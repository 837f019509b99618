package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  lazy val points = Seq(
    (1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0), (5L, -3.0), (6L, 1e9)
  ).toDF("pid", "v")
  lazy val intervals = Seq(
    (10L, 0.0, 10.0),     // [0, 10): pids 1, 2 — NOT 3 (hi exclusive)
    (11L, 5.0, 30.0),     // [5, 30): pids 2, 3, 4
    (12L, -10.0, 0.0),    // [-10, 0): pid 5
    (13L, 50.0, 40.0)     // empty interval: matches nothing
  ).toDF("iid", "lo", "hi")

  private def run(w: Double) =
    RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", w)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  val expected = Set(
    (1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L), (5L, 12L))

  test("containment semantics: inclusive lo, exclusive hi, negatives, empty intervals") {
    assert(run(10.0) == expected)
  }

  test("bin width never changes the result (only the plan cost)") {
    for (w <- Seq(0.5, 3.0, 7.0, 1000.0)) {
      assert(run(w) == expected, s"width $w changed the match set")
    }
  }

  test("no duplicate pairs even when an interval spans many bins") {
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 0.25)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, "binned join emitted duplicate pairs")
  }

  test("plans an equi-join on the bin, never a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n${plan.take(600)}")
  }

  test("an interval spanning too many bins fails fast with an actionable error") {
    // [5, 30) at width 0.25 = 100 bins > the 10-bin cap
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
        binWidth = 0.25, maxBinsPerInterval = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("RangeJoin: interval")),
      s"expected the per-row span message, got: ${ex.getMessage}")
  }

  test("column collisions are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("lo", lit(0.0)),
        intervals, "v", "lo", "hi", 10.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 0.0)
    }
  }

  // ---- intervalOverlap ----

  lazy val leftIv = Seq(
    (1L, 0.0, 10.0), (2L, 5.0, 15.0), (3L, 20.0, 30.0), (4L, 40.0, 40.0)
  ).toDF("lid", "llo", "lhi")
  lazy val rightIv = Seq(
    (10L, -5.0, 1.0),    // overlaps 1 only (touches [0,10) at [0,1))
    (11L, 9.0, 21.0),    // overlaps 1, 2, 3
    (12L, 15.0, 20.0),   // gap [15,20): overlaps nothing (both ends exclusive)
    (13L, -100.0, 100.0) // covers every non-empty left interval
  ).toDF("rid", "rlo", "rhi")

  val expectedOverlap = Set(
    (1L, 10L), (1L, 11L), (2L, 11L), (3L, 11L),
    (1L, 13L), (2L, 13L), (3L, 13L))

  private def runOv(w: Double) =
    RangeJoin.intervalOverlap(leftIv, rightIv, "llo", "lhi", "rlo", "rhi", w)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSeq

  test("overlap semantics: half-open intervals, empty left dropped, adjacency is no overlap") {
    val got = runOv(8.0)
    assert(got.toSet == expectedOverlap, s"got ${got.toSet}")
    assert(got.size == got.toSet.size, "each pair must be emitted exactly once")
  }

  test("overlap bin width never changes the result and never duplicates pairs") {
    for (w <- Seq(0.5, 3.0, 25.0, 1000.0)) {
      val got = runOv(w)
      assert(got.toSet == expectedOverlap, s"width $w changed the match set")
      assert(got.size == got.toSet.size, s"width $w duplicated pairs")
    }
  }

  test("overlap join plans on the bin key, never a nested loop") {
    val plan = RangeJoin.intervalOverlap(leftIv, rightIv,
        "llo", "lhi", "rlo", "rhi", 8.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"interval overlap must not plan a nested loop:\n${plan.take(600)}")
  }

  test("overlap join validates inputs like pointInInterval") {
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(leftIv, rightIv.withColumn("llo", lit(0.0)),
        "llo", "lhi", "rlo", "rhi", 8.0)
    }
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlap(leftIv, rightIv, "llo", "lhi", "rlo", "rhi",
        binWidth = 0.5, maxBinsPerInterval = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("RangeJoin: interval")))
  }
}
