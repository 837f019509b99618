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
}
