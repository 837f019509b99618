package graft

import graft.ops.Profiler
import org.apache.spark.sql.functions._

/** ops/Profiler — ANALYZE-style column report on a hand-built frame. */
class ProfilerSpec extends SparkTestBase {
  import spark.implicits._

  test("profileColumns: nulls, distincts, native-order min/max, modal ties") {
    val df = Seq(
      (10L, Some("b"), "x"),
      (9L, Some("a"), "x"),
      (100L, None, "y"),
      (9L, Some("a"), "z")
    ).toDF("k", "s", "t")
    val got = Profiler.profileColumns(df, Seq("k", "s", "t"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    // k: native numeric order → min 9, max 100 (lexicographic would
    // say min "10", max "9"); mode 9 (count 2)
    assert(got("k") == (("k", 4L, 0L, 3L, "9", "100", "9", 2L)))
    assert(got("s") == (("s", 4L, 1L, 2L, "a", "b", "a", 2L)))
    // t: counts x=2, y=1, z=1 → mode x
    assert(got("t") == (("t", 4L, 0L, 3L, "x", "z", "x", 2L)))
    // modal tie breaks toward the larger rendered value
    val tie = Seq("p", "p", "q", "q").toDF("c")
    val m = Profiler.profileColumns(tie, Seq("c"))
      .select($"top_value", $"top_count").as[(String, Long)].collect().head
    assert(m == (("q", 2L)))
    // all-null column: distinct 0, no modal value
    val nulls = Seq[Option[String]](None, None).toDF("c")
    val nn = Profiler.profileColumns(nulls, Seq("c"))
      .as[(String, Long, Long, Long, Option[String], Option[String],
        Option[String], Option[Long])].collect().head
    assert(nn._3 == 2L && nn._4 == 0L && nn._7.isEmpty)
    intercept[IllegalArgumentException] {
      Profiler.profileColumns(df, Seq("k", "nope"))
    }
    intercept[IllegalArgumentException] {
      Profiler.profileColumns(df, Nil)
    }
    // partition independence
    val a = Profiler.profileColumns(df.repartition(7), Seq("k", "s", "t"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .collect().toSet
    assert(a == got.values.toSet)
  }
}
