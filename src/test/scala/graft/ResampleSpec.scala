package graft

import graft.ops.Resample
import org.apache.spark.sql.functions._

/** ops/Resample — LOCF gap-fill onto dense period spines. */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("gapFillLocf fills holes with the carried value, flags them") {
    val obs = Seq(
      ("a", 10L, 5L), ("a", 13L, 9L),        // gap at 11, 12
      ("b", 20L, 1L),                        // singleton: no fill
      ("c", 7L, 3L), ("c", 8L, 4L)           // dense: no fill
    ).toDF("g", "p", "v")
    val got = Resample.gapFillLocf(obs, "g", "p", "v")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 10L, 5L, 0L), ("a", 11L, 5L, 1L), ("a", 12L, 5L, 1L),
      ("a", 13L, 9L, 0L),
      ("b", 20L, 1L, 0L),
      ("c", 7L, 3L, 0L), ("c", 8L, 4L, 0L)))
    // every group's spine is dense: count == span
    val spans = Resample.gapFillLocf(obs, "g", "p", "v")
      .groupBy($"g").agg(count(lit(1)).as("n"),
        (max($"p") - min($"p") + 1).as("span"))
      .as[(String, Long, Long)].collect()
    assert(spans.forall(r => r._2 == r._3))
    // partition independence
    val again = Resample.gapFillLocf(obs.repartition(7), "g", "p", "v")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(again == got)
  }
}
