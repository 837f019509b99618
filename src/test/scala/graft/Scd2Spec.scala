package graft

import graft.ops.Scd2
import org.apache.spark.sql.functions._

/** ops/Scd2 — SCD type-2 history build, incremental merge, and
  * point-in-time snapshot against hand-computable fixtures. */
class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private val MAX = Long.MaxValue

  // (key, ts, seq, attr)
  private def hist(rows: Seq[(Long, Long, Long, String)]) =
    Scd2.buildHistory(rows.toDF("k", "ts", "seq", "a"), "k", "ts", "seq",
      Seq("a"))

  test("buildHistory: intervals, no-op collapse, same-ts last-writer") {
    val rows = Seq(
      // key 1: x@0, no-op x@5 (collapses), y@10, x@20
      (1L, 0L, 1L, "x"), (1L, 5L, 2L, "x"), (1L, 10L, 3L, "y"),
      (1L, 20L, 4L, "x"),
      // key 2: two writers at ts 0 — seq 6 wins; then z@7
      (2L, 0L, 5L, "p"), (2L, 0L, 6L, "q"), (2L, 7L, 7L, "z")
    )
    val got = hist(rows).as[(Long, String, Long, Long, Int)]
      .collect().toSet
    val want = Set(
      (1L, "x", 0L, 9L, 0), (1L, "y", 10L, 19L, 0), (1L, "x", 20L, MAX, 1),
      (2L, "q", 0L, 6L, 0), (2L, "z", 7L, MAX, 1))
    assert(got == want)
    // partition independence
    val again = Scd2.buildHistory(rows.toDF("k", "ts", "seq", "a")
        .repartition(7), "k", "ts", "seq", Seq("a"))
      .as[(Long, String, Long, Long, Int)].collect().toSet
    assert(again == got)
    intercept[IllegalArgumentException] {
      Scd2.buildHistory(rows.toDF("k", "ts", "seq", "a"), "k", "ts", "seq",
        Nil)
    }
  }

  test("mergeHistory: incremental equals full rebuild; untouched keys pass through") {
    val batch1 = Seq(
      (1L, 0L, 1L, "x"), (1L, 10L, 2L, "y"),
      (2L, 0L, 3L, "p"),
      (3L, 0L, 4L, "s"))
    val batch2 = Seq(
      (1L, 20L, 5L, "z"),          // new version for key 1
      (2L, 0L, 6L, "q"),           // same-ts overwrite for key 2
      (4L, 5L, 7L, "n"))           // brand-new key
    val h1 = hist(batch1)
    val merged = Scd2.mergeHistory(h1, batch2.toDF("k", "ts", "seq", "a"),
        "k", "ts", "seq", Seq("a"))
      .as[(Long, String, Long, Long, Int)].collect().toSet
    val full = hist(batch1 ++ batch2)
      .as[(Long, String, Long, Long, Int)].collect().toSet
    assert(merged == full)
    // key 3 untouched by batch2 — its row must be byte-identical
    assert(merged.contains((3L, "s", 0L, MAX, 1)))
    // key 2 same-ts overwrite: batch seq beats the replayed interval
    assert(merged.contains((2L, "q", 0L, MAX, 1)))
  }

  test("snapshotAt answers point-in-time reads") {
    val h = hist(Seq(
      (1L, 0L, 1L, "x"), (1L, 10L, 2L, "y"),
      (2L, 5L, 3L, "p")))
    assert(Scd2.snapshotAt(h, 4L).as[(Long, String)].collect().toSet ==
      Set((1L, "x")))
    assert(Scd2.snapshotAt(h, 10L).as[(Long, String)].collect().toSet ==
      Set((1L, "y"), (2L, "p")))
    // before any version: empty
    assert(Scd2.snapshotAt(h, -1L).count() == 0)
  }

  test("auditHistory: a built history is clean; each corruption fires its rule") {
    val h = hist(Seq(
      (1L, 0L, 1L, "x"), (1L, 10L, 2L, "y"), (1L, 20L, 3L, "z"),
      (2L, 5L, 4L, "p")))
    def audit(df: org.apache.spark.sql.DataFrame) =
      Scd2.auditHistory(df, "k")
        .as[(String, Long, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val clean = audit(h)
    assert(clean.values.forall(_ == ((0L, 1))),
      s"buildHistory output must audit clean: $clean")
    // inverted: empty interval on key 2
    val inv = audit(h.withColumn("valid_to",
      when(col("k") === 2, col("valid_from") - 1).otherwise(col("valid_to"))))
    assert(inv("inverted") == ((1L, 0)))
    // overlap: key 1's first interval extended over the second
    val ovl = audit(h.withColumn("valid_to",
      when(col("k") === 1 && col("valid_from") === 0, lit(12L))
        .otherwise(col("valid_to"))))
    assert(ovl("overlap") == ((1L, 0)))
    // gap: key 1's first interval truncated
    val gap = audit(h.withColumn("valid_to",
      when(col("k") === 1 && col("valid_from") === 0, lit(5L))
        .otherwise(col("valid_to"))))
    assert(gap("gap") == ((1L, 0)))
    // current_marker: duplicated current row (counts ONE bad key, even
    // though two rows are involved) — and no lag-window overflow on the
    // MaxValue sentinel riding into prev_to
    val dup = audit(h.unionByName(h.filter(col("is_current") === 1 &&
      col("k") === 2)))
    assert(dup("current_marker") == ((1L, 0)))
    // closed-out current row: flag says current but interval is finite
    val closed = audit(h.withColumn("valid_to",
      when(col("k") === 2, lit(99L)).otherwise(col("valid_to"))))
    assert(closed("current_marker") == ((1L, 0)))
  }
}
