package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: pair each point row with every
  * interval row whose [lo, hi) contains the point's value. Spark plans a
  * bare `p.v >= i.lo AND p.v < i.hi` join as BroadcastNestedLoopJoin —
  * O(|points|·|intervals|) and a guaranteed stall at corpus scale. No
  * reference analog; the oracle (gate query q47) is DuckDB's plain
  * inequality join.
  *
  * Plan shape: fixed-width BINNING turns the inequality into an equality
  * — a point lands in bucket floor(v/w); an interval explodes to the
  * buckets it overlaps, floor(lo/w)..floor(hi/w). A containing interval
  * ALWAYS shares the point's bucket (floor is monotonic), so an
  * equi-join on the bucket followed by the exact containment filter is
  * complete; and each matching (point, interval) pair meets in exactly
  * ONE bucket (the point's), so no dedup is needed. One shuffle on the
  * bucket key; cost |points| + Σ(interval span/w) + |matches|.
  *
  * Pick `binWidth` near the TYPICAL interval width: too small explodes
  * the interval side (span/w bucket rows per interval), too large packs
  * many intervals per bucket (join fan-out approaches the nested loop).
  * Correctness never depends on the width, but a too-small width is a
  * cost cliff, not a graceful one: a single interval spanning more than
  * `maxBinsPerInterval` buckets FAILS FAST with an actionable per-row
  * error (raise binWidth) instead of letting `sequence()` abort deep in
  * a stage on Spark's max array length.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      valueCol: String, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxBinsPerInterval: Long = 1L << 22): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    require(points.columns.intersect(intervals.columns).isEmpty,
      "point and interval column names must be disjoint (alias before joining)")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not carry the helper column __bin")
    val p = points.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    val i = intervals
      .filter(col(hiCol) > col(loCol))   // empty intervals match nothing
      .withColumn("__bin",
        explodeToBins(loCol, hiCol, binWidth, maxBinsPerInterval))
    p.join(i, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pair every left interval [lLo, lHi) with
    * every right interval [rLo, rHi) that overlaps it (shares at least
    * one value: `lLo < rHi AND rLo < lHi`). Same binning idea as
    * [[pointInInterval]], both sides exploded; each overlapping pair is
    * emitted from exactly ONE bucket — the bucket of the overlap's
    * START, `max(lLo, rLo)`, which both explosion ranges provably cover —
    * so no dedup pass is needed. One shuffle on the bucket key.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      binWidth: Double,
                      maxBinsPerInterval: Long = 1L << 22): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    require(left.columns.intersect(right.columns).isEmpty,
      "left and right column names must be disjoint (alias before joining)")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "inputs must not carry the helper column __bin")
    val l = left.filter(col(lHi) > col(lLo))
      .withColumn("__bin", explodeToBins(lLo, lHi, binWidth, maxBinsPerInterval))
    val r = right.filter(col(rHi) > col(rLo))
      .withColumn("__bin", explodeToBins(rLo, rHi, binWidth, maxBinsPerInterval))
    l.join(r, Seq("__bin"))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        // exactly-once: only the bucket holding the overlap start emits
        col("__bin") === floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop("__bin")
  }

  /** Bins covered by [lo, hi) at `binWidth`, exploded — with the per-row
    * span guard: when the assert passes it yields null and coalesce
    * falls through to hiBin, keeping the check inside the sequence()
    * argument so the optimizer can't prune it away. */
  private def explodeToBins(loCol: String, hiCol: String, binWidth: Double,
                            maxBinsPerInterval: Long): Column = {
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val guardedHi = coalesce(
      assert_true(hiBin - loBin < lit(maxBinsPerInterval),
        format_string("RangeJoin: interval [%s, %s) spans >= " +
          s"$maxBinsPerInterval bins at binWidth=$binWidth — raise " +
          "binWidth (or maxBinsPerInterval)", col(loCol), col(hiCol)))
        .cast("long"),
      hiBin)
    explode(sequence(loBin, guardedHi))
  }
}
