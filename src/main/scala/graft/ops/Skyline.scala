package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D SKYLINE (Pareto frontier): the rows no other row beats on BOTH
  * dimensions — the multi-objective shortlist query ("cheapest for its
  * size class") classic OLAP engines ship as SKYLINE OF. Dominance is
  * the standard strict form: p dominates q iff p ≥ q on both dims and
  * > on at least one.
  *
  * Exact distributed plan with NO pairwise comparison: maximize both
  * dims (callers negate a minimized dim), collapse equal-x rows to
  * their max y (an equal-x higher-y row dominates the lower), then a
  * row survives iff its y exceeds the prefix max of y over all
  * STRICTLY larger x — the classic sort-scan skyline, distributed via
  * [[GlobalRank.globalRunningMaxExclusive]] (range partition +
  * per-partition offsets; ≤ p rows of driver metadata, window state
  * bounded by one range partition). Two shuffles total (x-collapse,
  * range partition); O(n log n) work, never O(n²).
  *
  * Output: (xCol, yCol) skyline points — strictly decreasing y as x
  * descends, the frontier itself. */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).cast("long").as("__x"))
      .agg(max(col(yCol).cast("long")).as("__y"))
    GlobalRank.globalRunningMaxExclusive(pts,
        Seq(col("__x").desc), "__y", "__pm")
      .filter(col("__y") > col("__pm"))
      .select(col("__x").as(xCol), col("__y").as(yCol))
  }
}
