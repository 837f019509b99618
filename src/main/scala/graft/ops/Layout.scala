package graft.ops

import graft.functions.ZOrderFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column data layout (Z-order clustering).
  *
  * A table sorted on one column prunes scans filtered on that column
  * only; a table clustered on the Z-curve of several columns keeps
  * EVERY keyed column's per-file min/max span narrow, so parquet
  * row-group/file skipping fires for predicates on any of them — the
  * Spark-side analog of MergeTree multi-column ORDER BY clustering and
  * the standard lakehouse answer to "this table is filtered by two
  * unrelated keys". Pay the clustering once at write, prune every read.
  */
object Layout {

  /** Append a `zcodeCol` Morton code for `cols`, min/max-scaled to
    * `bitsPerDim` bits per dimension. The min/max probe is one O(1)
    * aggregate (column stats make it near-free on parquet). */
  def withZOrderCode(df: DataFrame, cols: Seq[String],
                     bitsPerDim: Int = 16,
                     zcodeCol: String = "__zcode"): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(!df.columns.contains(zcodeCol),
      s"input already has a '$zcodeCol' column — pass a different zcodeCol")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val scale = (1L << bitsPerDim) - 1
    val dims: Seq[Column] = cols.zipWithIndex.map { case (c, i) =>
      // empty frame / all-NULL column → null aggregates → constant dim 0
      // (NULL values themselves clamp to 0 inside ZOrderCode)
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      val span = if (mx > mn) mx - mn else 1.0
      // linear scale to [0, 2^bits): rank-free, monotonic, codegen-able
      ((col(c).cast("double") - lit(mn)) / lit(span) * lit(scale.toDouble))
        .cast("long")
    }
    df.withColumn(zcodeCol, ZOrderFunctions.zorderCode(dims, bitsPerDim))
  }

  /** Cluster the frame on the Z-curve of `cols`: range-repartition +
    * in-partition sort by the Morton code. Write the result with any
    * sink; each output file then covers a small hyper-rectangle of the
    * key space. */
  def zorder(df: DataFrame, cols: Seq[String], partitions: Int = 0,
             bitsPerDim: Int = 16): DataFrame = {
    val p = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    withZOrderCode(df, cols, bitsPerDim)
      .repartitionByRange(p, col("__zcode"))
      .sortWithinPartitions(col("__zcode"))
      .drop("__zcode")
  }
}
