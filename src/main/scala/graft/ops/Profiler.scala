package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-TABLE / data-catalog report: one row
  * per profiled column with null rate, distinct cardinality, range and
  * the modal value. What an operator reads FIRST against an unfamiliar
  * 100 TB table, and the statistics layer the reference's S10
  * exists/count/PK probes hint at, generalized to every column.
  *
  * Two passes, both single-shuffle:
  *   1. a fused aggregate (one scan, zero shuffles beyond the final
  *      1-row reduce) computes n, per-column null counts and min/max;
  *   2. the columns UNPIVOT into (column, value) long form — k columns
  *      make the scan k× wider, not k scans — and ONE groupBy
  *      (column, value) feeds both distinct counts and the modal value
  *      (max_by over the (count, value) struct: ties break toward the
  *      LARGER rendered value, a total order both engines replay).
  *
  * Values are rendered as strings for the long form (the unpivot needs
  * one type). Longs/strings/dates render identically across engines;
  * DOUBLE columns are the caller's risk (scientific-notation rendering
  * differs between engines — pre-scale to integers, the repo-wide
  * discipline). NULLs are excluded from the long form (counted in
  * pass 1; a null is a missing measurement, not a modal candidate).
  *
  * Scale: the (column, value) shuffle carries distinct values per
  * column, not rows, after the map-side partial; a high-cardinality id
  * column degrades it to ~rows — at 100 TB swap pass 2's distinct
  * count for the HLL sketch (`Sketches.hll*`) per column and keep the
  * modal value only for bounded-alphabet columns. Exactness is the
  * gate contract; the sketch path is the documented scale knob. */
object Profiler {

  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(",")}")
    // pass 1: fused null/min/max aggregate — one scan, 1-row result
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      // min/max under the column's NATIVE order, rendered after — a
      // string-first min would order numerics lexicographically
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val onerow = df.agg(aggs.head, aggs.tail: _*)
    // fan the 1-row frame out to one row per column (metadata explode)
    val basics = onerow.select(explode(array(cols.map(c => struct(
        lit(c).as("column"), col("__n").as("n"),
        col(s"__null_$c").as("n_null"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("__s"))
      .select(col("__s.*"))
    // pass 2: long-form value histogram → distinct + mode per column
    val long = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("__col"), col(c).cast("string").as("__val"))): _*))
        .as("__s"))
      .select(col("__s.*"))
      .where(col("__val").isNotNull)
    val hist = long.groupBy(col("__col"), col("__val"))
      .agg(count(lit(1)).as("__cnt"))
    val shape = hist.groupBy(col("__col").as("column"))
      .agg(count(lit(1)).as("n_distinct"),
        max_by(col("__val"), struct(col("__cnt"), col("__val")))
          .as("top_value"),
        max(col("__cnt")).as("top_count"))
    basics.join(shape, Seq("column"), "left")
      .select(col("column"), col("n"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"),
        col("top_value"), col("top_count"))
  }
}
