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

  /** Pass 1 of both profile modes: fused null/min/max aggregate — one
    * scan, 1-row result — fanned out to one row per column. */
  private def basicsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(",")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      // min/max under the column's NATIVE order, rendered after — a
      // string-first min would order numerics lexicographically
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val onerow = df.agg(aggs.head, aggs.tail: _*)
    // fan the 1-row frame out to one row per column (metadata explode)
    onerow.select(explode(array(cols.map(c => struct(
        lit(c).as("column"), col("__n").as("n"),
        col(s"__null_$c").as("n_null"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("__s"))
      .select(col("__s.*"))
  }

  /** Long form shared by pass 2 of both modes: the columns UNPIVOT to
    * (__col, __val-as-string), NULLs excluded — k columns make the scan
    * k× wider, not k scans. */
  private def longForm(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("__col"), col(c).cast("string").as("__val"))): _*))
        .as("__s"))
      .select(col("__s.*"))
      .where(col("__val").isNotNull)

  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val basics = basicsOf(df, cols)
    // pass 2: long-form value histogram → distinct + mode per column
    val hist = longForm(df, cols).groupBy(col("__col"), col("__val"))
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

  /** The documented 100 TB scale knob of [[profileColumns]], made real:
    * pass 2's exact (column, value) histogram — whose shuffle degrades
    * to ~rows on a high-cardinality id column — is replaced by ONE
    * [[Sketches.hllRegisters]] build over the same long form, grouped
    * by column name. The shuffle now carries at most k·2^b register
    * rows after the map-side partial max, whatever the cardinality;
    * the modal value is dropped (a mode needs the exact histogram —
    * callers wanting it for bounded-alphabet columns run the exact
    * profile on those columns alone).
    *
    * Output per column: (column, n, n_null, min_value, max_value,
    * n_buckets, denom_units, estimate) — `n_buckets`/`denom_units` are
    * the sketch's exact integer core (auditable, engine-reproducible
    * with a shared hash), `estimate` the float convenience from
    * [[Sketches.hllEstimate]]. Values sketch by their RENDERED string
    * (the unpivot needs one type), so 1 and "1" in different columns
    * count the same — consistent with the exact mode's histogram.
    *
    * `hashFn`/`hashBits` default to production xxhash64/63; gates pass
    * [[graft.llm.TextAnalysis.md5Hash60]]/60 so an external engine
    * replays the registers from string math alone. */
  def approxProfile(df: DataFrame, cols: Seq[String], b: Int = 6,
                    hashFn: org.apache.spark.sql.Column =>
                      org.apache.spark.sql.Column = xxhash64(_),
                    hashBits: Int = 63): DataFrame = {
    val basics = basicsOf(df, cols)
    val reg = Sketches.hllRegisters(longForm(df, cols), col("__val"),
      b = b, hashFn = hashFn, hashBits = hashBits, groupCols = Seq("__col"))
    val est = Sketches.hllEstimate(reg, b = b, hashBits = hashBits,
        groupCols = Seq("__col"))
      .withColumnRenamed("__col", "column")
    basics.join(est, Seq("column"), "left")
      .select(col("column"), col("n"), col("n_null"),
        col("min_value"), col("max_value"),
        // an all-NULL column has no registers: 0 occupied buckets, the
        // all-empty harmonic denominator m·2^S, estimate 0 distinct
        coalesce(col("n_buckets"), lit(0)).as("n_buckets"),
        coalesce(col("denom_units"),
          lit(BigDecimal(BigInt(1) << (hashBits - b + 1)) * (1 << b))
            .cast("decimal(38,0)")).as("denom_units"),
        coalesce(col("estimate"), lit(0.0)).as("estimate"))
  }

  /** FUNCTIONAL-DEPENDENCY check: for each candidate (determinant →
    * dependent) pair, does A determine B in the data? The schema-
    * discovery probe behind normalization audits and join-key
    * validation ("is product_id → category actually clean?").
    * Violations are determinant keys carrying MORE THAN ONE distinct
    * dependent value; NULL dependents count as a value of their own
    * (a key mapping to {x, NULL} is dirty, not half-clean).
    *
    * Output: one row per pair — (det, dep, n_keys, n_violating,
    * max_deps, holds) with holds = (n_violating == 0).
    *
    * Scale shape: per pair ONE (det, dep) distinct-pair groupBy (the
    * dependency is a property of the DISTINCT mapping — row counts
    * never matter) + one det-keyed count; pairs evaluated
    * independently and unioned (pair list is caller-bounded
    * metadata). NULL determinant keys are excluded — "NULL determines
    * x" is not a statement about any real key. */
  def functionalDependencies(df: DataFrame,
                             pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (determinant, dependent)")
    require(pairs.distinct.size == pairs.size, "duplicate FD pairs")
    pairs.map { case (det, dep) =>
      df.where(col(det).isNotNull)
        .select(col(det).cast("string").as("__k"),
          col(dep).cast("string").as("__v"))
        .distinct()
        .groupBy(col("__k"))
        .agg(count(lit(1)).as("__nv"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("__nv") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("__nv")).as("max_deps"))
        .select(lit(det).as("det"), lit(dep).as("dep"),
          coalesce(col("n_keys"), lit(0L)).as("n_keys"),
          coalesce(col("n_violating"), lit(0L)).as("n_violating"),
          coalesce(col("max_deps"), lit(0L)).as("max_deps"),
          coalesce(col("n_violating") === 0, lit(true)).as("holds"))
    }.reduce(_ unionByName _)
  }
}
