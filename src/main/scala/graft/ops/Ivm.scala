package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for grouped aggregates — keep a
  * materialized `GROUP BY` view current under a changelog WITHOUT
  * rescanning the base table. This is the set-based generalization of
  * the reference's watermark-append family (SURVEY §2 W3/W4 pull only
  * the delta; here the MERGE into the derived aggregate is also
  * delta-only) and the classic retract-stream model Flink/Materialize
  * published: every change arrives as a signed row, an UPDATE being a
  * retraction of the old image plus an insertion of the new one.
  *
  * Supported aggregate shape: per-key `count`, `sum`s — the
  * self-maintainable aggregates (a retraction is just a negative
  * contribution; min/max are NOT self-maintainable under deletes and
  * need the per-key value multiset, deliberately out of scope).
  *
  * Scale shape: the changelog is aggregated FIRST (one shuffle over the
  * delta only — partial aggregation applies), then joined to the view
  * by key. The base table is never touched; the view-side join is
  * shuffle-on-key against a delta-aggregate that is typically tiny →
  * AQE broadcasts it. Groups whose post-merge count reaches zero are
  * dropped (their key disappeared from the base), matching a full
  * recompute exactly — counts going negative means the changelog lied
  * (a retraction for a row never inserted) and is surfaced as an
  * optional invariant column rather than silently clamped.
  */
object Ivm {

  /** Sum/count spec: view column name -> value expression over the
    * changelog row (the same expression the view was built with). */
  final case class AggSpec(sums: Seq[(String, Column)],
                           countCol: String = "n_rows")

  /** Build the initial materialized view from a base frame. */
  def materialize(base: DataFrame, keys: Seq[String],
                  spec: AggSpec): DataFrame = {
    val aggs = count(lit(1)).as(spec.countCol) +:
      spec.sums.map { case (n, e) => sum(e).as(n) }
    base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a retract-model changelog into the view. `opCol` holds +1
    * (insert) / -1 (retract/delete); an update is two changelog rows.
    * Returns the updated view with the same schema.
    *
    * Join shape matters at scale: a naive full-outer on the keys
    * shuffles the ENTIRE view every batch. Instead the view splits
    * into untouched (anti join against the delta's distinct keys — the
    * small side, so AQE broadcasts it and the split is map-only over
    * the view) and touched (semi join, same broadcast); only the
    * touched slice — bounded by the delta's key count — full-outer
    * joins the delta aggregate, and untouched unions back verbatim.
    * The probe-and-admit contract Scd2.mergeHistory and the persisted
    * indices use. */
  def applyDelta(view: DataFrame, changes: DataFrame, keys: Seq[String],
                 spec: AggSpec, opCol: String = "op",
                 multiplicityCol: Option[String] = None): DataFrame = {
    // signed row weight; `multiplicityCol` (snapshotChangelog emits one)
    // lets a collapsed diff row stand for N identical physical rows
    val sgn = multiplicityCol
      .map(m => col(opCol).cast("long") * col(m).cast("long"))
      .getOrElse(col(opCol).cast("long"))
    // aggregate the delta alone: one shuffle over the (small) changelog
    val deltaAggs = sum(sgn).as(spec.countCol) +:
      spec.sums.map { case (n, e) => sum(sgn * e).as(n) }
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      // read once, feeds three branches (keys, semi/anti probes, merge)
      .localCheckpoint()
    val metricCols = spec.countCol +: spec.sums.map(_._1)
    val deltaKeys = delta.select(keys.map(col): _*)
    val untouched = view.join(deltaKeys, keys, "left_anti")
    val touched = view.join(deltaKeys, keys, "left_semi")
    val v = metricCols.foldLeft(touched) { (d, c) =>
      d.withColumnRenamed(c, s"__v_$c") }
    val d = metricCols.foldLeft(delta) { (df, c) =>
      df.withColumnRenamed(c, s"__d_$c") }
    // full outer over the TOUCHED slice only: delta may create brand-new
    // keys (view side null) or retract whole keys (delta drives to 0)
    val merged = v.join(d, keys, "full_outer")
    val out = metricCols.foldLeft(merged) { (df, c) =>
      df.withColumn(c,
        coalesce(col(s"__v_$c"), lit(0L).cast("long")) +
          coalesce(col(s"__d_$c"), lit(0L).cast("long")))
    }
    // count==0 → the key left the base; <0 → corrupt changelog, keep the
    // row visible (negative count) so reconciliation can flag it instead
    // of a silent wrong answer
    out.filter(col(spec.countCol) =!= 0L)
      .select((keys ++ metricCols).map(col): _*)
      .unionByName(untouched.select((keys ++ metricCols).map(col): _*))
  }

  /** MIN/MAX under retracts — the aggregates [[applyDelta]] documents
    * as NOT self-maintainable — via the classic auxiliary-state fix:
    * maintain the per-key VALUE MULTISET as a count view keyed by
    * (keys, value), which IS self-maintainable, and read extrema from
    * it. Deleting the current minimum needs no base rescan: the next
    * minimum is already in the histogram. State is bounded by distinct
    * (key, value) pairs — for integer-domain metrics typically far
    * below row count; pre-bucket continuous values if needed.
    *
    * The three entry points compose with [[applyDelta]] rather than
    * duplicate it: the auxiliary view is literally a count view with
    * the value column promoted into the key. */
  def extremaMaterialize(base: DataFrame, keys: Seq[String],
                         valueCol: String): DataFrame =
    materialize(base, keys :+ valueCol, AggSpec(Seq.empty))

  /** Merge a retract changelog into the extrema auxiliary view — same
    * contract as [[applyDelta]] (op ±1, optional multiplicity; zero
    * counts drop, negative counts stay visible for reconciliation). */
  def applyExtremaDelta(aux: DataFrame, changes: DataFrame,
                        keys: Seq[String], valueCol: String,
                        opCol: String = "op",
                        multiplicityCol: Option[String] = None): DataFrame =
    applyDelta(aux, changes, keys :+ valueCol, AggSpec(Seq.empty),
      opCol, multiplicityCol)

  /** Read the current per-key (min, max, n) from the auxiliary view.
    * Rows with non-positive counts (corrupt-changelog markers) are
    * EXCLUDED from extrema here — surface them via a `n_rows < 0`
    * filter on the aux view itself before trusting the snapshot. */
  def extremaSnapshot(aux: DataFrame, keys: Seq[String],
                      valueCol: String): DataFrame =
    aux.where(col("n_rows") > 0)
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as(s"${valueCol}_min"),
        max(col(valueCol)).as(s"${valueCol}_max"),
        sum(col("n_rows")).as("n_rows"))

  /** Turn a pair of table snapshots into the retract changelog that
    * `applyDelta` consumes — the batch-CDC "diff to changelog" bridge
    * (rows only in `before` retract, rows only in `after` insert;
    * UPDATEs appear naturally as one of each). Row identity = the full
    * column tuple; multiplicity handled via group counts so duplicate
    * rows diff correctly. One shuffle per side on the row hash. */
  def snapshotChangelog(before: DataFrame, after: DataFrame,
                        opCol: String = "op"): DataFrame = {
    val cols = before.columns.toSeq
    require(after.columns.toSeq == cols, "snapshot schemas must match")
    def counted(df: DataFrame, as: String) =
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as(as))
    counted(before, "__nb").join(counted(after, "__na"), cols, "full_outer")
      .withColumn("__d",
        coalesce(col("__na"), lit(0L)) - coalesce(col("__nb"), lit(0L)))
      .filter(col("__d") =!= 0L)
      .select(cols.map(col) :+
        when(col("__d") > 0, lit(1)).otherwise(lit(-1)).as(opCol) :+
        abs(col("__d")).as("multiplicity"): _*)
  }
}
