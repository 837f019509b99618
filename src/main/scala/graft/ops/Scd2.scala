package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension TYPE 2 history — the warehouse-side sibling
  * of the engine's update/merge family (SyncEngine W5 applies the latest
  * value per key; SCD2 keeps EVERY value with its validity interval).
  * From a stream of versioned change rows (key, ts, attributes) it builds
  * the classic history table: one row per distinct consecutive attribute
  * state, with `valid_from`/`valid_to` interval bounds and an
  * `is_current` flag.
  *
  * Determinism: `seqCol` (a unique long per change row) resolves
  * same-timestamp writers — max seq wins per (key, ts), the CDC
  * last-writer rule — and all interval bounds are integer time units, so
  * both engines floor identically.
  *
  * Scale shape: every window partitions by the DIMENSION KEY — state is
  * bounded by one key's version count, never the table; the change-
  * detection lag and the interval lead ride the same (key, ts) sort, so
  * the whole build is ONE shuffle on the key. Incremental application
  * ([[mergeHistory]]) rebuilds only the keys a batch touches (semi-join)
  * and unions the untouched history back — the probe-and-admit contract
  * of the persisted-index family.
  */
object Scd2 {

  /** One version per (key, ts) — latest `seqCol` wins (max_by). */
  private def versions(changes: DataFrame, keyCol: String, tsCol: String,
                       seqCol: String, attrCols: Seq[String]): DataFrame = {
    val attrs = struct(attrCols.map(col): _*)
    changes
      .groupBy(col(keyCol), col(tsCol).cast("long").as(tsCol))
      .agg(max_by(attrs, col(seqCol)).as("__a"))
      .select(col(keyCol) +: col(tsCol) +:
        attrCols.map(c => col(s"__a.$c").as(c)): _*)
  }

  /** Build the SCD2 history from scratch: change rows → interval rows
    * (key, attrs…, valid_from, valid_to, is_current). Consecutive
    * versions with identical attributes collapse into one interval
    * (no-op change detection); `valid_to` is the next kept version's
    * start minus one, null-for-current surfaced as `is_current = 1` with
    * `valid_to = Long.MaxValue` so the interval algebra stays integer. */
  def buildHistory(changes: DataFrame, keyCol: String, tsCol: String,
                   seqCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val v = versions(changes, keyCol, tsCol, seqCol, attrCols)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val attrs = struct(attrCols.map(col): _*)
    // change detection: drop versions equal to their predecessor (<=> so
    // an all-null attribute state still compares equal to itself)
    val kept = v.withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || !(attrs <=> col("__prev")))
      .drop("__prev")
    kept.withColumn("__next_from", lead(col(tsCol), 1).over(w))
      .select(col(keyCol) +: attrCols.map(col) :+
        col(tsCol).as("valid_from") :+
        coalesce(col("__next_from") - 1, lit(Long.MaxValue)).as("valid_to") :+
        when(col("__next_from").isNull, 1).otherwise(0)
          .cast("int").as("is_current"): _*)
  }

  /** Apply a change batch to an existing history incrementally: keys the
    * batch touches are rebuilt from (their existing intervals re-expressed
    * as change rows) ∪ (the batch); untouched keys pass through verbatim.
    * Equivalent to a full rebuild over all changes ever seen (spec-pinned)
    * while reading only the touched slice of the history. */
  def mergeHistory(history: DataFrame, changes: DataFrame, keyCol: String,
                   tsCol: String, seqCol: String,
                   attrCols: Seq[String]): DataFrame = {
    val touchedKeys = changes.select(col(keyCol)).distinct()
    val touched = history.join(touchedKeys, Seq(keyCol), "left_semi")
    val untouched = history.join(touchedKeys, Seq(keyCol), "left_anti")
    // existing intervals re-enter as change rows at their valid_from;
    // seq = MinValue so a same-ts batch row (a real new write) wins
    val replayed = touched.select(col(keyCol) +:
      col("valid_from").as(tsCol) +:
      lit(Long.MinValue).as(seqCol) +: attrCols.map(col): _*)
    val batch = changes.select(col(keyCol) +: col(tsCol).cast("long")
      .as(tsCol) +: col(seqCol).cast("long").as(seqCol) +:
      attrCols.map(col): _*)
    buildHistory(replayed.unionByName(batch), keyCol, tsCol, seqCol,
      attrCols).unionByName(untouched)
  }

  /** Point-in-time lookup: the attribute state of every key at `atTs`
    * (the "as of" dimension read SCD2 exists to answer) — a pure interval
    * filter, no window. */
  def snapshotAt(history: DataFrame, atTs: Long): DataFrame =
    history.filter(col("valid_from") <= atTs && col("valid_to") >= atTs)
      .drop("valid_from", "valid_to", "is_current")

  /** History-table invariant audit — the SCD2-specific data-quality
    * suite (DataQuality covers generic rules; interval algebra needs
    * its own): per key, ordered by `valid_from`, count
    *   - `inverted`: valid_to < valid_from (empty interval),
    *   - `overlap`: valid_from ≤ previous row's valid_to,
    *   - `gap`: valid_from > previous valid_to + 1 (history must tile),
    *   - `current_marker`: keys whose is_current-flagged row count ≠ 1,
    *     or whose current row isn't the last interval / isn't open-ended
    *     per the MaxValue convention.
    * Output: (rule, n_violations, passed) — the DataQuality report
    * shape, so warehouse monitors treat both alike.
    *
    * Scale: one shuffle on the dimension key; the lag window and the
    * per-key aggregate are key-partitioned (bounded by one key's
    * version count) and everything after is a ≤ 4-row report. */
  def auditHistory(history: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    val lagged = history.withColumn("__prev_to", lag(col("valid_to"), 1).over(w))
    val rowLevel = lagged.agg(
      sum(when(col("valid_to") < col("valid_from"), 1L).otherwise(0L))
        .as("inverted"),
      sum(when(col("__prev_to").isNotNull &&
        col("valid_from") <= col("__prev_to"), 1L).otherwise(0L))
        .as("overlap"),
      // valid_from − 1 (not prev_to + 1): prev_to can be the open-ended
      // MaxValue sentinel after a duplicated-current corruption, and
      // +1 overflows (ANSI Spark throws, DuckDB errors)
      sum(when(col("__prev_to").isNotNull &&
        col("valid_from") - 1 > col("__prev_to"), 1L).otherwise(0L))
        .as("gap"))
    val perKey = history.groupBy(col(keyCol)).agg(
      sum(col("is_current").cast("long")).as("__ncur"),
      max(col("valid_to")).as("__maxto"),
      max(when(col("is_current") === 1, col("valid_to"))).as("__curto"))
    val curBad = perKey.agg(
      sum(when(col("__ncur") =!= 1L ||
        col("__curto").isNull ||
        col("__curto") =!= col("__maxto") ||
        col("__curto") =!= Long.MaxValue, 1L).otherwise(0L))
        .as("current_marker"))
    val rep = rowLevel.crossJoin(curBad)   // two 1-row aggregates
      .select(explode(array(
        Seq("inverted", "overlap", "gap", "current_marker").map(r =>
          struct(lit(r).as("rule"),
            coalesce(col(r), lit(0L)).as("n_violations"))): _*)).as("e"))
      .select(col("e.rule"), col("e.n_violations"))
    rep.withColumn("passed",
      when(col("n_violations") === 0L, 1).otherwise(0))
  }
}
