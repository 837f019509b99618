package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Versioned-table reads over an append-only commit log — the
  * lakehouse time-travel primitive ("SELECT … AS OF version v"): the
  * table's state is never stored, only reconstructed from an ordered
  * log of row-level add/remove actions. Completes the repo's
  * warehouse-state family: SCD2 answers "what was the attribute over
  * time", IVM keeps one aggregate current, corpusDiff compares two
  * materialized snapshots — this reconstructs ANY historical version
  * from the log alone.
  *
  * Log contract: one row per action (versionCol long, opCol
  * 'add'|'remove', keyCol, payload columns). Per key the action with
  * the HIGHEST version ≤ v wins; at an equal version 'remove' beats
  * 'add' (lexicographic max over the (version, op) struct — a total
  * order both engines replay; co-versioned add+remove of one key is a
  * delete, the conservative read). A key whose winner is 'remove' (or
  * that has no action ≤ v) is absent from the snapshot.
  *
  * Scale shape: snapshotAt is ONE key-keyed max_by aggregate over the
  * log filtered to ≤ v — partial map-side (each task keeps one
  * candidate per key), no windows, no state beyond the live key set.
  * versionDiff is two snapshots + one full-outer key join shipping
  * payload HASHES (8 B), the corpusDiff discipline. On a real cluster
  * the log would be version-partitioned parquet, so the ≤ v filter is
  * partition pruning, not a scan. */
object CommitLog {

  /** The table as of `version`: latest-action-wins per key, removes
    * drop. Payload columns come back exactly as logged. */
  def snapshotAt(log: DataFrame, keyCol: String, versionCol: String,
                 opCol: String, version: Long,
                 payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val ord = struct(col(versionCol), col(opCol))
    val aggs = max_by(col(opCol), ord).as("__op") +:
      max(col(versionCol)).as("last_version") +:
      payloadCols.map(c => max_by(col(c), ord).as(c))
    log.filter(col(versionCol) <= version)
      .groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("__op") === "add")
      .select((col(keyCol) +: col("last_version") +:
        payloadCols.map(col)): _*)
  }

  /** What changed between two versions: (key, status ∈ added / removed
    * / changed) — unchanged keys are omitted (the actionable diff).
    * Payloads compare by xxhash64 of their struct, null-safe. */
  def versionDiff(log: DataFrame, keyCol: String, versionCol: String,
                  opCol: String, v1: Long, v2: Long,
                  payloadCols: Seq[String]): DataFrame = {
    require(v1 <= v2, s"v1 must be <= v2, got $v1 > $v2")
    def snap(v: Long, h: String, p: String) =
      snapshotAt(log, keyCol, versionCol, opCol, v, payloadCols)
        .select(col(keyCol),
          xxhash64(struct(payloadCols.map(col): _*)).as(h),
          lit(true).as(p))
    snap(v1, "__h1", "__p1")
      .join(snap(v2, "__h2", "__p2"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__p1").isNull, "added")
          .when(col("__p2").isNull, "removed")
          .when(col("__h1") <=> col("__h2"), "unchanged")
          .otherwise("changed").as("status"))
      .filter(col("status") =!= "unchanged")
  }
}
