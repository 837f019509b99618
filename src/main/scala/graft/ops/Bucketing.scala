package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the shuffle-amortization primitive for
  * 100 TB repeated-join workloads: write a table hash-bucketed (and
  * optionally sorted) on its join key ONCE, and every subsequent join
  * or aggregation on that key reads co-located buckets instead of
  * re-shuffling the corpus per query. Two tables bucketed on the same
  * key with the same bucket count sort-merge-join with ZERO exchanges
  * (BucketingSpec pins the plan); a groupBy on the bucket key
  * aggregates shuffle-free the same way. This is the Spark-native
  * answer to the pre-partitioned copy-back tables the reference keeps
  * per calculation (`calc/CalcEngine` C2): declare the layout in the
  * catalog and let the planner prove the exchange away, instead of
  * hand-scheduling partition-parallel pulls.
  *
  * What the layout buys in Spark 4: EXCHANGE elimination on both join
  * sides and on bucket-key aggregation. The merge join's Sort node
  * remains, but strictly LOCAL (per-bucket in-task — Spark ≥3.0 no
  * longer trusts bucket sort metadata for output ordering; the legacy
  * conf restoring it is gone in 4.x); `sortBy` still clusters values
  * for parquet run-length/dictionary wins and cheap local sorting.
  *
  * At 100 TB: the bucket count bounds per-bucket file size (pick
  * corpus_bytes / target_bucket_bytes, a power of two so downstream
  * re-bucketing can coalesce pairs); the one-time write pays the
  * shuffle ONCE, and every downstream join of a 10¹¹-row fact table
  * to its bucketed dimensions skips both exchange AND sort (sorted
  * buckets stream directly into the merge join).
  */
object Bucketing {

  /** Persist `df` as a managed bucketed table: hash-bucketed on
    * `bucketCols` into `numBuckets`, each bucket sorted on `sortCols`
    * (default: the bucket key, which is what the merge join wants).
    * Overwrites by default — layout declarations are idempotent. */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], numBuckets: Int,
                    sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    // one shuffle to co-locate each bucket in ONE task → ONE file per
    // bucket: without this, every write task emits a file per bucket
    // (tasks×buckets small files at scale), and the scan only trusts
    // bucket SORTEDNESS — eliminating the merge-join Sort — when a
    // bucket is a single file
    val placed = df.repartition(numBuckets,
      bucketCols.map(org.apache.spark.sql.functions.col): _*)
    placed.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back through the catalog — the bucket
    * spec only reaches the planner via `spark.table`, never via a
    * path read. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
