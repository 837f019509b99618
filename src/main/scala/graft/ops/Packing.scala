package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-token-budget bins
  * (the batch-assembly step before LLM pre-training — pack short docs
  * together so every training sequence is ~full).
  *
  * True first-fit packing is inherently sequential, so the scalable form
  * packs WITHIN deterministic buckets: rows are hashed into `buckets`
  * independent streams, each stream is ordered by the id and filled
  * contiguously — a document starts a new bin when the running total
  * before it has crossed a multiple of `budget`. Bin token totals can
  * overshoot `budget` by at most one document (documents are never
  * split); callers that need a hard cap filter oversized docs first.
  *
  * Shape at 100 TB: ONE shuffle (hash partition by bucket) + a per-bucket
  * sort. Each window partition is corpus_size/buckets rows — size
  * `buckets` to the cluster (e.g. 10× task count) and no single task ever
  * sees more than a bounded slice; this is the same de-skew rule as the
  * groupBy+join guards elsewhere (a GLOBAL order-based pack would be one
  * task and is exactly the straggler we refuse to ship).
  */
object Packing {

  /** Sentinel for `buckets`: derive from the session's
    * defaultParallelism (see [[packGreedy]]). */
  val DeriveBuckets: Int = 0

  /** Pack rows into bins of ~`budget` tokens within `buckets` streams.
    *
    * Output: input columns + `bucket` (stream id), `cum_before` (tokens
    * ahead of this row in its stream) and `bin_id` (bin within stream).
    * Deterministic: a pure function of (idCol, sizeCol) — re-runs and
    * retries assign identical bins.
    *
    * `buckets` defaults to [[DeriveBuckets]] = 4× the session's
    * defaultParallelism: a naive caller must never serialize the corpus
    * into one stream, and 4× keeps the largest per-bucket window slice
    * well under a task's share even with hash imbalance. NOTE the
    * derived value depends on the session — callers that need
    * re-run-identical bin ids across differently-sized clusters must
    * pass `buckets` explicitly (the gate queries do).
    *
    * Contract: `sizeCol` values must be non-negative (they are token
    * counts). A negative size would make `cum_before` negative, where
    * Spark's `DIV` (truncate toward zero) and floor-division engines
    * disagree — the operator does not define bin ids for that input.
    */
  def packGreedy(df: DataFrame, idCol: Column, sizeCol: Column,
                 budget: Long, buckets: Int = DeriveBuckets): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(buckets >= 0, s"buckets must be >= 1 (or 0 = derive), got $buckets")
    for (c <- Seq("bucket", "cum_before", "bin_id"))
      require(!df.columns.contains(c),
        s"input frame already carries the output column $c")
    val nb =
      if (buckets != DeriveBuckets) buckets
      else 4 * math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val w = Window.partitionBy(col("bucket")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("bucket", pmod(idCol, lit(nb)).cast("long"))
      .withColumn("cum_before",
        (sum(sizeCol.cast("long")).over(w) - sizeCol.cast("long")))
      // integer DIV, not floor(double /): exact past 2^53 total tokens
      .withColumn("bin_id", expr(s"cum_before DIV ${budget}L"))
  }

  /** Materialize packed bins as training sequences: one row per
    * (bucket, bin_id) with the member payloads joined by `sep` in pack
    * order (ascending `idCol`), plus item and token counts — the final
    * assembly step after [[packGreedy]] (a training sequence is its
    * bin's documents concatenated with a separator/EOS token).
    *
    * Shape: ONE map-side-partial groupBy on (bucket, bin_id). Per-bin
    * ordering is an array_sort of the collected (id, payload) structs —
    * bounded by one bin (~`budget` tokens by construction), never a
    * window over the stream (the reassembleParagraphs rule). `idCol`
    * must be the pack-order id passed to packGreedy (unique per row, so
    * the struct sort is total and deterministic). */
  def assembleBins(packed: DataFrame, idCol: Column, sizeCol: Column,
                   textCol: Column, sep: String = "\n"): DataFrame = {
    for (c <- Seq("bucket", "bin_id"))
      require(packed.columns.contains(c),
        s"assembleBins expects a packGreedy output (missing column $c)")
    packed.groupBy(col("bucket"), col("bin_id"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(sizeCol.cast("long")).as("n_tokens"),
        array_sort(collect_list(struct(idCol.cast("long").as("i"),
          textCol.as("t")))).as("__bs"))
      .withColumn("text",
        array_join(transform(col("__bs"), s => s.getField("t")), sep))
      .drop("__bs")
  }

  /** SORTED LENGTH BATCHING for padded (non-packed) training/inference:
    * order the corpus by (sizeCol, idCol) and cut consecutive runs of
    * `batchSize` rows — neighbors in length share a batch, so padding
    * each batch to its own max wastes the least compute (the dynamic-
    * batching step of an inference/eval pipeline; [[packGreedy]] is the
    * concat-packing alternative for pre-training). Deterministic: a
    * pure function of (sizeCol, idCol).
    *
    * Shape: one window-free
    * [[graft.ops.GlobalRank.globalRowNumber]] ranked shuffle — never a
    * global window. Output: input columns + `batch_id` (0-based). */
  def lengthBatches(df: DataFrame, sizeCol: Column, idCol: Column,
                    batchSize: Int, outCol: String = "batch_id"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(!df.columns.contains(outCol),
      s"input frame already carries the output column $outCol")
    GlobalRank.globalRowNumber(df, Seq(sizeCol, idCol), outCol = "__lbr")
      .withColumn(outCol, expr(s"(__lbr - 1) DIV ${batchSize}L"))
      .drop("__lbr")
  }

  /** GPT-style PACKED PRETRAINING BLOCKS: concatenate the corpus in
    * ascending `idCol` order into one virtual token stream (an `eos`
    * marker closing every document) and cut fixed `blockSize`-token
    * blocks that CROSS document boundaries — the standard pretraining
    * tokenization ([[packGreedy]] never splits a document;
    * this always fills every block exactly). The final short block is
    * kept. Output: (block_id, n_tokens, text, spans) — `spans` is the
    * in-block document layout `start:len,start:len,…` (0-based token
    * offsets, one entry per document fragment in order): the attention
    * mask of packed training needs doc boundaries, and a block loses
    * them the moment fragments concatenate.
    *
    * Shape at 100 TB: the global offsets come from the window-free
    * [[GlobalRank.globalRunningSum]]; each document then emits one
    * FRAGMENT row per block it touches (≤ ceil(n/blockSize)+1 — doc
    * fragments ship, never individual tokens), and blocks reassemble
    * with one map-side-partial groupBy whose per-block sort is bounded
    * by the fragments of one block. Integer long math end to end. */
  def tokenBlocks(df: DataFrame, idCol: Column, textCol: String,
                  blockSize: Int, eos: String = "<eos>"): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val sized = df
      .select(idCol.as("__id"),
        concat(split(col(textCol), " "), array(lit(eos))).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
    val withCum = GlobalRank.globalRunningSum(
      sized, Seq(col("__id")), "__n", outCol = "__cum")
    val spanned = withCum
      .withColumn("__start", col("__cum") - col("__n"))
      .withColumn("block_id",
        explode(sequence(expr(s"__start DIV ${blockSize}L"),
          expr(s"(__start + __n - 1) DIV ${blockSize}L"))))
    // fragment of this doc inside this block: token-array slice
    val fragFrom = greatest(col("block_id") * blockSize, col("__start"))
    val fragTo = least((col("block_id") + 1) * blockSize,
      col("__start") + col("__n"))           // exclusive
    val frags = spanned.select(col("block_id"),
      fragFrom.as("__f"),
      (fragTo - fragFrom).cast("int").as("__len"),
      slice(col("__toks"), (fragFrom - col("__start") + 1).cast("int"),
        (fragTo - fragFrom).cast("int")).as("__frag"))
    frags.groupBy(col("block_id"))
      .agg(sum(col("__len")).as("n_tokens"),
        array_sort(collect_list(struct(col("__f"), col("__frag"))))
          .as("__fs"))
      .withColumn("text", array_join(
        flatten(transform(col("__fs"), s => s.getField("__frag"))), " "))
      .withColumn("spans", array_join(
        transform(col("__fs"), s => concat(
          (s.getField("__f") - col("block_id") * blockSize).cast("string"),
          lit(":"), size(s.getField("__frag")).cast("string"))), ","))
      .drop("__fs")
  }

  /** Per-batch padding accounting over a [[lengthBatches]] output:
    * rows, max length (= the padded width), total real tokens, and
    * `waste` = n_rows·max_len − sum_len (the padding tokens the batch
    * burns). One map-side-partial groupBy; integer-exact. */
  def paddingStats(batched: DataFrame, sizeCol: Column,
                   batchCol: Column): DataFrame =
    batched.groupBy(batchCol.as("batch_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(sizeCol.cast("long")).as("max_len"),
        sum(sizeCol.cast("long")).as("sum_len"))
      .withColumn("waste",
        col("n_rows") * col("max_len") - col("sum_len"))

  /** Export-shard assignment — the final step before a training corpus
    * ships as fixed-size archive shards (the WebDataset/TFRecord
    * layout): docs in `sortCols` order are assigned
    * shard_id = floor(exclusive_prefix_sum / shardBudget), so a shard
    * closes once its content crosses the budget and a doc NEVER
    * splits — shard totals land in [budget−maxItem, budget+maxItem).
    * Deterministic integer rule, no float division.
    *
    * Scale shape: the prefix sum is [[GlobalRank.globalRunningSum]]'s
    * window-free distributed form (range partition + ≤p metadata
    * offsets); the shard id is map-only arithmetic on top. Output:
    * input columns + `cum` (inclusive running total) + `shard_id`. */
  def shardAssign(df: DataFrame, sortCols: Seq[Column], valueCol: String,
                  shardBudget: Long, cumCol: String = "cum",
                  shardCol: String = "shard_id"): DataFrame = {
    require(shardBudget >= 1L,
      s"shardBudget must be >= 1, got $shardBudget")
    GlobalRank.globalRunningSum(df, sortCols, valueCol, cumCol)
      .withColumn(shardCol,
        expr(s"CAST(($cumCol - $valueCol) DIV $shardBudget AS BIGINT)"))
  }

  /** Per-shard manifest over a [[shardAssign]] output: item count and
    * content total per shard — the index file a shard consumer reads.
    * One map-side-partial groupBy, ≤ #shards rows. */
  def shardManifest(assigned: DataFrame, valueCol: String,
                    shardCol: String = "shard_id"): DataFrame =
    assigned.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col(valueCol).cast("long")).as("total"))
}
