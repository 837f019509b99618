package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed training-data cleaning pipeline over a document corpus —
  * the end-to-end shape the individual llm operators exist for:
  *
  *   profile (quality signals, langid, token counts)   — map-only
  *   → quality filter                                  — map-only
  *   → exact dedup (survivor = min doc_id)             — 1 shuffle
  *   → optional near-dup kill via MinHash banding      — bounded joins
  *
  * Everything before dedup fuses into the document scan (one pass,
  * whole-stage codegen); at 100 TB the only unavoidable shuffles are the
  * dedup groupBy and the LSH bucket join.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 8,
      maxTokens: Int = 100000,
      maxPunctRatio: Double = 0.3,
      dropNearDups: Boolean = true,
      minhashK: Int = 32,
      minhashBands: Int = 8,
      nearDupThreshold: Double = 0.8,
      // when set, MinHash candidate pairs are re-verified by EXACT n-gram
      // Jaccard >= value before the transitive kill — the production
      // candidates→verify shape, and what makes the near-dup stage
      // engine-independent (exact Jaccard is SQL-expressible, signature
      // agreement is not)
      exactVerifyJaccard: Option[Double] = None)

  /** Returns the cleaned corpus with profile columns attached, plus
    * bookkeeping columns `drop_reason` on the rejected frame. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            cfg: Config = Config()): (DataFrame, DataFrame) = {
    val profiled = docs
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualitySignals(col(textCol)))
      .withColumn("n_tokens", col("quality.n_tokens"))
      .withColumn("keep_quality",
        TextAnalysis.qualityKeep(col(textCol), cfg.minTokens, cfg.maxTokens,
          cfg.maxPunctRatio))

    val qualityRejects = profiled.filter(!col("keep_quality"))
      .withColumn("drop_reason", lit("quality"))
    val kept = profiled.filter(col("keep_quality"))

    // exact dedup: survivor = min id per CONTENT. The window partitions
    // on (content_hash, text): the 64-bit hash leads so shuffle
    // partitioning and in-partition comparisons work on an 8-byte key
    // and only fall through to the full text on a hash collision —
    // which the text tiebreaker then resolves EXACTLY (two distinct
    // documents sharing a hash still land in different groups, so a
    // collision can never silently drop a distinct document).
    val survivors = kept
      .withColumn("content_hash", xxhash64(col(textCol)))
      .withColumn("__keep_id",
        min(col(idCol)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("content_hash"), col(textCol))))
    val exactRejects = survivors.filter(col(idCol) =!= col("__keep_id"))
      .withColumn("drop_reason", lit("exact_dup"))
    val uniqued = survivors.filter(col(idCol) === col("__keep_id"))
      .drop("__keep_id")

    if (!cfg.dropNearDups) {
      (uniqued, qualityRejects.unionByName(
        exactRejects.drop("content_hash", "__keep_id"), allowMissingColumns = true))
    } else {
      // near-dup kill: transitive clusters via connected components —
      // each duplicate CHAIN keeps exactly its min-id member (a≈b, b≈c
      // drops both b and c even if (a,c) was never a candidate pair).
      // The corpus is shingled ONCE and the frame shared between MinHash
      // candidate generation and the exact-Jaccard verify (both stages
      // otherwise recompute the n-gram split over every document).
      val gramsF = uniqued.select(col(idCol).as("doc_id"),
          TextShingles.wordNgrams(col(textCol), 2).as("__grams"),
          col(textCol).as("__text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val candidates = Dedup.minHashCandidatesFromGrams(gramsF,
        cfg.minhashK, cfg.minhashBands, threshold = cfg.nearDupThreshold)
      val pairs = cfg.exactVerifyJaccard match {
        case Some(minJ) => Dedup.jaccardVerifyGrams(
          candidates.select(col("id_a"), col("id_b")), gramsF, idCol, minJ)
        case None => candidates
      }
      // nearDupLosers materializes the edge list (checkpoint/collect)
      // before returning, so the shingle cache AND the candidate-pair
      // cache (minHashCandidatesFromGrams returns a persisted frame)
      // can both be released here — repeated clean() calls in a
      // long-lived session must not accumulate dead cached blocks
      val losers = Dedup.nearDupLosers(pairs).withColumnRenamed("id", idCol)
      gramsF.unpersist(false)
      candidates.unpersist(false)
      val nearRejects = uniqued.join(losers, Seq(idCol), "left_semi")
        .withColumn("drop_reason", lit("near_dup"))
      val clean = uniqued.join(losers, Seq(idCol), "left_anti")
      (clean, qualityRejects
        .unionByName(exactRejects.drop("content_hash", "__keep_id"),
          allowMissingColumns = true)
        .unionByName(nearRejects.drop("content_hash"),
          allowMissingColumns = true))
    }
  }

  /** SUB-document curation + budget cut — the composition [[clean]]
    * stops short of: boilerplate paragraphs deduped corpus-wide
    * (fixed `paraTokens`-token windows as pseudo-paragraphs, for
    * corpora without structural separators), then repeated spans of
    * `spanN` tokens scrubbed from the DEDUPED text at arbitrary
    * alignment, then the surviving corpus cut to `budget` total tokens
    * in ascending-id order. Returns (doc_id, n_tokens, cum) — the
    * training-set manifest; join back on doc_id for the cleaned text.
    *
    * Every stage is an individually gate-checked operator
    * (q88/q91/q89); the composition itself is gate query q92 — stage
    * boundaries (emptied docs dropping out, token recounts on rebuilt
    * text) are where composition bugs would hide. Fully-scrubbed docs
    * are excluded before the budget (empty text is not a training
    * row). Shapes: two groupBy-dedup stages + the pid-partitioned
    * running-sum window — no corpus-wide windows, no collects beyond
    * the ≤p offset rows. */
  def curateSubdocBudget(docs: DataFrame, idCol: String, textCol: String,
                         budget: Long,
                         paraTokens: Int = 10, paraMinLen: Int = 10,
                         spanN: Int = 10, spanMinDocs: Int = 2,
                         spanHashGrams: Boolean = true): DataFrame = {
    val paras = Chunking.chunkByTokens(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")),
        idCols = Seq("doc_id"), textCol = "__t",
        chunkSize = paraTokens, stride = paraTokens)
      .select(col("doc_id"), col("chunk_id").as("pos"),
        col("chunk_text").as("para"))
    // pin the deduped corpus: the scrub stage reads its input three
    // times (window explode, span flag-back, final rejoin), and here
    // that input is the whole chunk+dedup+reassemble lineage — uncached
    // it recomputes per read (measured 3× the composite's wall time at
    // sf0.1). The budget stage's eager checkpoint materializes the
    // result, so the cache is released before returning.
    val deduped = Dedup.reassembleParagraphs(
      Dedup.dedupParagraphInstances(
        paras, keepFirst = true, minLen = paraMinLen), sep = " ")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scrubbed = Dedup.scrubRepeatedSpans(
      deduped, idCol = "doc_id", textCol = "text",
      n = spanN, minDocs = spanMinDocs, hashGrams = spanHashGrams)
    val survivors = scrubbed.filter(col("text") =!= "")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val result = graft.ops.GlobalRank.takeWhileBudget(
      survivors, Seq(col("doc_id")), "n_tokens", budget)
    deduped.unpersist(false)
    result
  }

  /** QUALITY → DEDUP → LEAKAGE-SAFE SPLIT → TRAIN BATCHING — the
    * release-manifest composition the round-6 operators enable: Gopher
    * rule battery drops low-quality docs, exact dedup keeps the min-id
    * copy, the train/val/test split is keyed on the near-dup CLUSTER
    * representative (winnowing-overlap pairs over the survivors — a
    * near-dup pair straddling train/test would leak eval), and the
    * train side is cut into length-homogeneous padded batches
    * (val/test batch as -1: eval batching is the harness's choice).
    * Returns (doc_id, n_tokens, rep, split, batch_id).
    *
    * Every stage is an individually gate-checked operator
    * (q111/q20/q113/q114); the composition is gate q117. Shapes: the
    * quality pass is map-only, dedup one min(struct) groupBy, pairs
    * the capped inverted-index join, split map-only after the
    * components join, batching one window-free ranked shuffle over the
    * train side only. */
  def curateLeakSafe(docs: DataFrame, idCol: String, textCol: String,
                     splits: Seq[(String, Int)],
                     batchSize: Int,
                     minWords: Int = 30, minStopwords: Int = 1,
                     winnowMaxDf: Int = 50, minShared: Int = 2,
                     hashFn: org.apache.spark.sql.Column =>
                       org.apache.spark.sql.Column = xxhash64(_))
      : DataFrame = {
    val counts = TextAnalysis.gopherCounts(col(textCol))
    val quality = docs.filter(TextAnalysis.gopherKeep(counts,
      minWords = minWords, minStopwords = minStopwords))
    // pin the survivors: the 10-regex quality pass + dedup groupBy
    // otherwise recompute for the fingerprint build, the split frame,
    // and BOTH filter branches of the final union (the q92 lesson:
    // check what re-reads its input before feeding it computed lineage
    // — measured 4× = 9.9 s vs 4.2 s at sf0.1)
    val uniqued = quality
      .groupBy(col(textCol))
      .agg(min(col(idCol)).as("__keep_id"))
      .select(col("__keep_id").as(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.winnowingOverlapPairs(
        uniqued, idCol = idCol, textCol = textCol,
        minShared = minShared, maxDf = winnowMaxDf, hashFn = hashFn)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    // id-level rows only; materialized eagerly so the survivor pin can
    // release before returning (winnowingOverlapPairs' own discipline —
    // the returned frame stays persisted, callers may unpersist)
    val assigned = Dedup.leakageSafeSplits(
        uniqued.select(col(idCol),
          size(split(col(textCol), " ")).cast("long").as("n_tokens")),
        pairs, idCol, splits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    uniqued.unpersist(false)
    val train = graft.ops.Packing.lengthBatches(
      assigned.filter(col("split") === splits.head._1),
      col("n_tokens"), col(idCol), batchSize)
    assigned.filter(col("split") =!= splits.head._1)
      .withColumn("batch_id", lit(-1L))
      .unionByName(train)
      .select(col(idCol), col("n_tokens"), col("rep").cast("long").as("rep"),
        col("split"), col("batch_id"))
  }

  /** Corpus DATA CARD — the per-slice summary a release ships next to
    * the data (and the first thing an operator reads before touching a
    * new crawl): per group (language / source / shard), document and
    * distinct-content counts, exact-dup rate, token/char totals, length
    * extremes, and the Gopher-quality pass rate — all integer surface
    * (rates as per-mille floor divisions, the repo-wide tie discipline).
    *
    * Scale shape: ONE corpus scan. Distinctness counts the 8-byte
    * content hash (never the text — `hashFn`: xxhash64 production,
    * md5Hash60 at the gate), and Spark plans the mixed
    * distinct/non-distinct aggregate as one Expand over the group key —
    * two map-side-partial shuffles of |groups|-bounded rows, no joins,
    * no windows. */
  def corpusReport(docs0: DataFrame, textCol: String,
                   groupCols: Seq[String],
                   minWords: Int = 50, minStopwords: Int = 2,
                   hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val text = col(textCol)
    val keep = TextAnalysis.gopherKeep(TextAnalysis.gopherCounts(text),
      minWords = minWords, minStopwords = minStopwords)
    docs0.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(hashFn(text)).as("n_distinct"),
        sum(length(text)).as("total_chars"),
        sum(TextAnalysis.tokenCount(text).cast("long")).as("total_tokens"),
        min(length(text)).as("min_chars"),
        max(length(text)).as("max_chars"),
        sum(when(keep, 1L).otherwise(0L)).as("n_quality"))
      .withColumn("dup_pm",
        expr("CAST(1000 * (n_docs - n_distinct) DIV n_docs AS BIGINT)"))
      .withColumn("quality_pm",
        expr("CAST(1000 * n_quality DIV n_docs AS BIGINT)"))
  }
}
