package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-relevance scoring over a document corpus — BM25, the ranking
  * function behind practically every retrieval stage of a training-data
  * pipeline (dedup-aware sampling, quality-weighted selection, nearest
  * queries over text). No reference analog; gate query q48.
  *
  * Execution shape: tokenize once (map-only), one groupBy(doc) producing
  * doc length plus one conditional-sum column per query term (the full
  * vocabulary is never aggregated), melt to (doc, term) rows, df from the
  * same map-only corpus-stats pass (never a term-partitioned window —
  * a frequent term's window partition is corpus-sized), 1-row corpus
  * stats broadcast. Scales with |matching tokens|, not |vocabulary|.
  * Past `largeTermThreshold` query terms the conditional-sum plan (one
  * column per term) would grow quadratically, so the operator switches
  * to a filter-on-terms + groupBy(doc, term) shape over one pinned
  * (doc, term) count frame — same numbers, vocabulary-proof plan.
  *
  * Two variants:
  *   - [[bm25]]: the real thing — Lucene-shaped idf `ln(1 + (N-df+.5)/
  *     (df+.5))`, double math, codegen'd. Use this in production.
  *   - [[bm25Deterministic]]: the gate form. ln() and double division
  *     round differently across engines in the last ulp, so this variant
  *     keeps every factor RATIONAL: idf_r = (N-df+0.5)/(df+0.5) =
  *     (2N-2df+1)/(2df+1) and tf-norm = tf·S/(tf·S + k1(1-b)S + k1·b·dl·N)
  *     = 10·tf·S/(10·tf·S + 3S + 9·dl·N) for (k1=1.2, b=0.75) — pure
  *     integer numerators/denominators, ONE decimal division each,
  *     rounded to DECIMAL(18,6) identically in Spark and DuckDB, then an
  *     exact decimal sum. Same per-term monotonicity as BM25 (rational
  *     idf is the pre-log Robertson form); not the same totals.
  */
object Relevance {

  private val MemDisk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** Per-document term rows ready for scoring — columns
    * (doc_id, dl, w, tf, df, S, N) — plus an optional pinned frame the
    * caller must release after materializing its result.
    *
    * Small/static term lists (≤ `largeTermThreshold`): ONE corpus
    * tokenize — doc length and the per-term counts come out of a single
    * groupBy(doc_id) with one conditional-sum column per query term,
    * then the term columns melt back to (doc_id, dl, w, tf) rows — dl
    * rides the unpivot ids, so no join back for it. df comes from the
    * SAME map-only stats pass (`array_contains(words, term)` — no
    * explode, no shuffle, 1-row result) and resolves per row from the
    * broadcast stats via a when-chain. The round-4 verdict retired the
    * previous `count().over(Window.partitionBy(w))` df: a window
    * partition is one task, and a frequent query term's partition holds
    * nearly every document at corpus scale — a straggler the groupBy/
    * stats forms never create. Lineage is linear, nothing pinned.
    *
    * Large/dynamic term lists: the conditional-sum plan grows one
    * aggregate column per term (quadratic plan size), so past the
    * threshold the shape switches to filter-on-terms + groupBy(doc,
    * term) over ONE pinned (doc, term) count frame: tokenize once,
    * aggregate once, derive dl / df / S / N from the cached counts
    * (map-side partial aggregation throughout, AQE-splittable joins,
    * no window). Returns the pin for the caller to release.
    *
    * S (total tokens) and N (docs with ≥1 token) are global corpus
    * aggregates; at very large corpora pass them via `corpusStats` —
    * the small shape then runs strictly one tokenize plus the map-only
    * df probe (df depends on the query terms, so callers cannot
    * precompute it). */
  private def plumbing(docs: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String],
                       corpusStats: Option[(Long, Long)],
                       largeTermThreshold: Int)
      : (DataFrame, Option[DataFrame]) = {
    require(terms.nonEmpty, "query terms must be non-empty")
    require(terms.distinct.size == terms.size, "query terms must be distinct")
    if (terms.size <= largeTermThreshold)
      (plumbingConditional(docs, idCol, textCol, terms, corpusStats), None)
    else plumbingFiltered(docs, idCol, textCol, terms, corpusStats)
  }

  /** Conditional-sum shape (see [[plumbing]]): one aggregate column per
    * term, fully lazy, no session state. */
  private[graft] def plumbingConditional(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], corpusStats: Option[(Long, Long)]): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextShingles.words(col(textCol))).as("w"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("w") === t, 1L).otherwise(0L)).as(s"__tf_$i")
    }
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val termOf = terms.zipWithIndex
      .foldLeft(lit(null).cast("string")) { case (els, (t, i)) =>
        when(col("metric") === s"__tf_$i", lit(t)).otherwise(els)
      }
    val tf = perDoc
      .unpivot(Array(col("doc_id"), col("dl")),
        terms.indices.map(i => col(s"__tf_$i")).toArray, "metric", "tf")
      .filter(col("tf") > 0)
      .select(col("doc_id"), col("dl"), termOf.as("w"), col("tf"))
    // df per term from a map-only docs pass (array_contains — no
    // explode, no shuffle, 1-row result), riding the broadcast stats row
    val wordsArr = TextShingles.words(col(textCol))
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      count(when(array_contains(wordsArr, t), 1)).as(s"__df_$i")
    }
    val stats = corpusStats match {
      case Some((s, n)) =>
        docs.agg(dfCols.head, dfCols.tail: _*)
          .select(lit(s).as("S") +: lit(n).as("N") +:
            terms.indices.map(i => col(s"__df_$i")): _*)
      case None =>
        val sz = size(wordsArr)
        docs.agg(coalesce(sum(sz.cast("long")), lit(0L)).as("S"),
          count(when(sz > 0, 1)).as("N") +: dfCols: _*)
    }
    val dfOf = terms.zipWithIndex
      .foldLeft(lit(null).cast("long")) { case (els, (t, i)) =>
        when(col("w") === t, col(s"__df_$i")).otherwise(els)
      }
    tf.crossJoin(broadcast(stats))
      .withColumn("df", dfOf)
      .drop(terms.indices.map(i => s"__df_$i"): _*)
  }

  /** Filter + groupBy(doc, term) shape for large/dynamic term sets (see
    * [[plumbing]]): one tokenize into a pinned (doc, term) count frame,
    * everything else derived from the cache. Returns (rows, pin). */
  private[graft] def plumbingFiltered(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], corpusStats: Option[(Long, Long)])
      : (DataFrame, Option[DataFrame]) = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextShingles.words(col(textCol))).as("w"))
    // the full-vocabulary (doc, term) counts feed dl, df, S/N and the
    // scored rows — pin once (persist keeps lineage: an executor loss
    // recomputes instead of failing, unlike localCheckpoint)
    val tf0 = toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf")).persist(MemDisk)
    val dl = tf0.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val tfq = tf0.filter(col("w").isInCollection(terms))
    // df = docs containing w = tf rows per w: groupBy + join, never a
    // term-partitioned window (single-task straggler on frequent terms)
    val dfA = tfq.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val stats = corpusStats match {
      case Some((s, n)) =>
        docs.sparkSession.range(1).select(lit(s).as("S"), lit(n).as("N"))
      case None =>
        dl.agg(coalesce(sum(col("dl")), lit(0L)).as("S"),
               count(when(col("dl") > 0, 1)).as("N"))
    }
    val rows = tfq.join(dl, Seq("doc_id")).join(dfA, Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"), col("w"), col("tf"), col("df"),
              col("S"), col("N"))
    (rows, Some(tf0))
  }

  /** Materialize `result` (so downstream actions read the cache, not the
    * pinned lineage), then release the plumbing pin. House pattern —
    * mirrors Dedup.minHashCandidates / Similarity.lshBucketPairs. */
  private def finishWithPin(result: DataFrame, pin: Option[DataFrame])
      : DataFrame = pin match {
    case None => result
    case Some(p) =>
      val r = result.persist(MemDisk)
      r.count()
      p.unpersist(false)
      r
  }

  /** Production BM25 (k1, b tunable): (doc_id, score) for documents
    * matching ≥1 query term, higher = more relevant.
    * @param corpusStats precomputed (total tokens S, doc count N) — pass
    *        at very large corpora to skip the map-only stats pass.
    * @param largeTermThreshold past this many query terms the plan
    *        switches from one conditional-sum column per term to the
    *        filter + groupBy(doc, term) shape (score parity spec-pinned). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           corpusStats: Option[(Long, Long)] = None,
           largeTermThreshold: Int = 64): DataFrame = {
    val (tf, pin) =
      plumbing(docs, idCol, textCol, terms, corpusStats, largeTermThreshold)
    val idf = log(lit(1.0) +
      (col("N") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = col("tf") /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") * col("N") / col("S")))
    finishWithPin(
      tf.select(col("doc_id"), (idf * tfn).as("s"))
        .groupBy(col("doc_id")).agg(sum(col("s")).as("score")),
      pin)
  }

  /** TF-IDF top-k terms per document over the FULL vocabulary — the
    * keyword-extraction / topic-signature primitive (BM25 above scores
    * docs against a fixed query; this characterizes each doc by its own
    * most distinctive terms). Execution shape: tokenize (map-only), one
    * groupBy(doc, term) for tf (pinned — it feeds both the df aggregate
    * and the scored rows), df via groupBy(term) + join (map-side partial
    * aggregation; a term-partitioned window would put a stop-word's
    * corpus-sized partition into one task), the 1-row N broadcast, then
    * a PER-DOC row_number window (the partition key is the doc id —
    * millions of small partitions, never a global sort). Production
    * form; `ln` keeps it off the gate. */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    val (scored0, pin) = tfIdfScored(docs, idCol, textCol)
    val scored = scored0.withColumn("score",
      col("tf") * log(col("N").cast("double") / col("df")))
    finishWithPin(rankPerDoc(scored, k), pin)
  }

  /** Gate form of [[tfIdfTopK]] (query q62): the PRE-LOG rational score
    * tf·N/df — one decimal division rounded to DECIMAL(18,6) identically
    * in both engines. Per-term it is a strictly monotone transform of
    * tf·ln(N/df) only when tf is fixed, so the top-k SETS can differ
    * from the log form; the gate pins the rational ranking itself. */
  def tfIdfDeterministicTopK(docs: DataFrame, idCol: String,
                             textCol: String, k: Int = 3): DataFrame = {
    val d274 = "decimal(27,4)"
    val (scored0, pin) = tfIdfScored(docs, idCol, textCol)
    val scored = scored0
      .withColumn("score6",
        ((col("tf") * col("N")).cast(d274) / col("df").cast(d274))
          .cast("decimal(18,6)"))
      .withColumn("score", col("score6").cast("double"))
    finishWithPin(rankPerDoc(scored, k, orderCol = "score6"), pin)
  }

  /** (doc_id, w, tf, df, N) rows over the full vocabulary + the pinned
    * tf frame the caller releases after materializing (see callers).
    * df = docs containing w = tf rows per w, aggregated with groupBy
    * (map-side partial) and joined back on the term key — AQE can split
    * a skewed shuffle join; it cannot split the skewed window this
    * replaced (round-4 verdict: a stop-word's window partition is
    * corpus-sized — single-task straggler at 100×). The join consumes
    * tf twice, hence the pin: the alternative re-tokenizes the corpus. */
  private def tfIdfScored(docs: DataFrame, idCol: String,
                          textCol: String): (DataFrame, Option[DataFrame]) = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextShingles.words(col(textCol))).as("w"))
    val tf = toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf")).persist(MemDisk)
    val dfA = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // N is a column-pruned count-only scan of docs (no tokenize)
    val n = docs.agg(count(lit(1)).as("N"))
    (tf.join(dfA, Seq("w")).crossJoin(broadcast(n)), Some(tf))
  }

  private def rankPerDoc(scored: DataFrame, k: Int,
                         orderCol: String = "score"): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col(orderCol).desc, col("w").asc)
    scored.withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("w").as("term"), col("rnk"), col("score"))
  }

  /** Gate variant: rational idf, decimal arithmetic, cross-engine
    * bit-stable (see class doc). k1=1.2, b=0.75 fixed (they make the
    * tf-norm coefficients the exact integers 10/3/9). */
  def bm25Deterministic(docs: DataFrame, idCol: String, textCol: String,
                        terms: Seq[String],
                        corpusStats: Option[(Long, Long)] = None,
                        largeTermThreshold: Int = 64): DataFrame = {
    val (tf, pin) =
      plumbing(docs, idCol, textCol, terms, corpusStats, largeTermThreshold)
    val d4 = "decimal(18,4)"; val d274 = "decimal(27,4)"
    val idf6 = ((lit(2) * col("N") - lit(2) * col("df") + lit(1)).cast(d4) /
      (lit(2) * col("df") + lit(1)).cast(d4)).cast("decimal(18,6)")
    val num = lit(10) * col("tf") * col("S")
    val den = num + lit(3) * col("S") + lit(9) * col("dl") * col("N")
    val tfn6 = (num.cast(d274) / den.cast(d274)).cast("decimal(18,6)")
    finishWithPin(
      tf.select(col("doc_id"), (idf6 * tfn6).as("s"))   // exact (37,12)
        .groupBy(col("doc_id"))
        .agg(sum(col("s")).cast("decimal(38,12)").cast("double").as("score")),
      pin)
  }

  /** Hashed-feature LINEAR scorer — the fastText/CCNet-style quality
    * classifier at inference time: tokens hash into `dim` buckets (the
    * hashing trick, so the model is a fixed-width table regardless of
    * vocabulary), the trained per-bucket weights broadcast onto the
    * token stream, and each document scores the weight sum of its
    * tokens. The threshold-filter step of classifier-based corpus
    * curation, as one scan + one partial groupBy.
    *
    * `weights` is the trained model: (bucket int ∈ [0, dim), weight —
    * cast to decimal(18,6)). Buckets absent from the table score 0.
    * Returns (doc_id, n_tokens, score decimal(38,6)) — exact decimal
    * sums, so equal-weight runs tie exactly instead of drifting in
    * double rounding; callers needing a double surface cast once.
    *
    * `hashFn` is pluggable like the winnowing family: xxhash64
    * production default, [[TextAnalysis.md5Hash60]] when a
    * cross-engine-reproducible bucket assignment is needed (gate q97).
    * Scale shape: the weight table is `dim` rows (typically ≤ 2^21 —
    * fastText's default bucket count) and broadcasts; the token stream
    * never shuffles strings, only (doc_id, bucket). */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
                        weights: DataFrame, dim: Int,
                        hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(TextShingles.words(col(textCol))).as("__w"))
      .select(col("doc_id"),
        pmod(hashFn(col("__w")), lit(dim.toLong)).as("bucket"))
    toks.join(
        broadcast(weights.select(col("bucket").cast("long").as("bucket"),
          col("weight").cast("decimal(18,6)").as("__wt"))),
        Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__wt"), lit(0).cast("decimal(18,6)")))
          .cast("decimal(38,6)").as("score"))
  }

  /** DSIR-style hashed importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): learn a
    * per-bucket weight table from a small high-quality TARGET corpus
    * versus the RAW pool, so [[hashedLinearScore]] can rank every raw
    * document by how target-like its hashed token distribution is —
    * the data-selection step of a pretraining pipeline, with no
    * trained classifier required.
    *
    * Both corpora hash tokens into the same `dim` buckets (the hashing
    * trick — fixed-width model, vocabulary-free). With add-one
    * smoothing over the `dim`-bucket spine, production weight per
    * bucket is the log importance ratio
    * `ln((t_b+1)/(T+dim)) − ln((r_b+1)/(R+dim))`, folded to one ln of
    * the cross-multiplied rational so it costs a single transcendental
    * per bucket. A doc's importance = Σ tokens' bucket weights.
    *
    * Execution shape — the tagged-union pattern (repetitionSignals):
    * one map-only tokenize per corpus, union with a side tag, ONE
    * groupBy(bucket) computing both corpora's counts (map-side partial;
    * ≤ `dim` result rows, PINNED — the totals re-aggregate and the
    * spine join both read it, and their plans differ by an inferred
    * join-key null filter, so ReuseExchange cannot dedup them; the pin
    * guarantees the corpora tokenize ONCE), spine completion against
    * `range(dim)` — every join here is against ≤ dim rows, so the
    * learn step stays broadcast-only. The returned weight table is
    * materialized eagerly (the count pin is released before returning)
    * and comes back PERSISTED — it is the trained model; callers
    * unpersist it when done scoring (dsirScore's gate path holds it
    * for the life of the query, like the IVF index). The
    * expensive side (scoring the raw pool) is [[hashedLinearScore]]
    * — weight table broadcast, ids-only shuffle.
    *
    * `deterministic = true` replaces the ln with the PRE-LOG rational
    * ratio `(t_b+1)(R+dim) / ((r_b+1)(T+dim))` — one decimal division
    * rounded to DECIMAL(18,6) identically in Spark and DuckDB (the q62
    * recipe), since ln never crosses engines bit-stably. Per-bucket it
    * is a strictly monotone transform of the log weight, but SUMS of
    * ratios rank differently than sums of logs — the gate (q98) pins
    * the rational form's plumbing; production selection uses the log
    * form. Cross-products are computed in decimal(19,0)·decimal(19,0)
    * (exact to 1e38, no int64 overflow); the deterministic division
    * additionally requires products < 1e23 (the decimal(27,4) domain —
    * holds to ~10^11 tokens per corpus), while the log path is
    * unbounded. Returns (bucket, weight). */
  def dsirWeights(target: DataFrame, raw: DataFrame, textCol: String,
                  dim: Int, hashFn: Column => Column = xxhash64(_),
                  deterministic: Boolean = false): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val spark = target.sparkSession
    def toks(df: DataFrame, isTarget: Int) =
      df.select(explode(TextShingles.words(col(textCol))).as("__w"))
        .select(lit(isTarget).as("__is_t"),
          pmod(hashFn(col("__w")), lit(dim.toLong)).as("bucket"))
    val counts = toks(target, 1).unionByName(toks(raw, 0))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__is_t") === 1, 1L).otherwise(0L)).as("__tc"),
           sum(when(col("__is_t") === 0, 1L).otherwise(0L)).as("__rc"))
      .persist(MemDisk)
    val full = spark.range(dim).select(col("id").as("bucket"))
      .join(broadcast(counts), Seq("bucket"), "left")
      .crossJoin(broadcast(counts
        .agg((coalesce(sum(col("__tc")), lit(0L)) + dim).as("__tt"),
             (coalesce(sum(col("__rc")), lit(0L)) + dim).as("__rt"))))
    val d190 = "decimal(19,0)"
    val num = (coalesce(col("__tc"), lit(0L)) + 1L).cast(d190) *
      col("__rt").cast(d190)
    val den = (coalesce(col("__rc"), lit(0L)) + 1L).cast(d190) *
      col("__tt").cast(d190)
    val w =
      if (deterministic)
        (num.cast("decimal(27,4)") / den.cast("decimal(27,4)"))
          .cast("decimal(18,6)")
      else log(num.cast("double") / den.cast("double"))
    finishWithPin(full.select(col("bucket"), w.as("weight")), Some(counts))
  }

  /** DSIR importance scores for every raw document: [[dsirWeights]]
    * learned from (target, raw), then [[hashedLinearScore]] over the
    * raw pool. Returns (doc_id, n_tokens, score decimal(38,6)) —
    * higher = more target-like. Select by taking the global top-k
    * (TakeOrderedAndProject via limit, the q75 shape) or a hash-gated
    * threshold; gate q98 surfaces the scores themselves. */
  def dsirScore(raw: DataFrame, target: DataFrame, idCol: String,
                textCol: String, dim: Int,
                hashFn: Column => Column = xxhash64(_),
                deterministic: Boolean = false): DataFrame =
    hashedLinearScore(raw, idCol, textCol,
      dsirWeights(target, raw, textCol, dim, hashFn, deterministic),
      dim, hashFn)

  /** N-gram NOVELTY per document: of a doc's distinct word n-grams, how
    * many appear in no other document. The inverse of the boilerplate /
    * near-dup signals (q25/q88 flag what is SHARED; this scores what is
    * UNIQUE) — low novelty marks template-heavy or heavily-duplicated
    * docs that survive exact dedup, high novelty marks genuinely fresh
    * text worth keeping at selection time.
    *
    * Returns (doc_id, n_grams, n_novel) — distinct-gram count and the
    * df==1 subset, integers only (callers derive the ratio; a rational
    * average would tie at the rounding digit cross-engine). Docs with
    * fewer than `n` words emit no grams and are absent from the result
    * (inner semantics, same as the tf frames).
    *
    * Execution shape — the tfIdfScored skeleton: tokenize+shingle
    * map-only (native fused WordNgrams), one groupBy(doc, gram) for the
    * distinct-gram frame (pinned — it feeds both sides), df via
    * groupBy(gram) + join (map-side partial; never a gram-partitioned
    * window — a boilerplate gram's partition is corpus-sized), one
    * final groupBy(doc). Grams hash to int64 BEFORE the shuffle
    * (`hashFn` — xxhash64 production, md5Hash60 at the gate q99) so the
    * exchanges move (doc_id, long) pairs, not gram strings; a hash
    * collision conflates two grams corpus-wide (novelty undercounts),
    * at 2^-64 per pair — the span-scrub trade, documented there. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3,
                   hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(TextShingles.wordNgrams(col(textCol), n)).as("__g"))
      .select(col("doc_id"), hashFn(col("__g")).as("__gh"))
      .groupBy(col("doc_id"), col("__gh")).agg(count(lit(1)).as("__c"))
      .persist(MemDisk)
    val dfA = grams.groupBy(col("__gh")).agg(count(lit(1)).as("__df"))
    finishWithPin(
      grams.join(dfA, Seq("__gh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("__df") === 1L, 1)).as("n_novel")),
      Some(grams))
  }

  /** Distributed TRAINING of the hashed logistic quality classifier —
    * the learning side of [[hashedLinearScore]] (fastText/CCNet-style:
    * hash tokens into `dim` buckets, learn one weight per bucket by
    * logistic regression on labeled docs). Batch gradient descent,
    * `iters` fixed full-corpus passes:
    *
    *   margin_i = Σ_j w_j·x_ij,  p_i = σ(margin_i),
    *   grad_j   = Σ_i (p_i − y_i)·x_ij,   w_j ← w_j − lr·grad_j/n
    *
    * DETERMINISM: the two corpus-sized sums (margin per doc, gradient
    * per bucket) accumulate as exact DECIMAL(38,15) of per-element
    * double products — partition-order-proof, and reproducible by a
    * driver-side reference loop bit for bit (spec-pinned, the MMR/BPE
    * discipline; not oracle-gated — each iteration's weights feed the
    * next pass, no single-statement SQL form). σ and the lr update run
    * in IEEE doubles with one fixed expression order.
    *
    * Shape at 100 TB: the (doc, bucket, count) feature frame is built
    * ONCE and persisted (released before returning); per iteration one
    * map-only margin join (weights ride a dim-bounded literal array —
    * `dim` ≤ 65536 validated) + two map-side-partial groupBys. The
    * model is `dim` doubles on the driver — the centroid contract.
    * Labels must be 0/1. Returns the learned weights. */
  def trainHashedLogistic(docs: DataFrame, idCol: String, textCol: String,
                          labelCol: String, dim: Int, iters: Int = 10,
                          lr: Double = 0.5,
                          hashFn: Column => Column = xxhash64(_))
      : Array[Double] = {
    require(dim >= 1 && dim <= 65536, s"dim must be in [1, 65536], got $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val d15 = "decimal(38,15)"
    val feats = docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("double").as("y"),
        explode(TextShingles.words(col(textCol))).as("__w"))
      .select(col("doc_id"), col("y"),
        pmod(hashFn(col("__w")), lit(dim.toLong)).cast("int").as("bucket"))
      .groupBy(col("doc_id"), col("y"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = feats.select(countDistinct(col("doc_id"))).head().getLong(0)
    val w = Array.fill(dim)(0.0)
    try {
      for (_ <- 1 to iters) {
        val wCol = array(w.toSeq.map(lit): _*)
        val margins = feats
          .select(col("doc_id"), col("y"),
            (element_at(wCol, col("bucket") + 1) * col("x"))
              .cast(d15).as("__mx"))
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(col("__mx")).cast(d15).cast("double").as("m"))
          // residual in one fixed expression order
          .select(col("doc_id"),
            (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("r"))
        val grads = feats.join(margins, "doc_id")
          .select(col("bucket"), (col("r") * col("x")).cast(d15).as("__g"))
          .groupBy(col("bucket"))
          .agg(sum(col("__g")).cast(d15).cast("double").as("g"))
          .collect()
        grads.foreach { row =>
          val j = row.getInt(0)
          w(j) = w(j) - lr * (row.getDouble(1) / n)
        }
      }
      w
    } finally feats.unpersist(false)
  }

  /** RETRIEVAL-EVAL metrics — the measurement harness over any ranked
    * search output (the four ANN routes, BM25, TF-IDF all emit the
    * (query_id, cand_id, rnk) shape this consumes): per query against a
    * relevance-judgment set `qrels` (query_id, cand_id),
    *   - `n_rel`    total relevant candidates,
    *   - `hits`     relevant results within the top `k` (recall@k and
    *                precision@k follow as hits/n_rel, hits/k — left as
    *                integer numerators: a rational average ties at the
    *                rounding digit across engines),
    *   - `first_rank` rank of the first relevant hit (0 = none),
    *   - `rr_micro` reciprocal rank in exact micro units,
    *                10⁶ DIV first_rank — the MRR numerator as an
    *                integer (a float 1/rank SUM is order-sensitive).
    * Queries absent from `qrels` surface with n_rel = 0.
    *
    * Shape: the qrels join rides the (query, cand) keys (ids only) and
    * both aggregates are map-side partial — no windows, nothing
    * query-count-bounded on one task. */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hits = results.filter(col("rnk") <= k)
      .join(qrels.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("__hits"), min(col("rnk")).as("__fr"))
    val nRel = qrels.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    results.select(col("query_id")).distinct()
      .join(nRel, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("__hits"), lit(0L)).as("hits"),
        coalesce(col("__fr"), lit(0)).cast("int").as("first_rank"),
        when(col("__fr").isNotNull, expr("CAST(1000000 DIV __fr AS BIGINT)"))
          .otherwise(lit(0L)).as("rr_micro"))
  }

  /** The pinned nDCG rank-discount table: w_r = ⌊10⁶ / log₂(r+1)⌋ for
    * r = 1..k, computed once with StrictMath (bit-identical on every
    * JVM) and injected as LITERALS into both engines — the repo's
    * pinned-constant recipe for an irrational weight family (the
    * Benford masses precedent). w_1 = 10⁶, w_3 = 500000. */
  def ndcgWeightsMicro(k: Int): Seq[Long] = {
    require(k >= 1 && k <= 1000, s"k in [1,1000], got $k")
    (1 to k).map(r =>
      (1000000.0 / (StrictMath.log(r + 1.0) / StrictMath.log(2.0))).toLong)
  }

  /** nDCG@k with binary relevance, exact integers over the pinned
    * [[ndcgWeightsMicro]] discount table: DCG = Σ_{relevant r ≤ k} w_r,
    * IDCG = Σ_{r ≤ min(n_rel, k)} w_r (every relevant doc ranked
    * first), ndcg_micro = 10⁶·DCG div IDCG — the position-sensitive
    * complement of [[retrievalMetrics]]' hits/MRR (two rankings with
    * the same hit count differ in nDCG when one buries its hits).
    * Queries with no relevant candidates surface NULL (nDCG
    * undefined), not 0 — 0 means "ranked every hit out of the top k".
    *
    * Output: (query_id, n_rel, dcg_micro, ndcg_micro).
    *
    * Scale shape: the qrels join rides (query, cand) ids; the discount
    * table is a k-row broadcast joined on the rank; one partial
    * groupBy per query. */
  def ndcgAtK(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    import results.sparkSession.implicits._
    val w = ndcgWeightsMicro(k)
    val wf = broadcast(w.zipWithIndex
      .map { case (wt, i) => (i + 1, wt) }.toDF("__r", "__w"))
    val prefix = w.scanLeft(0L)(_ + _) // prefix(i) = Σ w_1..w_i
    val idcgF = broadcast((0 to k)
      .map(i => (i.toLong, prefix(i))).toDF("__nr", "__idcg"))
    val dcg = results.filter(col("rnk") <= k)
      .join(qrels.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"))
      .join(wf, col("rnk") === col("__r"))
      .groupBy(col("query_id")).agg(sum(col("__w")).as("__dcg"))
    val nRel = qrels.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    results.select(col("query_id")).distinct()
      .join(nRel, Seq("query_id"), "left")
      .join(dcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("__dcg"), lit(0L)).as("dcg_micro"))
      .join(idcgF, least(col("n_rel"), lit(k.toLong)) === col("__nr"))
      .select(col("query_id"), col("n_rel"), col("dcg_micro"),
        when(col("n_rel") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000 * dcg_micro) div __idcg"))
          .as("ndcg_micro"))
  }

  /** RECIPROCAL RANK FUSION (Cormack et al. 2009): combine several
    * rankings of the same query set — dense ANN + lexical BM25 + a
    * freshness sort — into one, scoring each (query, candidate) by
    * Σ_rankings ⌊10⁶ / (rrfK + rank)⌋ and re-ranking. The standard
    * hybrid-retrieval merge: rank-based, so incomparable scores
    * (cosine vs BM25) never need calibration. Exact integers — each
    * term is an integer floor division, the sum is order-free.
    *
    * Input: (query_id, cand_id, rnk) with one row per ranking that
    * placed the candidate (union the rankers' top-k outputs; a
    * candidate absent from a ranking simply contributes no term).
    * Output: (query_id, cand_id, rrf_micro, rnk) — fused top-k, ties
    * by (score DESC, cand_id ASC).
    *
    * Scale shape: one (query, cand) partial groupBy over the already
    * k-bounded ranker outputs, then the k-bounded
    * [[Similarity.topKPerQuery]] aggregation — input is
    * queries·rankers·k rows, never a corpus. */
  /** RANKER AGREEMENT — before fusing two retrieval systems
    * ([[rrfFuse]]) or swapping one for a cheaper ANN route, measure
    * how much they even overlap: per query the top-k set Jaccard
    * between ranker A's and ranker B's candidates. Near-1 agreement
    * means the cheap ranker can replace the expensive one; near-0
    * means fusion genuinely widens recall (the q266 story,
    * quantified).
    *
    * Output per query (full outer — a query one ranker dropped still
    * reports): (query, n_a, n_b, n_common, jaccard_ppm) — NULL
    * jaccard when both sides are empty.
    *
    * Scale shape: two per-ranker distinct+count groupBys and one
    * (query, doc)-keyed inner join — candidate lists shuffle,
    * never corpora. */
  def rankerAgreement(a: DataFrame, b: DataFrame, queryCol: String,
                      docCol: String): DataFrame = {
    def side(df: DataFrame) = df.select(col(queryCol).as("__q"),
      col(docCol).as("__d")).distinct()
    val da = side(a); val db = side(b)
    val na = da.groupBy(col("__q")).agg(count(lit(1)).as("__na"))
    val nb = db.groupBy(col("__q")).agg(count(lit(1)).as("__nb"))
    val common = da.join(db, Seq("__q", "__d"))
      .groupBy(col("__q")).agg(count(lit(1)).as("__nc"))
    na.join(nb, Seq("__q"), "full_outer")
      .join(common, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        coalesce(col("__na"), lit(0L)).as("n_a"),
        coalesce(col("__nb"), lit(0L)).as("n_b"),
        coalesce(col("__nc"), lit(0L)).as("n_common"),
        when(coalesce(col("__na"), lit(0L)) +
            coalesce(col("__nb"), lit(0L)) === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """(1000000 * coalesce(__nc, 0))
              |div (coalesce(__na, 0) + coalesce(__nb, 0)
              |     - coalesce(__nc, 0))""".stripMargin
              .replace("\n", " "))).as("jaccard_ppm"))
  }

  def rrfFuse(rankings: DataFrame, k: Int, rrfK: Long = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    val scored = rankings
      .where(col("rnk").isNotNull && col("rnk") >= 1)
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(expr(s"1000000 div ($rrfK + rnk)")).as("rrf_micro"))
    graft.llm.Similarity.topKPerQuery(
        scored, "rrf_micro", k, ascending = false)
      .select(col("query_id"), col("cand_id"),
        col("rrf_micro").cast("long").as("rrf_micro"), col("rnk"))
  }

  /** ROUGE-n style clipped n-gram overlap between candidate/reference
    * document pairs — the summarization/generation eval harness next to
    * [[retrievalMetrics]]. Per (cand_id, ref_id) pair: total gram
    * instances on each side and the CLIPPED overlap
    * Σ_g min(count_cand(g), count_ref(g)) — overlap/ref_grams is
    * ROUGE-n recall, overlap/cand_grams the BLEU-style modified
    * precision; both surfaced as integer PER-MILLE floor divisions
    * (the exact-rational recipe — a float ratio ties at the rounding
    * digit). Pairs whose sides share nothing (or are too short to
    * gram) still surface with overlap 0.
    *
    * Scale shape: each doc grams ONCE into a persisted (id, gram-hash,
    * count) table — grams hash to int64 before any shuffle (the q99
    * rule), and pairs join that table per side BY ID, so shuffle
    * volume is pairs×grams, never corpus×corpus. One groupBy per pair
    * for the clipped sum; totals ride two metadata-sized joins. */
  def rougeOverlap(pairs: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, n: Int = 2,
                   hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = docs.select(col(idCol).as("__id"),
        explode(TextShingles.wordNgrams(col(textCol), n)).as("__g"))
      .select(col("__id"), hashFn(col("__g")).as("__gh"))
      .groupBy(col("__id"), col("__gh")).agg(count(lit(1)).as("__c"))
      .persist(MemDisk)
    val totals = grams.groupBy(col("__id")).agg(sum(col("__c")).as("__t"))
    val p = pairs.select(col("cand_id"), col("ref_id"))
    val overlap = p
      .join(grams.select(col("__id").as("cand_id"), col("__gh"),
        col("__c").as("__cc")), Seq("cand_id"))
      .join(grams.select(col("__id").as("ref_id"), col("__gh"),
        col("__c").as("__rc")), Seq("ref_id", "__gh"))
      .groupBy(col("cand_id"), col("ref_id"))
      .agg(sum(least(col("__cc"), col("__rc"))).as("__ov"))
    val out = p
      .join(totals.select(col("__id").as("cand_id"),
        col("__t").as("__ct")), Seq("cand_id"), "left")
      .join(totals.select(col("__id").as("ref_id"),
        col("__t").as("__rt")), Seq("ref_id"), "left")
      .join(overlap, Seq("cand_id", "ref_id"), "left")
      .select(col("cand_id"), col("ref_id"),
        coalesce(col("__ct"), lit(0L)).as("cand_grams"),
        coalesce(col("__rt"), lit(0L)).as("ref_grams"),
        coalesce(col("__ov"), lit(0L)).as("overlap"))
      .withColumn("recall_pm",
        when(col("ref_grams") > 0,
          expr("CAST(1000 * overlap DIV ref_grams AS BIGINT)"))
          .otherwise(lit(0L)))
      .withColumn("precision_pm",
        when(col("cand_grams") > 0,
          expr("CAST(1000 * overlap DIV cand_grams AS BIGINT)"))
          .otherwise(lit(0L)))
    finishWithPin(out, Some(grams))
  }

  /** RANK-BIASED OVERLAP at depth k (Webber, Moffat & Zobel 2010,
    * truncated eq. 4): the rank-WEIGHTED companion of
    * [[rankerAgreement]]'s set Jaccard —
    *
    *   rbo@k = Σ_{d=1..k} (1−p)·p^(d−1) · |A_1..d ∩ B_1..d| / d
    *
    * with persistence p = 9/10 pinned, so top-rank disagreement costs
    * more than tail disagreement (two rankers can share all 20
    * candidates in reverse order: Jaccard 1, rbo well below 1).
    *
    * Exact integer form: p^(d−1) = 9^(d−1)/10^(d−1) stays rational, so
    * each depth term is the pinned floor
    * (10⁶ · 9^(d−1) · X_d) div (10^d · d) ppm and the sum of floors is
    * a pure integer function of the two rank lists (under-reads the
    * real rbo by < k ppm — documented, cross-engine stable; 9^19 ≈
    * 1.4·10¹⁸ fits a long, the 10^d denominator rides a decimal
    * literal). Rows with rnk > k or rnk < 1 are ignored.
    *
    * Output per query (full outer): (query, rbo_ppm) — 0 when the
    * rankers share nothing.
    *
    * Scale shape: one (query, doc) inner join of two k-bounded rank
    * lists, one explode to ≤ k−maxrnk+1 depth rows per shared doc
    * (≤ k² rows per query), one groupBy — candidate lists shuffle,
    * never corpora. */
  def rboPpm(a: DataFrame, b: DataFrame, queryCol: String,
             docCol: String, rnkCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 20,
      s"k must be in [1, 20] (9^(k-1) must fit a long), got $k")
    def side(df: DataFrame, r: String) = df
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        col(rnkCol).cast("long").as(r))
      .where(col(r).between(1L, k.toLong))
    val da = side(a, "__ra"); val db = side(b, "__rb")
    // a shared doc first counts at depth max(ra, rb), then at every
    // deeper prefix: explode its depth range once
    val shared = da.join(db, Seq("__q", "__d"))
      .select(col("__q"),
        explode(sequence(greatest(col("__ra"), col("__rb")),
          lit(k.toLong))).as("__depth"))
      .groupBy(col("__q"), col("__depth"))
      .agg(count(lit(1)).as("__x"))
    val d38 = "decimal(38,0)"
    // exact long powers (9^19 > 2^53 — math.pow would round)
    val pow9 = Iterator.iterate(1L)(_ * 9L).take(k).toSeq
    val terms = shared.select(col("__q"),
      // (10^6 * 9^(d-1) * X) div (10^d * d), every factor exact
      (element_at(
          array(pow9.map(v => lit(v).cast(d38)): _*), col("__depth").cast("int")) *
        1000000L * col("__x")).as("__num"),
      (element_at(
          array((1 to k).map(e =>
            lit(java.math.BigDecimal.TEN.pow(e)).cast(d38)): _*),
          col("__depth").cast("int")) * col("__depth")).as("__den"))
      .select(col("__q"),
        expr("CAST(__num div __den AS BIGINT)").as("__t"))
      .groupBy(col("__q")).agg(sum(col("__t")).as("__rbo"))
    // full outer over the query universes: a query either ranker saw
    // reports, sharing nothing → 0
    da.select(col("__q")).union(db.select(col("__q"))).distinct()
      .join(terms, Seq("__q"), "left")
      .select(col("__q").as(queryCol),
        coalesce(col("__rbo"), lit(0L)).as("rbo_ppm"))
  }
}
