package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators over `documents` / `embeddings`
  * (builder-prompt north star; not present in the reference, which is
  * pure relational ETL). Each driver-checkable entry has a DuckDB oracle;
  * the non-SQL-expressible ops (MinHash-LSH banding, IVF ANN) live in
  * `graft.llm.*` with ScalaTest coverage and appear here as rows-only
  * checks.
  *
  * Scale notes: every query is one scan + at most one shuffle; the
  * near-dup/similarity ops avoid the O(n²) cross join via inverted-index
  * (posting-list) joins or LSH banding — the only strategies that survive
  * 100 TB of documents.
  */
object LlmQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val out = "decimal(38,6)"

  // Exact dedup: group by content fingerprint, keep lowest doc_id
  // (deterministic survivor), count the duplicate cluster.
  def q20_dedup_exact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
           count(lit(1)).as("n_copies"))

  // Token counting: whitespace tokenization via regexp_count — robust to
  // empty strings, stays in codegen.
  def q21_token_count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      regexp_count(col("text"), lit("\\S+")).as("n_tokens"),
      length(col("text")).as("len_chars"))

  // Quality scoring: deterministic integer counts + exact decimal ratios
  // (length / token / stopword signals a filtering pipeline keys on).
  def q22_quality(s: SparkSession, dir: String): DataFrame = {
    val toks  = regexp_count(col("text"), lit("\\S+"))
    val stops = regexp_count(col("text"),
      lit("\\b(the|a|of|and|to|in|is|it)\\b"))
    t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      toks.as("n_tokens"), stops.as("n_stopwords"),
      when(toks > 0,
        (stops.cast("decimal(18,6)") / toks.cast("decimal(18,6)")).cast(out))
        .otherwise(lit(0).cast(out)).cast("double").as("stopword_ratio"),
      when(toks > 0,
        ((length(col("text")) - toks + 1).cast("decimal(18,6)") / toks.cast("decimal(18,6)")).cast(out))
        .otherwise(lit(0).cast(out)).cast("double").as("avg_token_len"))
  }

  // Document fingerprinting: content hash (md5 — bit-identical across
  // engines) + a positional prefix fingerprint.
  def q23_fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("content_fp"),
      md5(substring(col("text"), 1, 64).cast("binary")).as("prefix_fp"))

  // Corpus language statistics (the aggregate view a langid pass feeds).
  def q24_lang_stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"),
           min(col("doc_id")).as("min_doc_id"))

  // N-gram (word-bigram) Jaccard near-dup candidates via inverted-index
  // self-join — NOT a cross join: explode bigrams, join on bigram, count
  // shared, Jaccard from exact integer counts. `maxDf` drops stop-grams
  // (a gram shared by f docs contributes f² join rows — the cap is what
  // keeps the posting-list join partition-safe at corpus scale).
  def q25_ngram_jaccard(s: SparkSession, dir: String): DataFrame =
    graft.llm.Dedup.ngramJaccardPairs(
        t(s, dir, "documents").filter(col("doc_id") < 200),
        "doc_id", "text", minJaccard = 0.10, ngram = 2, maxDf = 150)
      // threshold compared on the exact decimal; surfaced as double (gate)
      .withColumn("jaccard", col("jaccard").cast("double"))

  // Brute-force cosine top-5 for a fixed probe set (vec_id < 8) — the
  // exact-ANN baseline. Queries broadcast; corpus scanned once. Cosine is
  // decimal-deterministic (see graft.llm.Similarity) so the DuckDB oracle
  // hash-matches bit-for-bit.
  def q26_cosine_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("cand_id"),
              col("cosine").cast(out).cast("double").as("cosine"), col("rnk"))
  }

  /** Corpus with planted near-duplicates (each doc re-appears with its
    * first word dropped, id offset by 1e6) — lets the near-dup operators
    * demonstrate recall deterministically on any sf. */
  private def corpusWithNearDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s*", "").as("text")))
  }

  // MinHash+LSH candidates → EXACT bigram-Jaccard verification — the
  // production candidates→verify shape. The verified output is
  // engine-independent (exact Jaccard ≥ 0.8 is SQL-expressible) and the
  // fixture has a wide J gap (nothing between 0.35 and 0.88), so LSH
  // recall over the verified set is total and the DuckDB oracle matches
  // exactly. Planted dups (first word dropped, id+1e6) guarantee rows.
  def q27_minhash_pairs(s: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDups(s, dir).filter(col("doc_id") % 1000000L < 250)
    val cands = graft.llm.Dedup.minHashCandidates(
      corpus, "doc_id", "text", k = 32, bands = 8, ngram = 2, threshold = 0.35)
    graft.llm.Dedup.jaccardVerify(
      cands.select(col("id_a"), col("id_b")), corpus, "doc_id", "text",
      minJaccard = 0.8)
  }

  /** Corpus where each doc re-appears with its words REVERSED (id+1e6):
    * SimHash is a bag-of-tokens fingerprint, so a reordered copy has the
    * identical fingerprint (hamming 0) — provably recalled by the chunk
    * pigeonhole, which makes the verified pair set oracle-checkable. */
  private def corpusWithReorderedDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
  }

  // SimHash near-dup candidates (hamming ≤ 3 over 64-bit fingerprints)
  // → exact token-multiset verification: surviving pairs are exactly the
  // multiset-equal doc pairs (SQL-expressible canonical sorted-token key).
  def q28_simhash_pairs(s: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithReorderedDups(s, dir).filter(col("doc_id") % 1000000L < 250)
    val cands = graft.llm.Dedup.simHashPairs(corpus, "doc_id", "text", maxDist = 3)
    graft.llm.Dedup.multisetVerify(cands, corpus, "doc_id", "text")
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // BPE-ish subword counting (pre-tokenizer estimate shape).
  def q29_subword_count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      graft.llm.TextAnalysis.subwordCount(col("text")).as("n_subwords"))

  // Heuristic language ID — the operator is pure regexp-count + argmax,
  // so it IS SQL-expressible and gets a full DuckDB oracle.
  def q30_langid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      graft.llm.TextAnalysis.langId(col("text")).as("lang_pred"))

  // Multimodal plumbing at the gate: synthetic binary corpus →
  // mapPartitions stub decode → per-kind feature stats. Deterministic;
  // rows-only (custom codec isn't SQL-expressible).
  def q33_media_features(s: SparkSession, dir: String): DataFrame = {
    val media = graft.llm.Multimodal.syntheticCorpus(s, 300, partitions = 4)
    graft.llm.Multimodal.extractFeatures(media).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
           sum(col("n_frames")).as("total_frames"),
           count(when(col("decode_ok"), lit(1))).as("n_decoded"))
  }

  // Embedding near-dup with planted duplicates (each vector re-appears
  // scaled by 1.001 → cosine ≈ 1): LSH pair-mode buckets + exact verify.
  // Deterministic cosine (decimal sums, double finish) makes the verify
  // threshold and the surfaced value bit-stable cross-engine, so the
  // DuckDB all-pairs oracle matches exactly.
  def q34_embedding_neardup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val planted = emb.unionByName(emb.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    // bits pinned explicitly: the operator default now derives width
    // from the corpus count; the gate fixture stays bit-for-bit stable
    graft.llm.Dedup.embeddingNearDup(planted, "vec_id", "embedding",
        minCosine = 0.999, bits = 16, deterministic = true)
      .select(col("id_a"), col("id_b"),
              col("cosine").cast(out).cast("double").as("cosine"))
  }

  // Composed cleaning pipeline at the gate: per-reason drop histogram +
  // survivor count over a corpus with planted dups. The near-dup stage
  // exact-verifies MinHash candidates (bigram Jaccard ≥ 0.8), so every
  // stage — quality filter, exact dedup, transitive near-dup kill — is
  // SQL-expressible (components via a recursive CTE in the oracle).
  def q36_corpus_clean(s: SparkSession, dir: String): DataFrame = {
    val base = corpusWithNearDups(s, dir).filter(col("doc_id") % 1000000L < 300)
    // plant one sub-minTokens junk doc and one exact copy of doc 0 so
    // EVERY stage (quality, exact_dup, near_dup, kept) shows up in the
    // gate histogram — the raw fixture only rejects near-dups
    val docs0 = t(s, dir, "documents")
    val planted = base
      .unionByName(s.range(1).select(lit(2000000L).as("doc_id"),
        lit("!!! ...").as("text")))
      .unionByName(docs0.filter(col("doc_id") === 0)
        .select(lit(3000000L).as("doc_id"), col("text")))
    val (clean, rejects) = graft.llm.CorpusPipeline.clean(
      planted, "doc_id", "text",
      graft.llm.CorpusPipeline.Config(nearDupThreshold = 0.35,
        exactVerifyJaccard = Some(0.8)))
    rejects.groupBy(col("drop_reason")).agg(count(lit(1)).as("n_docs"))
      .unionByName(clean.select(lit("kept").as("drop_reason"))
        .groupBy("drop_reason").agg(count(lit(1)).as("n_docs")))
  }

  // PII-style redaction pass (scrubbing stage of a cleaning pipeline):
  // emails/URLs/phone runs → placeholder tokens, with per-doc counts.
  // Patterns live in the Java∩RE2 regex subset so the DuckDB oracle is
  // byte-identical; three planted docs guarantee non-zero counts.
  def q41_redact(s: SparkSession, dir: String): DataFrame = {
    val planted = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(s.range(1).select(lit(9000001L).as("doc_id"),
        lit("contact me at alice.smith@example.com or bob@test.org for details").as("text")))
      .unionByName(s.range(1).select(lit(9000002L).as("doc_id"),
        lit("see https://example.com/path?q=1 and email carol@x.io or call +1-555-123-4567 now").as("text")))
      .unionByName(s.range(1).select(lit(9000003L).as("doc_id"),
        lit("numbers 12345678 and 1-800-555-0199 plus word text").as("text")))
    val (ne, nu, np) = graft.llm.TextAnalysis.redactionCounts(col("text"))
    planted.select(col("doc_id"),
      ne.as("n_emails"), nu.as("n_urls"), np.as("n_phones"),
      md5(graft.llm.TextAnalysis.redact(col("text")).cast("binary")).as("redacted_fp"))
  }

  // BM25-style relevance scoring at the gate (rational-decimal variant —
  // see llm/Relevance's scaladoc for why ln() can't cross the engine
  // boundary bit-stably). Fixed 4-term query over the documents corpus.
  def q48_bm25(s: SparkSession, dir: String): DataFrame =
    graft.llm.Relevance.bm25Deterministic(
      t(s, dir, "documents"), "doc_id", "text",
      Seq("join", "vector", "filter", "scan"))

  // Deterministic train/val/test splitting at the gate: assignment is a
  // pure function of doc_id (stable under reruns/resharding/appends —
  // what randomSplit can't give). Gate key = the engine-independent LCG
  // mix; production key = xxhash64 (Sampling.xxKey).
  def q49_hash_split(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.assignSplits(
      t(s, dir, "documents").select(col("doc_id")),
      graft.ops.Sampling.lcgKey(col("doc_id")),
      Seq("train" -> 900, "val" -> 50, "test" -> 50))

  // K-means ASSIGNMENT at the gate (llm/Similarity.assignToCentroids):
  // every embedding assigned to its nearest of 8 pinned centroids (the
  // lowest-id vectors — a deterministic "init"; full Lloyd training is
  // ivfCentroids) by squared-L2 via |v|²+|c|²−2·v·c on the native
  // decimal-dot kernel, double finish — cross-engine exact, ties to the
  // lowest centroid id.
  def q61_kmeans_assign(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Similarity.assignToCentroids(
        emb, emb.filter(col("vec_id") < 8),
        idCol = "vec_id", vecCol = "embedding",
        centroidIdCol = "vec_id", centroidVecCol = "embedding")
      .select(col("vec_id"), col("centroid_id"),
              col("dist2").cast(out).cast("double").as("dist2"))
  }

  // TF-IDF top-3 terms per document at the gate (llm/Relevance
  // .tfIdfDeterministicTopK): the rational pre-log score tf·N/df, one
  // decimal division rounded to DECIMAL(18,6) in both engines (ln()
  // isn't cross-engine bit-stable; the production tfIdfTopK uses it).
  def q62_tfidf_terms(s: SparkSession, dir: String): DataFrame =
    graft.llm.Relevance.tfIdfDeterministicTopK(
      t(s, dir, "documents"), idCol = "doc_id", textCol = "text", k = 3)

  // END-TO-END curation pipeline at the gate: quality filter → exact
  // dedup (hash-first survivor window, the q36 pattern) → per-language
  // stratified rebalance → train/val/test assignment, every stage one
  // of the engine's first-class operators and the whole composition
  // SQL-expressible. Every stage provably BITES on the fixture: the
  // corpus is unioned with a full id-shifted clone (dedup must drop
  // every clone), the 40-token bar drops ~1/3 of docs, and the strata
  // rates drop more. The split key is SALTED so it decorrelates from
  // the sampling key (same-key composition would send every row of a
  // low-rate stratum to "train"). Map-only except the one dedup shuffle.
  def q65_curation_pipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs0 = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val corpus = docs0.unionByName(docs0.select(
      (col("doc_id") + 2000000L).as("doc_id"), col("lang"), col("text")))
    val quality = corpus
      .filter(regexp_count(col("text"), lit("\\S+")) >= 40)
    val deduped = quality
      .withColumn("__h", xxhash64(col("text")))
      .withColumn("__keep",
        min(col("doc_id")).over(Window.partitionBy(col("__h"), col("text"))))
      .filter(col("doc_id") === col("__keep"))
    val sampled = graft.ops.Sampling.stratifiedSampleByHash(
      deduped, graft.ops.Sampling.lcgKey(col("doc_id")), col("lang"),
      Seq("en" -> 500, "zh" -> 800, "es" -> 1000, "de" -> 250),
      defaultPerMille = 100)
    graft.ops.Sampling.assignSplits(
      sampled.select(col("doc_id"), col("lang")),
      graft.ops.Sampling.lcgKey(col("doc_id"), salt = 777L),
      Seq("train" -> 900, "val" -> 50, "test" -> 50))
  }

  // q65 with the LM-QUALITY stage wired in — the full production
  // curation story: token-count quality ∧ LM score ∧ dedup ∧ rebalance
  // ∧ split. The LM stage scores every quality survivor by its rational
  // bigram conditional-probability mass under a model trained on the
  // BASE corpus (LanguageModel.docCondProbMassDeterministic — the
  // oracle-safe form of the ln scorer) and drops docs whose AVERAGE
  // falls below 0.0340, thresholded by cross-multiplication
  // (sum_p6 ≥ 0.0340·n — exact decimals, no tie-prone division): on
  // the fixture the per-doc averages sit tightly around ~0.0345, so
  // the bar provably drops a fraction (gibberish-like tails) while the
  // clone-dedup, 40-token and strata stages keep biting as in q65.
  def q66_curation_lm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs0 = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val corpus = docs0.unionByName(docs0.select(
      (col("doc_id") + 2000000L).as("doc_id"), col("lang"), col("text")))
    val quality = corpus
      .filter(regexp_count(col("text"), lit("\\S+")) >= 40)
    // scores form (docs with >= 2 tokens only — every 40-token quality
    // survivor qualifies): skips the operator's id-frame left join, one
    // less corpus scan before the inner join below
    val lm = graft.llm.LanguageModel.docCondProbMassScores(
        quality, "doc_id", "text", modelDocs = Some(docs0))
      .filter(col("sum_p6") >=
        lit("0.0340").cast("decimal(18,6)") * col("n_bigrams"))
      .select(col("doc_id"), col("sum_p6"))
    val lmKept = quality.join(lm, Seq("doc_id"))
    val deduped = lmKept
      .withColumn("__h", xxhash64(col("text")))
      .withColumn("__keep",
        min(col("doc_id")).over(Window.partitionBy(col("__h"), col("text"))))
      .filter(col("doc_id") === col("__keep"))
    val sampled = graft.ops.Sampling.stratifiedSampleByHash(
      deduped, graft.ops.Sampling.lcgKey(col("doc_id")), col("lang"),
      Seq("en" -> 500, "zh" -> 800, "es" -> 1000, "de" -> 250),
      defaultPerMille = 100)
    graft.ops.Sampling.assignSplits(
      sampled.select(col("doc_id"), col("lang"),
        col("sum_p6").cast("double").as("lm_mass")),
      graft.ops.Sampling.lcgKey(col("doc_id"), salt = 777L),
      Seq("train" -> 900, "val" -> 50, "test" -> 50))
  }

  // Training-sequence chunking at the gate: overlapping 32-token windows
  // at stride 24 (llm/Chunking.chunkByTokens) — map-only explode inside
  // the scan stage; the pass that turns a curated corpus into model
  // inputs. The final short chunk and full token coverage are part of
  // the checked contract.
  def q67_token_chunks(s: SparkSession, dir: String): DataFrame =
    graft.llm.Chunking.chunkByTokens(
      t(s, dir, "documents"), idCols = Seq("doc_id"), textCol = "text",
      chunkSize = 32, stride = 24)

  // Semi-structured extraction at the gate: pull a typed field out of a
  // JSON payload column (events.props) and aggregate it — get_json_object
  // is a scan-stage expression, so at 100 TB this is one scan plus one
  // map-side-partial groupBy on a low-cardinality key.
  def q68_json_extract(s: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    t(s, dir, "events")
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           count(col("k")).as("n_with_k"),
           sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
  }

  // Gopher-style repetition signals at the gate: exact integer
  // token/bigram totals, distinct counts, and hottest-gram frequencies
  // per document (TextAnalysis.repetitionSignals — one corpus scan,
  // gram-keyed then doc-keyed map-side-partial aggregation, no windows).
  def q69_repetition(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextAnalysis.repetitionSignals(
      t(s, dir, "documents"), idCol = "doc_id", textCol = "text")

  // Greedy sequence packing at the gate (ops/Packing.packGreedy): docs
  // fill ~512-token bins within 8 deterministic hash streams — the
  // batch-assembly step before training. Global-order packing would be
  // one task; the bucketed form is the shape that survives 100 TB.
  def q70_seq_packing(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    graft.ops.Packing.packGreedy(
        docs, col("doc_id"), col("n_tokens"), budget = 512L, buckets = 8)
      .select(col("doc_id"), col("lang"), col("bucket"), col("n_tokens"),
              col("bin_id"))
  }

  // Winnowing-fingerprint overlap at the gate (Dedup.winnowingOverlapPairs)
  // — MOSS-style substring-level overlap detection via the sampled
  // fingerprint inverted index. The gate runs the md5-derived 60-bit
  // shingle hash (TextAnalysis.md5Hash60) so DuckDB can reproduce the
  // fingerprints and the whole chain — shingle → sliding-window min →
  // distinct → df cap → self-join — is hash-checked; production default
  // stays xxhash64, with md5/xxhash64 path equivalence pinned in
  // SketchOverlapSpec.
  def q71_winnow_overlap(s: SparkSession, dir: String): DataFrame =
    graft.llm.Dedup.winnowingOverlapPairs(
      t(s, dir, "documents"), idCol = "doc_id", textCol = "text",
      minShared = 2, ngram = 3, window = 4, maxDf = 50,
      hashFn = graft.llm.TextAnalysis.md5Hash60)

  // Sign-bit embedding sketch + Hamming top-k at the gate
  // (Similarity.hammingTopK): 64 float dims packed into two 32-bit words,
  // XOR+popcount distance — integer arithmetic end-to-end, so unlike
  // cosine it needs no decimal scaffolding to hash-match the oracle.
  def q72_hamming_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Similarity.hammingTopK(
        emb.where(col("vec_id") < 8), emb,
        idCol = "vec_id", vecCol = "embedding", dim = 64, k = 5)
      .select(col("query_id"), col("cand_id"),
              col("hamming").cast("int").as("hamming"),
              col("rnk").cast("int").as("rnk"))
  }

  // Deterministic corpus shuffle at the gate: global training order =
  // exact global row_number over the full-resolution LCG key
  // (injective → tie-free), computed by the window-free GlobalRank
  // machinery (range repartition + per-partition offsets) — the
  // pseudo-random epoch ordering every trainer needs, reproducible
  // across runs and retries, with NO single-partition global window.
  // 100 TB note: the explicit ORDINAL costs GlobalRank's one pinned
  // materialization; a trainer that only needs the ORDER skips it —
  // repartitionByRange(lcgKeyRaw) + sortWithinPartitions is the same
  // reproducible sequence with no rank column and no checkpoint.
  def q73_corpus_shuffle(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.ops.Sampling.lcgKeyRaw(col("doc_id")).as("shuffle_key"))
    graft.ops.GlobalRank.globalRowNumber(
      keyed, Seq(col("shuffle_key"), col("doc_id")), outCol = "shuffle_rank")
  }

  // Train/test decontamination at the gate
  // (Dedup.crossCorpusContamination): the corpus split into halves by
  // doc_id parity, test docs reported when they share any exact 5-gram
  // with a train doc — the benchmark-leakage check, inverted-index join,
  // never all-pairs. Exact strings, fully oracle-checkable.
  def q74_decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.llm.Dedup.crossCorpusContamination(
      train = docs.where(pmod(col("doc_id"), lit(2)) === 0),
      test  = docs.where(pmod(col("doc_id"), lit(2)) === 1),
      idCol = "doc_id", textCol = "text", ngram = 5, minShared = 1)
  }

  // Vocabulary builder at the gate (LanguageModel.buildVocab): top-50
  // tokens by (count DESC, token ASC) with dense ids — distributed
  // top-k (TakeOrderedAndProject), id window over exactly k rows.
  def q75_vocab(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.buildVocab(
      t(s, dir, "documents"), textCol = "text", k = 50)

  // Per-group quota capping at the gate (Sampling.capPerGroupApprox):
  // keep ≈10 docs per source — deterministic approximate membership
  // (LCG key vs integer-DIV rate), one counts groupBy + join + map-only
  // filter. The exact form would be a per-group rank window with the
  // largest group in one task; approximate-but-map-only is the 100 TB
  // answer.
  def q76_cap_per_group(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.capPerGroupApprox(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        graft.ops.Sampling.lcgKey(col("doc_id")), col("source"),
        maxPerGroup = 10L)
      .select(col("doc_id"), col("source"))

  // Canonical normalization at the gate (TextAnalysis.normalizeText):
  // NFC (native expression, = DuckDB nfc_normalize) + lower + whitespace
  // collapse, surfaced with the md5 the normalized-dedup pass keys on.
  // The fixture corpus is ASCII so the gate pins the plumbing; the
  // unicode semantics (composition, case, runs) are spec-pinned.
  def q77_normalize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      graft.llm.TextAnalysis.normalizeText(col("text")).as("norm_text"),
      md5(graft.llm.TextAnalysis.normalizeText(col("text")).cast("binary"))
        .as("norm_fp"))

  // End-to-end training-sequence ASSEMBLY composite: chunk every
  // document into overlapping 32-token windows (q67's operator), then
  // greedily pack the chunks into ~512-token bins across 8 deterministic
  // streams (q70's operator) — documents in, ready-to-batch training
  // bins out. The synthetic chunk id orders by (chunk_id, doc_id) and
  // buckets by doc parity, so streams stay balanced (bucketing by a
  // doc-major id would pile every chunk-0 into one stream).
  def q78_chunk_pack(s: SparkSession, dir: String): DataFrame = {
    // synthetic pack-order id: unique while doc_id < 10^12 and
    // chunk_id <= ~9.2e6 (long overflow bound) — 9.2M chunks × 24-token
    // stride is a 220M-token document, far past any real corpus doc.
    // The previous 10^7 multiplier collided at doc_id >= 10^7, i.e. at
    // exactly the corpus scale the operator targets.
    val chunks = graft.llm.Chunking.chunkByTokens(
        t(s, dir, "documents"), idCols = Seq("doc_id"), textCol = "text",
        chunkSize = 32, stride = 24)
      .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
        (col("chunk_id") * 1000000000000L + col("doc_id")).as("cid"))
    graft.ops.Packing.packGreedy(
        chunks, col("cid"), col("n_chunk_tokens"), budget = 512L, buckets = 8)
      .select(col("doc_id"), col("chunk_id"), col("bucket"),
              col("n_chunk_tokens"), col("bin_id"))
  }

  // Distributed k-means M-step at the gate
  // (Similarity.centroidUpdateStats): exact decimal component sums +
  // member counts per (label, dimension) — q61 covers the E-step
  // (assignment), this covers the update; together they are the full
  // Lloyd iteration as gate-checked distributed operators.
  def q79_centroid_update(s: SparkSession, dir: String): DataFrame =
    graft.llm.Similarity.centroidUpdateStats(
      t(s, dir, "embeddings"), labelCol = "label", vecCol = "embedding")

  // STREAMING ingest → training-chunk assembly at the gate: q67's
  // chunking operator applied to a real file-source stream through real
  // micro-batches (stateless map-only transform ⇒ Append mode, no
  // state store) — the shape of a continuous corpus-ingest pipeline
  // where new documents become training sequences as they land.
  // Deterministic: per-row transform, finite replay ⇒ output = batch.
  def q80_stream_chunks(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.runBatchOfStream(
      s, s"$dir/documents.parquet", "q80_chunks_mem", df =>
        graft.llm.Chunking.chunkByTokens(
          df, idCols = Seq("doc_id"), textCol = "text",
          chunkSize = 32, stride = 24),
      mode = org.apache.spark.sql.streaming.OutputMode.Append())

  // SEQUENCE-level decontamination at the gate
  // (Dedup.sequenceDecontamination): winnowing fingerprints on both
  // corpus halves + the q74 cross-corpus join shape — catches leaks by
  // shared RUNS, which exact n-gram containment loses after light
  // paraphrase. The fixture PLANTS mutated leaks: every 10th train doc
  // re-enters the test side with its first word dropped (id + 10^6) —
  // each planted doc must flag against its source despite the edit.
  // md5-derived fingerprints (TextAnalysis.md5Hash60) keep the whole
  // chain DuckDB-reproducible; the mutation is pure token arithmetic
  // (drop element 1 of the single-space split) in both engines.
  def q81_seq_decontam(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val train = docs.where(col("doc_id") % 2 === 0)
    val planted = train.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(
          slice(split(col("text"), " "), lit(2), size(split(col("text"), " "))),
          " ").as("text"))
    val test = docs.where(col("doc_id") % 2 === 1).unionByName(planted)
    graft.llm.Dedup.sequenceDecontamination(
      train, test, idCol = "doc_id", textCol = "text",
      minShared = 2, ngram = 3, window = 4, maxDf = 50,
      hashFn = graft.llm.TextAnalysis.md5Hash60)
  }

  // Connected components at the gate (Dedup.connectedComponents): the
  // transitive-closure step every near-dup pipeline ends with (pair
  // lists -> duplicate CLUSTERS -> one survivor per cluster), until now
  // spec-only because its input edges were hash-valued. The q71 winnow
  // edge set (md5 fingerprints) makes the whole chain
  // oracle-reproducible: DuckDB computes the same min-label components
  // with a recursive CTE over the same pairs. Output: (doc_id, comp_id
  // = min doc id reachable), one row per node that appears in a pair.
  def q82_components(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.llm.Dedup.winnowingOverlapPairs(
      t(s, dir, "documents"), idCol = "doc_id", textCol = "text",
      minShared = 2, ngram = 3, window = 4, maxDf = 50,
      hashFn = graft.llm.TextAnalysis.md5Hash60)
    graft.llm.Dedup.connectedComponents(
        pairs.select(col("doc_a").as("id_a"), col("doc_b").as("id_b")))
      .select(col("id").cast("long").as("doc_id"),
              col("comp").cast("long").as("comp_id"))
  }

  // STREAMING decontamination at the gate: the persisted-index probe
  // (sequenceDecontaminationIndexed) applied to a real file-source
  // stream of incoming documents — the continuous-ingest leak filter a
  // production pipeline runs in front of training. Build the train
  // index once (batch), then the stream side only winnows each
  // micro-batch and stream-static-joins the stored postings; the
  // groupBy count runs in Complete mode. Deterministic: finite replay
  // of a stateless transform + aggregation ⇒ output ≡ the batch run,
  // so the oracle is q81's chain minus the planted branch.
  def q85_stream_decontam(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val store = new graft.io.ParquetTableStore(
      s, java.nio.file.Files.createTempDirectory("q85idx").toString)
    graft.llm.Dedup.buildDecontamIndex(store, "dc",
      docs.where(col("doc_id") % 2 === 0), idCol = "doc_id",
      textCol = "text", ngram = 3, window = 4, maxDf = 50,
      hashFn = graft.llm.TextAnalysis.md5Hash60, hashLabel = "md5hash60")
    graft.streaming.EventStream.runBatchOfStream(
      s, s"$dir/documents.parquet", "q85_decontam_mem", df =>
        graft.llm.Dedup.sequenceDecontaminationIndexed(store, "dc",
          df.where(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
          idCol = "doc_id", textCol = "text", minShared = 2,
          hashFn = graft.llm.TextAnalysis.md5Hash60,
          hashLabel = "md5hash60"),
      mode = org.apache.spark.sql.streaming.OutputMode.Complete())
  }

  // IVF ANN at the gate (Similarity.ivfTopKDeterministic): bucket
  // assignment, nprobe probe selection, and exact rerank with every
  // distance an IEEE-double combination of exact decimal sums —
  // centroids pinned to the iters=0 init (first nlist vectors by id)
  // because Lloyd training averages doubles and is not
  // oracle-comparable (q61/q79 gate the E/M steps separately). With
  // q26 (brute), q72 (Hamming), and q84 (LSH), every ANN route is now
  // hash-checked end to end.
  def q86_ivf_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Similarity.ivfTopKDeterministic(
        emb.where(col("vec_id") < 8), emb,
        idCol = "vec_id", vecCol = "embedding", k = 5,
        nlist = 16, nprobe = 4)
      .select(col("query_id"), col("cand_id"),
              col("cosine").cast(out).cast("double").as("cosine"), col("rnk"))
  }

  // Product-quantization ADC search at the gate
  // (Similarity.pqTopKDeterministic): encode the corpus to m=4 subspace
  // codes against iters=0 codebooks, per-query LUT of exact subspace
  // distances, fixed-order recombine, k-bounded rank. Completes the
  // embedding-compression family (sign sketch q72 = 1 bit/dim; PQ =
  // log2(nlist) bits/subspace) with the same decimal-distance recipe
  // as q86.
  def q87_pq_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Similarity.pqTopKDeterministic(
        emb.where(col("vec_id") < 8), emb,
        idCol = "vec_id", vecCol = "embedding", k = 5,
        m = 4, dims = 64, nlist = 16)
      .select(col("query_id"), col("cand_id"),
              col("approx_dist").cast(out).cast("double").as("approx_dist"),
              col("rnk"))
  }

  // LSH ANN at the gate (Similarity.lshSignatureMd5 + bandKeys +
  // deterministic cosine + the k-bounded topKPerQuery): until now the
  // LSH path was recall-checked only — its xxhash64 hyperplanes had no
  // DuckDB peer. The md5-parity hyperplanes + exact-decimal plane dots
  // make every signature bit cross-engine deterministic, so the ENTIRE
  // search — signature, banding, bucket-join candidate set, exact
  // rerank, top-k — hash-checks. Same banding math as production
  // (16 bits / 4 bands), so the gate exercises the real shape.
  def q84_lsh_topk(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.Similarity
    val emb = t(s, dir, "embeddings")
    val sigs = emb.select(col("vec_id"), col("embedding"),
      Similarity.lshSignatureMd5(col("embedding"), 16, dims = 64).as("sig"))
    val keys = sigs.select(col("vec_id"), col("embedding"),
      explode(Similarity.bandKeys(col("sig"), 16, 4)).as("bk"))
      .select(col("vec_id"), col("embedding"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val q = keys.where(col("vec_id") < 8)
    val cand = keys.as("c").join(q.as("q"),
        col("c.band") === col("q.band") && col("c.key") === col("q.key") &&
          col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("cand_id"))
      .distinct()
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        "query_id")
      .join(emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv")),
        "cand_id")
    val scored = cand.select(col("query_id"), col("cand_id"),
      Similarity.cosineDeterministic(col("qv"), col("cv"),
        Similarity.norm2Decimal(col("qv")),
        Similarity.norm2Decimal(col("cv"))).as("cosine"))
    Similarity.topKPerQuery(scored, "cosine", k = 5, ascending = false)
      .select(col("query_id"), col("cand_id"),
        col("cosine").cast(out).cast("double").as("cosine"), col("rnk"))
  }

  // Paragraph-level dedup at the gate (Dedup.dedupParagraphInstances +
  // reassembleParagraphs): the C4/RefinedWeb sub-document cleaning step
  // — boilerplate paragraphs repeated across the corpus are removed
  // while the documents survive. The corpus has no structural
  // separators, so pseudo-paragraphs are 10-token windows from the
  // gate-checked chunker (q67's machinery); keep-first = the min
  // (doc_id, pos) instance; paragraphs under 10 chars are exempt
  // (exercising the minLen path on short tail chunks). Every original
  // doc_id survives via left join — one fixture doc dedups to the
  // empty string, pinning that contract.
  def q88_para_dedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val paras = graft.llm.Chunking.chunkByTokens(
        docs.select(col("doc_id"), col("text")),
        idCols = Seq("doc_id"), textCol = "text",
        chunkSize = 10, stride = 10)
      .select(col("doc_id"), col("chunk_id").as("pos"),
        col("chunk_text").as("para"))
    val kept = graft.llm.Dedup.dedupParagraphInstances(
      paras, keepFirst = true, minLen = 10)
    val rebuilt = graft.llm.Dedup.reassembleParagraphs(kept, sep = " ")
    val counts = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  // Token-budget prefix at the gate (GlobalRank.takeWhileBudget): the
  // distributed prefix sum — range repartition, per-partition totals as
  // ≤p rows of metadata, in-partition running window — cuts the corpus
  // to the compute-matched training budget in a fixed order. Integer
  // token counts sum exactly, so the inclusive cumulative totals (and
  // the budget boundary itself) are cross-engine bit-identical.
  def q89_token_budget(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    graft.ops.GlobalRank.takeWhileBudget(
      docs, Seq(col("doc_id")), "n_tokens", budget = 15000L)
  }

  // Mixture sampling at the gate (Sampling.sampleToMixture): per-group
  // keep rates DERIVED from target mixture shares + group counts — the
  // Pile-style composition-reweighting step. All long math (per-mille
  // shares, integer DIV, the LCG membership key), so the kept row set
  // reproduces bit-for-bit in DuckDB. The fr share oversubscribes its
  // population, pinning the rate clamp (keep-all) branch.
  def q90_mixture_sample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.sampleToMixture(
      t(s, dir, "documents").select(col("doc_id"), col("lang")),
      graft.ops.Sampling.lcgKey(col("doc_id")), col("lang"),
      Seq("en" -> 300, "zh" -> 150, "es" -> 100, "de" -> 50, "fr" -> 400),
      targetTotal = 200L)

  // Repeated-span scrubbing at the gate (Dedup.scrubRepeatedSpans): the
  // fixed-width approximation of suffix-array substring dedup — any
  // 10-token run occurring in ≥2 distinct docs is removed from ALL of
  // them at arbitrary alignment (what paragraph dedup q88 misses when
  // the repeat straddles a boundary). Pure string/int ops, so cleaned
  // text and removal counts are cross-engine exact; 24 fixture docs
  // scrub to the empty string, pinning the emptied-doc contract.
  def q91_span_scrub(s: SparkSession, dir: String): DataFrame =
    graft.llm.Dedup.scrubRepeatedSpans(
      t(s, dir, "documents"), idCol = "doc_id", textCol = "text",
      n = 10, minDocs = 2, hashGrams = false)

  // Curation v2 composite at the gate: the three round-6 operators
  // chained the way a production pipeline runs them — paragraph dedup
  // (q88's boilerplate pass) → repeated-span scrub over the DEDUPED
  // text (q91 at a finer alignment) → token-budget prefix (q89) to the
  // compute-matched cut. Every stage is individually hash-checked; this
  // pins their composition: stage boundaries (emptied docs dropping
  // out, token recounts on rebuilt text) are where composition bugs
  // would hide.
  def q92_curate_v2(s: SparkSession, dir: String): DataFrame =
    graft.llm.CorpusPipeline.curateSubdocBudget(
      t(s, dir, "documents"), idCol = "doc_id", textCol = "text",
      budget = 12000L, spanHashGrams = false)

  // SEMANTIC dedup at the gate (Dedup.semanticDedup — SemDeDup):
  // cluster the embedding space on the 8 pinned iters=0 centroids
  // (q61's deterministic "init"), then flag within-cluster cosine
  // near-dups keep-first. Fixture plants a ×1.001-scaled copy of every
  // vector (the q34 corpus): same direction ⇒ same nearest centroid ⇒
  // every planted copy is a within-cluster loser. Deterministic cosine
  // (decimal sums, double finish) makes the ≥ 0.999 threshold
  // bit-stable cross-engine.
  def q93_semantic_dedup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val planted = emb.unionByName(emb.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    graft.llm.Dedup.semanticDedup(planted, "vec_id", "embedding",
      centroids = emb.filter(col("vec_id") < 8),
      centroidIdCol = "vec_id", centroidVecCol = "embedding",
      minCosine = 0.999, deterministic = true)
  }

  // Vocabulary OOV-rate check at the gate (LanguageModel.oovCounts):
  // per-doc token/OOV counts against the q75 vocab builder capped at
  // k=20 (the fixture corpus has 31 distinct words, so a 20-word vocab
  // leaves real OOV mass — 0..40 per doc). Integer surface, broadcast
  // vocab join, one partial groupBy.
  def q96_oov_rate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.llm.LanguageModel.oovCounts(docs,
      graft.llm.LanguageModel.buildVocab(docs, textCol = "text", k = 20),
      idCol = "doc_id", textCol = "text")
  }

  // Classifier-based quality scoring at the gate
  // (Relevance.hashedLinearScore): the fastText/CCNet-style hashed
  // linear model at inference — tokens hash into 64 buckets, a fixed
  // weight table (LCG-derived per-mille weights, identical arithmetic
  // in both engines) broadcast-joins on, docs score exact decimal
  // weight sums. Gate hashes with md5Hash60 (cross-engine); production
  // defaults to xxhash64.
  def q97_quality_classifier(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val v = (col("id") * 1103515245L + 12345L) % 1000000007L % 2001L - 1000L
    val weights = s.range(dim).select(col("id").cast("int").as("bucket"),
      (v.cast("decimal(27,4)") / lit(1000).cast("decimal(27,4)"))
        .cast("decimal(18,6)").as("weight"))
    graft.llm.Relevance.hashedLinearScore(
        t(s, dir, "documents"), "doc_id", "text", weights, dim,
        hashFn = graft.llm.TextAnalysis.md5Hash60)
      .select(col("doc_id"), col("n_tokens"),
        col("score").cast("double").as("score"))
  }

  // DSIR importance scoring at the gate (Relevance.dsirScore): weights
  // LEARNED from a target-vs-raw corpus split (target = every 7th doc,
  // standing in for the curated high-quality corpus), then the hashed
  // linear scorer ranks the whole pool by target-likeness. The
  // deterministic pre-log rational weight (the q62 recipe) replaces the
  // production ln — sums of ratios, not sums of logs; the gate pins the
  // learn+score plumbing. md5Hash60 buckets cross-engine.
  def q98_dsir_score(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.llm.Relevance.dsirScore(
        raw = docs, target = docs.filter(col("doc_id") % 7 === 0),
        idCol = "doc_id", textCol = "text", dim = 128,
        hashFn = graft.llm.TextAnalysis.md5Hash60, deterministic = true)
      .select(col("doc_id"), col("n_tokens"),
        col("score").cast("double").as("score"))
  }

  // N-gram novelty at the gate (Relevance.ngramNovelty): per doc, how
  // many of its distinct trigrams occur in NO other document — integer
  // counts only. Grams hash through md5Hash60 before the shuffle (the
  // span-scrub trade; production uses xxhash64).
  def q99_ngram_novelty(s: SparkSession, dir: String): DataFrame =
    graft.llm.Relevance.ngramNovelty(
      t(s, dir, "documents"), "doc_id", "text", n = 3,
      hashFn = graft.llm.TextAnalysis.md5Hash60)

  // DSIR SELECTION at the gate: q98's scores → global top-200 by
  // (exact decimal score DESC, doc_id ASC) via limit — distributed
  // TakeOrderedAndProject (the q75 shape), never a global sort. The
  // importance-resampling "keep the most target-like slice" step.
  def q100_dsir_select(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.llm.Relevance.dsirScore(
        raw = docs, target = docs.filter(col("doc_id") % 7 === 0),
        idCol = "doc_id", textCol = "text", dim = 128,
        hashFn = graft.llm.TextAnalysis.md5Hash60, deterministic = true)
      .orderBy(col("score").desc, col("doc_id").asc).limit(200)
      .select(col("doc_id"), col("n_tokens"),
        col("score").cast("double").as("score"))
  }

  // Temperature-flattened mixture at the gate
  // (Sampling.sampleToTemperature): kept language sizes ∝ n^0.5 —
  // sqrt is IEEE-correctly-rounded in both engines, the n^α table
  // rounds once to decimal(27,6), and the rate math is the usual
  // per-mille long DIV; membership through the cross-engine LCG key.
  def q101_temperature_mix(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.sampleToTemperature(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        key = graft.ops.Sampling.lcgKey(col("doc_id")), groupCol = col("lang"),
        alpha = 0.5, targetTotal = 250L)

  // EXACT per-group quota at the gate (Sampling.capPerGroupExact):
  // exactly min(n_g, 70) docs per language, chosen by the smallest
  // (lcgKeyRaw, doc_id) — the k-bounded BottomKLong aggregator, never a
  // per-group row_number window. On the fixture: fr (64 docs) keeps all
  // (under-populated edge), de (70) sits exactly on the boundary,
  // en/es/zh (218/73/75) are cut to 70. Integer keys end to end.
  def q102_cap_exact(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.capPerGroupExact(
      t(s, dir, "documents").select(col("doc_id"), col("lang")),
      orderKey = graft.ops.Sampling.lcgKeyRaw(col("doc_id")),
      groupCol = col("lang"), idCol = col("doc_id"), maxPerGroup = 70)

  // ASYMMETRIC containment at the gate (Dedup.ngramContainmentPairs):
  // every 5th doc's first 15 tokens re-enter as a sub-document
  // (id + 10^6) — symmetric Jaccard scores them low (the union is the
  // long doc) but containment flags all 100 against their sources.
  // Cross-multiplied integer threshold, df-capped inverted index.
  def q123_containment(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val subs = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 15), " ").as("text"))
    graft.llm.Dedup.ngramContainmentPairs(
      docs.unionByName(subs), idCol = "doc_id", textCol = "text",
      minContainPerMille = 800, ngram = 3, maxDf = 100)
  }

  // Tokenizer FERTILITY at the gate (LanguageModel.tokenizerFertility):
  // per-language doc/word/subword/char totals + subwords-per-word — the
  // mC4/XLM-R tokenizer-cost table. Map-only regexp counts (the q21/q29
  // patterns), one tiny groupBy; the single rational divides once via
  // the shared decimal(27,4)→(18,6) recipe.
  def q124_fertility(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.tokenizerFertility(
        t(s, dir, "documents"), textCol = "text", groupCols = Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_subwords"), col("n_chars"),
        col("fertility").cast("double").as("fertility"))

  // CORPUS n-gram DIVERSITY at the gate (TextAnalysis.ngramDiversity):
  // per-language distinct-2 — bigram instances, distinct bigrams, and
  // the type-token ratio. Grams md5Hash60-keyed before the shuffle
  // (the q99 bridge; production xxhash64), ttr via the decimal recipe.
  def q125_distinct_ngrams(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextAnalysis.ngramDiversity(
        t(s, dir, "documents"), textCol = "text", n = 2,
        groupCols = Seq("lang"),
        hashFn = graft.llm.TextAnalysis.md5Hash60)
      .select(col("lang"), col("n_grams"), col("n_distinct"),
        col("ttr").cast("double").as("ttr"))

  // Margin-based BITEXT MINING at the gate (Similarity.marginMining):
  // forward top-4 pairs from the even-id sub-corpus (< 400) into the
  // odd-id corpus, scored by the Artetxe-Schwenk margin — raw cosine
  // over the mean of both endpoints' neighborhood cosines. Per-pair
  // cosines round to decimal(18,6) before the neighborhood sums, one
  // q22-recipe division, DOUBLE surface.
  def q126_margin_mining(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Similarity.marginMining(
        emb.where(col("vec_id") % 2 === 0 && col("vec_id") < 400),
        emb.where(col("vec_id") % 2 === 1),
        idCol = "vec_id", vecCol = "embedding", k = 4)
      .select(col("query_id"), col("cand_id"),
        col("cosine").cast(out).cast("double").as("cosine"),
        col("rnk"), col("margin").cast("double").as("margin"))
  }

  // STREAMING ANN probe at the gate (EventStream.runStreamForeachBatch
  // + Similarity.sqTopKIndexed): the online-serving shape — the SQ8
  // index is built once batch-side, then query vectors ARRIVE AS A
  // STREAM and each micro-batch probes the stored codes and appends its
  // top-k to a results table. Finite replay ⇒ the union of per-batch
  // results ≡ the batch run, so the oracle is q110's — streamed ≡
  // indexed ≡ direct, the whole SQ8 family pinned to one SQL form.
  def q128_stream_ann(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val store = new graft.io.ParquetTableStore(
      s, java.nio.file.Files.createTempDirectory("q128idx").toString)
    graft.llm.Similarity.buildSqIndex(store, "sq", emb, "vec_id", "embedding")
    graft.streaming.EventStream.runStreamForeachBatch(
      s, s"$dir/embeddings.parquet", { (batch, _) =>
        val res = graft.llm.Similarity.sqTopKIndexed(store, "sq",
          batch.where(col("vec_id") < 8), idCol = "vec_id",
          vecCol = "embedding", k = 5)
        if (store.exists("sq.results")) store.append("sq.results", res)
        else store.overwrite("sq.results", res)
      })
    store.read("sq.results")
      .select(col("query_id"), col("cand_id"),
        col("approx_dist").cast(out).cast("double").as("approx_dist"),
        col("rnk"))
  }

  // PQ INDEXED search at the gate (Similarity.buildPqIndex +
  // pqTopKIndexed): the persisted-index path — codebooks + codes +
  // meta stored once, queries probe without codebook derivation or a
  // corpus encode. Must be indistinguishable from the direct q87 path,
  // so the oracle is IDENTICAL to q87's (the q122 precedent).
  def q127_pq_indexed(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val store = new graft.io.ParquetTableStore(
      s, java.nio.file.Files.createTempDirectory("q127idx").toString)
    graft.llm.Similarity.buildPqIndex(store, "pq", emb, "vec_id",
      "embedding", m = 4, dims = 64, nlist = 16)
    graft.llm.Similarity.pqTopKIndexed(store, "pq",
        emb.where(col("vec_id") < 8), idCol = "vec_id",
        vecCol = "embedding", k = 5)
      .select(col("query_id"), col("cand_id"),
        col("approx_dist").cast(out).cast("double").as("approx_dist"),
        col("rnk"))
  }

  // SQ8 INDEXED search at the gate (Similarity.buildSqIndex +
  // sqTopKIndexed): the persisted-index path — stats row + codes table
  // stored once, queries probe without a stats scan or corpus encode.
  // Must be indistinguishable from the direct q110 path, so the oracle
  // is IDENTICAL to q110's — the strongest indexed==direct statement
  // the gate can make.
  def q122_sq_indexed(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val store = new graft.io.ParquetTableStore(
      s, java.nio.file.Files.createTempDirectory("q122idx").toString)
    graft.llm.Similarity.buildSqIndex(store, "sq", emb, "vec_id", "embedding")
    graft.llm.Similarity.sqTopKIndexed(store, "sq",
        emb.where(col("vec_id") < 8), idCol = "vec_id",
        vecCol = "embedding", k = 5)
      .select(col("query_id"), col("cand_id"),
        col("approx_dist").cast(out).cast("double").as("approx_dist"),
        col("rnk"))
  }

  // STREAMING QUALITY MONITOR at the gate: the Gopher battery as a
  // continuous-ingest dashboard — documents stream through a real
  // file source and the per-language keep/drop tallies aggregate in
  // Complete mode (stateless scoring + streaming agg; finite replay ⇒
  // totals ≡ the batch run, which is the oracle).
  def q121_stream_quality(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.runBatchOfStream(
      s, s"$dir/documents.parquet", "q121_qmon", { df =>
        import graft.llm.TextAnalysis._
        val c = gopherCounts(col("text"))
        df.select(col("lang"),
            when(gopherKeep(c, minWords = 30, minStopwords = 1), 1)
              .otherwise(0).as("k"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("k")).cast("long").as("n_keep"))
      })

  // CORPUS → VOCAB-ID SEQUENCES at the gate
  // (LanguageModel.encodeWithVocab): every token maps through the
  // q75 vocabulary (k=20 so the fixture genuinely produces OOV hits),
  // id sequences surfaced as space-joined strings (a string renders
  // identically through every readback path; arrays don't). k-row
  // broadcast, per-doc array_sort reassembly — never a corpus window.
  def q120_vocab_encode(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val vocab = graft.llm.LanguageModel.buildVocab(docs, "text", k = 20)
    graft.llm.LanguageModel.encodeWithVocab(docs, "doc_id", "text", vocab)
  }

  // PACKED PRETRAINING BLOCKS at the gate (Packing.tokenBlocks): the
  // GPT-style token stream — corpus concatenated in id order with an
  // <eos> closing every doc, cut into fixed 64-token blocks that CROSS
  // document boundaries (every block exactly full except the last).
  // Docs ship as per-block FRAGMENTS, never single tokens; the oracle
  // is the naive token-level window form.
  def q118_token_blocks(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.tokenBlocks(
      t(s, dir, "documents").select(col("doc_id"), col("text")),
      idCol = col("doc_id"), textCol = "text", blockSize = 64)

  // MULTI-EPOCH reshuffle at the gate (Sampling.epochOrders): epoch e
  // orders by the salt-e LCG key — every epoch a different
  // reproducible permutation, no RNG state to checkpoint. Two epochs
  // surfaced; ranks are the window-free globalRowNumber.
  def q119_epoch_shuffle(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.epochOrders(
        t(s, dir, "documents").select(col("doc_id")),
        idCol = col("doc_id"), epochs = 2)
      .select(col("doc_id"), col("epoch"), col("epoch_rank"))

  // CURATION v3 at the gate (CorpusPipeline.curateLeakSafe): the
  // release-manifest composition of the round-6 operators — Gopher
  // quality gate → exact dedup → leakage-safe split keyed on the
  // winnowing-overlap cluster rep → train-side length batching.
  // Stage boundaries (quality survivors feeding the dedup, the pair
  // set built on SURVIVORS only, the split filter feeding the batch
  // rank) are where composition bugs hide; each stage is separately
  // gate-checked (q111/q20/q113/q114).
  def q117_curate_v3(s: SparkSession, dir: String): DataFrame =
    graft.llm.CorpusPipeline.curateLeakSafe(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        idCol = "doc_id", textCol = "text",
        splits = Seq("train" -> 900, "val" -> 50, "test" -> 50),
        batchSize = 32,
        hashFn = graft.llm.TextAnalysis.md5Hash60)

  // CCNet-style LM-quality buckets at the gate
  // (LanguageModel.perplexityBuckets): every doc ranked by the integer
  // MICRO-average of its bigram conditional-probability mass under the
  // corpus model — (sum_p6·10⁶) DIV n_bigrams, exact floor division
  // where the rational average would tie at the rounding digit — and
  // cut into head/middle/tail tiers by the window-free ntile.
  def q115_ppl_buckets(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.perplexityBuckets(
        t(s, dir, "documents"), idCol = "doc_id", textCol = "text",
        buckets = 3)
      .select(col("doc_id"), col("avg_micro"), col("bucket"))

  // RETRIEVAL-EVAL metrics at the gate (Relevance.retrievalMetrics):
  // the measurement harness over a ranked search output — q26's
  // decimal-exact brute-force top-5 scored against same-label qrels
  // (embeddings carry class labels; relevant = same label). Integer
  // surface: hit counts, first relevant rank, reciprocal rank in micro
  // units (a float 1/rank sum is order-sensitive).
  def q116_retrieval_eval(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val results = graft.llm.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", k = 5)
    val qrels = emb.where(col("vec_id") < 8).select(
        col("vec_id").as("query_id"), col("label").as("qlab"))
      .join(emb.select(col("vec_id").as("cand_id"), col("label").as("clab")),
        col("cand_id") =!= col("query_id") && col("qlab") === col("clab"))
      .select(col("query_id"), col("cand_id"))
    graft.llm.Relevance.retrievalMetrics(results, qrels, k = 5)
  }

  // CORPUS SNAPSHOT DIFF at the gate (Dedup.corpusDiff): the
  // incremental-pipeline primitive — classify every doc id across two
  // corpus versions as added/removed/changed/unchanged by content
  // hash (hashes ship, not text; one id-keyed full-outer join). The
  // "next crawl" is simulated in-query: %7 ids dropped, %10 texts
  // mutated, %13 re-enter as new ids.
  def q112_corpus_diff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val next = docs.where(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0, concat(col("text"), lit(" mutated")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    graft.llm.Dedup.corpusDiff(docs, next, "doc_id", "text")
      .select(col("id").as("doc_id"), col("status"))
  }

  // LEAKAGE-SAFE SPLIT at the gate (Dedup.leakageSafeSplits): near-dup
  // clusters (q82's md5-winnowing component chain) land WHOLE on one
  // side of train/val/test — the split key is the cluster
  // representative's LCG hash, not the doc's. 94 fixture docs have a
  // rep ≠ self, so per-doc hashing would demonstrably leak.
  def q113_leak_split(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = graft.llm.Dedup.winnowingOverlapPairs(
        docs, idCol = "doc_id", textCol = "text",
        minShared = 2, ngram = 3, window = 4, maxDf = 50,
        hashFn = graft.llm.TextAnalysis.md5Hash60)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    graft.llm.Dedup.leakageSafeSplits(
        docs.select(col("doc_id")), pairs, "doc_id",
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
      .select(col("doc_id"), col("rep").cast("long").as("rep"), col("split"))
  }

  // SORTED LENGTH BATCHING at the gate (Packing.lengthBatches +
  // paddingStats): consecutive runs of 32 in (n_tokens, doc_id) order
  // share a batch; per-batch padding accounting (waste = n·max − sum)
  // is integer-exact. The rank is the window-free globalRowNumber.
  def q114_length_batches(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val batched = graft.ops.Packing.lengthBatches(
      docs, col("n_tokens"), col("doc_id"), batchSize = 32)
    graft.ops.Packing.paddingStats(batched, col("n_tokens"), col("batch_id"))
  }

  // GOPHER rule battery at the gate (TextAnalysis.gopherCounts +
  // gopherKeep): the full Rae-et-al document-quality gate as one
  // map-only pass — integer counts surfaced raw, every ratio rule a
  // cross-multiplied integer comparison (a float ratio would tie at
  // the rounding digit across engines). minWords=30/minStopwords=1
  // tuned to the fixture (words 10–99, only "the" from the stopword
  // list occurs) so keep genuinely splits the corpus (334/166).
  def q111_gopher(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.TextAnalysis._
    val docs = t(s, dir, "documents")
    docs.select(col("doc_id"), gopherCounts(col("text")).as("c"))
      .select(col("doc_id"), col("c.*"),
        when(gopherKeep(col("c"), minWords = 30, minStopwords = 1), 1)
          .otherwise(0).as("keep"))
  }

  // SQ8 scalar-quantization ANN at the gate (Similarity.sqTopK): per-dim
  // min/span affine codes (4× memory cut keeping per-dim resolution —
  // between the q72 sign sketch and q87's PQ in the compression
  // family), exact query vs dequantized candidates, the shared q86/q87
  // decimal squared-distance recipe, k-bounded rank. No separate gate
  // form: min/max are selections and the affine maps are chains of
  // correctly-rounded IEEE ops, so production IS the deterministic path.
  def q110_sq_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Similarity.sqTopK(
        emb.where(col("vec_id") < 8), emb,
        idCol = "vec_id", vecCol = "embedding", k = 5)
      .select(col("query_id"), col("cand_id"),
        col("approx_dist").cast(out).cast("double").as("approx_dist"),
        col("rnk"))
  }

  // STREAMING dedup INGEST at the gate
  // (EventStream.runStreamForeachBatch + Dedup.updateExactIndex): the
  // even half seeds the persisted content-hash index; the stream then
  // replays the whole corpus with every row PLANTED TWICE (id-shifted
  // clone) through foreachBatch probe-and-admit. Index hits (even
  // originals + their clones) drop, within-batch dups resolve to the
  // min id — exactly the odd originals land in the sink table.
  def q109_stream_dedup_ingest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val store = new graft.io.ParquetTableStore(
      s, java.nio.file.Files.createTempDirectory("q109idx").toString)
    graft.llm.Dedup.buildExactIndex(store, "dd",
      docs.where(col("doc_id") % 2 === 0), idCol = "doc_id", textCol = "text")
    graft.streaming.EventStream.runStreamForeachBatch(
      s, s"$dir/documents.parquet", { (batch, _) =>
        val withDups = batch
          .select(explode(array(
            struct(col("doc_id"), col("text")),
            struct((col("doc_id") + 1000000L).as("doc_id"), col("text"))))
            .as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
        val novel = graft.llm.Dedup.updateExactIndex(store, "dd", withDups,
          idCol = "doc_id", textCol = "text")
        if (store.exists("dd.novel")) store.append("dd.novel", novel)
        else store.overwrite("dd.novel", novel)
      })
    store.read("dd.novel").select(col("doc_id"), col("text"))
  }

  // CURRICULUM ordering at the gate (GlobalRank.curriculumOrder):
  // 4 difficulty tiers by token count (NTILE parity with ntileScalable),
  // shuffled within a tier by the LCG key, one window-free epoch rank —
  // easy-first training order without a difficulty sort.
  def q108_curriculum(s: SparkSession, dir: String): DataFrame =
    graft.ops.GlobalRank.curriculumOrder(
      t(s, dir, "documents").select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks")),
      difficultyCol = col("n_toks"), idCol = col("doc_id"),
      stages = 4, shuffleKey = graft.ops.Sampling.lcgKeyRaw(col("doc_id")))

  // Token-frequency SPECTRUM at the gate
  // (LanguageModel.tokenFrequencySpectrum): per-language Zipf bands —
  // distinct types and occurrences per power-of-two count band;
  // band = length(bin(cnt))-1, pure integer/string math both engines
  // share. Two map-side-partial groupBys, vocabulary-bounded.
  def q107_freq_spectrum(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.tokenFrequencySpectrum(
      t(s, dir, "documents"), textCol = "text", groupCols = Seq("lang"))

  // WATER-FILLING budget at the gate (Sampling.waterFillBudget):
  // exactly 293 docs, as evenly across languages as sizes allow — the
  // level lands at λ=58 with remainder 3, so de/en/es (first capped
  // langs in order) keep 59 and fr/zh keep 58. Closed-form integer λ,
  // |groups|-bounded metadata, BottomKLong selection buffers.
  def q106_water_fill(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.waterFillBudget(
      t(s, dir, "documents").select(col("doc_id"), col("lang")),
      orderKey = graft.ops.Sampling.lcgKeyRaw(col("doc_id")),
      groupCol = col("lang"), idCol = col("doc_id"), totalBudget = 293L)

  // HARD-NEGATIVE mining at the gate (Similarity.hardNegatives): per
  // query, top-5 most-similar embeddings with a DIFFERENT label —
  // contrastive-training negatives on the q26 decimal-exact cosine and
  // the k-bounded topKPerQuery buffers; the label inequality rides the
  // join so same-class rows never reach the buffers.
  def q105_hard_negatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Similarity.hardNegatives(
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        "label", k = 5)
      .select(col("query_id"), col("cand_id"),
        col("cosine").cast(out).cast("double").as("cosine"), col("rnk"))
  }

  // Weighted source INTERLEAVE at the gate
  // (GlobalRank.interleaveSources): three corpora woven into one epoch
  // order with 1:2:4 rates — per-source window-free global ranks,
  // integer virtual time, then one window-free rank over the union.
  // The dataset-mixing step that fixes WHEN each source's rows are seen.
  def q103_interleave(s: SparkSession, dir: String): DataFrame =
    graft.ops.GlobalRank.interleaveSources(
      t(s, dir, "documents").select(col("doc_id"), col("source")),
      sourceCol = col("source"),
      orderKey = graft.ops.Sampling.lcgKeyRaw(col("doc_id")),
      idCol = col("doc_id"),
      weights = Seq("src0" -> 1, "src1" -> 2, "src2" -> 4))

  // Bin ASSEMBLY at the gate (Packing.assembleBins): the q78 chunk→pack
  // chain materialized into actual training sequences — one row per
  // (bucket, bin_id), member chunks joined by '\n' in pack order. The
  // per-bin order is an array_sort bounded by one bin (~512 tokens),
  // never a window; the groupBy combines map-side.
  def q104_pack_assemble(s: SparkSession, dir: String): DataFrame = {
    val chunks = graft.llm.Chunking.chunkByTokens(
        t(s, dir, "documents"), idCols = Seq("doc_id"), textCol = "text",
        chunkSize = 32, stride = 24)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
        col("n_chunk_tokens"),
        (col("chunk_id") * 1000000000000L + col("doc_id")).as("cid"))
    val packed = graft.ops.Packing.packGreedy(
      chunks, col("cid"), col("n_chunk_tokens"), budget = 512L, buckets = 8)
    graft.ops.Packing.assembleBins(
      packed, col("cid"), col("n_chunk_tokens"), col("chunk_text"))
  }

  // TOKEN-budget mixture sampling at the gate
  // (Sampling.sampleToMixtureWeighted): the q90 composition step with
  // targets in TOKENS — per-language keep rates derived from token
  // SUMS, the way a training-mixture spec is actually written. fr's
  // budget exceeds its population → rate clamps to keep-all (pinned);
  // the others land partial rates. All long math + the LCG key.
  def q95_token_mixture(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.sampleToMixtureWeighted(
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_toks")),
      graft.ops.Sampling.lcgKey(col("doc_id")), col("lang"),
      col("n_toks"),
      Seq("en" -> 300, "zh" -> 150, "es" -> 100, "de" -> 50, "fr" -> 400),
      targetWeight = 12000L)

  // Quality-aware cluster resolution at the gate
  // (Dedup.resolveClustersBest): the q82 near-dup components resolved
  // to their LONGEST member (token count as the quality score, ties →
  // lowest id) instead of blind min-id — the keep-best step a real
  // pipeline runs after transitive clustering. Integer scores, so the
  // argmax is cross-engine exact.
  def q94_cluster_best(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = graft.llm.Dedup.winnowingOverlapPairs(
      docs, idCol = "doc_id", textCol = "text",
      minShared = 2, ngram = 3, window = 4, maxDf = 50,
      hashFn = graft.llm.TextAnalysis.md5Hash60)
    val comps = graft.llm.Dedup.connectedComponents(
      pairs.select(col("doc_a").as("id_a"), col("doc_b").as("id_b")))
    graft.llm.Dedup.resolveClustersBest(
        comps.select(col("id").cast("long").as("doc_id"),
          col("comp").cast("long").as("comp_id")),
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).as("n_toks")),
        idCol = "doc_id", compCol = "comp_id", scoreCol = "n_toks")
      .select(col("doc_id"), col("comp_id"),
        col("survivor_id").cast("long").as("survivor_id"))
  }

  // Bigram language model at the gate (llm/LanguageModel.topFollowers):
  // top-3 followers of every frequent head word by rational conditional
  // probability pair_cnt/head_cnt — one decimal division, identical in
  // both engines. The production per-doc LM scorer (docAvgLogProb, ln)
  // is spec-checked instead.
  def q64_bigram_lm(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.topFollowers(
      t(s, dir, "documents"), textCol = "text", minHeadCount = 50, k = 3)

  // Stratified deterministic sampling at the gate: per-language keep
  // fractions (the corpus-rebalancing move — downsample the dominant
  // language, keep all of a rare one), membership a pure function of
  // doc_id so re-weights never reshuffle which rows survive. Map-only;
  // the rate lookup is a codegen'd comparison cascade.
  def q52_stratified_sample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.stratifiedSampleByHash(
        t(s, dir, "documents"),
        graft.ops.Sampling.lcgKey(col("doc_id")), col("lang"),
        Seq("en" -> 500, "zh" -> 800, "es" -> 1000, "de" -> 250),
        defaultPerMille = 100)
      .select(col("doc_id"), col("lang"))

  // Bounded-memory heavy hitters at the gate: vocabulary items with
  // ≥ 100 occurrences via per-partition SpaceSaving sketches + exact
  // recount (recall provably total for minCount > n/k — k auto-derived).
  // Oracle = the plain GROUP BY ... HAVING the sketch path avoids.
  def q51_heavy_hitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = t(s, dir, "documents")
      .select(explode(graft.llm.TextShingles.words(col("text"))).as("w"))
      .as[String]
    graft.ops.HeavyHitters.heavyHitters(words, minCount = 100)
      .select(col("item").as("w"), col("cnt"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_dedup_exact"   -> q20_dedup_exact _,
    "q21_token_count"   -> q21_token_count _,
    "q22_quality"       -> q22_quality _,
    "q23_fingerprint"   -> q23_fingerprint _,
    "q24_lang_stats"    -> q24_lang_stats _,
    "q25_ngram_jaccard" -> q25_ngram_jaccard _,
    "q26_cosine_topk"   -> q26_cosine_topk _,
    "q27_minhash_pairs" -> q27_minhash_pairs _,
    "q28_simhash_pairs" -> q28_simhash_pairs _,
    "q29_subword_count" -> q29_subword_count _,
    "q30_langid"        -> q30_langid _,
    "q33_media_features" -> q33_media_features _,
    "q34_embedding_neardup" -> q34_embedding_neardup _,
    "q36_corpus_clean"  -> q36_corpus_clean _,
    "q41_redact"        -> q41_redact _,
    "q48_bm25"          -> q48_bm25 _,
    "q49_hash_split"    -> q49_hash_split _,
    "q51_heavy_hitters" -> q51_heavy_hitters _,
    "q52_stratified_sample" -> q52_stratified_sample _,
    "q61_kmeans_assign" -> q61_kmeans_assign _,
    "q62_tfidf_terms"   -> q62_tfidf_terms _,
    "q64_bigram_lm"     -> q64_bigram_lm _,
    "q65_curation_pipeline" -> q65_curation_pipeline _,
    "q66_curation_lm"   -> q66_curation_lm _,
    "q67_token_chunks"  -> q67_token_chunks _,
    "q68_json_extract"  -> q68_json_extract _,
    "q69_repetition"    -> q69_repetition _,
    "q70_seq_packing"   -> q70_seq_packing _,
    "q71_winnow_overlap" -> q71_winnow_overlap _,
    "q72_hamming_topk"  -> q72_hamming_topk _,
    "q73_corpus_shuffle" -> q73_corpus_shuffle _,
    "q74_decontaminate" -> q74_decontaminate _,
    "q75_vocab"         -> q75_vocab _,
    "q76_cap_per_group" -> q76_cap_per_group _,
    "q77_normalize"     -> q77_normalize _,
    "q78_chunk_pack"    -> q78_chunk_pack _,
    "q79_centroid_update" -> q79_centroid_update _,
    "q80_stream_chunks" -> q80_stream_chunks _,
    "q81_seq_decontam"  -> q81_seq_decontam _,
    "q82_components"    -> q82_components _,
    "q84_lsh_topk"      -> q84_lsh_topk _,
    "q85_stream_decontam" -> q85_stream_decontam _,
    "q86_ivf_topk"      -> q86_ivf_topk _,
    "q87_pq_topk"       -> q87_pq_topk _,
    "q88_para_dedup"    -> q88_para_dedup _,
    "q89_token_budget"  -> q89_token_budget _,
    "q90_mixture_sample" -> q90_mixture_sample _,
    "q91_span_scrub"    -> q91_span_scrub _,
    "q92_curate_v2"     -> q92_curate_v2 _,
    "q93_semantic_dedup" -> q93_semantic_dedup _,
    "q94_cluster_best"  -> q94_cluster_best _,
    "q95_token_mixture" -> q95_token_mixture _,
    "q96_oov_rate"      -> q96_oov_rate _,
    "q97_quality_classifier" -> q97_quality_classifier _,
    "q98_dsir_score"    -> q98_dsir_score _,
    "q99_ngram_novelty" -> q99_ngram_novelty _,
    "q100_dsir_select"  -> q100_dsir_select _,
    "q101_temperature_mix" -> q101_temperature_mix _,
    "q102_cap_exact"    -> q102_cap_exact _,
    "q103_interleave"   -> q103_interleave _,
    "q104_pack_assemble" -> q104_pack_assemble _,
    "q105_hard_negatives" -> q105_hard_negatives _,
    "q106_water_fill"   -> q106_water_fill _,
    "q107_freq_spectrum" -> q107_freq_spectrum _,
    "q108_curriculum"   -> q108_curriculum _,
    "q109_stream_dedup_ingest" -> q109_stream_dedup_ingest _,
    "q110_sq_topk"      -> q110_sq_topk _,
    "q111_gopher"       -> q111_gopher _,
    "q112_corpus_diff"  -> q112_corpus_diff _,
    "q113_leak_split"   -> q113_leak_split _,
    "q114_length_batches" -> q114_length_batches _,
    "q115_ppl_buckets"  -> q115_ppl_buckets _,
    "q116_retrieval_eval" -> q116_retrieval_eval _,
    "q117_curate_v3"    -> q117_curate_v3 _,
    "q118_token_blocks" -> q118_token_blocks _,
    "q119_epoch_shuffle" -> q119_epoch_shuffle _,
    "q120_vocab_encode" -> q120_vocab_encode _,
    "q121_stream_quality" -> q121_stream_quality _,
    "q122_sq_indexed"   -> q122_sq_indexed _,
    "q123_containment"  -> q123_containment _,
    "q124_fertility"    -> q124_fertility _,
    "q125_distinct_ngrams" -> q125_distinct_ngrams _,
    "q126_margin_mining" -> q126_margin_mining _,
    "q127_pq_indexed"   -> q127_pq_indexed _,
    "q128_stream_ann"   -> q128_stream_ann _
  )

  private val PqOracleSql: String =
    """WITH sv AS (
        |  SELECT vec_id, j, embedding[j*16+1 : j*16+16] AS s
        |  FROM (SELECT vec_id, embedding, unnest(range(0,4)) AS j FROM embeddings)),
        |svn AS (SELECT vec_id, j, s,
        |  CAST(list_sum(list_transform(s,
        |    x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE) AS nrm
        |  FROM sv),
        |books AS (SELECT j, vec_id AS cid, s AS cv, nrm AS cnrm FROM svn
        |          WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |ad AS (SELECT v.vec_id AS cand_id, v.j, b.cid,
        |  v.nrm - 2*CAST(list_sum(list_transform(list_zip(v.s, b.cv),
        |      z -> CAST(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE) + b.cnrm AS dist
        |  FROM svn v JOIN books b ON b.j = v.j),
        |codes AS (SELECT cand_id, j, cid AS code FROM
        |  (SELECT *, row_number() OVER (PARTITION BY cand_id, j ORDER BY dist ASC, cid ASC) AS rn FROM ad)
        |  WHERE rn = 1),
        |lut AS (SELECT cand_id AS query_id, j, cid AS code, dist AS d FROM ad WHERE cand_id < 8),
        |per AS (SELECT l.query_id, c.cand_id, c.j, l.d
        |        FROM codes c JOIN lut l ON l.j = c.j AND l.code = c.code
        |        WHERE c.cand_id <> l.query_id),
        |piv AS (SELECT query_id, cand_id,
        |          max(CASE WHEN j=0 THEN d END) + max(CASE WHEN j=1 THEN d END) +
        |          max(CASE WHEN j=2 THEN d END) + max(CASE WHEN j=3 THEN d END) AS approx_dist
        |        FROM per GROUP BY 1, 2)
        |SELECT query_id, cand_id,
        |  CAST(CAST(approx_dist AS DECIMAL(38,6)) AS DOUBLE) AS approx_dist, CAST(rnk AS INT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, cand_id ASC) AS rnk
        |      FROM piv) WHERE rnk <= 5""".stripMargin

  private val Sq8OracleSql: String =
    """WITH dims AS (
      |  SELECT vec_id, unnest(range(0, len(embedding))) AS d,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |stats AS (
      |  SELECT d, min(x) AS mn, max(x) - min(x) AS sp FROM dims GROUP BY d),
      |codes AS (
      |  SELECT vec_id AS cand_id, d,
      |    CASE WHEN sp > 0
      |         THEN CAST(least(greatest(floor(((x - mn) / sp) * 255.0), 0), 255) AS BIGINT)
      |         ELSE 0 END AS c
      |  FROM dims JOIN stats USING (d)),
      |vhat AS (
      |  SELECT cand_id, d, mn + (CAST(c AS DOUBLE) * sp) / 255.0 AS xh
      |  FROM codes JOIN stats USING (d)),
      |cn AS (
      |  SELECT cand_id, CAST(sum(CAST(xh * xh AS DECIMAL(38,15))) AS DOUBLE) AS cnrm
      |  FROM vhat GROUP BY cand_id),
      |qn AS (
      |  SELECT vec_id AS query_id,
      |    CAST(list_sum(list_transform(embedding,
      |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE) AS qnrm
      |  FROM embeddings WHERE vec_id < 8),
      |dotp AS (
      |  SELECT qd.vec_id AS query_id, v.cand_id,
      |    CAST(sum(CAST(qd.x * v.xh AS DECIMAL(38,15))) AS DOUBLE) AS dot
      |  FROM dims qd JOIN vhat v USING (d)
      |  WHERE qd.vec_id < 8 AND v.cand_id <> qd.vec_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT query_id, cand_id, q.qnrm - 2*d.dot + c.cnrm AS approx_dist
      |  FROM dotp d JOIN qn q USING (query_id) JOIN cn c USING (cand_id))
      |SELECT query_id, cand_id,
      |  CAST(CAST(approx_dist AS DECIMAL(38,6)) AS DOUBLE) AS approx_dist,
      |  CAST(rnk AS INT) AS rnk
      |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
      |        ORDER BY approx_dist ASC, cand_id ASC) AS rnk FROM pairs)
      |WHERE rnk <= 5""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q20_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q21_token_count" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
        | CAST(length(text) AS INT) AS len_chars FROM documents""".stripMargin,
    "q22_quality" ->
      """SELECT doc_id, lang,
        | CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
        | CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it)\b')) AS INT) AS n_stopwords,
        | CAST(CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
        |   CAST(CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it)\b')) AS DECIMAL(18,6))
        |        / CAST(len(regexp_extract_all(text, '\S+')) AS DECIMAL(18,6)) AS DECIMAL(38,6))
        | ELSE CAST(0 AS DECIMAL(38,6)) END AS DOUBLE) AS stopword_ratio,
        | CAST(CASE WHEN len(regexp_extract_all(text, '\S+')) > 0 THEN
        |   CAST(CAST(length(text) - len(regexp_extract_all(text, '\S+')) + 1 AS DECIMAL(18,6))
        |        / CAST(len(regexp_extract_all(text, '\S+')) AS DECIMAL(18,6)) AS DECIMAL(38,6))
        | ELSE CAST(0 AS DECIMAL(38,6)) END AS DOUBLE) AS avg_token_len
        |FROM documents""".stripMargin,
    "q23_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_fp,
        | md5(substring(text, 1, 64)) AS prefix_fp FROM documents""".stripMargin,
    "q24_lang_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | min(doc_id) AS min_doc_id FROM documents GROUP BY lang""".stripMargin,
    "q25_ngram_jaccard" ->
      """WITH grams0 AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM documents WHERE doc_id < 200),
        |keep AS (SELECT gram FROM grams0 GROUP BY gram HAVING count(*) <= 150),
        |grams AS (SELECT grams0.doc_id, grams0.gram FROM grams0 JOIN keep USING (gram)),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, n_shared,
        |  CAST(CAST(CAST(n_shared AS DECIMAL(18,6)) /
        |       CAST(sa.n_grams + sb.n_grams - n_shared AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS jaccard
        |FROM shared
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(CAST(n_shared AS DECIMAL(18,6)) /
        |       CAST(sa.n_grams + sb.n_grams - n_shared AS DECIMAL(18,6)) AS DECIMAL(38,6))
        |      > CAST(0.10 AS DECIMAL(38,6))""".stripMargin,
    "q27_minhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 250
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, regexp_replace(text, '^\S+\s*', '') AS text
        |  FROM documents WHERE doc_id < 250),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM corpus),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(n_shared AS INT) AS n_shared,
        |  CAST(CAST(CAST(n_shared AS DECIMAL(18,6)) /
        |       CAST(sa.n_grams + sb.n_grams - n_shared AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) AS jaccard
        |FROM shared
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(CAST(n_shared AS DECIMAL(18,6)) /
        |       CAST(sa.n_grams + sb.n_grams - n_shared AS DECIMAL(18,6)) AS DECIMAL(38,6))
        |      >= CAST(0.8 AS DECIMAL(38,6))""".stripMargin,
    "q28_simhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 250
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
        |  FROM documents WHERE doc_id < 250),
        |keyed AS (
        |  SELECT doc_id, array_to_string(list_sort(string_split(text, ' ')), ' ') AS k
        |  FROM corpus)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS hamming
        |FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id""".stripMargin,
    "q33_media_features" ->
      """WITH m AS (
        |  SELECT i,
        |    CASE WHEN i % 3 = 0 THEN 'image'
        |         WHEN i % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CASE WHEN i % 3 = 2 THEN greatest(1, (1000 + (i % 10) * 200) // 40)
        |         WHEN i % 3 = 0 THEN 1 ELSE 0 END AS n_frames
        |  FROM range(0, 300) t(i))
        |SELECT kind, count(*) AS n_media,
        |       CAST(sum(n_frames) AS BIGINT) AS total_frames,
        |       count(*) AS n_decoded
        |FROM m GROUP BY kind""".stripMargin,
    "q34_embedding_neardup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        |corpus AS (
        |  SELECT vec_id, embedding FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding, x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) AS embedding
        |  FROM base),
        |norm AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM corpus),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE)
        |      / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS cosine
        |  FROM norm a JOIN norm b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, CAST(CAST(cosine AS DECIMAL(38,6)) AS DOUBLE) AS cosine
        |FROM pairs WHERE cosine >= 0.999""".stripMargin,
    "q36_corpus_clean" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, regexp_replace(text, '^\S+\s*', '') AS text
        |  FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT 2000000 AS doc_id, '!!! ...' AS text
        |  UNION ALL
        |  SELECT 3000000 AS doc_id, text FROM documents WHERE doc_id = 0),
        |prof AS (
        |  SELECT doc_id, text,
        |    len(regexp_extract_all(text, '\S+')) AS n_toks,
        |    CASE WHEN length(text) > 0
        |         THEN CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE) / length(text)
        |         ELSE 0.0 END AS punct_ratio
        |  FROM corpus),
        |keptq AS (
        |  SELECT doc_id, text FROM prof
        |  WHERE n_toks BETWEEN 8 AND 100000 AND punct_ratio <= 0.3),
        |surv AS (
        |  SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS keep_id
        |  FROM keptq),
        |uniq AS (SELECT doc_id, text FROM surv WHERE doc_id = keep_id),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM uniq),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |nd_pairs AS (
        |  SELECT id_a, id_b FROM shared
        |  JOIN sizes sa ON sa.doc_id = id_a
        |  JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(CAST(n_shared AS DECIMAL(18,6)) /
        |        CAST(sa.n_grams + sb.n_grams - n_shared AS DECIMAL(18,6)) AS DECIMAL(38,6))
        |        >= CAST(0.8 AS DECIMAL(38,6))),
        |und AS (SELECT id_a AS s, id_b AS d FROM nd_pairs
        |        UNION SELECT id_b, id_a FROM nd_pairs),
        |reach AS (
        |  SELECT s, d FROM und
        |  UNION
        |  SELECT r.s, u.d FROM reach r JOIN und u ON r.d = u.s),
        |comp AS (SELECT s AS doc_id, least(s, min(d)) AS comp FROM reach GROUP BY s),
        |losers AS (SELECT doc_id FROM comp WHERE comp < doc_id),
        |hist AS (
        |  SELECT 'quality' AS drop_reason, count(*) AS n_docs FROM prof
        |    WHERE NOT (n_toks BETWEEN 8 AND 100000 AND punct_ratio <= 0.3)
        |  UNION ALL
        |  SELECT 'exact_dup', count(*) FROM surv WHERE doc_id <> keep_id
        |  UNION ALL
        |  SELECT 'near_dup', count(*) FROM losers
        |  UNION ALL
        |  SELECT 'kept', (SELECT count(*) FROM uniq) - (SELECT count(*) FROM losers))
        |SELECT drop_reason, n_docs FROM hist WHERE n_docs > 0""".stripMargin,
    "q41_redact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT 9000001, 'contact me at alice.smith@example.com or bob@test.org for details'
        |  UNION ALL SELECT 9000002, 'see https://example.com/path?q=1 and email carol@x.io or call +1-555-123-4567 now'
        |  UNION ALL SELECT 9000003, 'numbers 12345678 and 1-800-555-0199 plus word text'),
        |r AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, 'https?://[^ \t\n\x0B\f\r]+', '<URL>', 'g') AS no_url
        |  FROM corpus)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[^ \t\n\x0B\f\r]+')) AS INT) AS n_urls,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9\-]{6,}[0-9]')) AS INT) AS n_phones,
        |  md5(regexp_replace(
        |    regexp_replace(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9\-]{6,}[0-9]', '<PHONE>', 'g')) AS redacted_fp
        |FROM r""".stripMargin,
    // rational-decimal BM25: integer numerators/denominators, one
    // decimal(18,6)-rounded division per factor, exact decimal sum
    "q48_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |stats AS (SELECT CAST(sum(dl) AS BIGINT) AS S, CAST(count(*) AS BIGINT) AS N FROM dl),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
        |       WHERE w IN ('join','vector','filter','scan') GROUP BY doc_id, w),
        |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |scored AS (
        |  SELECT t.doc_id,
        |    CAST(CAST(2*s.N - 2*x.df + 1 AS DECIMAL(18,4)) / CAST(2*x.df + 1 AS DECIMAL(18,4)) AS DECIMAL(18,6)) AS idf6,
        |    CAST(CAST(10*t.tf*s.S AS DECIMAL(27,4)) / CAST(10*t.tf*s.S + 3*s.S + 9*l.dl*s.N AS DECIMAL(27,4)) AS DECIMAL(18,6)) AS tfn6
        |  FROM tf t JOIN dfx x USING (w) JOIN dl l USING (doc_id) CROSS JOIN stats s)
        |SELECT doc_id, CAST(CAST(SUM(idf6*tfn6) AS DECIMAL(38,12)) AS DOUBLE) AS score
        |FROM scored GROUP BY doc_id""".stripMargin,
    // the exact aggregate the sketch+recount path reproduces
    "q51_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |SELECT w, count(*) AS cnt FROM tok GROUP BY w HAVING count(*) >= 100""".stripMargin,
    // pure-integer LCG mix — identical arithmetic in any engine
    "q49_hash_split" ->
      """WITH k AS (
        |  SELECT doc_id, ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 AS key
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN key < 900 THEN 'train' WHEN key < 950 THEN 'val' ELSE 'test' END AS split
        |FROM k""".stripMargin,
    // nearest-centroid assignment: decimal norms/dots, double combine
    "q61_kmeans_assign" ->
      """WITH nv AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, embedding AS cvec, nrm AS cnrm FROM nv WHERE vec_id < 8),
        |p AS (
        |  SELECT v.vec_id, c.centroid_id,
        |    CAST(v.nrm AS DOUBLE) + CAST(c.cnrm AS DOUBLE)
        |    - 2*CAST(list_sum(list_transform(list_zip(v.embedding, c.cvec),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE) AS dist2
        |  FROM nv v CROSS JOIN c),
        |a AS (SELECT vec_id, centroid_id, dist2,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, centroid_id ASC) AS rn
        |      FROM p)
        |SELECT vec_id, centroid_id, CAST(CAST(dist2 AS DECIMAL(38,6)) AS DOUBLE) AS dist2
        |FROM a WHERE rn = 1""".stripMargin,
    // rational TF-IDF: one decimal division, rounded identically
    "q62_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
        |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |n AS (SELECT count(*) AS N FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.w,
        |    CAST(CAST(t.tf*n.N AS DECIMAL(27,4)) / CAST(x.df AS DECIMAL(27,4)) AS DECIMAL(18,6)) AS score6
        |  FROM tf t JOIN dfx x USING (w) CROSS JOIN n)
        |SELECT doc_id, w AS term, CAST(rnk AS INT) AS rnk, CAST(score6 AS DOUBLE) AS score
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score6 DESC, w ASC) AS rnk
        |      FROM scored)
        |WHERE rnk <= 3""".stripMargin,
    // quality -> exact-dedup -> stratified rebalance -> split, composed
    "q65_curation_pipeline" ->
      """WITH corpus AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, lang, text FROM documents),
        |q AS (
        |  SELECT doc_id, lang, text FROM corpus
        |  WHERE len(regexp_extract_all(text, '\S+')) >= 40),
        |d AS (
        |  SELECT doc_id, lang FROM (
        |    SELECT doc_id, lang, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM q)
        |  WHERE doc_id = keep_id),
        |s AS (
        |  SELECT doc_id, lang FROM d
        |  WHERE ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 <
        |    CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 800 WHEN 'es' THEN 1000
        |              WHEN 'de' THEN 250 ELSE 100 END),
        |k AS (
        |  SELECT doc_id, lang,
        |    (((((doc_id + 777) * 1103515245 + 12345) % 1000000007)
        |       * 1665302 + 1013904223) % 1000000007) % 1000 AS key FROM s)
        |SELECT doc_id, lang,
        |  CASE WHEN key < 900 THEN 'train' WHEN key < 950 THEN 'val' ELSE 'test' END AS split
        |FROM k""".stripMargin,
    // q65 + the rational LM-quality stage (base-corpus bigram model)
    "q66_curation_lm" ->
      """WITH corpus AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, lang, text FROM documents),
        |q AS (
        |  SELECT doc_id, lang, text FROM corpus
        |  WHERE len(regexp_extract_all(text, '\S+')) >= 40),
        |mg AS (
        |  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM documents),
        |mbg AS (SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM mg),
        |cab AS (SELECT w1, w2, count(*) AS pair_cnt FROM mbg GROUP BY 1, 2),
        |ca AS (SELECT w1, CAST(sum(pair_cnt) AS BIGINT) AS head_cnt FROM cab GROUP BY 1),
        |model AS (SELECT cab.w1, cab.w2,
        |  CAST(CAST(pair_cnt AS DECIMAL(18,4)) / CAST(head_cnt AS DECIMAL(18,4)) AS DECIMAL(18,6)) AS p6
        |  FROM cab JOIN ca USING (w1)),
        |dbg0 AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM q),
        |dbg AS (SELECT doc_id, string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM dbg0),
        |sc AS (
        |  SELECT d.doc_id, coalesce(m.p6, CAST(0 AS DECIMAL(18,6))) AS p6
        |  FROM dbg d LEFT JOIN model m ON d.w1 = m.w1 AND d.w2 = m.w2),
        |lm AS (
        |  SELECT doc_id, CAST(sum(p6) AS DECIMAL(38,6)) AS sum_p6,
        |    count(*) AS n_bigrams
        |  FROM sc GROUP BY doc_id),
        |lmk AS (
        |  SELECT q.doc_id, q.lang, q.text, lm.sum_p6
        |  FROM q JOIN lm USING (doc_id)
        |  WHERE lm.sum_p6 >= CAST('0.0340' AS DECIMAL(18,6)) * lm.n_bigrams),
        |d AS (
        |  SELECT doc_id, lang, sum_p6 FROM (
        |    SELECT doc_id, lang, sum_p6, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM lmk)
        |  WHERE doc_id = keep_id),
        |s AS (
        |  SELECT doc_id, lang, sum_p6 FROM d
        |  WHERE ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 <
        |    CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 800 WHEN 'es' THEN 1000
        |              WHEN 'de' THEN 250 ELSE 100 END),
        |k AS (
        |  SELECT doc_id, lang, sum_p6,
        |    (((((doc_id + 777) * 1103515245 + 12345) % 1000000007)
        |       * 1665302 + 1013904223) % 1000000007) % 1000 AS key FROM s)
        |SELECT doc_id, lang, CAST(sum_p6 AS DOUBLE) AS lm_mass,
        |  CASE WHEN key < 900 THEN 'train' WHEN key < 950 THEN 'val' ELSE 'test' END AS split
        |FROM k""".stripMargin,
    // rational bigram conditional probabilities, one decimal division
    "q64_bigram_lm" ->
      """WITH grams AS (
        |  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM documents),
        |bg AS (SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM grams),
        |cab AS (SELECT w1, w2, count(*) AS pair_cnt FROM bg GROUP BY 1, 2),
        |ca AS (SELECT w1, CAST(sum(pair_cnt) AS BIGINT) AS head_cnt FROM cab GROUP BY 1),
        |j AS (SELECT cab.w1, cab.w2, cab.pair_cnt, ca.head_cnt
        |      FROM cab JOIN ca USING (w1) WHERE ca.head_cnt >= 50),
        |scored AS (SELECT w1, w2, pair_cnt, head_cnt,
        |  CAST(CAST(pair_cnt AS DECIMAL(18,4)) / CAST(head_cnt AS DECIMAL(18,4)) AS DECIMAL(18,6)) AS p6
        |  FROM j)
        |SELECT w1, w2, CAST(pair_cnt AS BIGINT) AS pair_cnt, head_cnt, CAST(rnk AS INT) AS rnk,
        |       CAST(p6 AS DOUBLE) AS cond_p
        |FROM (SELECT *, row_number() OVER (PARTITION BY w1 ORDER BY p6 DESC, w2 ASC) AS rnk FROM scored)
        |WHERE rnk <= 3""".stripMargin,
    // same LCG key, per-stratum thresholds
    "q52_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 <
        |  CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 800 WHEN 'es' THEN 1000
        |            WHEN 'de' THEN 250 ELSE 100 END""".stripMargin,
    "q29_subword_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '\p{L}{1,4}|\p{N}{1,3}|[^\s\p{L}\p{N}]')) AS INT) AS n_subwords
        |FROM documents""".stripMargin,
    "q30_langid" ->
      """WITH hits AS (
        |  SELECT doc_id, 'en' AS lang,
        |    CAST(len(regexp_extract_all(text, '(?i)\b(the|and|of|to|is|in|that|it)\b')) AS INT) AS h FROM documents
        |  UNION ALL SELECT doc_id, 'de',
        |    CAST(len(regexp_extract_all(text, '(?i)\b(der|die|das|und|ist|nicht|ein|zu)\b')) AS INT) FROM documents
        |  UNION ALL SELECT doc_id, 'fr',
        |    CAST(len(regexp_extract_all(text, '(?i)\b(le|la|les|et|est|une|que|dans)\b')) AS INT) FROM documents
        |  UNION ALL SELECT doc_id, 'es',
        |    CAST(len(regexp_extract_all(text, '(?i)\b(el|los|las|es|una|que|por|con)\b')) AS INT) FROM documents
        |  UNION ALL SELECT doc_id, 'zh',
        |    CAST(len(regexp_extract_all(text, '(的|是|了|在|我|有|他|不)')) AS INT) FROM documents)
        |SELECT doc_id,
        |  CASE WHEN mx.h > 0 THEN mx.lang ELSE 'und' END AS lang_pred
        |FROM (SELECT doc_id, max(struct_pack(h := h, lang := lang)) AS mx
        |      FROM hits GROUP BY doc_id)""".stripMargin,
    "q26_cosine_topk" ->
      """WITH norm AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE)
        |      / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) AS cosine
        |  FROM norm q JOIN norm c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
        |SELECT query_id, cand_id, CAST(CAST(cosine AS DECIMAL(38,6)) AS DOUBLE) AS cosine, CAST(rnk AS INT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
        |      FROM pairs) WHERE rnk <= 5""".stripMargin,
    // overlapping token windows, 1-based inclusive list slices
    "q67_token_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |        unnest(generate_series(0, (len(toks)-1)//24)) AS chunk_id FROM t
        |      WHERE len(toks) >= 1)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  array_to_string(toks[chunk_id*24+1 : least(chunk_id*24+32, len(toks))], ' ') AS chunk_text,
        |  CAST(least(chunk_id*24+32, len(toks)) - chunk_id*24 AS BIGINT) AS n_chunk_tokens
        |FROM s""".stripMargin,
    // streaming chunking replays the batch chunker exactly (stateless
    // map, finite source) -> same oracle as q67
    "q80_stream_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |        unnest(generate_series(0, (len(toks)-1)//24)) AS chunk_id FROM t
        |      WHERE len(toks) >= 1)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  array_to_string(toks[chunk_id*24+1 : least(chunk_id*24+32, len(toks))], ' ') AS chunk_text,
        |  CAST(least(chunk_id*24+32, len(toks)) - chunk_id*24 AS BIGINT) AS n_chunk_tokens
        |FROM s""".stripMargin,
    // q71's winnowing chain on both corpus halves + the planted mutated
    // leaks (train docs with their first token dropped, id + 10^6 —
    // pure token arithmetic, identical in both engines), train-side df
    // cap, fingerprint-keyed join
    "q81_seq_decontam" ->
      """WITH raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |corp AS (
        |  SELECT doc_id, toks, 0 AS side FROM raw WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, toks, 1 FROM raw WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000, toks[2:], 1 FROM raw
        |  WHERE doc_id % 2 = 0 AND doc_id % 10 = 0),
        |g AS (SELECT doc_id, side, i, len(toks) - 2 AS n,
        |        ('0x' || substring(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id, side, toks,
        |              unnest(generate_series(1, len(toks)-2)) AS i FROM corp
        |            WHERE len(toks) >= 3)),
        |m AS (SELECT doc_id, side, i, n,
        |        min(h) OVER (PARTITION BY side, doc_id ORDER BY i
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |      FROM g),
        |fps AS (SELECT DISTINCT doc_id, side, fp FROM m
        |        WHERE i <= greatest(n-4, 0) + 1),
        |keep AS (SELECT fp FROM fps WHERE side = 0
        |         GROUP BY fp HAVING count(*) <= 50)
        |SELECT te.doc_id AS test_id, tr.doc_id AS train_id,
        |       count(*) AS n_shared
        |FROM (SELECT doc_id, fp FROM fps WHERE side = 1) te
        |JOIN keep USING (fp)
        |JOIN (SELECT doc_id, fp FROM fps WHERE side = 0) tr USING (fp)
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    // the q71 winnow edge set + recursive-CTE min-label transitive
    // closure: walk holds every (node, reachable label); min per node
    // is exactly connectedComponents' min-id component label. UNION
    // (not UNION ALL) dedups the frontier so the recursion terminates.
    "q82_components" ->
      """WITH RECURSIVE raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, i, len(toks) - 2 AS n,
        |        ('0x' || substring(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-2)) AS i FROM raw
        |            WHERE len(toks) >= 3)),
        |m AS (SELECT doc_id, i, n,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |      FROM g),
        |fps AS (SELECT DISTINCT doc_id, fp FROM m WHERE i <= greatest(n-4, 0) + 1),
        |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
        |f2 AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp)),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |      UNION SELECT doc_b, doc_a FROM pairs),
        |walk AS (
        |  SELECT src AS node, src AS lbl FROM e
        |  UNION
        |  SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node)
        |SELECT node AS doc_id, min(lbl) AS comp_id FROM walk GROUP BY node""".stripMargin,
    // q81's winnowing chain restricted to the real halves (no planted
    // branch) — the streaming probe replays to exactly the batch result
    "q85_stream_decontam" ->
      """WITH raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, doc_id % 2 AS side, i, len(toks) - 2 AS n,
        |        ('0x' || substring(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-2)) AS i FROM raw
        |            WHERE len(toks) >= 3)),
        |m AS (SELECT doc_id, side, i, n,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |      FROM g),
        |fps AS (SELECT DISTINCT doc_id, side, fp FROM m
        |        WHERE i <= greatest(n-4, 0) + 1),
        |keep AS (SELECT fp FROM fps WHERE side = 0
        |         GROUP BY fp HAVING count(*) <= 50)
        |SELECT te.doc_id AS test_id, tr.doc_id AS train_id,
        |       count(*) AS n_shared
        |FROM (SELECT doc_id, fp FROM fps WHERE side = 1) te
        |JOIN keep USING (fp)
        |JOIN (SELECT doc_id, fp FROM fps WHERE side = 0) tr USING (fp)
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    // iters=0 centroids (first nlist by id), dist = vnrm - 2*dot + cnrm
    // with each term an exact DECIMAL(38,15) sum cast to DOUBLE (the
    // NOTES combination rule); assignment rn=1 == Spark's
    // min(struct(dist, cid)); probe and rerank tie-break (dist|cosine,
    // id) == topKPerQuery
    "q86_ivf_topk" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 16),
        |cn AS (SELECT cid, cv,
        |  CAST(list_sum(list_transform(cv,
        |    x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE) AS cnrm
        |  FROM cents),
        |vn AS (SELECT vec_id, embedding,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE) AS vnrm
        |  FROM embeddings),
        |ad AS (SELECT v.vec_id AS cand_id, c.cid,
        |  v.vnrm - 2*CAST(list_sum(list_transform(list_zip(v.embedding, c.cv),
        |      p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE) + c.cnrm AS dist
        |  FROM vn v CROSS JOIN cn c),
        |assign AS (SELECT cand_id, cid FROM
        |  (SELECT *, row_number() OVER (PARTITION BY cand_id ORDER BY dist ASC, cid ASC) AS rn FROM ad)
        |  WHERE rn = 1),
        |probes AS (SELECT query_id, cid FROM
        |  (SELECT cand_id AS query_id, cid, dist,
        |     row_number() OVER (PARTITION BY cand_id ORDER BY dist ASC, cid ASC) AS pr
        |   FROM ad WHERE cand_id < 8)
        |  WHERE pr <= 4),
        |norm AS (SELECT vec_id, embedding,
        |  list_sum(list_transform(embedding,
        |    x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings),
        |pairs AS (SELECT p.query_id, a.cand_id,
        |  CAST(list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE)
        |    / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) AS cosine
        |  FROM probes p JOIN assign a USING (cid)
        |  JOIN norm q ON q.vec_id = p.query_id
        |  JOIN norm c ON c.vec_id = a.cand_id
        |  WHERE a.cand_id <> p.query_id)
        |SELECT query_id, cand_id, CAST(CAST(cosine AS DECIMAL(38,6)) AS DOUBLE) AS cosine, CAST(rnk AS INT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
        |      FROM pairs) WHERE rnk <= 5""".stripMargin,
    // PQ: subvector slices per subspace j, iters=0 codebooks (first 16
    // by id), decimal-exact subspace distances, argmin codes (rn=1 ==
    // Spark's min(struct)), per-query LUT join on (j, code),
    // fixed-order pivot recombine — sum() over doubles would be
    // order-nondeterministic
    "q87_pq_topk" -> PqOracleSql,
    // the persisted-index path must be indistinguishable from direct
    // PQ: q127 runs the SAME oracle
    "q127_pq_indexed" -> PqOracleSql,

    // md5-parity hyperplanes (±1 by md5Hash60('lsh:p:d') % 2), plane
    // dots as exact DECIMAL(38,15) (float32 converts exactly → every
    // signature bit deterministic), 16-bit signature / 4 bands, shared
    // band-key candidates, q26's deterministic-cosine rerank
    "q84_lsh_topk" ->
      """WITH sig AS (SELECT vec_id, embedding,
        |  CAST(list_sum(list_transform(range(0,16), p ->
        |    CASE WHEN list_sum(list_transform(range(1, len(embedding)+1), i ->
        |      CAST(CAST(embedding[i] AS DOUBLE) *
        |        (CASE WHEN (('0x'||substring(md5('lsh:' || p || ':' || (i-1)),1,15))::BIGINT) % 2 = 0
        |              THEN 1.0 ELSE -1.0 END) AS DECIMAL(38,15)))) >= 0
        |         THEN (1::BIGINT << p) ELSE 0 END)) AS BIGINT) AS sig
        |  FROM embeddings),
        |keys AS (SELECT vec_id, band, (sig >> (band*4)) & 15 AS key
        |         FROM (SELECT vec_id, sig, unnest(range(0,4)) AS band FROM sig)),
        |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
        |         FROM keys q JOIN keys c ON q.band = c.band AND q.key = c.key
        |         WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |norm AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT cand.query_id, cand.cand_id,
        |    CAST(list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE)
        |      / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) AS cosine
        |  FROM cand JOIN norm q ON q.vec_id = cand.query_id
        |            JOIN norm c ON c.vec_id = cand.cand_id)
        |SELECT query_id, cand_id, CAST(CAST(cosine AS DECIMAL(38,6)) AS DOUBLE) AS cosine, CAST(rnk AS INT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
        |      FROM pairs) WHERE rnk <= 5""".stripMargin,
    // sum(BIGINT) is HUGEINT in DuckDB -> cast back so both engines
    // surface int64
    "q68_json_extract" ->
      """SELECT event_type,
        |  count(*) AS n_events,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    // exact integer repetition signals; inner join is safe because every
    // document has >= 2 tokens (bigram row always present)
    "q69_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tc AS (SELECT doc_id, w, count(*) AS c
        |       FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2),
        |tok AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |          count(*) AS n_distinct_tokens, max(c) AS top_token_cnt
        |        FROM tc GROUP BY 1),
        |gi AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i FROM t),
        |bc AS (SELECT doc_id, g, count(*) AS c
        |       FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g FROM gi) GROUP BY 1, 2),
        |big AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |          count(*) AS n_distinct_bigrams, max(c) AS top_bigram_cnt
        |        FROM bc GROUP BY 1)
        |SELECT tok.doc_id, n_tokens, n_distinct_tokens, top_token_cnt,
        |       COALESCE(n_bigrams, 0) AS n_bigrams,
        |       COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
        |       COALESCE(top_bigram_cnt, 0) AS top_bigram_cnt
        |FROM tok LEFT JOIN big ON tok.doc_id = big.doc_id""".stripMargin,
    // same bucketed greedy pack: cumulative tokens before each doc in its
    // stream, integer-divided by the budget
    "q70_seq_packing" ->
      """WITH s AS (SELECT doc_id, lang, doc_id % 8 AS bucket,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_before FROM s)
        |SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket, n_tokens,
        |  CAST(cum_before // 512 AS BIGINT) AS bin_id
        |FROM c""".stripMargin,
    // full winnowing chain on the md5-derived 60-bit hash (both engines
    // agree on md5): 3-gram hashes in document order, sliding min over
    // 4 (ROWS BETWEEN CURRENT AND 3 FOLLOWING mirrors Spark's
    // short-tail slice), positions capped at greatest(n-4,0)+1 so a doc
    // with fewer grams than the window still emits its single
    // whole-array min, DISTINCT per doc, df cap 50, inverted-index
    // self-join, minShared 2
    "q71_winnow_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, i, len(toks) - 2 AS n,
        |        ('0x' || substring(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-2)) AS i FROM t
        |            WHERE len(toks) >= 3)),
        |m AS (SELECT doc_id, i, n,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |      FROM g),
        |fps AS (SELECT DISTINCT doc_id, fp FROM m WHERE i <= greatest(n-4, 0) + 1),
        |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
        |f2 AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp)),
        |sizes AS (SELECT doc_id, count(*) AS n_fps FROM f2 GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |          FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT doc_a, doc_b, n_shared, sa.n_fps AS fps_a, sb.n_fps AS fps_b
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b""".stripMargin,
    // sign bits packed 32/word so DuckDB BIGINT arithmetic never
    // overflows; pure integer surface
    "q72_hamming_topk" ->
      """WITH sk AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1,33),
        |      i -> CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i-1)) ELSE 0 END)) AS BIGINT) AS w0,
        |    CAST(list_sum(list_transform(range(33,65),
        |      i -> CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i-33)) ELSE 0 END)) AS BIGINT) AS w1
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS hamming
        |  FROM sk q JOIN sk c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
        |SELECT query_id, cand_id, CAST(hamming AS INT) AS hamming, CAST(rnk AS INT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY hamming ASC, cand_id ASC) AS rnk FROM pairs)
        |WHERE rnk <= 5""".stripMargin,
    // same unsalted LCG as q52, full resolution; rank over (key, id)
    "q73_corpus_shuffle" ->
      """SELECT doc_id, lang, shuffle_key,
        |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS shuffle_rank
        |FROM (SELECT doc_id, lang,
        |        (doc_id * 1103515245 + 12345) % 1000000007 AS shuffle_key
        |      FROM documents)""".stripMargin,
    // exact 5-gram containment across the parity halves
    "q74_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, doc_id % 2 AS half,
        |        toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
        |        toks[i+3] || ' ' || toks[i+4] AS gram
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-4)) AS i FROM t)),
        |gd AS (SELECT DISTINCT doc_id, half, gram FROM g)
        |SELECT a.doc_id AS test_id, b.doc_id AS train_id, count(*) AS n_shared
        |FROM gd a JOIN gd b ON a.gram = b.gram AND a.half = 1 AND b.half = 0
        |GROUP BY 1, 2""".stripMargin,
    // same LCG per-mille key; integer-DIV rate — exact in both engines
    "q76_cap_per_group" ->
      """WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY 1)
        |SELECT doc_id, source FROM documents JOIN c USING (source)
        |WHERE ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 <
        |  CASE WHEN cnt <= 10 THEN 1000 ELSE (10 * 1000) // cnt END""".stripMargin,
    // nfc_normalize = Unicode canonical composition in both engines;
    // whitespace as the explicit ASCII class (Java \s != RE2 \s)
    "q77_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(nfc_normalize(lower(text)), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm_text,
        |  md5(trim(regexp_replace(nfc_normalize(lower(text)), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS norm_fp
        |FROM documents""".stripMargin,
    // q67's chunk CTE composed with q70's pack window
    "q78_chunk_pack" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |        unnest(generate_series(0, (len(toks)-1)//24)) AS chunk_id FROM t
        |      WHERE len(toks) >= 1),
        |ch AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |         CAST(least(chunk_id*24+32, len(toks)) - chunk_id*24 AS BIGINT) AS n_chunk_tokens
        |       FROM s),
        |p AS (SELECT doc_id, chunk_id, n_chunk_tokens,
        |        chunk_id * 1000000000000 + doc_id AS cid,
        |        (chunk_id * 1000000000000 + doc_id) % 8 AS bucket FROM ch),
        |c2 AS (SELECT *, sum(n_chunk_tokens) OVER (PARTITION BY bucket ORDER BY cid
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chunk_tokens AS cb FROM p)
        |SELECT doc_id, chunk_id, CAST(bucket AS BIGINT) AS bucket, n_chunk_tokens,
        |  CAST(cb // 512 AS BIGINT) AS bin_id
        |FROM c2""".stripMargin,
    // exact decimal component sums; 1-based subscripts shifted to match
    // posexplode's 0-based pos
    "q79_centroid_update" ->
      """SELECT label, CAST(i - 1 AS INT) AS pos,
        |  CAST(CAST(CAST(sum(CAST(CAST(e AS DOUBLE) AS DECIMAL(38,15))) AS DOUBLE) AS DECIMAL(38,6)) AS DOUBLE) AS sum_val,
        |  count(*) AS n
        |FROM (SELECT label, unnest(embedding) AS e,
        |        generate_subscripts(embedding, 1) AS i FROM embeddings)
        |GROUP BY 1, 2""".stripMargin,
    // top-50 vocabulary, total (cnt DESC, token ASC) order
    "q75_vocab" ->
      """SELECT w, cnt, CAST(rn AS INT) AS vocab_id
        |FROM (SELECT w, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, w ASC) AS rn
        |      FROM (SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |            FROM (SELECT unnest(string_split(text, ' ')) AS w
        |                  FROM documents) GROUP BY 1))
        |WHERE rn <= 50""".stripMargin,
    // q67's chunk CTE at (10, 10) as pseudo-paragraphs; keep-first = the
    // row_number-1 instance under (doc_id, pos) order (Spark's
    // min(struct) picks the same one); < 10-char paragraphs exempt;
    // string_agg ORDER BY pos rebuilds, LEFT JOIN keeps emptied docs
    "q88_para_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |        unnest(generate_series(0, (len(toks)-1)//10)) AS pos FROM t
        |      WHERE len(toks) >= 1),
        |paras AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |    array_to_string(toks[pos*10+1 : least(pos*10+10, len(toks))], ' ') AS para
        |  FROM s),
        |kept AS (
        |  SELECT doc_id, pos, para FROM (
        |    SELECT doc_id, pos, para,
        |           row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
        |    FROM paras WHERE length(para) >= 10) WHERE rn = 1
        |  UNION ALL
        |  SELECT doc_id, pos, para FROM paras WHERE length(para) < 10
        |),
        |agg AS (SELECT doc_id, string_agg(para, ' ' ORDER BY pos) AS text,
        |               count(*) AS n_kept FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.text, '') AS text,
        |       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // inclusive running token total in doc_id order; sum(BIGINT) is
    // HUGEINT in DuckDB -> cast back; budget boundary is exact integer
    // arithmetic in both engines
    "q89_token_budget" ->
      """WITH s AS (SELECT doc_id,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM s)
        |SELECT doc_id, n_tokens, cum FROM c WHERE cum <= 15000""".stripMargin,
    // same derived-rate formula in DuckDB integer math: target_g =
    // (total*share)//1000, rate_g = least(1000, target_g*1000//n_g),
    // LCG per-mille membership key as in q49/q52/q76
    "q90_mixture_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |r AS (SELECT lang, n,
        |        CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 150
        |                  WHEN 'es' THEN 100 WHEN 'de' THEN 50
        |                  WHEN 'fr' THEN 400 ELSE 0 END AS share
        |      FROM c)
        |SELECT doc_id, lang FROM documents JOIN (
        |  SELECT lang, CASE WHEN share = 0 THEN 0
        |    ELSE least(1000, ((200 * share) // 1000) * 1000 // n) END AS rate
        |  FROM r) rr USING (lang)
        |WHERE ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 < rate""".stripMargin,
    // sliding 10-gram windows (1-based list slices), distinct-doc df,
    // covered positions via a 0..9 offset cross join, ANTI JOIN scrub,
    // string_agg reassembly; LEFT JOIN keeps untouched and emptied docs
    "q91_span_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, i, array_to_string(toks[i:i+9], ' ') AS gram
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-9)) AS i FROM t
        |            WHERE len(toks) >= 10)),
        |f AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS df
        |                        FROM g GROUP BY 1) WHERE df >= 2),
        |sp AS (SELECT doc_id, i FROM g JOIN f USING (gram)),
        |cov AS (SELECT DISTINCT doc_id, i + o AS p
        |        FROM sp CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS o) os),
        |tok AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS p FROM t),
        |kept AS (SELECT tok.doc_id, tok.w, tok.p FROM tok
        |         ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p),
        |agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS text, count(*) AS nk
        |        FROM kept GROUP BY 1)
        |SELECT d.doc_id, COALESCE(a.text, '') AS text,
        |       CAST(d.orig - COALESCE(a.nk, 0) AS BIGINT) AS n_removed_tokens
        |FROM (SELECT doc_id, len(string_split(text, ' ')) AS orig FROM documents) d
        |LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // q88's dedup CTE -> q91's scrub CTE over the rebuilt text -> q89's
    // budget window; fully-scrubbed docs drop out of the token recount
    // (they have no kept2 rows), matching the Spark-side text<>'' filter
    "q92_curate_v2" ->
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s0 AS (SELECT doc_id, toks,
        |         unnest(generate_series(0, (len(toks)-1)//10)) AS pos FROM t0
        |       WHERE len(toks) >= 1),
        |paras AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |    array_to_string(toks[pos*10+1 : least(pos*10+10, len(toks))], ' ') AS para
        |  FROM s0),
        |kept1 AS (
        |  SELECT doc_id, pos, para FROM (
        |    SELECT doc_id, pos, para,
        |           row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
        |    FROM paras WHERE length(para) >= 10) WHERE rn = 1
        |  UNION ALL
        |  SELECT doc_id, pos, para FROM paras WHERE length(para) < 10),
        |d1 AS (SELECT doc_id, string_agg(para, ' ' ORDER BY pos) AS text
        |       FROM kept1 GROUP BY doc_id),
        |t1 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d1),
        |g AS (SELECT doc_id, i, array_to_string(toks[i:i+9], ' ') AS gram
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-9)) AS i FROM t1
        |            WHERE len(toks) >= 10)),
        |f AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS df
        |                        FROM g GROUP BY 1) WHERE df >= 2),
        |sp AS (SELECT doc_id, i FROM g JOIN f USING (gram)),
        |cov AS (SELECT DISTINCT doc_id, i + o AS p
        |        FROM sp CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS o) os),
        |tok AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS p FROM t1),
        |kept2 AS (SELECT tok.doc_id, tok.w, tok.p FROM tok
        |          ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p),
        |d2 AS (SELECT doc_id, count(*) AS n_tokens FROM kept2 GROUP BY doc_id),
        |c AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |        CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM d2)
        |SELECT doc_id, n_tokens, cum FROM c WHERE cum <= 12000""".stripMargin,
    // SemDeDup: q61's assignment recipe + q34's deterministic-cosine
    // pair recipe, pairs restricted to a shared centroid_id
    "q93_semantic_dedup" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        |corpus AS (
        |  SELECT vec_id, embedding FROM base
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding, x -> CAST(x * CAST(1.001 AS FLOAT) AS FLOAT)) AS embedding
        |  FROM base),
        |nv AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM corpus),
        |c AS (SELECT vec_id AS centroid_id, embedding AS cvec, nrm AS cnrm FROM nv WHERE vec_id < 8),
        |p AS (
        |  SELECT v.vec_id, c.centroid_id,
        |    CAST(v.nrm AS DOUBLE) + CAST(c.cnrm AS DOUBLE)
        |    - 2*CAST(list_sum(list_transform(list_zip(v.embedding, c.cvec),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE) AS dist2
        |  FROM nv v CROSS JOIN c),
        |asg AS (
        |  SELECT vec_id, centroid_id FROM (
        |    SELECT vec_id, centroid_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, centroid_id ASC) AS rn
        |    FROM p) WHERE rn = 1),
        |av AS (SELECT a.vec_id, a.centroid_id, n.embedding, n.nrm FROM asg a JOIN nv n USING (vec_id)),
        |losers AS (
        |  SELECT DISTINCT b.vec_id AS vec_id
        |  FROM av a JOIN av b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        |  WHERE CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE)
        |    / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) >= 0.999)
        |SELECT v.vec_id, v.centroid_id,
        |  CASE WHEN l.vec_id IS NULL THEN 1 ELSE 0 END AS keep
        |FROM asg v LEFT JOIN losers l ON v.vec_id = l.vec_id""".stripMargin,
    // q82's component closure resolved to the max-token (tie min-id)
    // member; score compared as DOUBLE on both sides (integer-valued)
    "q94_cluster_best" ->
      """WITH RECURSIVE raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, i, len(toks) - 2 AS n,
        |        ('0x' || substring(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-2)) AS i FROM raw
        |            WHERE len(toks) >= 3)),
        |m AS (SELECT doc_id, i, n,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |      FROM g),
        |fps AS (SELECT DISTINCT doc_id, fp FROM m WHERE i <= greatest(n-4, 0) + 1),
        |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
        |f2 AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp)),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |      UNION SELECT doc_b, doc_a FROM pairs),
        |walk AS (
        |  SELECT src AS node, src AS lbl FROM e
        |  UNION
        |  SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node),
        |comp AS (SELECT node AS doc_id, min(lbl) AS comp_id FROM walk GROUP BY node),
        |tc AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS sc FROM documents),
        |j AS (SELECT c.doc_id, c.comp_id, t.sc FROM comp c JOIN tc t USING (doc_id)),
        |mx AS (SELECT comp_id, max(sc) AS ms FROM j GROUP BY comp_id),
        |best AS (SELECT j.comp_id, min(j.doc_id) AS survivor_id
        |         FROM j JOIN mx ON j.comp_id = mx.comp_id AND j.sc = mx.ms
        |         GROUP BY j.comp_id)
        |SELECT j.doc_id, j.comp_id, b.survivor_id
        |FROM j JOIN best b ON j.comp_id = b.comp_id""".stripMargin,
    // q90's rate derivation over token SUMS instead of row counts
    "q95_token_mixture" ->
      """WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks FROM documents),
        |c AS (SELECT lang, sum(n_toks) AS w FROM d GROUP BY 1),
        |r AS (SELECT lang, w,
        |        CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 150
        |                  WHEN 'es' THEN 100 WHEN 'de' THEN 50
        |                  WHEN 'fr' THEN 400 ELSE 0 END AS share
        |      FROM c),
        |rr AS (SELECT lang, CASE WHEN share = 0 OR w <= 0 THEN 0
        |        ELSE least(1000, ((12000 * share) // 1000) * 1000 // w) END AS rate FROM r)
        |SELECT doc_id, lang, n_toks FROM d JOIN rr USING (lang)
        |WHERE ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 < rate""".stripMargin,
    // q75's vocab construction at k=20 + a left join onto the token
    // stream; counts stay integers (no tie-prone ratio)
    "q96_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (SELECT w FROM (SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w ASC) AS rn
        |      FROM (SELECT w, count(*) AS cnt FROM tok GROUP BY 1)) WHERE rn <= 20)
        |SELECT doc_id, count(*) AS n_tokens,
        |       count(*) FILTER (WHERE v.w IS NULL) AS n_oov
        |FROM tok LEFT JOIN v ON tok.w = v.w
        |GROUP BY doc_id""".stripMargin,
    // LCG-derived weight table + md5-derived bucket hashing; exact
    // decimal weight sums surfaced as DOUBLE
    "q97_quality_classifier" ->
      """WITH wt AS (
        |  SELECT i AS bucket,
        |    CAST(CAST((i*1103515245 + 12345) % 1000000007 % 2001 - 1000 AS DECIMAL(27,4))
        |         / CAST(1000 AS DECIMAL(27,4)) AS DECIMAL(18,6)) AS w6
        |  FROM range(0, 64) t(i)),
        |tok AS (
        |  SELECT doc_id,
        |    (('0x' || substring(md5(tk), 1, 15))::BIGINT) % 64 AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents))
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(CAST(sum(w6) AS DECIMAL(38,6)) AS DOUBLE) AS score
        |FROM tok JOIN wt USING (bucket)
        |GROUP BY doc_id""".stripMargin,
    // weights learned from the target/raw bucket counts (add-one
    // smoothing over the 128-bucket spine); pre-log rational ratio via
    // the q62 decimal-division recipe; exact decimal score sums
    "q98_dsir_score" ->
      """WITH tokr AS (
        |  SELECT doc_id, (('0x' || substring(md5(tk), 1, 15))::BIGINT) % 128 AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents)),
        |tokt AS (SELECT bucket FROM tokr WHERE doc_id % 7 = 0),
        |tc AS (SELECT bucket, count(*) AS t FROM tokt GROUP BY bucket),
        |rc AS (SELECT bucket, count(*) AS r FROM tokr GROUP BY bucket),
        |tt AS (SELECT count(*) + 128 AS tot_t FROM tokt),
        |rt AS (SELECT count(*) + 128 AS tot_r FROM tokr),
        |wt AS (
        |  SELECT i AS bucket,
        |    CAST(CAST(CAST(COALESCE(tc.t, 0) + 1 AS DECIMAL(19,0)) * CAST(rt.tot_r AS DECIMAL(19,0)) AS DECIMAL(27,4))
        |       / CAST(CAST(COALESCE(rc.r, 0) + 1 AS DECIMAL(19,0)) * CAST(tt.tot_t AS DECIMAL(19,0)) AS DECIMAL(27,4))
        |       AS DECIMAL(18,6)) AS w6
        |  FROM range(0, 128) s(i)
        |  LEFT JOIN tc ON tc.bucket = i LEFT JOIN rc ON rc.bucket = i
        |  CROSS JOIN tt CROSS JOIN rt)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(CAST(sum(w6) AS DECIMAL(38,6)) AS DOUBLE) AS score
        |FROM tokr JOIN wt USING (bucket)
        |GROUP BY doc_id""".stripMargin,
    // distinct trigrams per doc via the md5-hashed gram key; df=1 =
    // novel; integer counts only (no cross-engine division)
    "q99_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-2)) AS i FROM t)),
        |gd AS (SELECT DISTINCT doc_id,
        |        (('0x' || substring(md5(gram), 1, 15))::BIGINT) AS gh FROM g),
        |dfx AS (SELECT gh, count(*) AS df FROM gd GROUP BY gh)
        |SELECT doc_id, count(*) AS n_grams,
        |       count(*) FILTER (WHERE df = 1) AS n_novel
        |FROM gd JOIN dfx USING (gh)
        |GROUP BY doc_id""".stripMargin,
    // q98's weight/score CTEs + top-200 on the EXACT decimal sum
    // (ties broken by doc_id) — surfaced as DOUBLE after selection
    "q100_dsir_select" ->
      """WITH tokr AS (
        |  SELECT doc_id, (('0x' || substring(md5(tk), 1, 15))::BIGINT) % 128 AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents)),
        |tokt AS (SELECT bucket FROM tokr WHERE doc_id % 7 = 0),
        |tc AS (SELECT bucket, count(*) AS t FROM tokt GROUP BY bucket),
        |rc AS (SELECT bucket, count(*) AS r FROM tokr GROUP BY bucket),
        |tt AS (SELECT count(*) + 128 AS tot_t FROM tokt),
        |rt AS (SELECT count(*) + 128 AS tot_r FROM tokr),
        |wt AS (
        |  SELECT i AS bucket,
        |    CAST(CAST(CAST(COALESCE(tc.t, 0) + 1 AS DECIMAL(19,0)) * CAST(rt.tot_r AS DECIMAL(19,0)) AS DECIMAL(27,4))
        |       / CAST(CAST(COALESCE(rc.r, 0) + 1 AS DECIMAL(19,0)) * CAST(tt.tot_t AS DECIMAL(19,0)) AS DECIMAL(27,4))
        |       AS DECIMAL(18,6)) AS w6
        |  FROM range(0, 128) s(i)
        |  LEFT JOIN tc ON tc.bucket = i LEFT JOIN rc ON rc.bucket = i
        |  CROSS JOIN tt CROSS JOIN rt),
        |scored AS (
        |  SELECT doc_id, count(*) AS n_tokens, CAST(sum(w6) AS DECIMAL(38,6)) AS s6
        |  FROM tokr JOIN wt USING (bucket)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_tokens, CAST(s6 AS DOUBLE) AS score
        |FROM scored ORDER BY s6 DESC, doc_id ASC LIMIT 200""".stripMargin,
    // sqrt is IEEE-correctly-rounded in both engines; n^0.5 rounds
    // once to DECIMAL(27,6) (double→decimal rounds in both), exact
    // decimal total, one double multiply/divide/floor, per-mille DIV
    "q101_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents WHERE lang IS NOT NULL GROUP BY 1),
        |s AS (SELECT lang, cnt, CAST(sqrt(cnt) AS DECIMAL(27,6)) AS sq FROM c),
        |tt AS (SELECT CAST(sum(sq) AS DOUBLE) AS tot FROM s),
        |r AS (SELECT lang, cnt,
        |        CAST(floor(250.0 * CAST(sq AS DOUBLE) / tot) AS BIGINT) AS kg
        |      FROM s CROSS JOIN tt),
        |rr AS (SELECT lang, least(1000, (kg * 1000) // cnt) AS rate FROM r)
        |SELECT doc_id, documents.lang FROM documents JOIN rr USING (lang)
        |WHERE ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 < rate""".stripMargin,
    // exact quota = the row_number the operator exists to avoid — fine
    // as an oracle, the engines agree on the integer (key, id) order
    "q102_cap_exact" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY (doc_id * 1103515245 + 12345) % 1000000007,
        |                    doc_id) AS rn
        |  FROM documents) WHERE rn <= 70""".stripMargin,
    // the q111 keep rule aggregated per language — the streaming run
    // replays to exactly this batch result
    "q121_stream_quality" ->
      """WITH c AS (
        |  SELECT lang,
        |    len(regexp_extract_all(text, '\S+')) AS w,
        |    len(regexp_extract_all(text, '\S')) AS ch,
        |    len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS sym,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE len(regexp_extract_all(text, '\n')) + 1 END AS ln,
        |    len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]')) AS bl,
        |    len(regexp_extract_all(text, '(?m)\.\.\.$')) AS el,
        |    len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS aw,
        |    (CASE WHEN len(regexp_extract_all(text, '(?i)\bthe\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bbe\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bto\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bof\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\band\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bthat\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bhave\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bwith\b')) > 0 THEN 1 ELSE 0 END) AS st
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN w BETWEEN 30 AND 100000
        |        AND ch >= 3*w AND ch <= 10*w
        |        AND 1000*sym <= 100*w AND 1000*bl <= 900*ln AND 1000*el <= 300*ln
        |        AND 1000*aw >= 800*w AND st >= 1
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |FROM c GROUP BY lang""".stripMargin,
    // q75's vocab fragment at k=20, positional token join, per-doc
    // string_agg in token order
    "q120_vocab_encode" ->
      """WITH v AS (
        |  SELECT w, CAST(rn AS INT) AS vocab_id
        |  FROM (SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w ASC) AS rn
        |        FROM (SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |              FROM (SELECT unnest(string_split(text, ' ')) AS w
        |                    FROM documents) GROUP BY 1))
        |  WHERE rn <= 20),
        |tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS w,
        |         unnest(range(0, len(string_split(text,' ')))) AS pos FROM documents),
        |j AS (SELECT doc_id, pos, COALESCE(v.vocab_id, 0) AS tid
        |      FROM tk LEFT JOIN v USING (w))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  string_agg(tid::VARCHAR, ' ' ORDER BY pos) AS ids
        |FROM j GROUP BY 1""".stripMargin,
    // naive token-level mirror of the fragment shape: cumulative doc
    // offsets -> absolute positions -> pos//64 blocks, string_agg in
    // position order
    "q118_token_blocks" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') || ['<eos>'] AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tok, unnest(range(1, len(toks)+1)) AS i FROM t),
        |off AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM t),
        |cum AS (SELECT doc_id, sum(n) OVER (ORDER BY doc_id) - n AS strt FROM off),
        |p AS (SELECT k.doc_id, c.strt + k.i - 1 AS pos, k.tok FROM tok k JOIN cum c USING (doc_id)),
        |b AS (SELECT CAST(pos // 64 AS BIGINT) AS block_id, doc_id, pos, tok FROM p),
        |fr AS (SELECT block_id, doc_id, min(pos) AS f, count(*) AS flen FROM b GROUP BY 1, 2),
        |sp AS (SELECT block_id,
        |         string_agg((f - block_id*64)::VARCHAR || ':' || flen::VARCHAR, ',' ORDER BY f) AS spans
        |       FROM fr GROUP BY 1),
        |tx AS (SELECT block_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |         string_agg(tok, ' ' ORDER BY pos) AS text FROM b GROUP BY 1)
        |SELECT block_id, n_tokens, text, spans FROM tx JOIN sp USING (block_id)""".stripMargin,
    // salt-e LCG keys (the salted second-stage multiplier), per-epoch
    // row_number
    "q119_epoch_shuffle" ->
      """WITH e AS (SELECT unnest(range(1,3)) AS epoch),
        |k AS (SELECT d.doc_id, e.epoch,
        |  (((d.doc_id + e.epoch) * 1103515245 + 12345) % 1000000007 * (1664525 + e.epoch) + 1013904223) % 1000000007 AS sk
        |  FROM documents d CROSS JOIN e)
        |SELECT doc_id, CAST(epoch AS INT) AS epoch,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY sk, doc_id) AS BIGINT) AS epoch_rank
        |FROM k""".stripMargin,
    // gopher keep -> min-id dedup -> winnow components -> rep-keyed
    // split -> train-side consecutive batching (the q111/q20/q113/q114
    // fragments composed)
    "q117_curate_v3" ->
      """WITH RECURSIVE q AS (
        |  SELECT doc_id, text,
        |    len(regexp_extract_all(text, '\S+')) AS w,
        |    len(regexp_extract_all(text, '\S')) AS ch,
        |    len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS sym,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE len(regexp_extract_all(text, '\n')) + 1 END AS ln,
        |    len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]')) AS bl,
        |    len(regexp_extract_all(text, '(?m)\.\.\.$')) AS el,
        |    len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS aw,
        |    (CASE WHEN len(regexp_extract_all(text, '(?i)\bthe\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bbe\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bto\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bof\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\band\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bthat\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bhave\b')) > 0 THEN 1 ELSE 0 END +
        |     CASE WHEN len(regexp_extract_all(text, '(?i)\bwith\b')) > 0 THEN 1 ELSE 0 END) AS st
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, text FROM q
        |  WHERE w BETWEEN 30 AND 100000 AND ch >= 3*w AND ch <= 10*w
        |    AND 1000*sym <= 100*w AND 1000*bl <= 900*ln AND 1000*el <= 300*ln
        |    AND 1000*aw >= 800*w AND st >= 1),
        |uniq AS (SELECT min(doc_id) AS doc_id, text FROM kept GROUP BY text),
        |raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM uniq),
        |g AS (SELECT doc_id, i, len(toks) - 2 AS n,
        |        ('0x' || substring(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-2)) AS i FROM raw
        |            WHERE len(toks) >= 3)),
        |m AS (SELECT doc_id, i, n,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |      FROM g),
        |fps AS (SELECT DISTINCT doc_id, fp FROM m WHERE i <= greatest(n-4, 0) + 1),
        |keepf AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
        |f2 AS (SELECT doc_id, fp FROM fps JOIN keepf USING (fp)),
        |prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |        FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |        GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |      UNION SELECT doc_b, doc_a FROM prs),
        |walk AS (
        |  SELECT src AS node, src AS lbl FROM e
        |  UNION
        |  SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node),
        |comp AS (SELECT node AS doc_id, min(lbl) AS comp_id FROM walk GROUP BY node),
        |sel AS (SELECT u.doc_id,
        |          CAST(len(string_split(u.text, ' ')) AS BIGINT) AS n_tokens,
        |          CAST(COALESCE(c.comp_id, u.doc_id) AS BIGINT) AS rep
        |        FROM uniq u LEFT JOIN comp c ON c.doc_id = u.doc_id),
        |k AS (SELECT *, ((rep * 1103515245 + 12345) % 1000000007) % 1000 AS key FROM sel),
        |sp AS (SELECT doc_id, n_tokens, rep,
        |         CASE WHEN key < 900 THEN 'train' WHEN key < 950 THEN 'val' ELSE 'test' END AS split
        |       FROM k),
        |tr AS (SELECT doc_id, n_tokens, rep, split,
        |         CAST((row_number() OVER (ORDER BY n_tokens, doc_id) - 1) // 32 AS BIGINT) AS batch_id
        |       FROM sp WHERE split = 'train')
        |SELECT doc_id, n_tokens, rep, split, CAST(-1 AS BIGINT) AS batch_id FROM sp WHERE split <> 'train'
        |UNION ALL
        |SELECT doc_id, n_tokens, rep, split, batch_id FROM tr""".stripMargin,
    // q66's bigram-model fragment -> integer micro-average -> ntile
    "q115_ppl_buckets" ->
      """WITH mg AS (
        |  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM documents),
        |mbg AS (SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM mg),
        |cab AS (SELECT w1, w2, count(*) AS pair_cnt FROM mbg GROUP BY 1, 2),
        |ca AS (SELECT w1, CAST(sum(pair_cnt) AS BIGINT) AS head_cnt FROM cab GROUP BY 1),
        |model AS (SELECT cab.w1, cab.w2,
        |  CAST(CAST(pair_cnt AS DECIMAL(18,4)) / CAST(head_cnt AS DECIMAL(18,4)) AS DECIMAL(18,6)) AS p6
        |  FROM cab JOIN ca USING (w1)),
        |dbg0 AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM documents),
        |dbg AS (SELECT doc_id, string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM dbg0),
        |sc AS (SELECT d.doc_id, coalesce(m.p6, CAST(0 AS DECIMAL(18,6))) AS p6
        |       FROM dbg d LEFT JOIN model m ON d.w1 = m.w1 AND d.w2 = m.w2),
        |agg AS (SELECT doc_id, CAST(sum(p6) AS DECIMAL(38,6)) AS sum_p6, count(*) AS n_bigrams FROM sc GROUP BY 1),
        |av AS (SELECT doc_id,
        |  CASE WHEN n_bigrams > 0 THEN CAST(sum_p6 * 1000000 AS BIGINT) // n_bigrams ELSE -1 END AS avg_micro
        |  FROM agg)
        |SELECT doc_id, CAST(avg_micro AS BIGINT) AS avg_micro,
        |  CAST(ntile(3) OVER (ORDER BY avg_micro DESC, doc_id) AS INT) AS bucket
        |FROM av""".stripMargin,
    // q26's decimal-cosine top-5 joined to same-label qrels; integer
    // metrics (reciprocal rank in micro units via floor division)
    "q116_retrieval_eval" ->
      """WITH norm AS (
        |  SELECT vec_id, embedding, label,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE)
        |      / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) AS cosine
        |  FROM norm q JOIN norm c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |res AS (SELECT query_id, cand_id, rnk FROM
        |  (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
        |   FROM pairs) WHERE rnk <= 5),
        |qrels AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id
        |          FROM embeddings q JOIN embeddings c
        |            ON q.vec_id < 8 AND c.vec_id <> q.vec_id AND q.label = c.label),
        |h AS (SELECT r.query_id, count(*) AS hits, min(r.rnk) AS fr
        |      FROM res r JOIN qrels USING (query_id, cand_id) GROUP BY 1),
        |nr AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY 1)
        |SELECT q.query_id,
        |  CAST(coalesce(nr.n_rel, 0) AS BIGINT) AS n_rel,
        |  CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
        |  CAST(coalesce(h.fr, 0) AS INT) AS first_rank,
        |  CAST(CASE WHEN h.fr IS NOT NULL THEN 1000000 // h.fr ELSE 0 END AS BIGINT) AS rr_micro
        |FROM (SELECT DISTINCT query_id FROM res) q
        |LEFT JOIN nr ON nr.query_id = q.query_id
        |LEFT JOIN h ON h.query_id = q.query_id""".stripMargin,
    // content-hash classify across the simulated next crawl; text
    // equality stands in for the engine-local xxhash64 equality
    "q112_corpus_diff" ->
      """WITH newc AS (
        |  SELECT doc_id, CASE WHEN doc_id % 10 = 0 THEN text || ' mutated' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text = n.text THEN 'unchanged' ELSE 'changed' END AS status
        |FROM documents o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id""".stripMargin,
    // q82's recursive-CTE component chain, then the cluster-rep LCG
    // split (q49's key formula on the rep, not the doc)
    "q113_leak_split" ->
      """WITH RECURSIVE raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, i, len(toks) - 2 AS n,
        |        ('0x' || substring(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT AS h
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks)-2)) AS i FROM raw
        |            WHERE len(toks) >= 3)),
        |m AS (SELECT doc_id, i, n,
        |        min(h) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |      FROM g),
        |fps AS (SELECT DISTINCT doc_id, fp FROM m WHERE i <= greatest(n-4, 0) + 1),
        |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
        |f2 AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp)),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |      UNION SELECT doc_b, doc_a FROM pairs),
        |walk AS (
        |  SELECT src AS node, src AS lbl FROM e
        |  UNION
        |  SELECT e.dst, w.lbl FROM walk w JOIN e ON e.src = w.node),
        |comp AS (SELECT node AS doc_id, min(lbl) AS comp_id FROM walk GROUP BY node),
        |sel AS (SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS rep
        |        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
        |k AS (SELECT doc_id, CAST(rep AS BIGINT) AS rep,
        |        ((rep * 1103515245 + 12345) % 1000000007) % 1000 AS key FROM sel)
        |SELECT doc_id, rep,
        |  CASE WHEN key < 900 THEN 'train' WHEN key < 950 THEN 'val' ELSE 'test' END AS split
        |FROM k""".stripMargin,
    // consecutive 32-runs in (n_tokens, doc_id) order; sum(BIGINT) is
    // HUGEINT in DuckDB -> cast back
    "q114_length_batches" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY n_tokens, doc_id) AS rn FROM d)
        |SELECT CAST((rn - 1) // 32 AS BIGINT) AS batch_id,
        |  count(*) AS n_rows, max(n_tokens) AS max_len,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_len,
        |  CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS waste
        |FROM r GROUP BY 1""".stripMargin,
    // Gopher battery: integer counts + cross-multiplied keep rule;
    // patterns in the Java∩RE2 subset, (?m)/(?i) inline flags shared
    "q111_gopher" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '\S')) AS INT) AS n_word_chars,
        |    CAST(len(regexp_extract_all(text, '#')) AS INT) AS n_hash,
        |    CAST(len(regexp_extract_all(text, '\.\.\.')) AS INT) AS n_ellipsis,
        |    CAST(CASE WHEN length(text) = 0 THEN 0
        |              ELSE len(regexp_extract_all(text, '\n')) + 1 END AS INT) AS n_lines,
        |    CAST(len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]')) AS INT) AS n_bullet_lines,
        |    CAST(len(regexp_extract_all(text, '(?m)\.\.\.$')) AS INT) AS n_ellipsis_lines,
        |    CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS INT) AS n_alpha_words,
        |    CAST(CASE WHEN len(regexp_extract_all(text, '(?i)\bthe\b')) > 0 THEN 1 ELSE 0 END +
        |         CASE WHEN len(regexp_extract_all(text, '(?i)\bbe\b')) > 0 THEN 1 ELSE 0 END +
        |         CASE WHEN len(regexp_extract_all(text, '(?i)\bto\b')) > 0 THEN 1 ELSE 0 END +
        |         CASE WHEN len(regexp_extract_all(text, '(?i)\bof\b')) > 0 THEN 1 ELSE 0 END +
        |         CASE WHEN len(regexp_extract_all(text, '(?i)\band\b')) > 0 THEN 1 ELSE 0 END +
        |         CASE WHEN len(regexp_extract_all(text, '(?i)\bthat\b')) > 0 THEN 1 ELSE 0 END +
        |         CASE WHEN len(regexp_extract_all(text, '(?i)\bhave\b')) > 0 THEN 1 ELSE 0 END +
        |         CASE WHEN len(regexp_extract_all(text, '(?i)\bwith\b')) > 0 THEN 1 ELSE 0 END AS INT)
        |      AS n_stopwords_present
        |  FROM documents)
        |SELECT *,
        |  CAST(CASE WHEN n_words BETWEEN 30 AND 100000
        |        AND n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
        |        AND 1000 * (n_hash + n_ellipsis) <= 100 * n_words
        |        AND 1000 * n_bullet_lines <= 900 * n_lines
        |        AND 1000 * n_ellipsis_lines <= 300 * n_lines
        |        AND 1000 * n_alpha_words >= 800 * n_words
        |        AND n_stopwords_present >= 1
        |       THEN 1 ELSE 0 END AS INT) AS keep
        |FROM c""".stripMargin,
    // SQ8: per-dim min/span stats, floor-clamped affine codes, exact
    // query vs dequantized candidates, the q86/q87 decimal sq-dist
    // recipe — every step a selection, exact integer, or chain of
    // correctly-rounded IEEE ops, so production and oracle agree
    "q110_sq_topk" -> Sq8OracleSql,
    // planted 15-token sub-docs; distinct 3-grams, df<=100 cap,
    // ordered inverted-index join, 1000*shared >= 800*|A|
    "q123_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string((string_split(text,' '))[1:15], ' ') AS text
        |  FROM documents WHERE doc_id % 5 = 0),
        |t AS (SELECT doc_id, string_split(text,' ') AS toks FROM corpus),
        |g0 AS (SELECT DISTINCT doc_id, gram FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks)-1),
        |     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
        |  FROM t WHERE len(toks) >= 3)),
        |keep AS (SELECT gram FROM g0 GROUP BY gram HAVING count(*) <= 100),
        |g AS (SELECT doc_id, gram FROM g0 JOIN keep USING (gram)),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
        |      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
        |      GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b, p.n_shared, s.n_grams AS grams_a
        |FROM p JOIN sizes s ON s.doc_id = p.doc_a
        |WHERE 1000 * p.n_shared >= 800 * s.n_grams""".stripMargin,
    // integer totals + one decimal-recipe division (subwords/words);
    // regexp classes are the Java∩RE2 q21/q29 patterns
    "q124_fertility" ->
      """WITH d AS (
        |  SELECT lang,
        |    len(regexp_extract_all(text, '\S+')) AS w,
        |    len(regexp_extract_all(text, '\p{L}{1,4}|\p{N}{1,3}|[^\s\p{L}\p{N}]')) AS s,
        |    length(text) AS c
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS n_words,
        |  CAST(sum(s) AS BIGINT) AS n_subwords, CAST(sum(c) AS BIGINT) AS n_chars,
        |  CASE WHEN sum(w) > 0 THEN
        |    CAST(CAST(CAST(sum(s) AS DECIMAL(27,4)) / CAST(sum(w) AS DECIMAL(27,4))
        |         AS DECIMAL(18,6)) AS DOUBLE) END AS fertility
        |FROM d GROUP BY lang""".stripMargin,
    // per-lang distinct-2: md5Hash60 gram keys (the q99 bridge), ttr
    // via the decimal recipe
    "q125_distinct_ngrams" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT lang,
        |        (('0x' || substring(md5(toks[i] || ' ' || toks[i+1]), 1, 15))::BIGINT) AS gh
        |      FROM (SELECT lang, toks, unnest(generate_series(1, len(toks)-1)) AS i
        |            FROM t WHERE len(toks) >= 2)),
        |pg AS (SELECT lang, gh, count(*) AS cnt FROM g GROUP BY 1, 2)
        |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_grams,
        |  count(*) AS n_distinct,
        |  CAST(CAST(CAST(count(*) AS DECIMAL(27,4)) / CAST(sum(cnt) AS DECIMAL(27,4))
        |       AS DECIMAL(18,6)) AS DOUBLE) AS ttr
        |FROM pg GROUP BY lang""".stripMargin,
    // forward/backward top-4 neighborhoods over the even<400 → odd
    // split; margin = 2·kf·kb·cos6 / (sf·kb + sb·kf), the q22 division
    "q126_margin_mining" ->
      """WITH norm AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings),
        |cosf AS (
        |  SELECT s.vec_id AS query_id, t.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(list_zip(s.embedding, t.embedding),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE)
        |      / sqrt(CAST(s.nrm AS DOUBLE) * CAST(t.nrm AS DOUBLE)) AS cosine
        |  FROM norm s JOIN norm t
        |    ON s.vec_id % 2 = 0 AND s.vec_id < 400 AND t.vec_id % 2 = 1),
        |fwdk AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, cand_id ASC) AS rnk FROM cosf)
        |  WHERE rnk <= 4),
        |fstats AS (
        |  SELECT query_id, CAST(sum(CAST(cosine AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sf,
        |         count(*) AS kf
        |  FROM fwdk GROUP BY 1),
        |bstats AS (
        |  SELECT cand_id, CAST(sum(CAST(cosine AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS sb,
        |         count(*) AS kb
        |  FROM (SELECT *, row_number() OVER (PARTITION BY cand_id
        |          ORDER BY cosine DESC, query_id ASC) AS brnk FROM cosf)
        |  WHERE brnk <= 4 GROUP BY 1)
        |SELECT f.query_id, f.cand_id,
        |  CAST(CAST(f.cosine AS DECIMAL(38,6)) AS DOUBLE) AS cosine,
        |  CAST(f.rnk AS INT) AS rnk,
        |  CASE WHEN (sf*kb + sb*kf) > 0 THEN
        |    CAST(CAST(CAST(CAST(f.cosine AS DECIMAL(18,6)) * kf * kb * 2 AS DECIMAL(18,6))
        |         / CAST(sf*kb + sb*kf AS DECIMAL(18,6)) AS DECIMAL(38,6)) AS DOUBLE) END AS margin
        |FROM fwdk f JOIN fstats USING (query_id) JOIN bstats USING (cand_id)""".stripMargin,
    // the persisted-index path must be indistinguishable from direct
    // SQ8: q122 runs the SAME oracle
    "q122_sq_indexed" -> Sq8OracleSql,
    // streamed probe of the stored SQ8 codes: finite replay ==> union
    // of micro-batch results == the batch run == q110's oracle
    "q128_stream_ann" -> Sq8OracleSql,

    // novel = not in the even-seeded index, min id within the batch
    "q109_stream_dedup_ingest" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |novel AS (
        |  SELECT doc_id, text FROM all_docs d
        |  WHERE NOT EXISTS (SELECT 1 FROM documents e
        |                    WHERE e.doc_id % 2 = 0 AND e.text = d.text))
        |SELECT min(doc_id) AS doc_id, text FROM novel GROUP BY text""".stripMargin,
    // ntile + within-stage LCG shuffle + epoch row_number
    "q108_curriculum" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM documents),
        |st AS (SELECT doc_id, n_toks,
        |         CAST(ntile(4) OVER (ORDER BY n_toks, doc_id) AS INT) AS stage FROM d),
        |k AS (SELECT *, (doc_id*1103515245+12345) % 1000000007 AS sk FROM st)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, stage,
        |  CAST(row_number() OVER (ORDER BY stage, sk, doc_id) AS BIGINT) AS epoch_rank
        |FROM k""".stripMargin,
    // per-(lang, band) type/occurrence counts; bin() agrees bit-for-bit
    "q107_freq_spectrum" ->
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT lang, w, count(*) AS cnt FROM w GROUP BY 1, 2)
        |SELECT lang, CAST(length(bin(cnt)) - 1 AS INT) AS band,
        |  count(*) AS n_types, CAST(sum(cnt) AS BIGINT) AS n_occurrences
        |FROM c GROUP BY 1, 2""".stripMargin,
    // brute-force the water level over generate_series (fixture-scale),
    // then the same largest-remainder caps and per-group rank filter
    "q106_water_fill" ->
      """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
        |lv AS (SELECT unnest(generate_series(0, 293)) AS l),
        |sp AS (SELECT l, sum(least(cnt, l)) AS spend FROM lv CROSS JOIN c GROUP BY l),
        |lam AS (SELECT max(l) AS lambda FROM sp WHERE spend <= 293),
        |s2 AS (SELECT lambda, (SELECT sum(least(cnt, lambda)) FROM c) AS spent FROM lam),
        |capped AS (SELECT lang, row_number() OVER (ORDER BY lang) AS rk
        |           FROM c CROSS JOIN lam WHERE cnt > lambda),
        |caps AS (SELECT c.lang,
        |           least(cnt, lambda) +
        |             COALESCE(CASE WHEN rk <= 293 - spent THEN 1 ELSE 0 END, 0) AS cap
        |         FROM c CROSS JOIN s2 LEFT JOIN capped USING (lang)),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY (doc_id*1103515245+12345) % 1000000007, doc_id) AS rn
        |      FROM documents)
        |SELECT doc_id, r.lang FROM r JOIN caps ON r.lang = caps.lang WHERE rn <= cap""".stripMargin,
    // q26's decimal-cosine recipe + the label-inequality join condition
    "q105_hard_negatives" ->
      """WITH norm AS (
        |  SELECT vec_id, label, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE) AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings WHERE label IS NOT NULL),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) AS DECIMAL(38,15)))) AS DOUBLE)
        |      / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) AS cosine
        |  FROM norm q JOIN norm c ON q.vec_id < 8 AND c.vec_id <> q.vec_id AND c.label <> q.label)
        |SELECT query_id, cand_id, CAST(CAST(cosine AS DECIMAL(38,6)) AS DOUBLE) AS cosine, CAST(rnk AS INT) AS rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
        |      FROM pairs) WHERE rnk <= 5""".stripMargin,
    // per-source ranks → integer virtual time → epoch order; the oracle
    // may use the windows the operator exists to avoid
    "q103_interleave" ->
      """WITH w(source, wt) AS (VALUES ('src0', 1), ('src1', 2), ('src2', 4)),
        |r AS (SELECT doc_id, d.source, wt,
        |        CAST(row_number() OVER (PARTITION BY d.source
        |          ORDER BY (doc_id * 1103515245 + 12345) % 1000000007, doc_id) AS BIGINT) AS src_rank
        |      FROM documents d JOIN w USING (source)),
        |v AS (SELECT doc_id, source, src_rank, (src_rank * 1000000) // wt AS vt FROM r)
        |SELECT doc_id, source, src_rank, vt,
        |  CAST(row_number() OVER (ORDER BY vt, source, src_rank) AS BIGINT) AS epoch_rank
        |FROM v""".stripMargin,
    // q78's CTE + chunk text, assembled per bin: string_agg(... ORDER BY
    // cid) mirrors the array_sort reassembly; the sum casts to BIGINT
    // (DuckDB's int128 sum renders as float through the driver's path)
    "q104_pack_assemble" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |        unnest(generate_series(0, (len(toks)-1)//24)) AS chunk_id FROM t
        |      WHERE len(toks) >= 1),
        |ch AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |         CAST(least(chunk_id*24+32, len(toks)) - chunk_id*24 AS BIGINT) AS n_chunk_tokens,
        |         array_to_string(toks[chunk_id*24+1 : chunk_id*24+32], ' ') AS chunk_text
        |       FROM s),
        |p AS (SELECT *, chunk_id * 1000000000000 + doc_id AS cid,
        |        (chunk_id * 1000000000000 + doc_id) % 8 AS bucket FROM ch),
        |c2 AS (SELECT *, sum(n_chunk_tokens) OVER (PARTITION BY bucket ORDER BY cid
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chunk_tokens AS cb FROM p)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(cb // 512 AS BIGINT) AS bin_id,
        |  count(*) AS n_items, CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens,
        |  string_agg(chunk_text, chr(10) ORDER BY cid) AS text
        |FROM c2 GROUP BY 1, 2""".stripMargin
  )
}
