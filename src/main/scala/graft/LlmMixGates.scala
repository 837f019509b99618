package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.LlmGateUtil._

/** Mixture / selection / ordering / packing / curation-composite
  * gates (token budgets, temperature & DSIR selection, quota caps,
  * curriculum, interleave, epoch shuffle, packing, leak-safe splits,
  * curate v1/v2/v3). Split from LlmQueries by domain (round-6 verdict
  * ask #5) — pure code motion.
  */
object LlmMixGates {

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

  // Deterministic train/val/test splitting at the gate: assignment is a
  // pure function of doc_id (stable under reruns/resharding/appends —
  // what randomSplit can't give). Gate key = the engine-independent LCG
  // mix; production key = xxhash64 (Sampling.xxKey).
  def q49_hash_split(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.assignSplits(
      t(s, dir, "documents").select(col("doc_id")),
      graft.ops.Sampling.lcgKey(col("doc_id")),
      Seq("train" -> 900, "val" -> 50, "test" -> 50))

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

  // Iterative graph diffusion at the gate (ops/GraphOps.pageRank):
  // quality/trust propagation over a deterministic skewed document
  // graph — each doc links to doc_id div 2 (a hub-forming collapse)
  // and to (doc_id²+1) mod n (quadratic spray). 3 iterations, damping
  // 850‰, all arithmetic integer micro-units, so the oracle's
  // unrolled-CTE replay matches bit-for-bit. The Pregel-by-joins
  // shape: per iteration a src-keyed join + one partial dst sum.
  def q134_pagerank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nFrame = docs.agg(count(lit(1)).as("__n"))
    val e1 = docs.select(col("doc_id").as("src"),
      expr("doc_id div 2").as("dst"))
    val e2 = docs.crossJoin(broadcast(nFrame))
      .select(col("doc_id").as("src"),
        expr("(doc_id * doc_id + 1) % __n").as("dst"))
    graft.ops.GraphOps.pageRank(e1.unionByName(e2), "src", "dst",
        iters = 3, dampingPm = 850)
      .select(col("node").as("doc_id"), col("rank_micro"))
  }

  // Export-shard assignment (Packing.shardAssign): docs in id order
  // shard at a 20k-char budget — shard_id = exclusive_prefix DIV
  // budget, docs never split (the WebDataset layout). Prefix sum is
  // the window-free globalRunningSum; shard id is map-only integer
  // arithmetic on top.
  def q141_shard_assign(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.shardAssign(
      t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
      sortCols = Seq(col("doc_id")), valueCol = "n_chars",
      shardBudget = 20000L)

  // Systematic PPS sampling (Sampling.systematicPps): one sample every
  // 251 weight-chars walking the corpus in doc_id order from phase 100
  // — token-proportional selection with exact budget adherence; docs
  // heavier than the stride repeat (copies > 1), the way a
  // token-weighted trainer consumes them. Pure integer arithmetic over
  // the window-free distributed prefix sum.
  def q195_pps_sample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.systematicPps(
      t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
      sortCols = Seq(col("doc_id")), weightCol = "n_chars",
      stride = 251L, phase = 100L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q195_pps_sample"   -> q195_pps_sample _,
    "q134_pagerank"     -> q134_pagerank _,
    "q141_shard_assign" -> q141_shard_assign _,
    "q36_corpus_clean"  -> q36_corpus_clean _,
    "q49_hash_split"    -> q49_hash_split _,
    "q52_stratified_sample" -> q52_stratified_sample _,
    "q65_curation_pipeline" -> q65_curation_pipeline _,
    "q66_curation_lm"   -> q66_curation_lm _,
    "q67_token_chunks"  -> q67_token_chunks _,
    "q70_seq_packing"   -> q70_seq_packing _,
    "q73_corpus_shuffle" -> q73_corpus_shuffle _,
    "q76_cap_per_group" -> q76_cap_per_group _,
    "q77_normalize"     -> q77_normalize _,
    "q78_chunk_pack"    -> q78_chunk_pack _,
    "q80_stream_chunks" -> q80_stream_chunks _,
    "q89_token_budget"  -> q89_token_budget _,
    "q90_mixture_sample" -> q90_mixture_sample _,
    "q92_curate_v2"     -> q92_curate_v2 _,
    "q95_token_mixture" -> q95_token_mixture _,
    "q100_dsir_select"  -> q100_dsir_select _,
    "q101_temperature_mix" -> q101_temperature_mix _,
    "q102_cap_exact"    -> q102_cap_exact _,
    "q103_interleave"   -> q103_interleave _,
    "q104_pack_assemble" -> q104_pack_assemble _,
    "q106_water_fill"   -> q106_water_fill _,
    "q108_curriculum"   -> q108_curriculum _,
    "q113_leak_split"   -> q113_leak_split _,
    "q114_length_batches" -> q114_length_batches _,
    "q117_curate_v3"    -> q117_curate_v3 _,
    "q118_token_blocks" -> q118_token_blocks _,
    "q119_epoch_shuffle" -> q119_epoch_shuffle _,
  )

  val oracleSql: Map[String, String] = Map(
    "q195_pps_sample" ->
      """WITH w AS (SELECT doc_id, n_chars,
        |        sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM documents),
        |s AS (SELECT doc_id, n_chars, CAST(cum AS BIGINT) AS cum,
        |        (cum - 100 + 251) // 251 - (cum - n_chars - 100 + 251) // 251 AS copies
        |      FROM w)
        |SELECT doc_id, n_chars, cum, CAST(copies AS BIGINT) AS copies
        |FROM s WHERE copies >= 1""".stripMargin,
    "q141_shard_assign" ->
      """SELECT doc_id, n_chars,
        |  CAST(sum(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS cum,
        |  CAST((sum(n_chars) OVER (ORDER BY doc_id) - n_chars) // 20000 AS BIGINT) AS shard_id
        |FROM documents""".stripMargin,
    "q134_pagerank" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS (
        |  SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 1) % nn.n FROM documents, nn),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT node
        |          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |i1 AS (SELECT e.dst AS node, sum(r0.rank // deg.outdeg) AS m
        |       FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
        |       GROUP BY 1),
        |r1 AS (SELECT nodes.node,
        |         CAST(150000 + (850 * coalesce(i1.m, 0)) // 1000 AS BIGINT) AS rank
        |       FROM nodes LEFT JOIN i1 USING (node)),
        |i2 AS (SELECT e.dst AS node, sum(r1.rank // deg.outdeg) AS m
        |       FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
        |       GROUP BY 1),
        |r2 AS (SELECT nodes.node,
        |         CAST(150000 + (850 * coalesce(i2.m, 0)) // 1000 AS BIGINT) AS rank
        |       FROM nodes LEFT JOIN i2 USING (node)),
        |i3 AS (SELECT e.dst AS node, sum(r2.rank // deg.outdeg) AS m
        |       FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
        |       GROUP BY 1),
        |r3 AS (SELECT nodes.node,
        |         CAST(150000 + (850 * coalesce(i3.m, 0)) // 1000 AS BIGINT) AS rank
        |       FROM nodes LEFT JOIN i3 USING (node))
        |SELECT node AS doc_id, rank AS rank_micro FROM r3""".stripMargin,
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
    // pure-integer LCG mix — identical arithmetic in any engine
    "q49_hash_split" ->
      """WITH k AS (
        |  SELECT doc_id, ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 AS key
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN key < 900 THEN 'train' WHEN key < 950 THEN 'val' ELSE 'test' END AS split
        |FROM k""".stripMargin,
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
    // same LCG key, per-stratum thresholds
    "q52_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id * 1103515245 + 12345) % 1000000007) % 1000 <
        |  CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 800 WHEN 'es' THEN 1000
        |            WHEN 'de' THEN 250 ELSE 100 END""".stripMargin,
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
    // same unsalted LCG as q52, full resolution; rank over (key, id)
    "q73_corpus_shuffle" ->
      """SELECT doc_id, lang, shuffle_key,
        |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS shuffle_rank
        |FROM (SELECT doc_id, lang,
        |        (doc_id * 1103515245 + 12345) % 1000000007 AS shuffle_key
        |      FROM documents)""".stripMargin,
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
    // ntile + within-stage LCG shuffle + epoch row_number
    "q108_curriculum" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM documents),
        |st AS (SELECT doc_id, n_toks,
        |         CAST(ntile(4) OVER (ORDER BY n_toks, doc_id) AS INT) AS stage FROM d),
        |k AS (SELECT *, (doc_id*1103515245+12345) % 1000000007 AS sk FROM st)
        |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, stage,
        |  CAST(row_number() OVER (ORDER BY stage, sk, doc_id) AS BIGINT) AS epoch_rank
        |FROM k""".stripMargin,
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
        |FROM c2 GROUP BY 1, 2""".stripMargin,
  )
}
