package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.LlmGateUtil._

/** Text-analysis gates (token/quality/langid/Gopher/fingerprint
  * statistics, BM25, TF-IDF, LM scoring, tokenizer diagnostics,
  * streaming quality). Split from LlmQueries by domain (round-6
  * verdict ask #5) — pure code motion.
  */
object LlmTextGates {

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

  // Corpus language statistics (the aggregate view a langid pass feeds).
  def q24_lang_stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"),
           min(col("doc_id")).as("min_doc_id"))

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

  // COHEN'S KAPPA (ops/Stats.cohenKappaPpm): chance-corrected agreement
  // between the fixture's lang labels and a simulated noisy re-annotation
  // (every 7th doc flipped to 'en') — the label-quality number an
  // annotation pipeline gates on. Confusion matrix bounded by the
  // 5-language alphabet²; κ in exact integer ppm.
  def q200_kappa(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.cohenKappaPpm(
      t(s, dir, "documents").select(
        col("lang").as("anno_a"),
        when(col("doc_id") % 7 === 0, "en").otherwise(col("lang"))
          .as("anno_b")),
      "anno_a", "anno_b")

  // BM25-style relevance scoring at the gate (rational-decimal variant —
  // see llm/Relevance's scaladoc for why ln() can't cross the engine
  // boundary bit-stably). Fixed 4-term query over the documents corpus.
  def q48_bm25(s: SparkSession, dir: String): DataFrame =
    graft.llm.Relevance.bm25Deterministic(
      t(s, dir, "documents"), "doc_id", "text",
      Seq("join", "vector", "filter", "scan"))

  // TF-IDF top-3 terms per document at the gate (llm/Relevance
  // .tfIdfDeterministicTopK): the rational pre-log score tf·N/df, one
  // decimal division rounded to DECIMAL(18,6) in both engines (ln()
  // isn't cross-engine bit-stable; the production tfIdfTopK uses it).
  def q62_tfidf_terms(s: SparkSession, dir: String): DataFrame =
    graft.llm.Relevance.tfIdfDeterministicTopK(
      t(s, dir, "documents"), idCol = "doc_id", textCol = "text", k = 3)

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

  // Vocabulary builder at the gate (LanguageModel.buildVocab): top-50
  // tokens by (count DESC, token ASC) with dense ids — distributed
  // top-k (TakeOrderedAndProject), id window over exactly k rows.
  def q75_vocab(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.buildVocab(
      t(s, dir, "documents"), textCol = "text", k = 50)

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

  // Vocabulary DECODE at the gate (LanguageModel.decodeWithVocab) —
  // the q120 round trip: encode against the k=20 vocab, decode back;
  // every in-vocab word survives, every OOV word renders as <unk>.
  // Same broadcast-join + per-doc array_sort shape as the encoder.
  def q145_vocab_decode(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val vocab = graft.llm.LanguageModel.buildVocab(docs, "text", k = 20)
    graft.llm.LanguageModel.decodeWithVocab(
      graft.llm.LanguageModel.encodeWithVocab(docs, "doc_id", "text", vocab),
      vocab)
  }

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

  // Token-frequency SPECTRUM at the gate
  // (LanguageModel.tokenFrequencySpectrum): per-language Zipf bands —
  // distinct types and occurrences per power-of-two count band;
  // band = length(bin(cnt))-1, pure integer/string math both engines
  // share. Two map-side-partial groupBys, vocabulary-bounded.
  def q107_freq_spectrum(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.tokenFrequencySpectrum(
      t(s, dir, "documents"), textCol = "text", groupCols = Seq("lang"))

  // Bigram language model at the gate (llm/LanguageModel.topFollowers):
  // top-3 followers of every frequent head word by rational conditional
  // probability pair_cnt/head_cnt — one decimal division, identical in
  // both engines. The production per-doc LM scorer (docAvgLogProb, ln)
  // is spec-checked instead.
  def q64_bigram_lm(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.topFollowers(
      t(s, dir, "documents"), textCol = "text", minHeadCount = 50, k = 3)

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

  // Corpus length-distribution diagnostics (ops/Stats): exact type-1
  // quantiles — smallest v whose cumulative count reaches
  // ceil(pm·n/1000), per-mille integer thresholds so both engines run
  // identical arithmetic — per-language plus the global corpus ('all')
  // in one frame. The global path is the window-free distributed prefix
  // sum (GlobalRank.globalRunningSum); the per-language path's window
  // partitions by lang, bounded by one group's distinct lengths.
  def q131_len_quantiles(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val probs = Seq(("p50", 500), ("p90", 900), ("p99", 990))
    graft.ops.Stats.exactQuantilesByGroup(docs, "lang", "n_chars", probs)
      .unionByName(
        graft.ops.Stats.exactQuantiles(docs, "n_chars", probs)
          .select(lit("all").as("lang"), col("label"), col("q")))
  }

  // Exact equi-width length histogram (ops/Stats.equiWidthHistogram):
  // integer bin width ceil((max−min+1)/nBins) — no float bin edges —
  // 1-row min/max stats frame broadcast back, one ≤nBins-row shuffle.
  def q132_len_histogram(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.equiWidthHistogram(t(s, dir, "documents"), "n_chars", 8)

  // Per-language HyperLogLog register table over the document texts
  // (ops/Sketches.hllRegisters): the mergeable distinct-count sketch —
  // 2^6 integer registers per language instead of a distinct-key
  // shuffle. Gate runs the md5-derived 60-bit hash so DuckDB rebuilds
  // the registers from the same rule (bucket = h mod 64, rho = 55 −
  // bitlength(h div 64)); the float estimate stays spec-pinned.
  def q136_hll_registers(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.hllRegisters(
      t(s, dir, "documents"), col("text"), b = 6,
      hashFn = graft.llm.TextAnalysis.md5Hash60, hashBits = 60,
      groupCols = Seq("lang"))

  // HLL shard-merge + estimate internals (Sketches.hllMerge/
  // hllEstimate): per-language sketches built on the even/odd doc
  // halves merge by element-wise max, and the estimator's exact
  // integer core (occupied buckets + the 2^(S−r) harmonic numerator —
  // 64·2^55 < 2^63, so it surfaces as BIGINT) hash-checks
  // cross-engine. The float estimate stays spec-pinned; this gate pins
  // the MERGE-then-estimate arithmetic the 100 TB per-shard workflow
  // depends on.
  def q144_hll_merge(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val docs = t(s, dir, "documents")
    def shard(m: Int) = Sketches.hllRegisters(
      docs.where(pmod(col("doc_id"), lit(2)) === m), col("text"), b = 6,
      hashFn = graft.llm.TextAnalysis.md5Hash60, hashBits = 60,
      groupCols = Seq("lang"))
    Sketches.hllEstimate(
        Sketches.hllMerge(shard(0), shard(1), groupCols = Seq("lang")),
        b = 6, hashBits = 60, groupCols = Seq("lang"))
      .select(col("lang"), col("n_buckets"),
        col("denom_units").cast("long").as("denom_units"))
  }

  // ROUGE-n clipped bigram overlap (Relevance.rougeOverlap) between
  // each doc and its id-successor — the generation-eval harness next
  // to q116's retrieval metrics. Grams hash to int64 before the
  // shuffle (md5Hash60 at the gate); ratios surface as integer
  // per-mille floor divisions. Zero-overlap and too-short-to-gram
  // pairs still surface.
  def q139_rouge_overlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = docs
      .select(col("doc_id").as("cand_id"),
        (col("doc_id") + 1).as("ref_id"))
      .join(docs.select(col("doc_id").as("ref_id")), Seq("ref_id"),
        "left_semi")
    graft.llm.Relevance.rougeOverlap(pairs, docs, "doc_id", "text",
      n = 2, hashFn = graft.llm.TextAnalysis.md5Hash60)
  }

  // Count-Min register table over the document token stream
  // (ops/Sketches.cmRegisters): the mergeable per-key FREQUENCY sketch
  // next to q136's HLL cardinality sketch — d·2^b integer cells instead
  // of a token-frequency shuffle. Gate runs the salted md5-derived
  // 60-bit hash family (row i hashes "i:" + token) so DuckDB rebuilds
  // the identical table with string math.
  def q146_cm_registers(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.cmRegisters(
      t(s, dir, "documents").select(explode(split(col("text"), " ")).as("w")),
      col("w"), d = 3, b = 8, hashFn = graft.llm.TextAnalysis.md5Hash60)

  // CM shard-merge + point query (Sketches.cmMerge/cmQuery): per-shard
  // sketches on the even/odd doc halves merge by element-wise SUM, then
  // a probe list (the distinct tokens of the first docs) reads d cells
  // each and takes the min — the never-undercounting estimate. The whole
  // per-shard → merge → query workflow a 100 TB frequency rollup runs,
  // hash-checked cross-engine (all-integer registers and estimates).
  def q147_cm_merge_query(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val docs = t(s, dir, "documents")
    def toks(m: Int) = docs.where(pmod(col("doc_id"), lit(2)) === m)
      .select(explode(split(col("text"), " ")).as("w"))
    def shard(m: Int) = Sketches.cmRegisters(toks(m), col("w"), d = 3, b = 8,
      hashFn = graft.llm.TextAnalysis.md5Hash60)
    val merged = Sketches.cmMerge(shard(0), shard(1))
    val probes = docs.where(col("doc_id") < 20)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
    Sketches.cmQuery(merged, probes, "w", d = 3, b = 8,
      hashFn = graft.llm.TextAnalysis.md5Hash60)
  }

  // Markup stripping (TextAnalysis.stripMarkup/markupTagCount): the
  // raw-crawl → plain-text extraction stage — script/style/comment
  // blocks dropped, tags → space, the six ubiquitous entities decoded
  // after tag removal, whitespace collapsed. Patterns in the Java∩RE2
  // subset; three planted HTML docs exercise every rule (nested tags,
  // entity-encoded pseudo-tags, bare `<` comparisons, multi-line lists).
  def q148_strip_markup(s: SparkSession, dir: String): DataFrame = {
    val planted = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(s.range(1).select(lit(9000001L).as("doc_id"),
        lit("<html><head><title>T</title><style>p {color: red;}</style></head><body><p>Hello &amp; welcome</p><!-- hidden note --><script type=\"text/javascript\">var x = 1<2 && y>0;</script><div class=\"x\">a &lt;tag&gt; b</div></body></html>").as("text")))
      .unionByName(s.range(1).select(lit(9000002L).as("doc_id"),
        lit("price is 3 < 5 and x &gt; 2 with &quot;quotes&quot; plus &#39;apostrophe&#39; and&nbsp;space").as("text")))
      .unionByName(s.range(1).select(lit(9000003L).as("doc_id"),
        lit("<ul>\n<li>one</li>\n<li>two</li>\n</ul>\n\ntrailing   text  here").as("text")))
    planted.select(col("doc_id"),
      graft.llm.TextAnalysis.markupTagCount(col("text")).cast("int").as("n_tags"),
      graft.llm.TextAnalysis.stripMarkup(col("text")).as("text"))
  }

  // Streaming sketch maintenance (runStreamForeachBatch + Sketches
  // .cmMerge): the corpus streams in as four real micro-batches
  // (repartitioned to four files, maxFilesPerTrigger=1), each batch
  // builds its own CM register table and merges into the accumulator —
  // localCheckpoint per merge bounds the cross-batch lineage (the
  // updateExactIndex contract). Merge is associative-sum, so the final
  // registers are provably identical to the one-shot batch build —
  // the oracle IS q146's SQL. This is the continuous-ingest frequency
  // monitor next to the streaming dedup (q109) / quality (q121) gates.
  def q150_stream_cm_sketch(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val tmp = java.nio.file.Files.createTempDirectory("q150src").toString
    t(s, dir, "documents").repartition(4).write
      .mode("overwrite").parquet(tmp)
    var acc: DataFrame = null
    graft.streaming.EventStream.runStreamForeachBatch(
      s, tmp, { (batch, _) =>
        val regs = Sketches.cmRegisters(
          batch.select(explode(split(col("text"), " ")).as("w")),
          col("w"), d = 3, b = 8, hashFn = graft.llm.TextAnalysis.md5Hash60)
        acc = (if (acc == null) regs else Sketches.cmMerge(acc, regs))
          .localCheckpoint(true)
      }, options = Map("maxFilesPerTrigger" -> "1"))
    acc
  }

  // Mergeable fixed-bound histogram + quantiles-from-histogram
  // (ops/Stats.fixedWidthHistogram/histogramMerge/histogramQuantiles):
  // the value-distribution member of the sketch trio (HLL distinct /
  // CM frequency / this) — per-shard histograms with caller-fixed
  // (lo, width, nBins) merge by bin-wise sum; the quantile is the
  // smallest bin whose cumulative count reaches the integer per-mille
  // threshold, so the true value provably lies in [lo, hi]. Shards =
  // even/odd doc halves; out-of-range clamps to the end bins.
  def q151_hist_sketch(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Stats
    val docs = t(s, dir, "documents")
    def shard(m: Int) = Stats.fixedWidthHistogram(
      docs.where(pmod(col("doc_id"), lit(2)) === m), "n_chars",
      lo = 0L, width = 50L, nBins = 40)
    Stats.histogramQuantiles(
      Stats.histogramMerge(shard(0), shard(1)), lo = 0L, width = 50L,
      probs = Seq("p50" -> 500, "p90" -> 900, "p99" -> 990))
  }

  // Trained character-trigram language ID (TextAnalysis
  // .trainLangProfiles/classifyByProfile — Cavnar-Trenkle family): the
  // data-driven sibling of q30's heuristic langId. Profiles = top-100
  // trigrams per labeled language (broadcast-sized by construction);
  // classification = integer profile-overlap argmax, ties → smallest
  // label, no-hit docs → 'und'. Train and classify on the same corpus
  // at the gate — the composition is what's hash-checked.
  def q149_langid_trained(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val profiles = graft.llm.TextAnalysis.trainLangProfiles(
      docs, "lang", "text", n = 3, topM = 100)
    graft.llm.TextAnalysis.classifyByProfile(
      docs, "doc_id", "text", profiles, n = 3, topM = 100)
  }

  // Text-corpus interchange IO (io/TextCorpusSources): the corpus
  // round-trips through BOTH line-oriented interchange formats — JSONL
  // (what crawls ship as) and headered quoted CSV — with explicit
  // schemas and PERMISSIVE corrupt-record capture (never schema
  // inference: a 100 TB inference pass reads the corpus twice). The
  // oracle reads the original parquet, so ANY lossiness in either
  // writer/reader pair (quoting, escaping, null handling, type
  // round-trip) breaks the hash — this gate is the IO-fidelity check.
  def q154_text_formats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.io.TextCorpusSources._
    val docs = t(s, dir, "documents")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val jl = java.nio.file.Files.createTempDirectory("q154jl").toString
    val cv = java.nio.file.Files.createTempDirectory("q154cv").toString
    writeJsonl(docs, jl)
    writeCsv(docs, cv)
    val (jClean, _) = quarantine(readJsonl(s, jl, schema))
    val (cClean, _) = quarantine(readCsv(s, cv, schema))
    def shape(df: DataFrame, fmt: String) =
      df.select(lit(fmt).as("fmt"), col("doc_id"), col("lang"),
        col("n_chars"), col("text"))
    shape(jClean, "jsonl").unionByName(shape(cClean, "csv"))
  }

  // Columnar interchange IO (io/ColumnarSources): the corpus round-trips
  // through ORC (zstd) with an explicit read schema. The oracle reads
  // the original parquet, so any writer/reader lossiness (type mapping,
  // nulls, string encoding) breaks the hash — the ORC sibling of q154's
  // line-format fidelity check.
  def q164_orc_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val docs = t(s, dir, "documents")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val tmp = java.nio.file.Files.createTempDirectory("q164orc").toString
    graft.io.ColumnarSources.writeOrc(docs, tmp)
    graft.io.ColumnarSources.readOrc(s, tmp, schema)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
  }

  // Schema-evolved parquet read (io/ColumnarSources.readParquetMerged):
  // two shards written under different schemas (the second adds `score`)
  // read back as ONE frame via mergeSchema — rows from the older shard
  // surface NULL score instead of silently dropping the column. The
  // oracle reconstructs the expected union from the source table.
  def q165_schema_merge(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("q165ev").toString
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(tmp)
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars").as("score"))
      .write.mode("append").parquet(tmp)
    graft.io.ColumnarSources.readParquetMerged(s, tmp)
      .select(col("doc_id"), col("lang"), col("score"))
  }

  // Stride-sampled quantile sketch (ops/Sketches.strideRegisters/
  // strideQuantiles): the rank member of the mergeable-sketch family —
  // no value bounds needed (vs q151's fixed-bound histogram). Each hash
  // shard keeps its block-midpoint ranks; estimates read only the
  // n/stride-bounded register table. Register construction AND the
  // estimates are integer-rule deterministic, so the whole path is
  // hash-checked (md5-derived shard hash at the gate).
  def q166_stride_quantiles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      col("l_extendedprice").as("v"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("id"))
    val regs = graft.ops.Sketches.strideRegisters(
      li, col("v"), col("id"), nShards = 16, stride = 50,
      hashFn = graft.llm.TextAnalysis.md5Hash60)
    graft.ops.Sketches.strideQuantiles(regs, Seq(250, 500, 900, 990))
  }

  /** Planted WordPiece vocab for q167: multi-char plain pieces (sc, st,
    * sp, me, or, da, hash), multi-char continuations (##an, ##il,
    * ##ter, ##le, ##ream), and deliberate holes — no plain 'q' or 'w',
    * so "query"/"window" become [UNK] — exercising every branch of the
    * greedy longest-match + whole-word-UNK semantics. */
  private val wordpieceVocab: Seq[String] = Seq(
    "a", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "o", "p",
    "r", "s", "t", "v", "sc", "st", "sp", "me", "or", "da", "hash",
    "##a", "##b", "##c", "##d", "##e", "##g", "##h", "##i", "##k",
    "##l", "##m", "##n", "##o", "##p", "##r", "##s", "##t", "##u",
    "##w", "##y", "##an", "##il", "##ter", "##le", "##ream")

  // WordPiece greedy longest-match encoding (llm/WordPiece.encodeDocs):
  // the BERT-family tokenizer next to BPE (q120 whole-word / merge
  // replay) and Unigram-LM — longest vocab piece at each position,
  // ## continuation marking, whole word → [UNK] on any miss. The
  // kernel runs once per DISTINCT word; docs reassemble by join +
  // in-doc sort. The oracle replays greedy matching as a recursive CTE
  // over the same literal vocab — the iterative ENCODER is
  // SQL-expressible even though the trainer is not (trainer is
  // spec-pinned against an in-memory reference, the Bpe precedent).
  def q167_wordpiece(s: SparkSession, dir: String): DataFrame =
    graft.llm.WordPiece.encodeDocs(
      t(s, dir, "documents"), "doc_id", "text", wordpieceVocab)

  // Sentence segmentation (TextAnalysis.splitSentences): split on
  // terminal-punctuation runs + whitespace — the deterministic regex
  // tier sentence-level dedup runs on (Java∩RE2, no lookbehind). Three
  // planted docs exercise multi-sentence splits, no-punctuation
  // passthrough, and the acronym limitation the scaladoc documents.
  def q155_sentences(s: SparkSession, dir: String): DataFrame = {
    val planted = t(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(s.range(1).select(lit(9000001L).as("doc_id"),
        lit("First one. Second here! Third? The end.").as("text")))
      .unionByName(s.range(1).select(lit(9000002L).as("doc_id"),
        lit("no terminal punctuation here").as("text")))
      .unionByName(s.range(1).select(lit(9000003L).as("doc_id"),
        lit("Dr. Smith arrived... Then left! Done.").as("text")))
    planted
      .select(col("doc_id"),
        posexplode(graft.llm.TextAnalysis.splitSentences(col("text"))))
      .select(col("doc_id"), col("pos").as("idx"), col("col").as("sentence"))
  }

  // Corpus DATA CARD (CorpusPipeline.corpusReport): the per-language
  // release summary — doc/distinct counts, exact-dup and Gopher-quality
  // per-mille rates, token/char totals and extremes — in ONE corpus
  // scan (mixed distinct/plain aggregate = one Expand over the group
  // key; distinctness counts the md5-derived 60-bit content hash at the
  // gate, xxhash64 in production). Exact clones of every 4th doc are
  // planted so the dup-rate arithmetic is demonstrably non-zero.
  def q153_corpus_report(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
    val corpus = docs.unionByName(docs.where(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("text")))
    graft.llm.CorpusPipeline.corpusReport(corpus, "text", Seq("lang"),
        minWords = 30, minStopwords = 1,
        hashFn = graft.llm.TextAnalysis.md5Hash60)
      .withColumn("min_chars", col("min_chars").cast("int"))
      .withColumn("max_chars", col("max_chars").cast("int"))
  }

  // Key-skew diagnostic (ops/Stats.keySkewReport): the 10 heaviest
  // (lang, source) combinations with exact counts and integer
  // per-mille share — the pre-partitioning report. orderBy+limit plans
  // as TakeOrderedAndProject (per-partition top-K + driver K-merge,
  // never a global sort); the (cnt DESC, keys ASC) total order makes
  // the cut engine-independent on ties.
  def q140_key_skew(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.keySkewReport(
      t(s, dir, "documents"), Seq("lang", "source"), topK = 10)

  /** Conversation-shaped corpus for the SFT gates: each document's
    * words in 8-word chunks become alternating user/assistant turns
    * (conv_id = doc_id); every 7th conversation starts with the
    * assistant, so the validation flags discriminate on real variety
    * (n_turns parity decides ends_assistant; ~45% of conversations are
    * fully valid at sf0.01). */
  private def convTurns(s: SparkSession, dir: String): DataFrame = {
    val ws = filter(split(col("text"), " "), x => length(x) > 0)
    t(s, dir, "documents")
      .select(col("doc_id").as("conv_id"), ws.as("__ws"))
      .filter(size(col("__ws")) >= 1)
      .select(col("conv_id"), col("__ws"), explode(sequence(lit(0L),
        ceil(size(col("__ws")) / lit(8.0)).cast("long") - 1)).as("idx"))
      .select(col("conv_id"), col("idx"),
        when(pmod(col("idx") +
            when(pmod(col("conv_id"), lit(7L)) === 0L, 1L).otherwise(0L),
            lit(2L)) === 0L,
          "user").otherwise("assistant").as("role"),
        concat_ws(" ",
          slice(col("__ws"), (col("idx") * 8 + 1).cast("int"), lit(8)))
          .as("content"))
  }

  // CHAT-TEMPLATE RENDER (llm/Conversations.render): turn rows → the one
  // training string the tokenizer consumes (ChatML-style markers, turns
  // in index order, EOS appended). One conv-keyed groupBy; order pinned
  // by array_sort on the collected (idx, role, content) structs, never a
  // sort node.
  def q170_chat_render(s: SparkSession, dir: String): DataFrame =
    graft.llm.Conversations.render(convTurns(s, dir),
      "conv_id", "idx", "role", "content")

  // CONVERSATION VALIDATION (llm/Conversations.validate): the SFT
  // structural contract — starts-with-user, strict alternation,
  // ends-with-assistant, gap/duplicate-free indices, no empty turns —
  // as INT flags per conversation. A planted conversation (id 9000011)
  // exercises the index-gap + whitespace-only-content paths the organic
  // corpus cannot produce. Window-free: min-index probe + one
  // conditional aggregation.
  def q171_chat_validate(s: SparkSession, dir: String): DataFrame = {
    val planted = convTurns(s, dir).unionByName(
      s.range(1).select(lit(9000011L).as("conv_id"), lit(0L).as("idx"),
          lit("user").as("role"), lit("hi").as("content"))
        .unionByName(s.range(1).select(lit(9000011L).as("conv_id"),
          lit(2L).as("idx"), lit("assistant").as("role"),
          lit("  ").as("content"))))
    graft.llm.Conversations.validate(planted,
      "conv_id", "idx", "role", "content")
  }

  // CONTENT-DEFINED CHUNKING (functions/CdcFunctions.cdcChunks): the
  // dedup-stable splitter — boundaries where the rolling Rabin hash of
  // the last 16 bytes masks to zero, so an upstream edit shifts chunk
  // identities only locally (fixed-size chunking shifts ALL of them).
  // Native one-pass kernel, map-only at any scale; the gate sanitizes
  // to ASCII so the DuckDB oracle replays the byte arithmetic as
  // character arithmetic.
  def q172_cdc_chunks(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.CdcFunctions.cdcChunks(
          regexp_replace(col("text"), "[^ -~]", "?"),
          window = 16, maskBits = 5)))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        col("col").as("chunk"))

  // HLL SET-INTERSECTION core (ops/Sketches.hllIntersectEstimate): how
  // many distinct documents do two corpus slices SHARE, without joining
  // them — inclusion–exclusion over three mergeable sketches (A, B,
  // A∪B by register max). The gate overlaps two doc_id mod-3 shards
  // (residue 1 in both) and pins the exact integer estimator cores of
  // all three sketches per language; the float intersection estimate
  // stays spec-pinned (SketchesSpec accuracy band).
  def q173_hll_intersect(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Sketches
    val docs = t(s, dir, "documents")
    def shard(lo: Int, hi: Int) = Sketches.hllRegisters(
      docs.where(pmod(col("doc_id"), lit(3)) === lo ||
        pmod(col("doc_id"), lit(3)) === hi),
      col("text"), b = 6,
      hashFn = graft.llm.TextAnalysis.md5Hash60, hashBits = 60,
      groupCols = Seq("lang"))
    val ra = shard(0, 1)
    val rb = shard(1, 2)
    def core(r: DataFrame, suf: String) =
      Sketches.hllEstimate(r, b = 6, hashBits = 60, groupCols = Seq("lang"))
        .select(col("lang"), col("n_buckets").as(s"n_buckets_$suf"),
          col("denom_units").cast("long").as(s"denom_$suf"))
    core(ra, "a")
      .join(core(rb, "b"), "lang")
      .join(core(Sketches.hllMerge(ra, rb, groupCols = Seq("lang")), "u"),
        "lang")
  }

  // PMI COLLOCATIONS (TextAnalysis.collocations): the word2vec-style
  // phrase-detection pass — top word pairs by pointwise mutual
  // information, scored as the exact integer cross-product
  // 10⁶·c_ab·N div (c_a·c_b) (log is monotone: the ORDER is PMI's
  // order, with none of a float log's tie ambiguity). Vocabulary-keyed
  // joins, TakeOrderedAndProject top-k — never corpus-keyed.
  def q184_collocations(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextAnalysis.collocations(
      t(s, dir, "documents"), "text", minPairCount = 5, topK = 20)

  /** The shared gate blocklist: "tab" nests inside every "table" match
    * (nested-output path), "a" matches inside words and overlaps
    * itself (multi-hit path), "scan slow" crosses a token boundary —
    * the substring semantics a token-level filter cannot express. */
  private val gateBlocklist =
    Seq("tab", "table", "scan slow", "a", "merge")

  // BLOCKLIST SCREENING (llm/Blocklist.matchStats over the native
  // Aho–Corasick expression functions/AcMatches): per-document distinct
  // blocked terms + total occurrences in ONE codegen'd scan of the
  // corpus — the pretraining dirty-word/PII-keyword filter at 10⁵
  // patterns, where per-pattern contains() rescans the corpus |P|
  // times. Occurrences count overlapping AND nested matches (oracle
  // replays via per-position substr equality).
  def q230_blocklist(s: SparkSession, dir: String): DataFrame =
    graft.llm.Blocklist.matchStats(
        t(s, dir, "documents").where(col("text").isNotNull)
          .select(col("doc_id"), col("text")),
        "text", gateBlocklist)
      .select(col("doc_id"), col("n_patterns_hit"), col("n_occurrences"))

  // BLOCKLIST HIT AUDIT (llm/Blocklist.hits): the exploded
  // (document, term, occurrences) table — which terms fire where, the
  // review surface behind every blocklist threshold decision.
  def q231_blocklist_hits(s: SparkSession, dir: String): DataFrame =
    graft.llm.Blocklist.hits(
      t(s, dir, "documents").where(col("text").isNotNull),
      Seq("doc_id"), "text", gateBlocklist)

  /** Deterministic URL synthesis shared by the URL gates — the fixture
    * has no URL column, so BOTH engines build the same one from
    * (doc_id, source, lang): four shapes covering mixed case, default
    * vs explicit port, tracking-only query, trailing-dot host, naive
    * ccTLD domains, and an unparseable row. */
  private def gateUrl: Column =
    when(col("doc_id") % 4 === 0,
      concat(lit("HTTPS://WWW."), col("source"), lit(".Example.CO.uk:443/Path/"),
        col("doc_id").cast("string"), lit("?utm_source=feed&b=2&a=1#frag")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("http://"), col("source"), lit(".example.com:8080/"),
          col("lang"), lit("/p?id="), col("doc_id").cast("string"),
          lit("&ref=x&a=1")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://cdn."), col("source"), lit(".example.com.?fbclid=abc")))
      .otherwise(concat(lit("not a url "), col("doc_id").cast("string")))

  // URL CANONICALIZATION (llm/UrlOps): RFC-3986 syntax normalization +
  // tracking-param strip + naive registrable domain — the crawl-dedup
  // key and per-domain rollup identity of a web corpus. Map-only
  // builtin column functions end to end; unparseable rows surface as
  // NULLs, never guesses.
  def q232_url_normalize(s: SparkSession, dir: String): DataFrame = {
    val withUrl = t(s, dir, "documents").withColumn("url", gateUrl)
    val host = graft.llm.UrlOps.hostOf(col("url"))
    withUrl.select(col("doc_id"), col("url"),
      graft.llm.UrlOps.normalizeUrl(col("url")).as("url_norm"),
      host.as("host"),
      graft.llm.UrlOps.registrableDomain(host).as("domain"))
  }

  // DOMAIN ROLLUP (llm/UrlOps.domainStats): pages / distinct hosts /
  // distinct canonical URLs per registrable domain — the quota view a
  // crawl frontier budgets by. One normalize scan + one domain-keyed
  // aggregate.
  def q233_domain_stats(s: SparkSession, dir: String): DataFrame =
    graft.llm.UrlOps.domainStats(
      t(s, dir, "documents").withColumn("url", gateUrl), "url")

  // CRAWL FRONTIER SCHEDULING (llm/UrlOps.frontierSchedule): at most 2
  // fetches per host per wave, priority-desc then url-asc within host —
  // the politeness constraint as auditable data. One host-partitioned
  // window (hosts ARE the crawl's parallelism).
  def q234_frontier(s: SparkSession, dir: String): DataFrame =
    graft.llm.UrlOps.frontierSchedule(
        t(s, dir, "documents")
          .withColumn("url", gateUrl)
          .withColumn("priority", col("doc_id") % 7),
        "url", "priority", perHostPerWave = 2, tieCols = Seq("doc_id"))
      .select(col("doc_id"), col("url_norm"), col("host"),
        col("priority"), col("wave"), col("slot"))

  // READABILITY (TextAnalysis.readability): Flesch–Kincaid grade in
  // exact integer milli (vowel-group syllables, floor-milli ratios),
  // rolled up per language — the surface-form difficulty screen next
  // to the Gopher battery. Map-only scan + one partial groupBy.
  def q256_readability(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextAnalysis.readability(t(s, dir, "documents"), "text")
      .where(col("fk_milli").isNotNull)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("words")).as("words"),
        expr("sum(fk_milli) div count(1)").as("mean_fk_milli"))

  // TEXTTILING TOPIC BOUNDARIES (llm/TextAnalysis.topicBoundaries):
  // per-sentence-gap vocabulary-Jaccard valleys over 2-sentence blocks
  // — the topic-shift chunking signal for long-document training prep,
  // next to the fixed-size chunkByTokens path. The fixture docs carry
  // no sentence punctuation, so the gate composes 10-doc documents
  // (each source doc = one sentence, the q159 planted-text stance) and
  // swaps every 5th source doc for an alien vocabulary — boundaries
  // must fire exactly around the planted topic shifts while same-pool
  // neighbors stay well above the threshold.
  def q375_topic_boundaries(s: SparkSession, dir: String): DataFrame = {
    val src = CoreQueries.tRead(s, dir, "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(expr("doc_id div 10").as("comp_id"), col("doc_id"),
        when(col("doc_id") % 5 === 0,
          lit("alpha beta gamma delta epsilon zeta eta theta"))
          .otherwise(col("text")).as("t"))
    val comp = src.groupBy(col("comp_id"))
      .agg(expr("""array_join(transform(
          |  array_sort(collect_list(struct(doc_id, t))),
          |  x -> x.t), '. ')""".stripMargin.replace("\n", " "))
        .as("text"))
    graft.llm.TextAnalysis.topicBoundaries(
      comp, "comp_id", "text", w = 2, thresholdPpm = 150000L)
  }

  // VOCABULARY GROWTH (TextAnalysis.vocabGrowth): the Heaps-law curve
  // over the corpus consumed in doc-id order — 16 equal id buckets,
  // cumulative tokens vs cumulative distinct tokens, cumulative TTR
  // in ppm. The saturation diagnostic read before sizing a tokenizer
  // vocabulary (q120/q124/q145) and next to q107's Zipf band spectrum.
  def q385_vocab_growth(s: SparkSession, dir: String): DataFrame =
    graft.llm.TextAnalysis.vocabGrowth(
      t(s, dir, "documents"), "doc_id", "text", buckets = 16)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q385_vocab_growth" -> q385_vocab_growth _,
    "q375_topic_boundaries" -> q375_topic_boundaries _,
    "q256_readability" -> q256_readability _,
    "q232_url_normalize" -> q232_url_normalize _,
    "q233_domain_stats" -> q233_domain_stats _,
    "q234_frontier" -> q234_frontier _,
    "q230_blocklist" -> q230_blocklist _,
    "q231_blocklist_hits" -> q231_blocklist_hits _,
    "q184_collocations" -> q184_collocations _,
    "q170_chat_render"  -> q170_chat_render _,
    "q171_chat_validate" -> q171_chat_validate _,
    "q172_cdc_chunks"   -> q172_cdc_chunks _,
    "q173_hll_intersect" -> q173_hll_intersect _,
    "q131_len_quantiles" -> q131_len_quantiles _,
    "q132_len_histogram" -> q132_len_histogram _,
    "q136_hll_registers" -> q136_hll_registers _,
    "q144_hll_merge"    -> q144_hll_merge _,
    "q146_cm_registers" -> q146_cm_registers _,
    "q147_cm_merge_query" -> q147_cm_merge_query _,
    "q148_strip_markup" -> q148_strip_markup _,
    "q149_langid_trained" -> q149_langid_trained _,
    "q150_stream_cm_sketch" -> q150_stream_cm_sketch _,
    "q151_hist_sketch"  -> q151_hist_sketch _,
    "q153_corpus_report" -> q153_corpus_report _,
    "q154_text_formats" -> q154_text_formats _,
    "q164_orc_roundtrip" -> q164_orc_roundtrip _,
    "q165_schema_merge" -> q165_schema_merge _,
    "q166_stride_quantiles" -> q166_stride_quantiles _,
    "q167_wordpiece" -> q167_wordpiece _,
    "q155_sentences"    -> q155_sentences _,
    "q145_vocab_decode" -> q145_vocab_decode _,
    "q139_rouge_overlap" -> q139_rouge_overlap _,
    "q140_key_skew"     -> q140_key_skew _,
    "q21_token_count"   -> q21_token_count _,
    "q22_quality"       -> q22_quality _,
    "q24_lang_stats"    -> q24_lang_stats _,
    "q29_subword_count" -> q29_subword_count _,
    "q30_langid"        -> q30_langid _,
    "q33_media_features" -> q33_media_features _,
    "q41_redact"        -> q41_redact _,
    "q200_kappa"        -> q200_kappa _,
    "q48_bm25"          -> q48_bm25 _,
    "q51_heavy_hitters" -> q51_heavy_hitters _,
    "q62_tfidf_terms"   -> q62_tfidf_terms _,
    "q64_bigram_lm"     -> q64_bigram_lm _,
    "q68_json_extract"  -> q68_json_extract _,
    "q69_repetition"    -> q69_repetition _,
    "q75_vocab"         -> q75_vocab _,
    "q96_oov_rate"      -> q96_oov_rate _,
    "q97_quality_classifier" -> q97_quality_classifier _,
    "q98_dsir_score"    -> q98_dsir_score _,
    "q99_ngram_novelty" -> q99_ngram_novelty _,
    "q107_freq_spectrum" -> q107_freq_spectrum _,
    "q111_gopher"       -> q111_gopher _,
    "q115_ppl_buckets"  -> q115_ppl_buckets _,
    "q120_vocab_encode" -> q120_vocab_encode _,
    "q121_stream_quality" -> q121_stream_quality _,
    "q124_fertility"    -> q124_fertility _,
    "q125_distinct_ngrams" -> q125_distinct_ngrams _,
  )

  /** Per-position substring-equality replay of the Aho–Corasick
    * semantics: every text position joins against every pattern whose
    * literal starts there — occurrence = match END events, so overlaps
    * and nested patterns count exactly as the automaton counts them. */
  private val blocklistOccSql =
    """WITH pats AS (SELECT * FROM (VALUES ('tab',0),('table',1),
      |    ('scan slow',2),('a',3),('merge',4)) p(pat, pid)),
      |pos AS (SELECT d.doc_id, unnest(generate_series(1, length(d.text))) AS i,
      |               d.text AS text
      |        FROM documents d WHERE d.text IS NOT NULL),
      |occ AS (SELECT pos.doc_id, p.pid, p.pat, count(*) AS occ
      |        FROM pos JOIN pats p
      |          ON substr(pos.text, pos.i, length(p.pat)) = p.pat
      |        GROUP BY 1, 2, 3)""".stripMargin

  /** DuckDB replay of UrlOps on the synthesized gate URLs: same parse
    * regex (RE2 ≡ Java on this pattern), same normalization rules.
    * `array_to_string([], ...)` is NULL in DuckDB (Spark's array_join
    * gives '') — the coalesce keeps the engines aligned on
    * tracking-only query strings. */
  private val urlNormSql =
    """WITH u AS (
      |  SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.CO.uk:443/Path/' || doc_id || '?utm_source=feed&b=2&a=1#frag'
      |    WHEN 1 THEN 'http://' || source || '.example.com:8080/' || lang || '/p?id=' || doc_id || '&ref=x&a=1'
      |    WHEN 2 THEN 'https://cdn.' || source || '.example.com.?fbclid=abc'
      |    ELSE 'not a url ' || doc_id END AS url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, url,
      |    regexp_matches(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$') AS ok,
      |    regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1) AS scheme0,
      |    regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2) AS rawhost,
      |    regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS port_s,
      |    regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS path0,
      |    regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 5) AS query0
      |  FROM u),
      |n AS (
      |  SELECT doc_id, url, ok,
      |    lower(scheme0) AS scheme, regexp_replace(lower(rawhost), '\.$', '') AS host,
      |    CASE WHEN port_s = '' THEN NULL ELSE CAST(port_s AS INT) END AS port,
      |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
      |    coalesce(array_to_string(list_sort(list_filter(str_split(query0, '&'),
      |      x -> x <> '' AND NOT starts_with(x, 'utm_')
      |        AND NOT str_split(x, '=')[1] IN ('gclid','fbclid','msclkid','yclid','ref'))), '&'), '') AS q
      |  FROM p),
      |f AS (
      |  SELECT doc_id, url,
      |    CASE WHEN NOT ok THEN NULL ELSE
      |      scheme || '://' || host ||
      |      CASE WHEN port IS NULL OR (scheme = 'http' AND port = 80)
      |                OR (scheme = 'https' AND port = 443)
      |           THEN '' ELSE ':' || port END ||
      |      path || CASE WHEN q = '' THEN '' ELSE '?' || q END
      |    END AS url_norm,
      |    CASE WHEN NOT ok THEN NULL ELSE host END AS host
      |  FROM n),
      |d AS (SELECT *, str_split(host, '.') AS labels FROM f),
      |norm AS (
      |  SELECT doc_id, url, url_norm, host,
      |    CASE WHEN host IS NULL THEN NULL
      |         WHEN len(labels) <= 1 THEN host
      |         WHEN len(labels) >= 3 AND length(labels[-1]) = 2
      |              AND labels[-2] IN ('co','com','net','org','gov','ac','edu')
      |         THEN array_to_string(labels[-3:], '.')
      |         ELSE array_to_string(labels[-2:], '.') END AS domain
      |  FROM d)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q385_vocab_growth" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |x AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM d),
        |tok AS (SELECT doc_id,
        |    unnest(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      s -> len(s) > 0)) AS w
        |  FROM d),
        |tb AS (SELECT (doc_id - lo) // ((hi - lo + 16) // 16) AS b,
        |         count(*) AS tk
        |       FROM tok, x GROUP BY 1),
        |iv AS (SELECT (fd - lo) // ((hi - lo + 16) // 16) AS b,
        |         count(*) AS nv
        |       FROM (SELECT w, min(doc_id) AS fd FROM tok GROUP BY 1), x
        |       GROUP BY 1),
        |sp AS (SELECT tb.b, tb.tk, coalesce(iv.nv, 0) AS nv
        |       FROM tb LEFT JOIN iv ON tb.b = iv.b)
        |SELECT CAST(a.b AS BIGINT) AS bucket,
        |  CAST(sum(u.tk) AS BIGINT) AS tokens_cum,
        |  CAST(sum(u.nv) AS BIGINT) AS vocab_cum,
        |  CAST((1000000 * CAST(sum(u.nv) AS HUGEINT)) // sum(u.tk)
        |       AS BIGINT) AS ttr_ppm
        |FROM sp a JOIN sp u ON u.b <= a.b
        |GROUP BY 1""".stripMargin,
    "q375_topic_boundaries" ->
      """WITH src AS (SELECT doc_id // 10 AS comp_id, doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN 'alpha beta gamma delta epsilon zeta eta theta'
        |      ELSE text END AS t
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |comp AS (SELECT comp_id AS doc_id,
        |    string_agg(t, '. ' ORDER BY doc_id) AS text
        |  FROM src GROUP BY 1),
        |s AS (SELECT doc_id,
        |    list_filter(list_transform(
        |        string_split_regex(text, '[.!?]+[ \t\n]+'),
        |        x -> trim(x)),
        |      x -> len(x) > 0) AS arr
        |  FROM comp),
        |sent AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |           arr[i] AS sen
        |         FROM (SELECT doc_id, arr,
        |                 unnest(range(1, len(arr)+1)) AS i FROM s)),
        |mx AS (SELECT doc_id, max(pos) AS maxp FROM sent GROUP BY 1),
        |sw AS (SELECT DISTINCT doc_id, pos, wd FROM (
        |         SELECT doc_id, pos,
        |           unnest(list_filter(
        |             string_split_regex(lower(sen), '[^a-z0-9]+'),
        |             x -> len(x) > 0)) AS wd
        |         FROM sent)),
        |spine AS (SELECT doc_id, CAST(unnest(range(1, maxp+1)) AS INT)
        |            AS g
        |          FROM mx WHERE maxp >= 1),
        |lw AS (SELECT DISTINCT sp.doc_id, sp.g, sw.wd
        |       FROM spine sp JOIN sw ON sw.doc_id = sp.doc_id
        |         AND sw.pos BETWEEN sp.g - 2 AND sp.g - 1),
        |rw AS (SELECT DISTINCT sp.doc_id, sp.g, sw.wd
        |       FROM spine sp JOIN sw ON sw.doc_id = sp.doc_id
        |         AND sw.pos BETWEEN sp.g AND sp.g + 1),
        |u AS (SELECT doc_id, g, wd, max(l) AS hl, max(r) AS hr FROM (
        |        SELECT doc_id, g, wd, 1 AS l, 0 AS r FROM lw
        |        UNION ALL
        |        SELECT doc_id, g, wd, 0, 1 FROM rw)
        |      GROUP BY 1, 2, 3),
        |pg AS (SELECT doc_id, g,
        |         sum(CASE WHEN hl = 1 AND hr = 1 THEN 1 ELSE 0 END)
        |           AS inter,
        |         count(*) AS uni
        |       FROM u GROUP BY 1, 2)
        |SELECT sp.doc_id AS comp_id, CAST(sp.g AS BIGINT) AS gap_pos,
        |  CAST(CASE WHEN uni IS NULL OR uni = 0 THEN NULL
        |       ELSE (1000000 * inter) // uni END AS BIGINT) AS sim_ppm,
        |  CAST(CASE WHEN uni IS NOT NULL AND uni > 0
        |              AND (1000000 * inter) // uni < 150000
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_boundary
        |FROM spine sp LEFT JOIN pg
        |  ON pg.doc_id = sp.doc_id AND pg.g = sp.g""".stripMargin,
    "q256_readability" ->
      """WITH d AS (SELECT lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |         AS BIGINT) sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |         AS BIGINT) syl
        |  FROM documents),
        |f AS (SELECT lang, words,
        |    CASE WHEN words = 0 THEN NULL ELSE
        |      (390*((1000*words)//sentences) + 11800*((1000*syl)//words))
        |        // 1000 - 15590 END AS fk_milli
        |  FROM d)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(words) AS BIGINT) AS words,
        |  CAST(sum(fk_milli) // count(*) AS BIGINT) AS mean_fk_milli
        |FROM f WHERE fk_milli IS NOT NULL GROUP BY 1""".stripMargin,
    "q232_url_normalize" -> (urlNormSql +
      "\nSELECT doc_id, url, url_norm, host, domain FROM norm"),
    "q233_domain_stats" -> (urlNormSql +
      """
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
        |  CAST(count(DISTINCT url_norm) AS BIGINT) AS n_urls
        |FROM norm WHERE domain IS NOT NULL GROUP BY 1""".stripMargin),
    "q234_frontier" -> (urlNormSql +
      """
        |SELECT doc_id, url_norm, host, priority,
        |  CAST((r - 1) // 2 AS INT) AS wave, CAST((r - 1) % 2 AS INT) AS slot
        |FROM (
        |  SELECT doc_id, url_norm, host, doc_id % 7 AS priority,
        |    row_number() OVER (PARTITION BY host
        |      ORDER BY doc_id % 7 DESC, url_norm, doc_id) AS r
        |  FROM norm WHERE url_norm IS NOT NULL)""".stripMargin),
    "q230_blocklist" -> (blocklistOccSql +
      """
        |SELECT d.doc_id,
        |  CAST(coalesce(o.np, 0) AS INT) AS n_patterns_hit,
        |  CAST(coalesce(o.no_, 0) AS BIGINT) AS n_occurrences
        |FROM documents d LEFT JOIN (
        |  SELECT doc_id, count(*) AS np, sum(occ) AS no_ FROM occ GROUP BY 1) o
        |  USING (doc_id)
        |WHERE d.text IS NOT NULL""".stripMargin),
    "q231_blocklist_hits" -> (blocklistOccSql +
      """
        |SELECT doc_id, pid, pat AS pattern, CAST(occ AS BIGINT) AS occ
        |FROM occ""".stripMargin),
    "q184_collocations" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
        |grams AS (
        |  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS gram
        |  FROM documents),
        |bg AS (SELECT string_split(gram, ' ')[1] AS w1, string_split(gram, ' ')[2] AS w2 FROM grams),
        |pairs AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_cnt
        |          FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
        |scored AS (SELECT p.w1, p.w2, p.pair_cnt,
        |  CAST((CAST(p.pair_cnt AS HUGEINT) * n.n_total * 1000000)
        |       // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS ppm
        |  FROM pairs p JOIN uni a ON a.w = p.w1 JOIN uni b ON b.w = p.w2 CROSS JOIN n)
        |SELECT w1, w2, pair_cnt, ppm FROM scored
        |ORDER BY ppm DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin,
    "q170_chat_render" ->
      """WITH w AS (SELECT doc_id AS conv_id,
        |        list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |      FROM documents),
        |t0 AS (SELECT conv_id, CAST(k AS BIGINT) AS idx,
        |         array_to_string(ws[8*k+1 : 8*k+8], ' ') AS content
        |       FROM (SELECT conv_id, ws,
        |               unnest(range(0, CAST(ceil(len(ws)/8.0) AS BIGINT))) AS k
        |             FROM w WHERE len(ws) >= 1)),
        |turns AS (SELECT conv_id, idx,
        |            CASE WHEN (idx + CASE WHEN conv_id % 7 = 0 THEN 1 ELSE 0 END) % 2 = 0
        |                 THEN 'user' ELSE 'assistant' END AS role, content
        |          FROM t0),
        |r AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
        |        string_agg('<|im_start|>' || role || chr(10) || content ||
        |                   '<|im_end|>' || chr(10), '' ORDER BY idx)
        |          || '<|endoftext|>' AS rendered
        |      FROM turns GROUP BY conv_id)
        |SELECT conv_id, n_turns, rendered, CAST(len(rendered) AS INT) AS n_chars
        |FROM r""".stripMargin,
    "q171_chat_validate" ->
      """WITH w AS (SELECT doc_id AS conv_id,
        |        list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |      FROM documents),
        |t0 AS (SELECT conv_id, CAST(k AS BIGINT) AS idx,
        |         array_to_string(ws[8*k+1 : 8*k+8], ' ') AS content
        |       FROM (SELECT conv_id, ws,
        |               unnest(range(0, CAST(ceil(len(ws)/8.0) AS BIGINT))) AS k
        |             FROM w WHERE len(ws) >= 1)),
        |turns AS (SELECT conv_id, idx,
        |            CASE WHEN (idx + CASE WHEN conv_id % 7 = 0 THEN 1 ELSE 0 END) % 2 = 0
        |                 THEN 'user' ELSE 'assistant' END AS role, content
        |          FROM t0
        |  UNION ALL SELECT 9000011, 0, 'user', 'hi'
        |  UNION ALL SELECT 9000011, 2, 'assistant', '  '),
        |f AS (SELECT conv_id, min(idx) AS imin FROM turns GROUP BY 1),
        |v AS (SELECT t.conv_id, CAST(count(*) AS BIGINT) AS n_turns,
        |        CAST(min(CASE WHEN t.idx = f.imin THEN (t.role = 'user')::INT END) AS INT) AS starts_user,
        |        CAST(min((t.role = CASE WHEN (t.idx - f.imin) % 2 = 0
        |                  THEN 'user' ELSE 'assistant' END)::INT) AS INT) AS alternates,
        |        CAST((max_by(t.role, t.idx) = 'assistant')::INT AS INT) AS ends_assistant,
        |        CAST((max(t.idx) - min(t.idx) + 1 = count(*)
        |              AND count(DISTINCT t.idx) = count(*))::INT AS INT) AS contiguous,
        |        CAST(max((t.content IS NULL OR trim(t.content) = '')::INT) AS INT) AS has_empty
        |      FROM turns t JOIN f ON f.conv_id = t.conv_id
        |      GROUP BY t.conv_id)
        |SELECT *, CAST(starts_user * alternates * ends_assistant * contiguous
        |               * (1 - has_empty) AS INT) AS valid
        |FROM v""".stripMargin,
    "q172_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '?', 'g') AS t FROM documents),
        |pos AS (SELECT doc_id, t, unnest(range(1, len(t)+1)) AS p FROM d),
        |h AS (SELECT doc_id, t, p,
        |        list_sum(list_transform(range(0, 16),
        |          j -> unicode(substr(t, CAST(p - j AS INT), 1)) *
        |               [1,257,66049,974545,457315,529604,107820,709659,381817,126675,555379,731977,117525,203835,385439,57526][CAST(j+1 AS INT)]
        |               % 1000003)) % 1000003 AS hv
        |      FROM pos WHERE p >= 16),
        |bnd AS (SELECT doc_id, p FROM h WHERE p < len(t) AND hv % 32 = 0),
        |c AS (SELECT d.doc_id, d.t,
        |        list_prepend(CAST(0 AS BIGINT),
        |          coalesce(list(bnd.p ORDER BY bnd.p) FILTER (WHERE bnd.p IS NOT NULL), []))
        |          || [CAST(len(d.t) AS BIGINT)] AS cuts
        |      FROM d LEFT JOIN bnd ON bnd.doc_id = d.doc_id
        |      GROUP BY d.doc_id, d.t)
        |SELECT doc_id, CAST(k - 1 AS INT) AS chunk_idx,
        |  substr(t, CAST(cuts[CAST(k AS INT)] + 1 AS INT),
        |         CAST(cuts[CAST(k+1 AS INT)] - cuts[CAST(k AS INT)] AS INT)) AS chunk
        |FROM (SELECT doc_id, t, cuts, unnest(range(1, len(cuts))) AS k FROM c)""".stripMargin,
    "q173_hll_intersect" ->
      """WITH h AS (SELECT lang, doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS h
        |           FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT lang, doc_id, h % 64 AS bucket, h // 64 AS w FROM h),
        |r AS (SELECT lang, doc_id % 3 AS m, bucket,
        |        CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rho FROM b),
        |ra AS (SELECT lang, bucket, max(rho) AS r FROM r WHERE m IN (0, 1) GROUP BY 1, 2),
        |rb AS (SELECT lang, bucket, max(rho) AS r FROM r WHERE m IN (1, 2) GROUP BY 1, 2),
        |ru AS (SELECT lang, bucket, max(r) AS r
        |       FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1, 2),
        |ca AS (SELECT lang, CAST(count(*) AS INT) AS n_buckets_a,
        |         CAST(sum(1::HUGEINT << (55 - r)) + (64 - count(*)) * (1::HUGEINT << 55) AS BIGINT) AS denom_a
        |       FROM ra GROUP BY 1),
        |cb AS (SELECT lang, CAST(count(*) AS INT) AS n_buckets_b,
        |         CAST(sum(1::HUGEINT << (55 - r)) + (64 - count(*)) * (1::HUGEINT << 55) AS BIGINT) AS denom_b
        |       FROM rb GROUP BY 1),
        |cu AS (SELECT lang, CAST(count(*) AS INT) AS n_buckets_u,
        |         CAST(sum(1::HUGEINT << (55 - r)) + (64 - count(*)) * (1::HUGEINT << 55) AS BIGINT) AS denom_u
        |       FROM ru GROUP BY 1)
        |SELECT ca.lang, ca.n_buckets_a, ca.denom_a, cb.n_buckets_b, cb.denom_b,
        |       cu.n_buckets_u, cu.denom_u
        |FROM ca JOIN cb ON cb.lang = ca.lang JOIN cu ON cu.lang = ca.lang""".stripMargin,
    "q164_orc_roundtrip" ->
      "SELECT doc_id, lang, source, n_chars, text FROM documents",
    "q165_schema_merge" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 2 = 1 THEN n_chars END AS score
        |FROM documents""".stripMargin,
    "q167_wordpiece" ->
      """WITH RECURSIVE vocab(tok) AS (SELECT unnest([
        |    'a','b','c','d','f','g','h','j','k','l','m','o','p',
        |    'r','s','t','v','sc','st','sp','me','or','da','hash',
        |    '##a','##b','##c','##d','##e','##g','##h','##i','##k',
        |    '##l','##m','##n','##o','##p','##r','##s','##t','##u',
        |    '##w','##y','##an','##il','##ter','##le','##ream'])),
        |d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws FROM documents),
        |wp AS (SELECT doc_id, i, ws[i] AS w
        |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS i FROM d)),
        |words(w) AS (SELECT DISTINCT w FROM wp),
        |step(w, pos, toks, failed) AS (
        |  SELECT w, 1, CAST([] AS VARCHAR[]), false FROM words
        |  UNION ALL
        |  SELECT s.w, s.pos + CAST(coalesce(m.plen, len(s.w)+1) AS INT),
        |         CASE WHEN m.tok IS NULL THEN ['[UNK]'] ELSE list_append(s.toks, m.tok) END,
        |         m.tok IS NULL
        |  FROM step s LEFT JOIN LATERAL (
        |    SELECT max_by(v.tok, CASE WHEN s.pos=1 THEN len(v.tok) ELSE len(v.tok)-2 END) AS tok,
        |           max(CASE WHEN s.pos=1 THEN len(v.tok) ELSE len(v.tok)-2 END) AS plen
        |    FROM vocab v
        |    WHERE (s.pos = 1 AND v.tok NOT LIKE '##%' AND v.tok = substr(s.w, 1, len(v.tok)))
        |       OR (s.pos > 1 AND v.tok LIKE '##%' AND substr(v.tok, 3) = substr(s.w, s.pos, len(v.tok)-2))
        |  ) m ON true
        |  WHERE s.pos <= len(s.w) AND NOT s.failed),
        |enc AS (SELECT w, toks FROM step WHERE pos > len(w))
        |SELECT wp.doc_id,
        |  string_agg(array_to_string(enc.toks, ' '), ' ' ORDER BY wp.i) AS toks,
        |  CAST(sum(len(enc.toks)) AS INT) AS n_subwords
        |FROM wp JOIN enc ON enc.w = wp.w
        |GROUP BY wp.doc_id""".stripMargin,
    "q166_stride_quantiles" ->
      """WITH src AS (SELECT l_extendedprice AS v, l_orderkey*8 + l_linenumber AS id FROM lineitem),
        |h AS (SELECT v, id, (('0x'||substring(md5(CAST(id AS VARCHAR)),1,15))::BIGINT) % 16 AS shard FROM src),
        |r AS (SELECT shard, v, id, CAST(row_number() OVER (PARTITION BY shard ORDER BY v, id) AS BIGINT) AS rn,
        |             count(*) OVER (PARTITION BY shard) AS cnt FROM h),
        |blk AS (SELECT shard, rn, v, cnt, (rn-1) // 50 AS b,
        |               least(50, cnt - ((rn-1)//50)*50) AS sz FROM r),
        |samp AS (SELECT shard, rn, v, sz AS w FROM blk WHERE rn - b*50 = (sz+1)//2),
        |ord AS (SELECT shard, rn, v, w,
        |          sum(w) OVER (ORDER BY v, shard, rn ROWS UNBOUNDED PRECEDING) AS cumw FROM samp),
        |tot AS (SELECT sum(w) AS W FROM samp),
        |qs AS (SELECT CAST(unnest([250, 500, 900, 990]) AS INT) AS q)
        |SELECT qs.q, min(ord.v) AS est
        |FROM ord, tot, qs WHERE ord.cumw * 1000 >= qs.q * tot.W
        |GROUP BY qs.q""".stripMargin,
    "q154_text_formats" ->
      """SELECT 'jsonl' AS fmt, doc_id, lang, n_chars, text FROM documents
        |UNION ALL
        |SELECT 'csv' AS fmt, doc_id, lang, n_chars, text FROM documents""".stripMargin,
    "q155_sentences" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT 9000001, 'First one. Second here! Third? The end.'
        |  UNION ALL SELECT 9000002, 'no terminal punctuation here'
        |  UNION ALL SELECT 9000003, 'Dr. Smith arrived... Then left! Done.'),
        |s AS (SELECT doc_id,
        |        list_filter(list_transform(string_split_regex(text, '[.!?]+[ \t\n]+'),
        |                                   x -> trim(x)),
        |                    x -> len(x) > 0) AS sents
        |      FROM corpus)
        |SELECT doc_id, CAST(i - 1 AS INT) AS idx, sents[i] AS sentence
        |FROM (SELECT doc_id, sents, unnest(range(1, len(sents)+1)) AS i FROM s)""".stripMargin,
    "q153_corpus_report" ->
      """WITH corpus AS (
        |  SELECT lang, text FROM documents
        |  UNION ALL SELECT lang, text FROM documents WHERE doc_id % 4 = 0),
        |c AS (
        |  SELECT lang, text,
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
        |  FROM corpus),
        |k AS (SELECT lang, text,
        |  CASE WHEN n_words BETWEEN 30 AND 100000
        |        AND n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
        |        AND 1000 * (n_hash + n_ellipsis) <= 100 * n_words
        |        AND 1000 * n_bullet_lines <= 900 * n_lines
        |        AND 1000 * n_ellipsis_lines <= 300 * n_lines
        |        AND 1000 * n_alpha_words >= 800 * n_words
        |        AND n_stopwords_present >= 1
        |       THEN 1 ELSE 0 END AS keep,
        |  n_words FROM c)
        |SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT ('0x' || substring(md5(text),1,15))::BIGINT) AS BIGINT) AS n_distinct,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(sum(n_words) AS BIGINT) AS total_tokens,
        |  CAST(min(length(text)) AS INT) AS min_chars,
        |  CAST(max(length(text)) AS INT) AS max_chars,
        |  CAST(sum(keep) AS BIGINT) AS n_quality,
        |  CAST((1000 * (count(*) - count(DISTINCT ('0x' || substring(md5(text),1,15))::BIGINT))) // count(*) AS BIGINT) AS dup_pm,
        |  CAST((1000 * sum(keep)) // count(*) AS BIGINT) AS quality_pm
        |FROM k GROUP BY 1""".stripMargin,
    "q150_stream_cm_sketch" ->
      """WITH tk AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
        |c AS (SELECT i, ('0x' || substring(md5(i::VARCHAR || ':' || w),1,15))::BIGINT % 256 AS bucket
        |      FROM tk CROSS JOIN (SELECT unnest([0,1,2]) AS i) s)
        |SELECT CAST(i AS INT) AS row, bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q151_hist_sketch" ->
      """WITH hs AS (SELECT doc_id % 2 AS s, greatest(0, least(39, (n_chars - 0) // 50)) AS bin
        |            FROM documents WHERE n_chars IS NOT NULL),
        |sh AS (SELECT s, bin, count(*) AS cnt FROM hs GROUP BY 1, 2),
        |m AS (SELECT bin, sum(cnt) AS cnt FROM sh GROUP BY 1),
        |c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM m),
        |n AS (SELECT sum(cnt) AS n FROM m),
        |p AS (SELECT * FROM (VALUES ('p50', 500), ('p90', 900), ('p99', 990)) t(label, pm))
        |SELECT p.label, min(c.bin) AS bin,
        |  CAST(0 + min(c.bin) * 50 AS BIGINT) AS lo,
        |  CAST(0 + (min(c.bin) + 1) * 50 - 1 AS BIGINT) AS hi
        |FROM c CROSS JOIN n JOIN p ON c.cum >= (p.pm * n.n + 999) // 1000
        |GROUP BY 1""".stripMargin,
    "q146_cm_registers" ->
      """WITH tk AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
        |c AS (SELECT i, ('0x' || substring(md5(i::VARCHAR || ':' || w),1,15))::BIGINT % 256 AS bucket
        |      FROM tk CROSS JOIN (SELECT unnest([0,1,2]) AS i) s)
        |SELECT CAST(i AS INT) AS row, bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q147_cm_merge_query" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |cell AS (SELECT doc_id, i, ('0x' || substring(md5(i::VARCHAR || ':' || w),1,15))::BIGINT % 256 AS bucket
        |         FROM tk CROSS JOIN (SELECT unnest([0,1,2]) AS i) s),
        |rA AS (SELECT i, bucket, count(*) AS cnt FROM cell WHERE doc_id % 2 = 0 GROUP BY 1,2),
        |rB AS (SELECT i, bucket, count(*) AS cnt FROM cell WHERE doc_id % 2 = 1 GROUP BY 1,2),
        |m AS (SELECT i, bucket, sum(cnt) AS cnt FROM (SELECT * FROM rA UNION ALL SELECT * FROM rB) GROUP BY 1,2),
        |probe AS (SELECT DISTINCT w FROM tk WHERE doc_id < 20),
        |pc AS (SELECT w, i, ('0x' || substring(md5(i::VARCHAR || ':' || w),1,15))::BIGINT % 256 AS bucket
        |       FROM probe CROSS JOIN (SELECT unnest([0,1,2]) AS i) s)
        |SELECT pc.w AS w, CAST(min(coalesce(m.cnt, 0)) AS BIGINT) AS estimate
        |FROM pc LEFT JOIN m ON m.i = pc.i AND m.bucket = pc.bucket
        |GROUP BY 1""".stripMargin,
    "q148_strip_markup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT 9000001, '<html><head><title>T</title><style>p {color: red;}</style></head><body><p>Hello &amp; welcome</p><!-- hidden note --><script type="text/javascript">var x = 1<2 && y>0;</script><div class="x">a &lt;tag&gt; b</div></body></html>'
        |  UNION ALL SELECT 9000002, 'price is 3 < 5 and x &gt; 2 with &quot;quotes&quot; plus &#39;apostrophe&#39; and&nbsp;space'
        |  UNION ALL SELECT 9000003, '<ul>' || chr(10) || '<li>one</li>' || chr(10) || '<li>two</li>' || chr(10) || '</ul>' || chr(10) || chr(10) || 'trailing   text  here'),
        |s1 AS (SELECT doc_id, text,
        |  regexp_replace(text, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS a FROM corpus),
        |s2 AS (SELECT doc_id, text, regexp_replace(a, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS a FROM s1),
        |s3 AS (SELECT doc_id, text, regexp_replace(a, '(?s)<!--.*?-->', ' ', 'g') AS a FROM s2),
        |s4 AS (SELECT doc_id, text, regexp_replace(a, '</?[A-Za-z!][^>]*>', ' ', 'g') AS a FROM s3),
        |s5 AS (SELECT doc_id, text,
        |  replace(replace(replace(replace(replace(replace(a,
        |    '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
        |    '&quot;', '"'), '&#39;', '''') AS a FROM s4)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '</?[A-Za-z!][^>]*>')) AS INT) AS n_tags,
        |  trim(regexp_replace(a, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text
        |FROM s5""".stripMargin,
    "q149_langid_trained" ->
      """WITH lt AS (SELECT doc_id, lang, lower(text) AS lt FROM documents),
        |g AS (SELECT doc_id, lang, substring(lt, i, 3) AS gram
        |      FROM (SELECT doc_id, lang, lt, unnest(generate_series(1, greatest(len(lt)-2, 0))) AS i FROM lt)),
        |prof AS (SELECT label, gram, rank FROM (
        |    SELECT lang AS label, gram, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rank
        |    FROM (SELECT lang, gram, count(*) AS cnt FROM g GROUP BY 1,2))
        |  WHERE rank <= 100),
        |dg AS (SELECT doc_id, gram, count(*) AS dc FROM g GROUP BY 1,2),
        |sc AS (SELECT doc_id, label, sum(dc * (101 - rank)) AS score
        |       FROM dg JOIN prof USING (gram) GROUP BY 1,2),
        |best AS (SELECT doc_id, label, score FROM (
        |    SELECT doc_id, label, score, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
        |    FROM sc) WHERE rn = 1)
        |SELECT d.doc_id, coalesce(b.label, 'und') AS lang_pred,
        |       CAST(coalesce(b.score, 0) AS BIGINT) AS score
        |FROM documents d LEFT JOIN best b USING (doc_id)""".stripMargin,
    "q145_vocab_decode" ->
      """WITH v AS (
        |  SELECT w
        |  FROM (SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w ASC) AS rn
        |        FROM (SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |              FROM (SELECT unnest(string_split(text, ' ')) AS w
        |                    FROM documents) GROUP BY 1))
        |  WHERE rn <= 20),
        |tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS w,
        |         unnest(range(0, len(string_split(text,' ')))) AS pos FROM documents)
        |SELECT doc_id,
        |  string_agg(CASE WHEN v.w IS NOT NULL THEN tk.w ELSE '<unk>' END, ' ' ORDER BY pos) AS text
        |FROM tk LEFT JOIN v USING (w) GROUP BY 1""".stripMargin,
    "q144_hll_merge" ->
      """WITH h AS (SELECT lang, doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS h
        |           FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT lang, doc_id, h % 64 AS bucket, h // 64 AS w FROM h),
        |rA AS (SELECT lang, bucket, max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS r
        |       FROM b WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |rB AS (SELECT lang, bucket, max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS r
        |       FROM b WHERE doc_id % 2 = 1 GROUP BY 1, 2),
        |m AS (SELECT lang, bucket, max(r) AS r
        |      FROM (SELECT * FROM rA UNION ALL SELECT * FROM rB) GROUP BY 1, 2)
        |SELECT lang, CAST(count(*) AS INT) AS n_buckets,
        |  CAST(sum(1::HUGEINT << (55 - r)) + (64 - count(*)) * (1::HUGEINT << 55) AS BIGINT) AS denom_units
        |FROM m GROUP BY 1""".stripMargin,
    "q139_rouge_overlap" ->
      """WITH raw AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
        |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i
        |            FROM raw WHERE len(toks) >= 2)),
        |gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS t FROM gc GROUP BY 1),
        |p AS (SELECT a.doc_id AS cand_id, a.doc_id + 1 AS ref_id
        |      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        |ov AS (SELECT p.cand_id, p.ref_id, sum(least(ca.c, rb.c)) AS ov
        |       FROM p JOIN gc ca ON ca.doc_id = p.cand_id
        |             JOIN gc rb ON rb.doc_id = p.ref_id AND rb.gram = ca.gram
        |       GROUP BY 1, 2)
        |SELECT p.cand_id, p.ref_id,
        |  CAST(coalesce(ct.t, 0) AS BIGINT) AS cand_grams,
        |  CAST(coalesce(rt.t, 0) AS BIGINT) AS ref_grams,
        |  CAST(coalesce(ov.ov, 0) AS BIGINT) AS overlap,
        |  CAST(CASE WHEN coalesce(rt.t, 0) > 0 THEN (1000 * coalesce(ov.ov, 0)) // rt.t ELSE 0 END AS BIGINT) AS recall_pm,
        |  CAST(CASE WHEN coalesce(ct.t, 0) > 0 THEN (1000 * coalesce(ov.ov, 0)) // ct.t ELSE 0 END AS BIGINT) AS precision_pm
        |FROM p LEFT JOIN tot ct ON ct.doc_id = p.cand_id
        |       LEFT JOIN tot rt ON rt.doc_id = p.ref_id
        |       LEFT JOIN ov ON ov.cand_id = p.cand_id AND ov.ref_id = p.ref_id""".stripMargin,
    "q140_key_skew" ->
      """SELECT lang, source, count(*) AS cnt,
        |  (1000 * count(*)) // t.total AS share_pm
        |FROM documents CROSS JOIN (SELECT count(*) AS total FROM documents) t
        |GROUP BY lang, source, t.total
        |ORDER BY cnt DESC, lang, source LIMIT 10""".stripMargin,
    "q136_hll_registers" ->
      """WITH h AS (SELECT lang, ('0x' || substring(md5(text), 1, 15))::BIGINT AS h
        |           FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT lang, h % 64 AS bucket, h // 64 AS w FROM h)
        |SELECT lang, bucket,
        |       CAST(max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS INT) AS r
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q131_len_quantiles" ->
      """WITH c AS (SELECT lang AS g, n_chars AS v, count(*) AS cnt
        |           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum FROM c),
        |n AS (SELECT g, sum(cnt) AS n FROM c GROUP BY 1),
        |p AS (SELECT * FROM (VALUES ('p50', 500), ('p90', 900), ('p99', 990)) t(label, pm))
        |SELECT r.g AS lang, p.label, min(r.v) AS q
        |FROM r JOIN n USING (g) CROSS JOIN p
        |WHERE r.cum >= (p.pm * n.n + 999) // 1000
        |GROUP BY 1, 2
        |UNION ALL
        |SELECT 'all' AS lang, p.label, min(r.v) AS q FROM
        | (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum
        |  FROM (SELECT n_chars AS v, count(*) AS cnt FROM documents
        |        WHERE n_chars IS NOT NULL GROUP BY 1)) r
        | CROSS JOIN (SELECT count(*) AS n FROM documents
        |             WHERE n_chars IS NOT NULL) n
        | CROSS JOIN (SELECT * FROM (VALUES ('p50', 500), ('p90', 900),
        |             ('p99', 990)) t(label, pm)) p
        |WHERE r.cum >= (p.pm * n.n + 999) // 1000
        |GROUP BY 2""".stripMargin,
    "q132_len_histogram" ->
      """WITH s AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx
        |           FROM documents WHERE n_chars IS NOT NULL),
        |w AS (SELECT mn, (mx - mn + 8) // 8 AS w FROM s)
        |SELECT (d.n_chars - w.mn) // w.w AS bin,
        |       w.mn + ((d.n_chars - w.mn) // w.w) * w.w AS lo,
        |       w.mn + ((d.n_chars - w.mn) // w.w + 1) * w.w - 1 AS hi,
        |       count(*) AS cnt
        |FROM documents d CROSS JOIN w
        |WHERE d.n_chars IS NOT NULL
        |GROUP BY 1, 2, 3""".stripMargin,
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
    "q24_lang_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | min(doc_id) AS min_doc_id FROM documents GROUP BY lang""".stripMargin,
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
    "q200_kappa" ->
      """WITH t AS (SELECT lang AS a, CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END AS b FROM documents),
        |c AS (SELECT a, b, count(*) AS n FROM t GROUP BY 1,2),
        |r AS (SELECT a AS l, sum(n) AS rr FROM c GROUP BY 1),
        |k AS (SELECT b AS l, sum(n) AS cc FROM c GROUP BY 1),
        |pe AS (SELECT sum(r.rr*k.cc) AS rc FROM r JOIN k ON k.l = r.l),
        |po AS (SELECT sum(n) AS n, sum(CASE WHEN a=b THEN n ELSE 0 END) AS agree FROM c)
        |SELECT CAST(po.n AS BIGINT) AS n, CAST(po.agree AS BIGINT) AS n_agree,
        |  CAST(CASE WHEN po.n*po.n = pe.rc THEN 0
        |   ELSE (1000000*(po.n*po.agree - pe.rc)) // (po.n*po.n - pe.rc) END AS BIGINT) AS kappa_ppm
        |FROM po, pe""".stripMargin,
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
    // top-50 vocabulary, total (cnt DESC, token ASC) order
    "q75_vocab" ->
      """SELECT w, cnt, CAST(rn AS INT) AS vocab_id
        |FROM (SELECT w, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, w ASC) AS rn
        |      FROM (SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |            FROM (SELECT unnest(string_split(text, ' ')) AS w
        |                  FROM documents) GROUP BY 1))
        |WHERE rn <= 50""".stripMargin,
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
    // per-(lang, band) type/occurrence counts; bin() agrees bit-for-bit
    "q107_freq_spectrum" ->
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT lang, w, count(*) AS cnt FROM w GROUP BY 1, 2)
        |SELECT lang, CAST(length(bin(cnt)) - 1 AS INT) AS band,
        |  count(*) AS n_types, CAST(sum(cnt) AS BIGINT) AS n_occurrences
        |FROM c GROUP BY 1, 2""".stripMargin,
  )
}
