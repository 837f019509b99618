package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-based bigram language model over a corpus — the classic
  * LM-quality signal of a training-data pipeline (KenLM-style scoring:
  * docs whose bigrams are improbable under the corpus model are
  * gibberish/boilerplate candidates). No reference analog; gate query
  * q64.
  *
  * Execution shape: one bigram explosion (map-only, stays in codegen —
  * TextShingles), ONE groupBy(w1, w2) for pair counts; head counts
  * attach as a window sum over the head word (re-aggregating the
  * already-counted pairs, never the raw token stream twice). The
  * follower ranking windows per HEAD WORD — millions of small
  * partitions, never a global sort. Scoring joins doc bigrams to the
  * model on (w1, w2): a plain shuffle join keyed by the bigram —
  * vocabulary-sized, not corpus-sized.
  */
object LanguageModel {

  /** Bigram model: (w1, w2, pair_cnt, head_cnt) for every observed
    * bigram. `head_cnt` = Σ pair_cnt over the head word — the
    * conditional-probability denominator P(w2|w1) = pair_cnt/head_cnt.
    *
    * head_cnt attaches by RE-AGGREGATING the pair counts on the head
    * word and joining back — not a window over the w1 partition: a hot
    * head word ("the") has vocabulary-many followers, and the window
    * form sorts that whole partition in one task, the same de-skew
    * argument that moved the TF-IDF df counts (round 4) and brute-force
    * top-k (round 6) off windows. The corpus is still tokenized ONCE:
    * both consumers sit above the same Exchange(w1, w2) over the
    * explode+partial-count subtree, which Catalyst's ReuseExchange
    * dedups (plan-audited in LanguageModelSpec — the lineage-linear
    * window form was kept only out of fear this reuse wouldn't
    * materialize; it does, and the post-shuffle re-aggregate is
    * vocabulary-sized, so the join costs one extra vocabulary-keyed
    * exchange, not a corpus pass). */
  def bigramModel(docs: DataFrame, textCol: String): DataFrame = {
    val bg = docs.select(
        explode(TextShingles.wordBigrams(col(textCol))).as("gram"))
      .select(substring_index(col("gram"), " ", 1).as("w1"),
              substring_index(col("gram"), " ", -1).as("w2"))
    val pairs = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("pair_cnt"))
    val heads = pairs.groupBy(col("w1"))
      .agg(sum(col("pair_cnt")).as("head_cnt"))
    pairs.join(heads, Seq("w1"))
  }

  /** Gate form: top-k followers of every frequent head word by RATIONAL
    * conditional probability — one decimal division rounded to
    * DECIMAL(18,6) identically in both engines (ln() is not
    * cross-engine bit-stable; [[docAvgLogProb]] is the production
    * scorer). Ties break on the follower word. */
  def topFollowers(docs: DataFrame, textCol: String,
                   minHeadCount: Long, k: Int): DataFrame = {
    val d4 = "decimal(18,4)"
    val p6 = (col("pair_cnt").cast(d4) / col("head_cnt").cast(d4))
      .cast("decimal(18,6)")
    val byHead = Window.partitionBy(col("w1"))
      .orderBy(col("p6").desc, col("w2").asc)
    bigramModel(docs, textCol)
      .filter(col("head_cnt") >= minHeadCount)
      .withColumn("p6", p6)
      .withColumn("rnk", row_number().over(byHead))
      .filter(col("rnk") <= k)
      .select(col("w1"), col("w2"), col("pair_cnt"), col("head_cnt"),
              col("rnk"), col("p6").cast("double").as("cond_p"))
  }

  /** Gate form of [[docAvgLogProb]]: per-document RATIONAL bigram
    * conditional-probability mass under the model — cross-engine
    * bit-stable (ln() is not): per bigram p6 = pair_cnt/head_cnt as in
    * [[topFollowers]] (one decimal division, rounded to DECIMAL(18,6)
    * identically in both engines), unseen bigrams contribute exactly 0,
    * and the doc score is the EXACT decimal sum of p6 plus the bigram
    * count — no final division: avg = sum/n ties at the rounding digit
    * for round divisors (sum/40 midpoints), and Spark (decimal
    * HALF_UP) and an engine rounding via double disagree on ties.
    * Threshold on the average by CROSS-MULTIPLICATION instead:
    * avg ≥ T  ⟺  sum_p6 ≥ T·n_bigrams, both sides exact decimals.
    * Higher mass per bigram = the doc's bigrams are more typical of
    * the model corpus. Docs without bigrams (< 2 tokens) get
    * sum_p6 = 0, n_bigrams = 0 — present exactly once; note they pass
    * a cross-multiplied bar VACUOUSLY (0 ≥ T·0), so add
    * `n_bigrams > 0` when evidence-less docs must fail. Same join
    * shape as [[docAvgLogProb]]: model keyed by (w1, w2) —
    * vocabulary-sized, AQE-splittable, never a window. */
  def docCondProbMassDeterministic(docs: DataFrame, idCol: String,
                                   textCol: String,
                                   modelDocs: Option[DataFrame] = None)
      : DataFrame = {
    val scored = docCondProbMassScores(docs, idCol, textCol, modelDocs)
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("sum_p6"), lit(0).cast("decimal(38,6)")).as("sum_p6"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  /** [[docCondProbMassDeterministic]] restricted to docs that HAVE
    * bigrams (≥ 2 tokens) — the inner form, without the id-frame left
    * join. Callers that re-join the scores to the corpus anyway (the
    * q66 curation pipeline) save one full corpus scan; callers that
    * need every input id exactly once use the public wrapper above. */
  def docCondProbMassScores(docs: DataFrame, idCol: String,
                            textCol: String,
                            modelDocs: Option[DataFrame] = None): DataFrame = {
    val d4 = "decimal(18,4)"; val d6 = "decimal(18,6)"
    val model = bigramModel(modelDocs.getOrElse(docs), textCol)
      .select(col("w1"), col("w2"),
        (col("pair_cnt").cast(d4) / col("head_cnt").cast(d4))
          .cast(d6).as("p6"))
    val docBg = docs.select(col(idCol).as("doc_id"),
        explode(TextShingles.wordBigrams(col(textCol))).as("gram"))
      .select(col("doc_id"),
              substring_index(col("gram"), " ", 1).as("w1"),
              substring_index(col("gram"), " ", -1).as("w2"))
    docBg.join(model, Seq("w1", "w2"), "left")
      .select(col("doc_id"),
        coalesce(col("p6"), lit(0).cast(d6)).as("p6"))
      .groupBy(col("doc_id"))
      .agg(sum(col("p6")).cast("decimal(38,6)").as("sum_p6"),
           count(lit(1)).as("n_bigrams"))
  }

  /** CORPUS TOKENIZATION TO VOCAB IDS — the final doc → id-sequence
    * step a trainer consumes: every token maps through the `vocab`
    * frame ([[buildVocab]]'s (w, vocab_id) shape) with out-of-vocab
    * tokens mapped to `oovId`. Returns (doc_id, n_tokens, n_oov,
    * ids) with `ids` the space-joined id sequence in token order (a
    * string surface renders identically through every readback path;
    * split on ' ' for the array).
    *
    * Shape: tokens posexplode inside the scan stage, the vocab rides a
    * k-row broadcast (the [[oovCounts]] precedent), per-doc reassembly
    * is an array_sort bounded by one document — never a corpus
    * window. */
  def encodeWithVocab(docs: DataFrame, idCol: String, textCol: String,
                      vocab: DataFrame, oovId: Int = 0): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextShingles.words(col(textCol))).as(Seq("pos", "w")))
      .join(broadcast(vocab.select(col("w"), col("vocab_id"))),
        Seq("w"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("vocab_id"), lit(oovId)).as("tid"))
    toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("tid") === oovId, 1)).as("n_oov"),
        array_sort(collect_list(struct(col("pos"), col("tid"))))
          .as("__ts"))
      .withColumn("ids", array_join(
        transform(col("__ts"), s => s.getField("tid").cast("string")), " "))
      .drop("__ts")
  }

  /** Inverse of [[encodeWithVocab]] — id sequences back to token text
    * (the detokenization half of the round trip a trainer's data
    * loader and eval harness both need): each id maps through the
    * vocab, ids absent from it (the OOV id included, unless the vocab
    * maps it) render as `unkToken`. Same shape as the encoder: k-row
    * broadcast join inside the scan stage, per-doc array_sort
    * reassembly bounded by one document, space-joined string surface.
    * Round-trip contract (spec-pinned): decode(encode(d)) equals d
    * with every OOV word replaced by `unkToken`. */
  def decodeWithVocab(encoded: DataFrame, vocab: DataFrame,
                      unkToken: String = "<unk>"): DataFrame = {
    val toks = encoded.select(col("doc_id"),
        posexplode(split(col("ids"), " ")).as(Seq("pos", "tid")))
      .withColumn("tid", col("tid").cast("int"))
      .join(broadcast(vocab.select(col("vocab_id").as("tid"), col("w"))),
        Seq("tid"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("w"), lit(unkToken)).as("tok"))
    toks.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("tok"))))
        .as("__ts"))
      .withColumn("text",
        array_join(transform(col("__ts"), s => s.getField("tok")), " "))
      .drop("__ts")
  }

  /** CCNet-style LM-quality bucketing (Wenzek et al. 2020): rank every
    * document by how typical its bigrams are of the model corpus and
    * cut the ranking into `buckets` equal tiers — bucket 1 = "head"
    * (most model-like), last = "tail" (least; CCNet trains on head+
    * middle). The per-doc score is the integer MICRO-average
    * `(sum_p6·10⁶) DIV n_bigrams` — exact floor division in both
    * engines, where the rational average sum/n would tie at the
    * rounding digit (the NOTES rule). Docs without bigrams (< 2
    * tokens) score −1 and sink to the tail, documented.
    *
    * Shape: the [[docCondProbMassDeterministic]] vocabulary-keyed join
    * (never a gram window) + the window-free
    * [[graft.ops.GlobalRank.ntileScalable]] tiering. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 3,
                        modelDocs: Option[DataFrame] = None): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val scored = docCondProbMassDeterministic(docs, idCol, textCol, modelDocs)
    val withAvg = scored.withColumn("avg_micro",
      when(col("n_bigrams") > 0,
        expr("CAST(sum_p6 * 1000000 AS BIGINT) DIV n_bigrams"))
        .otherwise(lit(-1L)))
    graft.ops.GlobalRank.ntileScalable(withAvg, buckets,
      Seq(col("avg_micro").desc, col("doc_id")), outCol = "bucket")
  }

  /** Frequency-ranked vocabulary of the `k` most common tokens, with
    * dense contiguous ids 1..k by (count DESC, token ASC) — the
    * tokenizer-prep step (vocab tables, OOV cutoffs, id assignment).
    *
    * Scale shape: one tokenize + one map-side-partial groupBy on the
    * token; the global order is a distributed TakeOrderedAndProject
    * (per-partition top-k + driver merge of k-bounded heads — never a
    * full sort), and the id-assigning window runs over exactly k rows.
    * k is the vocabulary budget (10^4..10^5), driver-safe by design. */
  def buildVocab(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(TextShingles.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(k)
    counts.withColumn("vocab_id",
      row_number().over(Window.orderBy(col("cnt").desc, col("w").asc))
        .cast("int"))
  }

  /** Token-frequency SPECTRUM (frequency of frequencies): distinct
    * token types and total occurrences per power-of-two count band —
    * the Zipf diagnostic that says at a glance whether a corpus has a
    * healthy long tail (band 0 = hapax legomena) or a duplication-
    * inflated head. `band = floor(log2(count))` computed as
    * `length(bin(cnt)) - 1` — pure integer/string ops both engines
    * evaluate identically, no float log.
    *
    * Scale shape: one map-side-partial groupBy(token) over the exploded
    * stream (vocabulary-bounded result), then a second tiny groupBy
    * over ≤64 bands (× the `groupCols` domain — pass e.g. the language
    * to spectrum each sub-corpus separately). Token strings are the
    * shuffle key — vocabulary-bounded and short; hash first only if a
    * pathological corpus makes individual types huge. */
  def tokenFrequencySpectrum(docs: DataFrame, textCol: String,
                             groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    docs
      .select(g :+ explode(TextShingles.words(col(textCol))).as("w"): _*)
      .groupBy(g :+ col("w"): _*).agg(count(lit(1)).as("cnt"))
      .groupBy(g :+ (length(bin(col("cnt"))) - 1).cast("int").as("band"): _*)
      .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_occurrences"))
  }

  /** Tokenizer FERTILITY / compression stats per sub-corpus: document,
    * word (whitespace), subword (BPE-ish pre-tokenizer regex) and
    * character totals, plus `fertility` = subwords per word — the
    * metric that says how expensive each language is to tokenize (a
    * fertility creeping past ~2 flags a vocab that under-serves that
    * language; mC4/XLM-R report exactly this table). No reference
    * analog; gate query q124.
    *
    * Determinism: integer sums; the one rational (fertility) divides
    * ONCE via the shared decimal(27,4)→(18,6) recipe (q98), null for a
    * group with zero words. Surface the decimal as DOUBLE at the gate.
    *
    * Scale shape: map-only regexp counts inside the scan stage (never
    * an exploded token stream — counting doesn't need the tokens), one
    * map-side-partial groupBy over the |groups| domain. */
  def tokenizerFertility(docs: DataFrame, textCol: String,
                         groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val words = sum(col("__w")).cast("decimal(27,4)")
    val subwords = sum(col("__s")).cast("decimal(27,4)")
    docs
      .select(g ++ Seq(
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__w"),
        TextAnalysis.subwordCount(col(textCol)).cast("long").as("__s"),
        length(col(textCol)).cast("long").as("__c")): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__s")).as("n_subwords"), sum(col("__c")).as("n_chars"),
        when(sum(col("__w")) > 0,
          (subwords / words).cast("decimal(18,6)")).as("fertility"))
  }

  /** Per-document OUT-OF-VOCABULARY counts against a fixed vocabulary
    * — the tokenizer-coverage check run before committing a vocab (an
    * OOV rate that creeps up as a corpus drifts means the vocab needs
    * rebuilding). Returns (doc_id, n_tokens, n_oov); callers threshold
    * on the pair (integer surface — no tie-prone ratio division).
    *
    * Scale shape: the vocab (k rows, the caller's vocabulary budget)
    * broadcast-joins onto the exploded token stream inside the scan
    * stage; one map-side-partial groupBy(doc_id). Every input doc
    * appears exactly once (split yields [""] for empty text — one
    * counted token, deterministically OOV unless "" is in the vocab). */
  def oovCounts(docs: DataFrame, vocab: DataFrame, idCol: String,
                textCol: String, vocabCol: String = "w"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextShingles.words(col(textCol))).as("w"))
    toks.join(
        broadcast(vocab.select(col(vocabCol).as("w"), lit(1).as("__in"))),
        Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           count(when(col("__in").isNull, lit(1))).as("n_oov"))
  }

  /** Production LM scoring: per-document average bigram log-probability
    * under the model trained on `modelDocs` (defaults to scoring the
    * corpus against itself; pass a reference corpus to score INCOMING
    * docs — higher = more natural, the LM-quality filter thresholds on
    * this). Bigrams unseen in the model back off to `floorProb` instead
    * of −∞. Documents with fewer than two tokens have no bigrams — no
    * evidence either way — and score AT THE FLOOR (ln(floorProb),
    * n_bigrams = 0) rather than silently vanishing: every input doc id
    * appears in the output exactly once, so a threshold filter treats
    * short docs deterministically (they fail any threshold above the
    * floor). Double math (ln) — spec-checked, not oracle-gated. */
  def docAvgLogProb(docs: DataFrame, idCol: String, textCol: String,
                    floorProb: Double = 1e-9,
                    modelDocs: Option[DataFrame] = None): DataFrame = {
    require(floorProb > 0 && floorProb < 1, "floorProb must be in (0,1)")
    val model = bigramModel(modelDocs.getOrElse(docs), textCol)
      .select(col("w1"), col("w2"),
        (col("pair_cnt").cast("double") / col("head_cnt")).as("p"))
    val docBg = docs.select(col(idCol).as("doc_id"),
        explode(TextShingles.wordBigrams(col(textCol))).as("gram"))
      .select(col("doc_id"),
              substring_index(col("gram"), " ", 1).as("w1"),
              substring_index(col("gram"), " ", -1).as("w2"))
    val scored = docBg.join(model, Seq("w1", "w2"), "left")
      .select(col("doc_id"),
        log(greatest(coalesce(col("p"), lit(floorProb)), lit(floorProb)))
          .as("lp"))
      .groupBy(col("doc_id"))
      .agg((sum(col("lp")) / count(lit(1))).as("avg_log_prob"),
           count(lit(1)).as("n_bigrams"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("avg_log_prob"), lit(math.log(floorProb)))
          .as("avg_log_prob"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  /** VOCABULARY RICHNESS — how many word types does this corpus
    * REALLY have, beyond the ones observed? Chao1's nonparametric
    * lower bound S_obs + f₁²/(2f₂) (singletons² over doubled
    * doubletons; the bias-corrected f₁(f₁−1)/2 form when no doubleton
    * exists) plus Good–Turing's unseen probability mass f₁/N — the
    * pair that tells a tokenizer/vocab builder whether the corpus is
    * saturating or an OOV long tail is still arriving.
    *
    * Exact integer per group: chao1_milli = 1000·S +
    * (1000·f₁²) div (2f₂)  [or (1000·f₁·(f₁−1)) div 2 at f₂ = 0];
    * gt_unseen_ppm = (10⁶·f₁) div N.
    *
    * Output per group: (group…, s_obs, n_tokens, f1, f2, chao1_milli,
    * gt_unseen_ppm).
    *
    * Scale shape: one (group, word) count groupBy — vocabulary crosses
    * the shuffle, not tokens — then a group-grain rollup. */
  def vocabularyRichness(docs: DataFrame, textCol: String,
                         groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    docs
      .select(g :+ explode(TextShingles.words(col(textCol))).as("w"): _*)
      .groupBy(g :+ col("w"): _*).agg(count(lit(1)).as("__c"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("s_obs"), sum(col("__c")).as("n_tokens"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(g ++ Seq(col("s_obs"), col("n_tokens"), col("f1"),
        col("f2"),
        (lit(1000L) * col("s_obs") +
          when(col("f2") > 0,
            expr("cast((1000 * cast(f1 as decimal(38,0)) * f1)" +
              " div (2 * f2) as bigint)"))
            .otherwise(expr(
              "cast((1000 * cast(f1 as decimal(38,0)) * (f1 - 1))" +
                " div 2 as bigint)")))
          .as("chao1_milli"),
        expr("(1000000 * f1) div n_tokens").as("gt_unseen_ppm")): _*)
  }
}
