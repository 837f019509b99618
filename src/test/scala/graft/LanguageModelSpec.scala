package graft

import graft.llm.LanguageModel
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkTestBase {
  import spark.implicits._

  // controlled bigram statistics: "a b" ×3, "a c" ×1, "b a" ×2 (across
  // doc boundaries bigrams never form — each doc tokenizes separately)
  lazy val docs = Seq(
    (1L, "a b a c"),      // bigrams: (a,b) (b,a) (a,c)
    (2L, "a b"),          // (a,b)
    (3L, "b a b"),        // (b,a) (a,b)
    (4L, "z z")           // (z,z)
  ).toDF("doc_id", "text")

  test("bigram model counts pairs and heads exactly") {
    val m = LanguageModel.bigramModel(docs, "text")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m(("a", "b")) == ((3L, 4L)))   // a→{b:3, c:1}, head a = 4
    assert(m(("a", "c")) == ((1L, 4L)))
    assert(m(("b", "a")) == ((2L, 2L)))
    assert(m(("z", "z")) == ((1L, 1L)))
    assert(m.size == 4)
  }

  test("bigramModel: head counts join reuses the pair-count exchange — one corpus pass, no head window") {
    val m = LanguageModel.bigramModel(docs, "text")
    m.collect()   // AQE finalizes exchange reuse at execution
    val plan = m.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Window"),
      "head counts must not window over the (vocabulary-many-follower) head partition")
    assert(finalPlan.contains("ReusedExchange"),
      s"heads branch must reuse the pair-count shuffle:\n${finalPlan.take(1500)}")
    val tokenizes = "Generate explode".r.findAllIn(finalPlan).size
    assert(tokenizes == 1,
      s"corpus must tokenize exactly once, found $tokenizes:\n${finalPlan.take(1500)}")
  }

  test("topFollowers ranks by conditional probability with word tiebreak") {
    val got = LanguageModel.topFollowers(docs, "text", minHeadCount = 2, k = 2)
      .as[(String, String, Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._5) -> (r._2, r._6)).toMap
    assert(got(("a", 1)) == (("b", 0.75)))
    assert(got(("a", 2)) == (("c", 0.25)))
    assert(got(("b", 1)) == (("a", 1.0)))
    assert(!got.contains(("z", 1)), "head below minHeadCount must drop")
  }

  test("docAvgLogProb: corpus-typical docs outscore unseen-bigram docs") {
    val scored = LanguageModel.docAvgLogProb(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    // doc 2 is the single most probable bigram (p=0.75); doc 4's (z,z)
    // has p=1.0 under its own head — both well above doc 1 (has p=0.25)
    assert(scored(2L) > scored(1L))
    assert(scored.values.forall(_ <= 0.0), "log probs must be non-positive")
    // scored against a REFERENCE model, an unseen bigram bottoms out at
    // ln(floorProb) — far below any in-model doc
    val probe = Seq((9L, "q r"), (10L, "a b")).toDF("doc_id", "text")
    val vsModel = LanguageModel.docAvgLogProb(
        probe, "doc_id", "text", floorProb = 1e-9, modelDocs = Some(docs))
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(vsModel(9L) == math.log(1e-9), "unseen bigram must hit the floor")
    assert(vsModel(10L) == math.log(0.75), "in-model bigram must score its true probability")
  }

  test("docAvgLogProb: sub-2-token docs appear once, scored at the floor") {
    val probe = Seq((1L, "single"), (2L, ""), (3L, "a b"))
      .toDF("doc_id", "text")
    val scored = LanguageModel.docAvgLogProb(
        probe, "doc_id", "text", floorProb = 1e-9, modelDocs = Some(docs))
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // no bigrams → no evidence → deterministic floor score, never absent:
    // a threshold filter must see every input doc exactly once
    assert(scored.keySet == Set(1L, 2L, 3L))
    assert(scored(1L) == (math.log(1e-9), 0L))
    assert(scored(2L) == (math.log(1e-9), 0L))
    assert(scored(3L)._2 == 1L)
  }

  test("docCondProbMassDeterministic: exact mass, gibberish fails any positive bar") {
    // corpus of well-modeled docs + one gibberish doc whose bigrams are
    // all unseen under the reference model → sum_p6 = 0 exactly
    val probe = Seq(
      (1L, "a b"),                  // in-model bigram
      (2L, "zz1 zz2 zz3 zz4"),      // pure gibberish vs the model
      (3L, "x")                     // sub-2-token: 0 mass, 0 bigrams
    ).toDF("doc_id", "text")
    val scored = LanguageModel.docCondProbMassDeterministic(
        probe, "doc_id", "text", modelDocs = Some(docs))
      .as[(Long, java.math.BigDecimal, Long)].collect()
      .map(r => r._1 -> (r._2.doubleValue, r._3)).toMap
    assert(scored.keySet == Set(1L, 2L, 3L), "every input doc appears once")
    assert(scored(1L)._1 > 0.0 && scored(1L)._2 == 1L)
    assert(scored(2L) == (0.0, 3L), "unseen bigrams contribute exactly 0")
    assert(scored(3L) == (0.0, 0L))
    // the cross-multiplied threshold (avg ≥ T ⟺ sum ≥ T·n) drops the
    // gibberish doc for ANY positive bar and keeps doc 1 for a bar
    // below its avg; evidence-less docs (n = 0) pass vacuously, so the
    // strict form adds n_bigrams > 0
    val kept = LanguageModel.docCondProbMassDeterministic(
        probe, "doc_id", "text", modelDocs = Some(docs))
      .filter(col("n_bigrams") > 0 && col("sum_p6") >=
        lit("0.000001").cast("decimal(18,6)") * col("n_bigrams"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"got $kept")
  }

  test("q66 LM stage provably drops rows the q65 pipeline keeps") {
    val dir = sf("sf0.001")
    val with65 = SparkEntry.queries("q65_curation_pipeline")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val with66 = SparkEntry.queries("q66_curation_lm")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    // same pipeline modulo the LM bar: q66's survivors are a strict
    // subset of q65's — the LM stage bites, and only the LM stage
    assert(with66.subsetOf(with65), "LM stage may only remove docs")
    assert(with66.size < with65.size, "LM bar must drop at least one doc")
    assert(with66.nonEmpty, "LM bar must not drop everything")
  }

  test("model counts are partition-independent") {
    val a = LanguageModel.bigramModel(docs, "text")
      .as[(String, String, Long, Long)].collect().toSet
    val b = LanguageModel.bigramModel(docs.repartition(13), "text")
      .as[(String, String, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("buildVocab: dense ids by count desc then token asc, k-bounded, tie-exact") {
    val corpus = Seq(
      "b b b a a c", // b:3 a:2 c:1
      "a c d"        // a:3 total, c:2, d:1
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val v = LanguageModel.buildVocab(corpus, "text", k = 3)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    // a:3, b:3 tie -> 'a' first; then c:2; d cut by k
    assert(v.toSeq == Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
    val full = LanguageModel.buildVocab(corpus.repartition(7), "text", k = 10)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(full.map(_._1).toSeq == Seq("a", "b", "c", "d"))
  }

  test("oovCounts: exact per-doc token/OOV counts, every doc present, broadcast vocab") {
    val corpus = Seq(
      (1L, "a b c a"),   // 4 tokens, c OOV under {a,b}
      (2L, "x y z"),     // all 3 OOV
      (3L, "a a"),       // fully covered
      (4L, "")           // split("") = [""] — one token, OOV
    ).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("w")
    val out = LanguageModel.oovCounts(corpus, vocab, "doc_id", "text")
    val got = out.as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 4L, 1L), (2L, 3L, 3L), (3L, 2L, 0L), (4L, 1L, 1L)))
    // the k-row vocab must broadcast, and the rollup must combine map-side
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "vocab join must broadcast")
    assert(plan.contains("partial_count"), "doc rollup must be partial")
    // composes with buildVocab: top-1 vocab of the spec corpus is "a"
    val v1 = LanguageModel.buildVocab(corpus, "text", k = 1)
    val oov1 = LanguageModel.oovCounts(corpus, v1, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(oov1(3L) == ((2L, 0L)), "doc of only 'a' has zero OOV under the top-1 vocab")
  }

  test("tokenFrequencySpectrum: exact power-of-two bands, totals preserved") {
    // counts: a=8 (band 3), b=4 (band 2), c=3 d=2 (band 1), e=f=g=1 (band 0)
    val docs = Seq(
      (1L, "a a a a b b c c"),
      (2L, "a a a a b b c d d e f g"))
      .toDF("doc_id", "text")
    val got = LanguageModel.tokenFrequencySpectrum(docs, "text")
      .as[(Int, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      0 -> ((3L, 3L)),   // e f g
      1 -> ((2L, 5L)),   // c=3, d=2
      2 -> ((1L, 4L)),   // b
      3 -> ((1L, 8L)))) // a
    // occurrences across bands = total token count
    assert(got.values.map(_._2).sum == 20L)
    // grouped variant spectra each sub-corpus independently
    val byLang = Seq((1L, "x x x", "en"), (2L, "x y", "fr"))
      .toDF("doc_id", "text", "lang")
    val g = LanguageModel.tokenFrequencySpectrum(byLang, "text", Seq("lang"))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(g == Set(("en", 1, 1L, 3L), ("fr", 0, 2L, 2L)))
  }

  test("tokenizerFertility: exact totals, fertility = subwords/words, zero-word group null") {
    // "hello world!" → 2 words, subwords: hell+o / worl+d / ! = 5
    // "ab 12" → 2 words, 2 subwords; "" → 0 words (regexp_count('')=0)
    val docs = Seq(
      (1L, "hello world!", "en"),
      (2L, "ab 12", "en"),
      (3L, "", "xx"))
      .toDF("doc_id", "text", "lang")
    val got = LanguageModel.tokenizerFertility(docs, "text", Seq("lang"))
      .select($"lang", $"n_docs", $"n_words", $"n_subwords", $"n_chars",
        $"fertility".cast("double"))
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("en") == ((2L, 4L, 7L, 17L, Some(1.75))))
    // a group with zero words surfaces a NULL fertility, not a crash
    assert(got("xx") == ((1L, 0L, 0L, 0L, None)))
  }

  test("encodeWithVocab: in-order ids, OOV mapped, counts exact") {
    val corpus = Seq(
      (1L, "a b a c"),
      (2L, "zz a b"))           // zz is out of a 3-word vocab
      .toDF("doc_id", "text")
    val vocab = LanguageModel.buildVocab(corpus, "text", k = 3)
    // counts: a=3, b=2, c=1, zz=1 → vocab (a=1, b=2, c=3); zz OOV
    val got = LanguageModel.encodeWithVocab(corpus, "doc_id", "text", vocab)
      .select($"doc_id", $"n_tokens", $"n_oov", $"ids")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 0L, "1 2 1 3")))
    assert(got(2L) == ((2L, 3L, 1L, "0 1 2")))
    // custom OOV id flows through both the ids and the count
    val gotOov = LanguageModel.encodeWithVocab(corpus, "doc_id", "text",
        vocab, oovId = 99)
      .select($"doc_id", $"n_oov", $"ids")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(gotOov(2L) == ((2L, 1L, "99 1 2")))
  }

  test("perplexityBuckets: model-typical docs head, gibberish tail, no-bigram docs sink") {
    // model: "a b" dominates; probe docs span typicality
    val probe = Seq(
      (1L, "a b a b a b"),        // all in-model, high-mass bigrams
      (2L, "a c b a"),            // mixed typicality
      (3L, "zz1 zz2 zz3"),        // unseen bigrams: avg_micro = 0
      (4L, "x"))                  // no bigrams: avg_micro = -1
      .toDF("doc_id", "text")
    val got = LanguageModel.perplexityBuckets(probe, "doc_id", "text",
        buckets = 4, modelDocs = Some(docs))
      .select($"doc_id", $"avg_micro", $"bucket")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    val byId = got.map(r => r._1 -> r).toMap
    // ordering: doc1 most typical, then doc2, then unseen, then no-bigram
    assert(byId(1L)._2 > byId(2L)._2 && byId(2L)._2 > 0)
    assert(byId(3L)._2 == 0L && byId(4L)._2 == -1L)
    assert(got.map(_._3).toSeq == Seq(1, 2, 3, 4), "tiers follow typicality")
    // 4 buckets over 4 docs: ntile gives one doc per tier; determinism
    val again = LanguageModel.perplexityBuckets(probe.repartition(5),
        "doc_id", "text", buckets = 4, modelDocs = Some(docs))
      .select($"doc_id", $"bucket").as[(Long, Int)].collect().toSet
    assert(again == got.map(r => (r._1, r._3)).toSet)
  }

  test("decodeWithVocab: round trip restores text with OOV -> unk token") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a rare xylophone word"),
      (3L, "the the the")).toDF("doc_id", "text")
    val vocab = LanguageModel.buildVocab(docs, "text", k = 5)
    val inVocab = vocab.select($"w").as[String].collect().toSet
    val enc = LanguageModel.encodeWithVocab(docs, "doc_id", "text", vocab)
    val dec = LanguageModel.decodeWithVocab(enc, vocab)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    for ((id, text) <- Seq((1L, "the cat sat on the mat"),
        (2L, "a rare xylophone word"), (3L, "the the the"))) {
      val want = text.split(" ")
        .map(w => if (inVocab(w)) w else "<unk>").mkString(" ")
      assert(dec(id) == want, s"doc $id: got ${dec(id)}, want $want")
    }
    // custom unk token; ids the vocab has never seen also map to it
    val alien = Seq((9L, 5L, 2L, "999 1 999")).toDF(
      "doc_id", "n_tokens", "n_oov", "ids")
    val dec2 = LanguageModel.decodeWithVocab(alien, vocab, unkToken = "?")
      .select($"text").as[String].head()
    assert(dec2.split(" ").count(_ == "?") == 2)
    assert(!dec2.contains("999"))
  }

  test("vocabularyRichness: hand Chao1, f2=0 bias-corrected branch, " +
       "Good-Turing unseen mass") {
    val df = Seq(("g1", "a a b c"),   // S=3 N=4 f1=2 f2=1
      ("g2", "x y")                   // S=2 N=2 f1=2 f2=0
    ).toDF("lang", "text")
    val got = LanguageModel.vocabularyRichness(df, "text", Seq("lang"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // chao1 = 3 + 2²/(2·1) = 5; unseen = 2/4
    assert(got("g1") == (("g1", 3L, 4L, 2L, 1L, 5000L, 500000L)),
      s"got $got")
    // f2=0 branch: 2 + 2·1/2 = 3; unseen = 2/2
    assert(got("g2") == (("g2", 2L, 2L, 2L, 0L, 3000L, 1000000L)))
  }
}
