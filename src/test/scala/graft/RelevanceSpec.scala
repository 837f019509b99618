package graft

import graft.llm.Relevance
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkTestBase {
  import spark.implicits._

  // tiny corpus with controlled term statistics: "rare" appears in one
  // doc, "common" in all, tf varies
  lazy val docs = Seq(
    (1L, "common rare common alpha beta gamma"),
    (2L, "common alpha alpha beta beta gamma gamma delta"),
    (3L, "common common common alpha beta")
  ).toDF("doc_id", "text")

  test("bm25: rare terms outscore common ones; tf raises the score") {
    val scores = Relevance.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .as[(Long, Double)].collect().toMap
    assert(scores.keySet == Set(1L, 2L, 3L))
    assert(scores.values.forall(_ > 0))
    // doc 1 has the only "rare" hit → must dominate
    assert(scores(1L) > scores(2L) && scores(1L) > scores(3L))
    // docs 2 and 3 differ only in "common" tf (1 vs 3) and length;
    // higher tf in a shorter doc must not score lower
    assert(scores(3L) > scores(2L))
  }

  test("deterministic variant ranks single-term queries identically to bm25") {
    // ln(1 + x) is monotone in the rational idf x, and the tf-norm is
    // shared — so a single-term ranking must agree between variants
    for (term <- Seq("common", "alpha", "beta")) {
      def ranking(d: org.apache.spark.sql.DataFrame) =
        d.orderBy(desc("score"), asc("doc_id")).select("doc_id")
          .as[Long].collect().toSeq
      val prod = ranking(Relevance.bm25(docs, "doc_id", "text", Seq(term)))
      val det = ranking(Relevance.bm25Deterministic(docs, "doc_id", "text", Seq(term)))
      assert(prod == det, s"term '$term': $prod vs $det")
    }
  }

  test("matching docs only; unmatched terms contribute nothing") {
    val scores = Relevance.bm25(docs, "doc_id", "text", Seq("rare", "nosuchterm"))
      .as[(Long, Double)].collect().toMap
    assert(scores.keySet == Set(1L))
  }

  test("plan: one tokenize-explode, linear lineage, no cartesian") {
    val plan = Relevance.bm25Deterministic(docs, "doc_id", "text", Seq("rare"))
      .queryExecution.executedPlan.toString
    // the corpus must be exploded exactly once — a second Generate means
    // the tokenize+aggregate subtree is being consumed twice (the
    // double-scan trap the window-based df exists to prevent). The
    // map-only stats pass uses size(), not explode.
    assert("Generate".r.findAllIn(plan).size == 1,
      s"expected exactly one explode of the corpus:\n${plan.take(800)}")
    // exactly ONE nested-loop join is legitimate: the 1-row (S, N) stats
    // frame cross-joined as a broadcast. Anything more is a regression.
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1 &&
           !plan.contains("CartesianProduct"),
      "only the 1-row stats broadcast may nested-loop")
    assert(!plan.contains("InMemoryTableScan"),
      "bm25 must be fully lazy — no hidden caches")
  }

  test("precomputed corpus stats give identical scores") {
    val s = docs.select(explode(graft.llm.TextShingles.words($"text"))).count()
    val n = docs.count()
    val a = Relevance.bm25Deterministic(docs, "doc_id", "text", Seq("rare"))
      .as[(Long, Double)].collect().toMap
    val b = Relevance.bm25Deterministic(docs, "doc_id", "text", Seq("rare"),
        corpusStats = Some((s, n)))
      .as[(Long, Double)].collect().toMap
    assert(a == b, s"$a vs $b")
  }

  test("tf-idf: a doc's unique term ranks first; ubiquitous terms rank last") {
    val top = Relevance.tfIdfTopK(docs, "doc_id", "text", k = 10)
      .as[(Long, String, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(top(1L).head == "rare", s"doc 1's distinctive term must win: ${top(1L)}")
    // "common" is in every doc → idf = ln(1) = 0 → it must rank last in
    // every doc (all other terms have positive idf)
    assert(top.values.forall(_.last == "common"), s"got $top")
  }

  test("tf-idf deterministic variant: exact rational scores on a pinned fixture") {
    // doc 1 "rare": tf=1, df=1, N=3 → 3.0; doc 3 "common": tf=3, df=3 → 3.0
    val got = Relevance.tfIdfDeterministicTopK(docs, "doc_id", "text", k = 10)
      .as[(Long, String, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got((1L, "rare")) == 3.0)         // tf=1, df=1: 1*3/1
    assert(got((3L, "common")) == 3.0)       // tf=3, df=3: 3*3/3
    assert(got((2L, "delta")) == 3.0)        // tf=1, df=1: 1*3/1
    assert(got((2L, "alpha")) == 2.0)        // tf=2, df=3: 2*3/3
  }

  test("large term sets: filtered shape matches the conditional-sum form exactly") {
    // past largeTermThreshold the plan switches from one conditional-sum
    // column per term to filter + groupBy(doc, term); the deterministic
    // variant's decimal sums are order-independent, so the two shapes
    // must agree to the bit
    val manyTerms = Seq("rare", "common", "alpha", "beta", "gamma", "delta") ++
      (1 to 114).map(i => s"zz$i")
    assert(manyTerms.size > 64)
    def scores(threshold: Int) =
      Relevance.bm25Deterministic(docs, "doc_id", "text", manyTerms,
          largeTermThreshold = threshold)
        .as[(Long, Double)].collect().toMap
    val conditional = scores(threshold = 1000)
    val filtered = scores(threshold = 64)
    assert(conditional == filtered, s"$conditional vs $filtered")
    // production (double) form: same doc set, same scores up to
    // summation-order ulps
    def prodScores(threshold: Int) =
      Relevance.bm25(docs, "doc_id", "text", manyTerms,
          largeTermThreshold = threshold)
        .as[(Long, Double)].collect().toMap
    val pc = prodScores(1000); val pf = prodScores(64)
    assert(pc.keySet == pf.keySet)
    pc.foreach { case (id, s) => assert(math.abs(s - pf(id)) <= 1e-12 * math.max(1.0, math.abs(s))) }
  }

  test("filtered shape plans no term window and releases its pin") {
    val manyTerms = Seq("rare", "common") ++ (1 to 80).map(i => s"zz$i")
    val r = Relevance.bm25Deterministic(docs, "doc_id", "text", manyTerms)
    val p = r.queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition"),
      s"df must come from groupBy+join, not a term window:\n${p.take(800)}")
    // the tf pin must be gone once the result is materialized — only the
    // (small) result frame itself may remain cached
    val before = spark.sparkContext.getPersistentRDDs.size
    val r2 = Relevance.bm25Deterministic(docs, "doc_id", "text", manyTerms)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1, s"leaked pins: $before -> $after")
    r2.unpersist()
  }

  test("tf-idf per-doc ranking is deterministic: ties break on the term") {
    val a = Relevance.tfIdfDeterministicTopK(docs, "doc_id", "text", k = 3)
      .as[(Long, String, Int, Double)].collect().toSet
    val b = Relevance.tfIdfDeterministicTopK(docs.repartition(7), "doc_id", "text", k = 3)
      .as[(Long, String, Int, Double)].collect().toSet
    assert(a == b, "partitioning must not change the extracted terms")
  }

  test("hashed linear scorer: exact weight sums, 0 for unweighted buckets, broadcast plan") {
    // dim = 1: every token lands in bucket 0 → score = n_tokens · w0.
    // Exact decimal arithmetic, so the equality is bitwise.
    val one = Seq((0, BigDecimal("0.25"))).toDF("bucket", "weight")
    val got = Relevance.hashedLinearScore(docs, "doc_id", "text", one, dim = 1)
      .select($"doc_id", $"n_tokens", $"score".cast("string"))
      .as[(Long, Long, String)].collect().map { case (d, n, s) => d -> ((n, s)) }.toMap
    assert(got(1L) == ((6L, "1.500000")))
    assert(got(2L) == ((8L, "2.000000")))
    assert(got(3L) == ((5L, "1.250000")))
    // an empty weight table scores every doc 0 (absent buckets → 0)
    val empty = Seq.empty[(Int, BigDecimal)].toDF("bucket", "weight")
    val zeros = Relevance.hashedLinearScore(docs, "doc_id", "text", empty, dim = 8)
      .select($"score".cast("double")).as[Double].collect()
    assert(zeros.forall(_ == 0.0))
    // md5 and xxhash64 bucketings both work (different assignments,
    // same totals under a constant weight table)
    val const = (0 until 8).map(b => (b, BigDecimal("0.5"))).toDF("bucket", "weight")
    val md5Scores = Relevance.hashedLinearScore(docs, "doc_id", "text", const,
        dim = 8, hashFn = graft.llm.TextAnalysis.md5Hash60)
      .select($"doc_id", $"score".cast("double")).as[(Long, Double)].collect().toMap
    val xxScores = Relevance.hashedLinearScore(docs, "doc_id", "text", const, dim = 8)
      .select($"doc_id", $"score".cast("double")).as[(Long, Double)].collect().toMap
    assert(md5Scores == xxScores, "constant weights must erase the hash choice")
    assert(md5Scores(1L) == 3.0)
    // plan: weight table broadcasts, rollup combines map-side
    val plan = Relevance.hashedLinearScore(docs, "doc_id", "text", one, dim = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "weight table must broadcast")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "doc rollup must be partial")
  }

  // word-length bucketing: a hashFn the test controls exactly
  private val lenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => length(c).cast("long")

  test("dsir weights: hand math on length buckets; target==raw is the unit weight") {
    // lenHash % 2: "common"/"gamma"(6,5)... bucket = len % 2.
    // target = doc 1 only. Hand counts over bucket parity:
    //   doc1 tokens: common(6→0) rare(4→0) common(0) alpha(5→1) beta(4→0) gamma(5→1)
    //   → target: b0=4, b1=2, T=6
    //   raw (all 3 docs, 19 tokens): b0: doc1 4 + doc2 (common6,beta4,beta4,delta5? delta=5→1)
    // Compute expected in the test from the same token lists instead of
    // hand-listing: the point is the formula, not the tokenizer.
    val toks = Map(
      1L -> Seq("common", "rare", "common", "alpha", "beta", "gamma"),
      2L -> Seq("common", "alpha", "alpha", "beta", "beta", "gamma", "gamma", "delta"),
      3L -> Seq("common", "common", "common", "alpha", "beta"))
    val dim = 2
    def cnt(ids: Seq[Long]) = {
      val bs = ids.flatMap(toks).map(_.length % dim)
      (0 until dim).map(b => bs.count(_ == b).toLong)
    }
    val t = cnt(Seq(1L)); val r = cnt(Seq(1L, 2L, 3L))
    val tT = t.sum + dim; val rT = r.sum + dim
    val expected = (0 until dim).map { b =>
      BigDecimal((t(b) + 1) * rT) / BigDecimal((r(b) + 1) * tT)
    }
    val got = Relevance.dsirWeights(docs.filter($"doc_id" === 1L), docs,
        "text", dim, hashFn = lenHash, deterministic = true)
      .orderBy("bucket").select($"weight".cast("double")).as[Double].collect()
    assert(got.length == dim)
    for (b <- 0 until dim)
      assert(math.abs(got(b) - expected(b).toDouble) < 5e-7,
        s"bucket $b: ${got(b)} vs ${expected(b)}")
    // per-bucket monotone agreement with the log form: sign(w-1) == sign(ln w)
    val logW = Relevance.dsirWeights(docs.filter($"doc_id" === 1L), docs,
        "text", dim, hashFn = lenHash)
      .orderBy("bucket").select($"weight".cast("double")).as[Double].collect()
    for (b <- 0 until dim)
      assert(math.signum(got(b) - 1.0) == math.signum(logW(b)),
        s"bucket $b: rational ${got(b)} vs log ${logW(b)}")
    // target == raw → every rational weight is exactly 1, every log 0
    val unit = Relevance.dsirWeights(docs, docs, "text", dim,
        hashFn = lenHash, deterministic = true)
      .select($"weight".cast("string")).as[String].collect()
    assert(unit.toSet == Set("1.000000"))
  }

  test("dsir score: target==raw scores n_tokens exactly; learn side broadcasts") {
    val scored = Relevance.dsirScore(docs, docs, "doc_id", "text", dim = 4,
      hashFn = lenHash, deterministic = true)
    val got = scored.select($"doc_id", $"n_tokens", $"score".cast("double"))
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (d, n, s) =>
      assert(s == n.toDouble, s"doc $d: score $s != n_tokens $n") }
    // every learn-side join is against ≤ dim or 1-row frames → broadcast;
    // no SortMergeJoin anywhere in the whole learn+score plan
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "dsir learn+score must stay broadcast-only")
    // the learned weight table comes back pinned (the model — its count
    // frame fed two consumers, so dsirWeights materializes through a
    // pin and returns the cached result); release it here
    val weights = Relevance.dsirWeights(docs, docs, "text", 4,
      hashFn = lenHash, deterministic = true)
    assert(weights.storageLevel.useMemory || weights.storageLevel.useDisk,
      "weight table must come back persisted")
    weights.unpersist(false)
  }

  test("ngram novelty: shared grams are not novel, within-doc repeats count once") {
    val d = Seq(
      (1L, "a b c d"),        // grams: "a b c" (shared with doc 2), "b c d"
      (2L, "a b c x"),        // grams: "a b c" (shared), "b c x"
      (3L, "p q p q p"),      // grams: "p q p" ×2 distinct→1, "q p q" — both novel
      (4L, "t u")             // < 3 words → no output row
    ).toDF("doc_id", "text")
    val got = Relevance.ngramNovelty(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long)].collect().map { case (i, g, v) => i -> ((g, v)) }.toMap
    assert(got == Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((2L, 2L))))
    // df never windows: a boilerplate gram's window partition would be
    // corpus-sized
    val plan = Relevance.ngramNovelty(d, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "novelty must not use a window")
  }

  test("trainHashedLogistic: bit-identical to the driver reference, separates classes") {
    val docs = Seq(
      (1L, "good great nice good", 1),
      (2L, "great fine good", 1),
      (3L, "bad awful bad", 0),
      (4L, "awful terrible poor", 0),
      (5L, "good nice fine great", 1),
      (6L, "terrible poor bad awful", 0)
    ).toDF("doc_id", "text", "label")
    val dim = 16
    val w = Relevance.trainHashedLogistic(docs, "doc_id", "text", "label",
      dim, iters = 5, lr = 0.5)
    // driver-side reference with the IDENTICAL decimal-sum semantics
    // (per-product Double.toString → setScale(15, HALF_UP), exact adds)
    // and the same bucket hash (pulled through the same Spark expr)
    val bmap = docs
      .select(explode(graft.llm.TextShingles.words($"text")).as("w"))
      .distinct()
      .select($"w", pmod(xxhash64($"w"), lit(dim.toLong)).cast("int").as("b"))
      .as[(String, Int)].collect().toMap
    def d15(v: Double) =
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(15, java.math.RoundingMode.HALF_UP)
    val feats = Seq(
      (1L, "good great nice good", 1.0), (2L, "great fine good", 1.0),
      (3L, "bad awful bad", 0.0), (4L, "awful terrible poor", 0.0),
      (5L, "good nice fine great", 1.0), (6L, "terrible poor bad awful", 0.0))
      .map { case (id, t, y) =>
        (id, y, t.split(" ").groupBy(bmap).map { case (b, g) =>
          b -> g.length.toDouble })
      }
    val ref = Array.fill(dim)(0.0)
    for (_ <- 1 to 5) {
      val grads = scala.collection.mutable.Map[Int, java.math.BigDecimal]()
      feats.foreach { case (_, y, xs) =>
        val m = xs.foldLeft(java.math.BigDecimal.ZERO.setScale(15)) {
          case (acc, (b, x)) => acc.add(d15(ref(b) * x))
        }.doubleValue
        val r = 1.0 / (1.0 + math.exp(-m)) - y
        xs.foreach { case (b, x) =>
          grads(b) = grads.getOrElse(b,
            java.math.BigDecimal.ZERO.setScale(15)).add(d15(r * x))
        }
      }
      grads.foreach { case (b, g) =>
        ref(b) = ref(b) - 0.5 * (g.doubleValue / feats.length)
      }
    }
    assert(w.toSeq == ref.toSeq, "distributed training must match the reference exactly")
    // the learned weights separate the planted classes
    def score(t: String) = t.split(" ").map(tok => w(bmap(tok))).sum
    assert(score("good great nice fine") > 0 && score("bad awful terrible poor") < 0)
    // exact partition-independence (decimal sums are order-proof)
    val w2 = Relevance.trainHashedLogistic(docs.repartition(7), "doc_id",
      "text", "label", dim, iters = 5, lr = 0.5)
    assert(w2.toSeq == w.toSeq)
  }

  test("retrievalMetrics: exact counts, first-rank reciprocal, no-qrel queries") {
    // q1: rel = {10, 30}; hits at rnk 2 (10) and 4 (30). q2: rel = {50}
    // outside top-k. q3: no qrels at all.
    val results = Seq(
      (1L, 20L, 1), (1L, 10L, 2), (1L, 40L, 3), (1L, 30L, 4), (1L, 99L, 5),
      (2L, 60L, 1), (2L, 70L, 2), (2L, 80L, 3),
      (3L, 11L, 1), (3L, 12L, 2)
    ).toDF("query_id", "cand_id", "rnk")
    val qrels = Seq((1L, 10L), (1L, 30L), (2L, 50L))
      .toDF("query_id", "cand_id")
    val got = Relevance.retrievalMetrics(results, qrels, k = 3)
      .as[(Long, Long, Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // k=3 cuts q1's rank-4 hit; rr = 1000000 DIV 2
    assert(got == Map(
      1L -> ((2L, 1L, 2, 500000L)),
      2L -> ((1L, 0L, 0, 0L)),
      3L -> ((0L, 0L, 0, 0L))))
    // k=5 recovers the rank-4 hit; first_rank stays the min
    val got5 = Relevance.retrievalMetrics(results, qrels, k = 5)
      .as[(Long, Long, Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got5(1L) == ((2L, 2L, 2, 500000L)))
    // rr_micro is the exact floor division for non-unit ranks
    val r3 = Seq((9L, 5L, 3)).toDF("query_id", "cand_id", "rnk")
    val q3 = Seq((9L, 5L)).toDF("query_id", "cand_id")
    assert(Relevance.retrievalMetrics(r3, q3, k = 3)
      .select($"rr_micro").as[Long].head() == 333333L)
  }

  test("rougeOverlap: clipped bigram overlap on a hand-computable fixture") {
    val docs = Seq(
      (1L, "a b c a b"),   // bigrams: "a b"×2, "b c", "c a"
      (2L, "a b d a b"),   // bigrams: "a b"×2, "b d", "d a"
      (3L, "x y"),         // one bigram, shares nothing
      (4L, "solo")         // too short to gram
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 1L))
      .toDF("cand_id", "ref_id")
    val got = Relevance.rougeOverlap(pairs, docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    // clip: min(2,2)=2 on "a b", nothing else shared → 2 of 4
    assert(got((1L, 2L)) == ((4L, 4L, 2L, 500L, 500L)))
    assert(got((1L, 3L)) == ((4L, 1L, 0L, 0L, 0L)))
    // gram-less ref/cand surfaces with zero totals, never divides
    assert(got((1L, 4L)) == ((4L, 0L, 0L, 0L, 0L)))
    assert(got((4L, 1L)) == ((0L, 4L, 0L, 0L, 0L)))
  }

  test("rougeOverlap: hash choice does not change results; partition-independent") {
    val rnd = new scala.util.Random(53)
    val words = Seq("the", "cat", "sat", "on", "mat", "dog", "ran")
    val docs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(5))(
        words(rnd.nextInt(words.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = (0 until 39).map(i => (i.toLong, i.toLong + 1))
      .toDF("cand_id", "ref_id")
    def run(df: org.apache.spark.sql.DataFrame,
            h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Relevance.rougeOverlap(pairs, df, "doc_id", "text", n = 2, hashFn = h)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    val xx = run(docs, xxhash64(_))
    val md = run(docs, graft.llm.TextAnalysis.md5Hash60)
    assert(xx == md, "results must be a pure function of the grams")
    assert(run(docs.repartition(9), xxhash64(_)) == xx)
  }

  test("ndcgAtK: perfect 10⁶, buried hit discounts exactly, no-rel NULL") {
    val w = Relevance.ndcgWeightsMicro(5)
    assert(w.head == 1000000L && w(2) == 500000L,
      "w₁ = 10⁶ and w₃ = 10⁶/log₂4 = 500000 exactly")
    // q1: hits at ranks 1..3 with n_rel=3 → perfect; q2: single hit at
    // rank 3 of n_rel=1 → 500000; q3: no qrels → NULL
    val results = Seq(
      (1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3), (1L, 14L, 4), (1L, 15L, 5),
      (2L, 21L, 1), (2L, 22L, 2), (2L, 23L, 3),
      (3L, 31L, 1)).toDF("query_id", "cand_id", "rnk")
    val qrels = Seq((1L, 11L), (1L, 12L), (1L, 13L), (2L, 23L))
      .toDF("query_id", "cand_id")
    val got = Relevance.ndcgAtK(results, qrels, k = 5)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, w.take(3).sum, Some(1000000L))))
    assert(got(2L) == ((1L, 500000L, Some(500000L))))
    assert(got(3L) == ((0L, 0L, None)))
    // more relevant docs than k: IDCG caps at the k-prefix
    val manyRel = (11L to 20L).map(c => (1L, c)).toDF("query_id", "cand_id")
    val capped = Relevance.ndcgAtK(results, manyRel, k = 5)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(capped(1L).contains(1000000L),
      "all-relevant top-5 must be perfect even with n_rel > k")
  }

  test("rrfFuse: hand scores, consensus beats single-ranker, ties by id") {
    // ranker A: 10 > 20 > 30; ranker B: 20 > 10 > 40
    val rankings = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (1L, 20L, 1), (1L, 10L, 2), (1L, 40L, 3))
      .toDF("query_id", "cand_id", "rnk")
    val got = Relevance.rrfFuse(rankings, k = 4)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    val w = (r: Int) => 1000000L / (60 + r)
    // 10 and 20 both score w(1)+w(2) — tie breaks to the smaller id
    assert(got.map(r => (r._2, r._3)).toSeq == Seq(
      (10L, w(1) + w(2)), (20L, w(1) + w(2)),
      (30L, w(3)), (40L, w(3))))
    assert(got.map(_._4).toSeq == Seq(1, 2, 3, 4))
  }

  test("rrfFuse: k bounds output, invalid ranks dropped, validation") {
    val rankings = (1L to 30L).map(c => (7L, c, c.toInt))
      .toDF("query_id", "cand_id", "rnk")
      .unionByName(Seq((7L, 99L, 0), (7L, 98L, -3))
        .toDF("query_id", "cand_id", "rnk"))
    val got = Relevance.rrfFuse(rankings, k = 5)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.length == 5 && !got.exists(r => r._2 == 99L || r._2 == 98L))
    intercept[IllegalArgumentException](Relevance.rrfFuse(rankings, 0))
    intercept[IllegalArgumentException](
      Relevance.rrfFuse(rankings, 5, rrfK = 0))
  }

  test("rankerAgreement: hand Jaccard, one-sided queries survive the " +
       "full outer, duplicates collapse") {
    val a = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 12L), // dup
      (2L, 20L),
      (3L, 30L)).toDF("q", "d")
    val b = Seq((1L, 11L), (1L, 12L), (1L, 13L),
      (4L, 40L)).toDF("q", "d")
    val got = Relevance.rankerAgreement(a, b, "q", "d")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // q1: A={10,11,12}, B={11,12,13} → 2/4
    assert(got(1L) == ((1L, 3L, 3L, 2L, Some(500000L))), s"got $got")
    assert(got(2L) == ((2L, 1L, 0L, 0L, Some(0L))))
    assert(got(3L) == ((3L, 1L, 0L, 0L, Some(0L))))
    assert(got(4L) == ((4L, 0L, 1L, 0L, Some(0L))))
  }

  test("rboPpm: identical lists hit the closed form, reversal costs " +
       "where Jaccard can't see, disjoint = 0, rank bias ordering") {
    val k = 5
    // driver reference: sum of pinned floors (10^6*9^(d-1)*X_d)//(10^d*d)
    def ref(xs: Seq[Int]): Long = (1 to k).map { d =>
      (BigInt(10).pow(6) * BigInt(9).pow(d - 1) * xs(d - 1) /
        (BigInt(10).pow(d) * d)).toLong
    }.sum
    def ranks(q: Long, ds: Seq[Long]) =
      ds.zipWithIndex.map { case (d, i) => (q, d, (i + 1).toLong) }
    val a = (ranks(1L, Seq(10, 11, 12, 13, 14)) ++ // q1: identity
      ranks(2L, Seq(20, 21, 22, 23, 24)) ++        // q2: vs reversed
      ranks(3L, Seq(30, 31, 32, 33, 34)))          // q3: vs disjoint
      .toDF("q", "d", "rnk")
    val b = (ranks(1L, Seq(10, 11, 12, 13, 14)) ++
      ranks(2L, Seq(24, 23, 22, 21, 20)) ++
      ranks(3L, Seq(90, 91, 92, 93, 94)))
      .toDF("q", "d", "rnk")
    val got = Relevance.rboPpm(a, b, "q", "d", "rnk", k)
      .as[(Long, Long)].collect().toMap
    // identical: X_d = d at every depth
    assert(got(1L) == ref(Seq(1, 2, 3, 4, 5)), s"got $got")
    // reversed same set: overlap only fills once prefixes meet
    // (X = 0,0,1,3,5 for 5 elements)
    assert(got(2L) == ref(Seq(0, 0, 1, 3, 5)))
    assert(got(2L) < got(1L), "reversal must cost under rank weighting")
    assert(got(3L) == 0L)
    // rank bias: sharing the TOP result only beats sharing the BOTTOM
    // result only (same Jaccard, different rbo)
    val top = Relevance.rboPpm(
      ranks(9L, Seq(1, 2, 3, 4, 5)).toDF("q", "d", "rnk"),
      ranks(9L, Seq(1, 6, 7, 8, 9)).toDF("q", "d", "rnk"),
      "q", "d", "rnk", k).as[(Long, Long)].collect().head._2
    val bottom = Relevance.rboPpm(
      ranks(9L, Seq(1, 2, 3, 4, 5)).toDF("q", "d", "rnk"),
      ranks(9L, Seq(6, 7, 8, 9, 5)).toDF("q", "d", "rnk"),
      "q", "d", "rnk", k).as[(Long, Long)].collect().head._2
    assert(top > bottom, s"top-share $top must beat bottom-share $bottom")
    intercept[IllegalArgumentException](
      Relevance.rboPpm(a, b, "q", "d", "rnk", 21))
  }
}
