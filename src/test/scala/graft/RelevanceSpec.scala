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
}
