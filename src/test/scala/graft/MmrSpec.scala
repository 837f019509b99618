package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** MMR diversified re-rank — spec-pinned (iterative greedy has no SQL
  * form, the BPE precedent). */
class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // one query; candidates: a redundant pair of near-identical vectors
  // with top relevance, plus an orthogonal lower-relevance vector
  private lazy val cands = Seq(
    (1L, 10L, 0.95, Array(1.0, 0.0, 0.0)),
    (1L, 11L, 0.94, Array(0.999, 0.01, 0.0)),   // near-copy of 10
    (1L, 12L, 0.60, Array(0.0, 1.0, 0.0)),      // diverse
    (1L, 13L, 0.50, Array(0.0, 0.9, 0.1))
  ).toDF("query_id", "cand_id", "rel", "vec")

  test("lambda=1 is pure relevance order; ties break ascending id") {
    val got = Similarity.mmrRerank(cands, "query_id", "cand_id", "rel",
        "vec", k = 4, lambda = 1.0)
      .orderBy("mmr_rank").select("cand_id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L, 12L, 13L))
    val tied = Seq(
      (1L, 21L, 0.5, Array(1.0, 0.0)), (1L, 20L, 0.5, Array(0.0, 1.0)))
      .toDF("query_id", "cand_id", "rel", "vec")
    val first = Similarity.mmrRerank(tied, "query_id", "cand_id", "rel",
        "vec", k = 1, lambda = 1.0)
      .select("cand_id").as[Long].head()
    assert(first == 20L, "equal scores must pick the lowest cand_id")
  }

  test("mid lambda promotes the diverse candidate over the redundant near-copy") {
    val got = Similarity.mmrRerank(cands, "query_id", "cand_id", "rel",
        "vec", k = 3, lambda = 0.5)
      .orderBy("mmr_rank").select("cand_id").as[Long].collect().toSeq
    // pick 1: highest rel (10). pick 2: 11 is penalized by ~cos≈1 to 10,
    // 12 is orthogonal → 12 wins despite lower relevance. pick 3: 13 is
    // now redundant with 12; 11 redundant with 10 — scores decide.
    assert(got.take(2) == Seq(10L, 12L),
      s"expected the diverse candidate second, got $got")
    assert(!got.take(2).contains(11L))
  }

  test("selection matches a driver-side greedy reference on a random fixture") {
    val rnd = new scala.util.Random(7)
    val rows = for (q <- 1 to 5; c <- 1 to 30) yield
      (q.toLong, (q * 1000 + c).toLong, rnd.nextDouble(),
        Array.fill(8)(rnd.nextGaussian()))
    val df = rows.toDF("query_id", "cand_id", "rel", "vec")
    val lambda = 0.7
    val got = Similarity.mmrRerank(df, "query_id", "cand_id", "rel", "vec",
        k = 10, lambda = lambda)
      .select("query_id", "cand_id", "mmr_rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // bit-identical formula to the operator's kernel: dot / sqrt(na·nb)
    // (sqrt(na)*sqrt(nb) differs in the last ulp and flips near-ties)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    val ref = rows.groupBy(_._1).view.mapValues { cs0 =>
      val cs = cs0.toArray
      var sel = Vector.empty[Int]
      (1 to 10).foreach { _ =>
        val best = cs.indices.filterNot(sel.contains).minBy { i =>
          val pen = if (sel.isEmpty) 0.0
            else sel.map(j => cos(cs(i)._4, cs(j)._4)).max
          val s = lambda * cs(i)._3 - (1 - lambda) * pen
          (-s, cs(i)._2)   // max score, tie → min id
        }
        sel = sel :+ best
      }
      sel.map(cs(_)._2)
    }.toMap
    assert(got == ref)
  }

  test("partition independence, k > n, and the unbounded-group guard") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.mmrRerank(df, "query_id", "cand_id", "rel", "vec",
          k = 3, lambda = 0.5)
        .select("query_id", "cand_id", "mmr_rank")
        .as[(Long, Long, Int)].collect().toSet
    assert(run(cands) == run(cands.repartition(7)))
    // k larger than the candidate set returns everything, ranked
    val all = Similarity.mmrRerank(cands, "query_id", "cand_id", "rel",
      "vec", k = 100, lambda = 0.5)
    assert(all.count() == 4)
    val err = intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerank(cands, "query_id", "cand_id", "rel", "vec",
        k = 2, lambda = 0.5, maxCandidates = 2).collect()
    }
    assert(err.getMessage.contains("mmrRerank") ||
      Option(err.getCause).exists(_.getMessage.contains("candidates")))
  }

  test("composes with brute-force ANN retrieval end to end") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200).cache()
    val queries = emb.limit(3)
    val top = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
      k = 20, deterministic = false)
    val withVecs = top.join(
      emb.select(col("vec_id").as("cand_id"), col("embedding").as("vec")),
      Seq("cand_id"))
    val sel = Similarity.mmrRerank(withVecs, "query_id", "cand_id",
      "cosine", "vec", k = 5, lambda = 0.5)
    val byQ = sel.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(byQ.size == 3 && byQ.values.forall(_ == 5L))
    emb.unpersist()
  }
}
