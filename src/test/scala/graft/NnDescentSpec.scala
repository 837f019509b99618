package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** llm/Similarity.nnDescent — graph-refined approximate k-NN. */
class NnDescentSpec extends SparkTestBase {
  import spark.implicits._

  /** 120 deterministic vectors in 4 well-separated cone clusters with
    * in-cluster jitter — cluster structure LSH can partially find and
    * NN-descent must complete. */
  private lazy val vecs = {
    val rows = (0L until 120L).map { id =>
      val c = (id % 4).toInt
      val base = Array.tabulate(8)(d => if (d == c * 2) 10f else 0f)
      base(((id * 7) % 8).toInt) += (id % 5).toFloat * 0.1f
      (id, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select($"query_id", $"cand_id", $"rnk")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

  test("nnDescent converges toward brute-force k-NN and refines the seed") {
    val brute = asMap(Similarity.bruteForceTopK(
      vecs, vecs, "vec_id", "embedding", k = 5))
    def recall(got: Map[Long, Seq[Long]]): Double = {
      val hits = brute.map { case (q, expect) =>
        expect.toSet.intersect(got.getOrElse(q, Nil).toSet).size }.sum
      hits.toDouble / brute.map(_._2.size).sum
    }
    val seedOnly = asMap(Similarity.nnDescent(
      vecs, "vec_id", "embedding", k = 5, iters = 0, lshBits = 8))
    val refined = asMap(Similarity.nnDescent(
      vecs, "vec_id", "embedding", k = 5, iters = 3, lshBits = 8))
    val r0 = recall(seedOnly)
    val r3 = recall(refined)
    assert(r3 >= r0, s"refinement lost recall: $r0 -> $r3")
    assert(r3 >= 0.95, s"recall after 3 rounds = $r3")
  }

  test("nnDescent is deterministic and partition-independent") {
    val a = asMap(Similarity.nnDescent(
      vecs, "vec_id", "embedding", k = 4, iters = 2, lshBits = 8))
    val b = asMap(Similarity.nnDescent(
      vecs.repartition(11), "vec_id", "embedding", k = 4, iters = 2,
      lshBits = 8))
    assert(a == b)
  }

  test("per-query kept-cosine quality never degrades with more rounds") {
    def quality(iters: Int): Map[Long, Double] =
      Similarity.nnDescent(vecs, "vec_id", "embedding", k = 4,
          iters = iters, lshBits = 8)
        .groupBy($"query_id").agg(sum($"cosine").as("s"))
        .as[(Long, Double)].collect().toMap
    val q0 = quality(0); val q1 = quality(1); val q2 = quality(2)
    val eps = 1e-9   // the kept cosines are exact decimals; the sum is
                     // a ≤k-term double fold — noise only at the ulp
    for (k <- q0.keys) {
      assert(q1.getOrElse(k, -99.0) >= q0(k) - eps)
      assert(q2.getOrElse(k, -99.0) >= q1(k) - eps)
    }
  }

  test("validation fails loud") {
    intercept[IllegalArgumentException] {
      Similarity.nnDescent(vecs, "vec_id", "embedding", k = 0, iters = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.nnDescent(vecs, "vec_id", "embedding", k = 3, iters = 11)
    }
  }
}
