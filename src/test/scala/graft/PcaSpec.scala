package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Similarity.covarianceStats / jacobiEigen / pcaWhiten — exact
  * second-moment statistics vs a driver reference, eigensolver
  * invariants, and the whitening contract (whitened empirical
  * covariance ≈ identity), plus determinism under repartitioning. */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 8

  /** Correlated synthetic embeddings: z ~ deterministic pseudo-gaussian,
    * x = M z with a fixed mixing matrix — guarantees strong off-diagonal
    * covariance for the whitening test. */
  private lazy val corpus: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(97)
    val mix = Array.fill(dim, dim)(rnd.nextGaussian() * 0.5)
    (0 until 300).map { i =>
      val z = Array.fill(dim)(rnd.nextGaussian())
      val x = Array.tabulate(dim)(r =>
        (0 until dim).map(c => mix(r)(c) * z(c)).sum.toFloat)
      (i.toLong, x)
    }
  }

  test("covarianceStats equals the driver-computed exact sums") {
    val df = corpus.toDF("vec_id", "embedding")
    val got = Similarity.covarianceStats(df, "embedding")
      .as[(Int, Int, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == dim * (dim + 1) / 2)
    val want = (for (i <- 0 until dim; j <- i until dim) yield {
      val s = corpus.map { case (_, v) =>
        BigDecimal(v(i).toDouble * v(j).toDouble)
          .setScale(15, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (i, j) -> s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }).toMap
    for (((i, j), (sxy, n)) <- got) {
      assert(n == corpus.size)
      // reference skips the engine's decimal→double→decimal(38,6)
      // round-trip, so allow one ulp of the 6-decimal grid
      assert(math.abs(sxy - want((i, j))) < 2e-6,
        s"pair ($i,$j): got $sxy want ${want((i, j))}")
    }
  }

  test("covarianceStats is partition-independent bit-for-bit") {
    val df = corpus.toDF("vec_id", "embedding")
    val a = Similarity.covarianceStats(df, "embedding")
      .as[(Int, Int, Double, Long)].collect().sorted.toSeq
    val b = Similarity.covarianceStats(df.repartition(13), "embedding")
      .as[(Int, Int, Double, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("jacobiEigen reconstructs A·v = λ·v with orthonormal vectors") {
    val rnd = new scala.util.Random(7)
    val raw = Array.fill(6, 6)(rnd.nextGaussian())
    val sym = Array.tabulate(6, 6)((i, j) => (raw(i)(j) + raw(j)(i)) / 2)
    val (values, vectors) = Similarity.jacobiEigen(sym)
    assert(values.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      "eigenvalues must come sorted descending")
    for (r <- 0 until 6) {
      val v = vectors(r)
      val av = Array.tabulate(6)(i => (0 until 6).map(j => sym(i)(j) * v(j)).sum)
      for (i <- 0 until 6)
        assert(math.abs(av(i) - values(r) * v(i)) < 1e-8,
          s"eigenpair $r violates A·v = λ·v at row $i")
      for (r2 <- 0 until 6) {
        val dot = (0 until 6).map(i => v(i) * vectors(r2)(i)).sum
        val want = if (r == r2) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-8, s"rows $r,$r2 not orthonormal")
      }
    }
  }

  test("pcaWhiten output has identity empirical covariance") {
    val df = corpus.toDF("vec_id", "embedding")
    val out = Similarity.pcaWhiten(df, "vec_id", "embedding", dim,
        outDim = dim)
      .as[(Long, Seq[Double])].collect()
    assert(out.length == corpus.size)
    val n = out.length.toDouble
    val mean = Array.tabulate(dim)(j => out.map(_._2(j)).sum / n)
    for (i <- 0 until dim; j <- i until dim) {
      val c = out.map(r => (r._2(i) - mean(i)) * (r._2(j) - mean(j)))
        .sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 2e-2,
        s"whitened cov($i,$j) = $c, want $want")
    }
  }

  test("pcaWhiten concentrates variance in the leading components") {
    // project to 3 of 8 dims: output must still be unit-variance, and
    // the DROPPED eigenvalues must be the smallest ones — check total
    // captured variance dominates
    val df = corpus.toDF("vec_id", "embedding")
    val out = Similarity.pcaWhiten(df, "vec_id", "embedding", dim,
        outDim = 3)
      .as[(Long, Seq[Double])].collect()
    assert(out.forall(_._2.length == 3))
    val n = out.length.toDouble
    for (j <- 0 until 3) {
      val m = out.map(_._2(j)).sum / n
      val v = out.map(r => (r._2(j) - m) * (r._2(j) - m)).sum / n
      assert(math.abs(v - 1.0) < 2e-2, s"component $j variance $v")
    }
  }

  test("pcaWhiten is deterministic under repartitioning") {
    val df = corpus.toDF("vec_id", "embedding")
    val a = Similarity.pcaWhiten(df, "vec_id", "embedding", dim, 4)
      .as[(Long, Seq[Double])].collect().toMap
    val b = Similarity.pcaWhiten(df.repartition(11), "vec_id",
        "embedding", dim, 4)
      .as[(Long, Seq[Double])].collect().toMap
    assert(a == b)
  }

  test("pcaWhiten validates its arguments") {
    val df = corpus.toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.pcaWhiten(df, "vec_id", "embedding", dim, dim + 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.pcaWhiten(df, "vec_id", "embedding", 0, 0)
    }
  }
}
