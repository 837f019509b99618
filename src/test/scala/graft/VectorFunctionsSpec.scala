package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),       // orthogonal
    (3L, Array(2.0f, 0.0f), Array(4.0f, 0.0f)),       // parallel
    (4L, Array.empty[Float], Array.empty[Float]))     // empty → 0
  lazy val df = vecs.toDF("id", "a", "b")

  test("vec_dot and vec_cosine compute correctly (incl. empty and zero-norm)") {
    val got = df.select($"id", vecDot($"a", $"b").as("d"),
        vecCosine($"a", $"b").as("c"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == 32.0)
    assert(math.abs(got(1L)._2 - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L) == ((8.0, 1.0)))
    assert(got(4L) == ((0.0, 0.0)))   // zero-norm guard, no NaN
  }

  test("native cosine matches the interpreted lambda form on real embeddings") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .limit(50).select($"vec_id", $"embedding")
    val pairs = emb.as("x").join(emb.as("y"),
      col("x.vec_id") < col("y.vec_id"))
    val lambda = aggregate(zip_with(col("x.embedding"), col("y.embedding"),
        (p, q) => p.cast("double") * q.cast("double")), lit(0.0), (s, v) => s + v) /
      sqrt(aggregate(transform(col("x.embedding"), p => p.cast("double") * p.cast("double")), lit(0.0), (s, v) => s + v) *
           aggregate(transform(col("y.embedding"), p => p.cast("double") * p.cast("double")), lit(0.0), (s, v) => s + v))
    val diffs = pairs.select(
        abs(vecCosine(col("x.embedding"), col("y.embedding")) - lambda).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diffs < 1e-12, s"max diff $diffs")
  }

  test("mismatched lengths use the common prefix; null elements contribute 0") {
    val df2 = Seq((Array[java.lang.Float](1.0f, null, 3.0f),
                   Array[java.lang.Float](2.0f, 5.0f, 4.0f, 9.9f)))
      .toDF("a", "b")
    val (d, c) = df2.select(vecDot($"a", $"b").as("d"), vecCosine($"a", $"b").as("c"))
      .as[(Double, Double)].head()
    assert(d == 1.0 * 2.0 + 3.0 * 4.0)
    assert(c > 0 && c <= 1.0)
  }

  test("SQL registration: vec_cosine callable from spark.sql") {
    registerSql(spark)
    df.createOrReplaceTempView("vec_test")
    val r = spark.sql(
      "SELECT id, vec_cosine(a, b) AS c FROM vec_test WHERE id = 3")
      .as[(Long, Double)].head()
    assert(r == ((3L, 1.0)))
  }

  test("native LSH signature is bit-identical to the lambda reference on real embeddings") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .limit(100).select($"vec_id", $"embedding")
    for (bits <- Seq(8, 16); seed <- Seq(42, 7)) {
      val mismatches = emb.select(
          vecLshSignature($"embedding", bits, seed).as("native"),
          graft.llm.Similarity.lshSignatureReference($"embedding", bits, seed).as("ref"))
        .filter($"native" =!= $"ref").count()
      assert(mismatches == 0, s"bits=$bits seed=$seed: $mismatches mismatches")
    }
  }

  test("native LSH signature edge cases: empty vector sets every bit; bounds enforced") {
    val sig = Seq(Tuple1(Array.empty[Float])).toDF("v")
      .select(vecLshSignature($"v", 16).as("s")).as[Long].head()
    assert(sig == (1L << 16) - 1)   // all dots 0.0, 0.0 >= 0 → bit set (lambda parity)
    intercept[IllegalArgumentException] {
      graft.functions.LshSignature(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression($"v"), 64, 42)
    }
  }

  test("native decimal dot is bit-identical to the lambda reference on real embeddings") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .limit(60).select($"vec_id", $"embedding")
    val pairs = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
    // compare the DECIMAL(38,15) values themselves, not a rounded double
    val mismatches = pairs.select(
        vecDotDecimal(col("x.embedding"), col("y.embedding")).as("native"),
        graft.llm.Similarity.dotDecimalReference(
          col("x.embedding"), col("y.embedding")).as("ref"))
      .filter($"native" =!= $"ref" ||
              $"native".cast("string") =!= $"ref".cast("string"))
      .count()
    assert(mismatches == 0)
    // and the full deterministic-cosine surface (decimal sums + double
    // finish) is unchanged by the kernel swap
    val n2 = pairs.select(
        (vecDotDecimal(col("x.embedding"), col("y.embedding")).cast("double") /
          sqrt(vecDotDecimal(col("x.embedding"), col("x.embedding")).cast("double") *
               vecDotDecimal(col("y.embedding"), col("y.embedding")).cast("double"))).as("k"),
        (graft.llm.Similarity.dotDecimalReference(col("x.embedding"), col("y.embedding")).cast("double") /
          sqrt(graft.llm.Similarity.dotDecimalReference(col("x.embedding"), col("x.embedding")).cast("double") *
               graft.llm.Similarity.dotDecimalReference(col("y.embedding"), col("y.embedding")).cast("double"))).as("r"))
      .filter($"k" =!= $"r").count()
    assert(n2 == 0)
  }

  test("native decimal dot matches the lambda reference on adversarial doubles") {
    // magnitudes spanning 2^-40 .. 2^40, signs mixed — exercises the
    // shortest-string → setScale(15, HALF_UP) rounding path heavily
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val n = 1 + rnd.nextInt(24)
      def arr = Array.fill(n)(
        (rnd.nextDouble() - 0.5) * math.pow(2.0, rnd.nextInt(81) - 40))
      (i.toLong, arr, arr)
    }
    val df2 = rows.toDF("id", "a", "b")
    val bad = df2.select(
        vecDotDecimal($"a", $"b").as("native"),
        graft.llm.Similarity.dotDecimalReference($"a", $"b").as("ref"))
      .filter($"native" =!= $"ref" ||
              $"native".cast("string") =!= $"ref".cast("string"))
      .count()
    assert(bad == 0)
  }

  test("decimal dot null semantics mirror zip_with: length mismatch / null element → null; empty → 0") {
    val df3 = Seq(
      (1L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0, 5.0)),
      (2L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)),
      (3L, Array.empty[java.lang.Double], Array.empty[java.lang.Double]))
      .toDF("id", "a", "b")
    val got = df3.select($"id",
        vecDotDecimal($"a", $"b").cast("string").as("native"),
        graft.llm.Similarity.dotDecimalReference($"a", $"b").cast("string").as("ref"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(1L)._1 == null && got(1L)._2 == null)
    assert(got(2L)._1 == null && got(2L)._2 == null)
    assert(got(3L)._1 == "0.000000000000000" && got(3L)._1 == got(3L)._2)
  }

  test("decimal dot overflow parity: kernel throws exactly where the lambda recast throws") {
    // 1000 products of 1e20 sum to 1e23: precision 38 at scale 14 (passes
    // the Add check) but 39 after the recast to scale 15 — the lambda's
    // final cast throws under ANSI, and the kernel must throw too, not
    // return an out-of-range Decimal
    val big = Seq(Tuple1(Array.fill(1000)(1e10))).toDF("v")
    intercept[Exception] {
      big.select(vecDotDecimal($"v", $"v")).collect()
    }
    intercept[Exception] {
      big.select(graft.llm.Similarity.dotDecimalReference($"v", $"v")).collect()
    }
  }

  test("type check rejects non-array inputs") {
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("x", "y").select(vecDot($"x", $"y")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array") ||
           err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
