package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** ops/Sketches — HyperLogLog distinct-count sketch: register rule vs
  * an independent driver md5 reference, mergeability, estimate
  * accuracy and the small-range linear-counting branch, per-group
  * independence, partition independence. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent driver-side md5Hash60 (JDK MessageDigest, no Spark). */
  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.substring(0, 15), 16)
  }

  /** Driver reference registers for the md5 path (b=6, hashBits=60). */
  private def refRegisters(keys: Seq[String]): Map[Long, Int] =
    keys.map { k =>
      val h = md5_60(k)
      val bucket = h % 64
      val w = h / 64
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w)
      val rho = if (w == 0) 55 else 55 - bitlen
      bucket -> rho
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }

  private val corpus =
    Seq.tabulate(800)(i => s"doc number $i with some text")

  test("md5-path registers equal the independent driver reference") {
    val df = corpus.toDF("k")
    val got = Sketches.hllRegisters(df, col("k"), b = 6,
        hashFn = graft.llm.TextAnalysis.md5Hash60, hashBits = 60)
      .as[(Long, Int)].collect().toMap
    assert(got == refRegisters(corpus))
  }

  test("duplicate keys do not change the registers; NULLs are excluded") {
    val base = corpus.toDF("k")
    val dups = (corpus ++ corpus ++ corpus).map(Option(_))
      .++(Seq(None, None)).toDF("k")
    val a = Sketches.hllRegisters(base, col("k"), b = 6,
        hashFn = graft.llm.TextAnalysis.md5Hash60, hashBits = 60)
      .as[(Long, Int)].collect().toMap
    val b = Sketches.hllRegisters(dups, col("k"), b = 6,
        hashFn = graft.llm.TextAnalysis.md5Hash60, hashBits = 60)
      .as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("merge of shard sketches equals the sketch of the union") {
    val (l, r) = corpus.splitAt(300)
    def reg(ks: Seq[String]) =
      Sketches.hllRegisters(ks.toDF("k"), col("k"), b = 6)
    val merged = Sketches.hllMerge(reg(l), reg(r))
      .as[(Long, Int)].collect().toMap
    val whole = reg(corpus).as[(Long, Int)].collect().toMap
    assert(merged == whole)
  }

  test("registers are partition-independent (xxhash64 production path)") {
    val df = corpus.toDF("k")
    val a = Sketches.hllRegisters(df, col("k"), b = 8)
      .as[(Long, Int)].collect().toMap
    val b = Sketches.hllRegisters(df.repartition(17), col("k"), b = 8)
      .as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("estimate matches the formula applied to collected registers") {
    val df = corpus.toDF("k")
    val regs = Sketches.hllRegisters(df, col("k"), b = 6)
    val got = Sketches.hllEstimate(regs, b = 6)
      .select(col("n_buckets"), col("denom_units").cast("string"),
        col("estimate"))
      .as[(Int, String, Double)].collect().head
    val collected = regs.as[(Long, Int)].collect().toMap
    val m = 64
    val s = 63 - 6 + 1
    val occ = collected.values.map(r => BigInt(1) << (s - r)).sum
    val denom = occ + BigInt(m - collected.size) * (BigInt(1) << s)
    val raw = Sketches.hllAlpha(m) * m * m *
      (BigInt(1) << s).toDouble / denom.toDouble
    val zeros = m - collected.size
    val want =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    assert(got._1 == collected.size)
    assert(BigInt(got._2) == denom)
    assert(got._3 == want)
  }

  test("estimate is within the theoretical error band (b=8, n=2000)") {
    val keys = Seq.tabulate(2000)(i => s"unique key $i")
    val regs = Sketches.hllRegisters(keys.toDF("k"), col("k"), b = 8)
    val est = Sketches.hllEstimate(regs, b = 8)
      .select("estimate").as[Double].collect().head
    // 1.04/sqrt(256) ≈ 6.5% std error; allow 3 sigma
    assert(math.abs(est - 2000.0) / 2000.0 < 0.20,
      s"estimate $est too far from 2000")
  }

  test("small cardinalities ride linear counting to near-exact counts") {
    for (n <- Seq(1, 5, 17)) {
      val keys = Seq.tabulate(n)(i => s"tiny $i")
      val regs = Sketches.hllRegisters(keys.toDF("k"), col("k"), b = 6)
      val est = Sketches.hllEstimate(regs, b = 6)
        .select("estimate").as[Double].collect().head
      assert(math.abs(est - n) <= math.max(1.0, 0.15 * n),
        s"n=$n estimated as $est")
    }
  }

  test("per-group registers equal per-filter registers") {
    val df = corpus.zipWithIndex
      .map { case (k, i) => (k, if (i % 3 == 0) "a" else "b") }
      .toDF("k", "g")
    val grouped = Sketches.hllRegisters(df, col("k"), b = 6,
        groupCols = Seq("g"))
      .as[(String, Long, Int)].collect()
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => r._2 -> r._3).toMap }
    for (g <- Seq("a", "b")) {
      val solo = Sketches.hllRegisters(df.where(col("g") === g),
          col("k"), b = 6)
        .as[(Long, Int)].collect().toMap
      assert(grouped(g) == solo, s"group $g")
    }
  }

  test("invalid parameters fail loud") {
    val df = corpus.toDF("k")
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(df, col("k"), b = 2)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(df, col("k"), b = 6, hashBits = 64)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllEstimate(df, b = 6, hashBits = 5)
    }
  }
}
