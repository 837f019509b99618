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

  test("intersection estimate lands near the true overlap and clamps at 0") {
    // 3000 left, 3000 right, 1000 shared → |A|=|B|=3000, |A∩B|=1000
    val shared = Seq.tabulate(1000)(i => s"shared item $i")
    val onlyA = Seq.tabulate(2000)(i => s"left only $i")
    val onlyB = Seq.tabulate(2000)(i => s"right only $i")
    def reg(ks: Seq[String]) =
      Sketches.hllRegisters(ks.toDF("k"), col("k"), b = 10)
    val row = Sketches.hllIntersectEstimate(
        reg(onlyA ++ shared), reg(onlyB ++ shared), bBits = 10)
      .select("est_a", "est_b", "est_union", "est_intersect")
      .as[(Double, Double, Double, Double)].collect().head
    // HLL relative error at b=10 ≈ 1.04/√1024 ≈ 3.3%; the intersection
    // inherits errors from three estimates over |A∪B|=5000 — allow a
    // generous but still diagnostic ±40% band on the 1000-truth
    assert(math.abs(row._1 - 3000) < 3000 * 0.1, s"est_a ${row._1}")
    assert(math.abs(row._3 - 5000) < 5000 * 0.1, s"est_union ${row._3}")
    assert(row._4 > 600 && row._4 < 1400, s"est_intersect ${row._4}")
    // disjoint sets: inclusion–exclusion noise must clamp at zero, never
    // report negative overlap
    val disjoint = Sketches.hllIntersectEstimate(
        reg(onlyA), reg(onlyB), bBits = 10)
      .select("est_intersect").as[Double].collect().head
    assert(disjoint >= 0.0)
    assert(disjoint < 400, s"disjoint overlap estimate $disjoint")
  }

  test("grouped intersection estimate equals per-filter estimates") {
    val rows = (Seq.tabulate(600)(i => ("g1", s"a$i")) ++
      Seq.tabulate(600)(i => ("g2", s"b$i"))).toDF("g", "k")
    def reg(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, col("k"), b = 8, groupCols = Seq("g"))
    val left = rows.filter(col("k") =!= "a0")
    val grouped = Sketches.hllIntersectEstimate(reg(left), reg(rows),
        bBits = 8, groupCols = Seq("g"))
      .select("g", "est_intersect").as[(String, Double)].collect().toMap
    Seq("g1", "g2").foreach { g =>
      val one = Sketches.hllIntersectEstimate(
          reg(left.filter(col("g") === g)), reg(rows.filter(col("g") === g)),
          bBits = 8)
        .select("est_intersect").as[Double].collect().head
      assert(math.abs(grouped(g) - one) < 1e-9, s"group $g")
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

  // --------------------------------------------------------------------
  // Count-Min sketch

  /** Driver CM reference on the md5 family: full register table +
    * min-over-d point estimates, mirroring cmRegisters/cmQuery. */
  private def cmRef(keys: Seq[(String, Long)], d: Int, b: Int)
      : (Map[(Int, Long), Long], String => Long) = {
    val m = 1L << b
    val regs = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    for ((k, w) <- keys; i <- 0 until d) {
      val bucket = md5_60(s"$i:$k") % m
      regs((i, bucket)) += w
    }
    val frozen = regs.toMap
    val query = (k: String) =>
      (0 until d).map(i => frozen.getOrElse((i, md5_60(s"$i:$k") % m), 0L)).min
    (frozen, query)
  }

  private val cmHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    graft.llm.TextAnalysis.md5Hash60

  private val cmCorpus: Seq[String] =
    Seq.tabulate(600)(i => s"token${i % 120}") // 120 distinct, 5 each

  test("CM registers equal the independent driver reference (md5 path)") {
    val got = Sketches.cmRegisters(cmCorpus.toDF("k"), col("k"),
        d = 3, b = 8, hashFn = cmHash)
      .as[(Int, Long, Long)].collect()
      .map { case (r, bk, c) => (r, bk) -> c }.toMap
    val (want, _) = cmRef(cmCorpus.map(_ -> 1L), 3, 8)
    assert(got == want)
  }

  test("CM point query equals the driver min-over-rows estimate and never undercounts") {
    val regs = Sketches.cmRegisters(cmCorpus.toDF("k"), col("k"),
      d = 3, b = 8, hashFn = cmHash)
    val probes = (0 until 120).map(i => s"token$i") :+ "never seen"
    val got = Sketches.cmQuery(regs, probes.toDF("k"), "k",
        d = 3, b = 8, hashFn = cmHash)
      .as[(String, Long)].collect().toMap
    val (_, ref) = cmRef(cmCorpus.map(_ -> 1L), 3, 8)
    val truth = cmCorpus.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (p <- probes) {
      assert(got(p) == ref(p), s"probe $p")
      assert(got(p) >= truth.getOrElse(p, 0L), s"undercount at $p")
    }
  }

  test("CM merge of shard sketches equals the sketch of the union") {
    val (l, r) = cmCorpus.splitAt(251)
    def reg(ks: Seq[String]) =
      Sketches.cmRegisters(ks.toDF("k"), col("k"), d = 4, b = 6)
    val merged = Sketches.cmMerge(reg(l), reg(r))
      .as[(Int, Long, Long)].collect().sorted.toSeq
    val whole = reg(cmCorpus).as[(Int, Long, Long)].collect().sorted.toSeq
    assert(merged == whole)
  }

  test("CM registers are weighted, partition-independent, and NULL-excluding") {
    val weighted = cmCorpus.zipWithIndex
      .map { case (k, i) => (k, (i % 3 + 1).toLong) }
    val df = weighted.toDF("k", "w")
    val a = Sketches.cmRegisters(df, col("k"), d = 2, b = 7,
        weight = col("w"), hashFn = cmHash)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    val b = Sketches.cmRegisters(df.repartition(13), col("k"), d = 2, b = 7,
        weight = col("w"), hashFn = cmHash)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(a == b)
    val (want, _) = cmRef(weighted, 2, 7)
    assert(a.map { case (r, bk, c) => (r, bk) -> c }.toMap == want)
    val withNull = weighted.map { case (k, w) => (Option(k), w) } :+
      ((None: Option[String], 99L))
    val c = Sketches.cmRegisters(withNull.toDF("k", "w"), col("k"),
        d = 2, b = 7, weight = col("w"), hashFn = cmHash)
      .as[(Int, Long, Long)].collect().sorted.toSeq
    assert(c == a)
  }

  test("CM grouped registers equal per-filter registers; invalid params fail loud") {
    val df = cmCorpus.zipWithIndex
      .map { case (k, i) => (k, if (i % 2 == 0) "x" else "y") }
      .toDF("k", "g")
    val grouped = Sketches.cmRegisters(df, col("k"), d = 2, b = 6,
        groupCols = Seq("g"))
      .as[(String, Int, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3) -> r._4).toMap }
    for (g <- Seq("x", "y")) {
      val solo = Sketches.cmRegisters(df.where(col("g") === g),
          col("k"), d = 2, b = 6)
        .as[(Int, Long, Long)].collect()
        .map { case (r, bk, c) => (r, bk) -> c }.toMap
      assert(grouped(g) == solo, s"group $g")
    }
    intercept[IllegalArgumentException] {
      Sketches.cmRegisters(df, col("k"), d = 0, b = 6)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmQuery(df, df, "k", d = 4, b = 26)
    }
  }

  // ---- stride-sampled quantile sketch --------------------------------

  private def strideEsts(df: org.apache.spark.sql.DataFrame,
                         nShards: Int, stride: Int,
                         qs: Seq[Int]): Map[Int, Double] =
    Sketches.strideQuantiles(
        Sketches.strideRegisters(df, col("v"), col("id"),
          nShards = nShards, stride = stride),
        qs)
      .as[(Int, Double)].collect().toMap

  test("stride quantiles: rank error within nShards*stride; stride=1 is exact") {
    val n = 5000
    // permuted distinct values so sorted rank == value
    val df = spark.range(n).select(
      ((col("id") * 2654435761L) % n).cast("double").as("v"),
      col("id"))
    val (nShards, stride) = (8, 25)
    val got = strideEsts(df, nShards, stride, Seq(100, 250, 500, 900, 990))
    for ((q, est) <- got) {
      val targetRank = q.toDouble / 1000 * n
      assert(math.abs(est - targetRank) <= nShards * stride,
        s"q=$q est=$est target=$targetRank")
    }
    // stride 1 keeps every row — estimates are exact order statistics
    val exact = strideEsts(df, 4, 1, Seq(500, 990))
    // smallest v with cum count >= q/1000*n (v = rank-1 → ceil-1)
    assert(exact(500) == math.ceil(0.5 * n) - 1)
    assert(exact(990) == math.ceil(0.99 * n) - 1)
  }

  test("stride quantiles: merged disjoint builds stay within additive error; partition-independent") {
    val n = 4000
    val df = spark.range(n).select(
      ((col("id") * 40503L) % n).cast("double").as("v"), col("id"))
    val (nShards, stride) = (8, 20)
    val a = Sketches.strideRegisters(df.where(col("id") % 2 === 0),
      col("v"), col("id"), nShards, stride)
    val b = Sketches.strideRegisters(df.where(col("id") % 2 === 1),
      col("v"), col("id"), nShards, stride)
    val merged = Sketches.strideQuantiles(
        Sketches.strideMerge(a, b), Seq(250, 500, 900))
      .as[(Int, Double)].collect().toMap
    for ((q, est) <- merged) {
      val targetRank = q.toDouble / 1000 * n
      // two builds → error bounds add
      assert(math.abs(est - targetRank) <= 2 * nShards * stride,
        s"q=$q est=$est target=$targetRank")
    }
    val once = strideEsts(df, nShards, stride, Seq(250, 500, 900))
    val again = strideEsts(df.repartition(13), nShards, stride,
      Seq(250, 500, 900))
    assert(once == again)
    intercept[IllegalArgumentException] {
      Sketches.strideRegisters(df, col("v"), col("id"), nShards = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.strideQuantiles(a, Seq(0))
    }
  }

  test("sliding HLL rollup: window registers equal direct merges of their periods") {
    // periods 0..9, each with its own key range (overlapping neighbors)
    val df = spark.range(2000).select(
      (col("id") % 10).as("t"),
      concat(lit("u"), (col("id") * 7919) % 500).as("k"))
    val perPeriod = Sketches.hllRegisters(df, col("k"), b = 5,
      groupCols = Seq("t"))
    val win = Sketches.hllSlidingMerge(perPeriod, "t", windowLen = 3)
    // window w must equal the sketch of periods {w-2, w-1, w} directly
    for (w <- Seq(2L, 5L, 9L)) {
      val direct = Sketches.hllRegisters(
        df.filter(col("t") >= w - 2 && col("t") <= w), col("k"), b = 5)
      val got = win.filter(col("w") === w).select("bucket", "r")
        .as[(Long, Int)].collect().toMap
      val want = direct.select("bucket", "r").as[(Long, Int)].collect().toMap
      assert(got == want, s"window $w")
    }
    // trailing partial windows exist past the last period
    assert(win.filter(col("w") === 11).count() > 0)
    assert(win.filter(col("w") === 12).count() == 0)
    intercept[IllegalArgumentException] {
      Sketches.hllSlidingMerge(perPeriod, "t", 0)
    }
  }

  test("CM join-size estimate: never undercounts, tight at adequate width") {
    // R: keys 0..199 with multiplicity 1 + key 7 hot (×50);
    // S: keys 100..299 once each → true |R⋈S| = 100 (keys 100..199)
    val r = (spark.range(200).selectExpr("CAST(id AS STRING) AS k") union
      spark.range(49).selectExpr("CAST(7 AS STRING) AS k")).toDF("k")
    val s2 = spark.range(100, 300).selectExpr("CAST(id AS STRING) AS k")
    val trueSize = 100L
    def est(b: Int): Long = {
      val ra = Sketches.cmRegisters(r, col("k"), d = 4, b = b)
      val rb = Sketches.cmRegisters(s2, col("k"), d = 4, b = b)
      Sketches.cmJoinSizeEstimate(ra, rb)
        .select("est").as[Long].head()
    }
    val wide = est(14)
    assert(wide >= trueSize, "CM inner product must never undercount")
    // collision bound: E[err] ≤ |R|·|S|/2^b = 249·200/16384 ≈ 3
    assert(wide <= trueSize + 60, s"b=14 estimate too loose: $wide")
    // narrow sketch still upper-bounds, just looser
    assert(est(4) >= wide)
    // per-row dots all ≥ est, est = their min
    val ra = Sketches.cmRegisters(r, col("k"), d = 4, b = 10)
    val rb = Sketches.cmRegisters(s2, col("k"), d = 4, b = 10)
    val rows = Sketches.cmJoinSizeEstimate(ra, rb)
      .select("row", "dot", "est").as[(Int, Long, Long)].collect()
    assert(rows.length == 4 && rows.map(_._3).distinct.length == 1)
    assert(rows.map(_._2).min == rows.head._3)
  }

  test("CM join-size estimate respects groups") {
    val r = spark.range(100).selectExpr("CAST(id AS STRING) AS k",
      "CAST(id % 2 AS STRING) AS g")
    val s2 = spark.range(50, 150).selectExpr("CAST(id AS STRING) AS k",
      "CAST(id % 2 AS STRING) AS g")
    val ra = Sketches.cmRegisters(r, col("k"), d = 3, b = 12,
      groupCols = Seq("g"))
    val rb = Sketches.cmRegisters(s2, col("k"), d = 3, b = 12,
      groupCols = Seq("g"))
    val got = Sketches.cmJoinSizeEstimate(ra, rb, Seq("g"))
      .select("g", "est").distinct().as[(String, Long)].collect().toMap
    // true per-group join size: 25 each (50..99 split by parity)
    assert(got("0") >= 25L && got("1") >= 25L)
    assert(got("0") <= 40L && got("1") <= 40L)
  }
}
