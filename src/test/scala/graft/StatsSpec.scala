package graft

import graft.ops.Stats
import org.apache.spark.sql.functions._

/** ops/Stats — distributed exact order statistics: the quantile rule
  * against a driver-side sorted reference, per-group vs global
  * consistency, partition independence, and the histogram's exact
  * integer binning. */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  private val probs = Seq(("p50", 500), ("p90", 900), ("p99", 990))

  /** Driver reference: type-1 lower quantile over a sorted vector with
    * the identical integer threshold rule. */
  private def refQuantile(values: Seq[Long], pm: Int): Long = {
    val sorted = values.sorted
    val rank = ((pm.toLong * sorted.size + 999) / 1000).toInt // ceil
    sorted(rank - 1)
  }

  lazy val mixed = Seq.tabulate(997)(i => (i.toLong * 7919L) % 1000L)

  test("exactQuantiles matches the driver-side sorted reference") {
    val df = mixed.toDF("v")
    val got = Stats.exactQuantiles(df, "v", probs)
      .as[(String, Long)].collect().toMap
    for ((label, pm) <- probs)
      assert(got(label) == refQuantile(mixed, pm),
        s"$label: got ${got(label)}, want ${refQuantile(mixed, pm)}")
  }

  test("quantiles are exact on heavy ties and p1000 is the maximum") {
    val values = Seq.fill(500)(5L) ++ Seq.fill(499)(9L) ++ Seq(1L)
    val df = values.toDF("v")
    val got = Stats.exactQuantiles(df, "v",
        Seq(("p1", 1), ("p500", 500), ("p501", 501), ("p1000", 1000)))
      .as[(String, Long)].collect().toMap
    assert(got("p1") == 1L)      // rank 1 = the single minimum
    assert(got("p500") == 5L)    // rank 500 still inside the 5-run
    assert(got("p501") == 5L)    // rank 501: 1 + 500 fives = cum 501
    assert(got("p1000") == 9L)   // full fraction = maximum
  }

  test("exactQuantiles is partition-independent and ignores NULL values") {
    val df = mixed.toDF("v")
      .unionByName(Seq.empty[Option[Long]].toDF("v"))
    val withNulls = df.unionByName(
      Seq[Option[Long]](None, None, None).toDF("v"))
    val a = Stats.exactQuantiles(withNulls, "v", probs)
      .as[(String, Long)].collect().toMap
    val b = Stats.exactQuantiles(withNulls.repartition(13), "v", probs)
      .as[(String, Long)].collect().toMap
    assert(a == b, "result must not depend on partitioning")
    for ((label, pm) <- probs)
      assert(a(label) == refQuantile(mixed, pm),
        s"$label must be computed over non-NULL values only")
  }

  test("exactQuantilesByGroup equals per-group global runs; NULL group kept") {
    val rows = mixed.zipWithIndex.map { case (v, i) =>
      (if (i % 3 == 0) Some("a") else if (i % 3 == 1) Some("b") else None, v)
    }
    val df = rows.toDF("g", "v")
    val grouped = Stats.exactQuantilesByGroup(df, "g", "v", probs)
      .as[(Option[String], String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(grouped.keySet == Set(Some("a"), Some("b"), None),
      "every group including NULL must surface")
    for (g <- Seq(Some("a"), Some("b"), None)) {
      val vals = rows.filter(_._1 == g).map(_._2)
      val solo = Stats.exactQuantiles(vals.toDF("v"), "v", probs)
        .as[(String, Long)].collect().toMap
      assert(grouped(g) == solo, s"group $g must equal its own global run")
      for ((label, pm) <- probs)
        assert(grouped(g)(label) == refQuantile(vals, pm))
    }
  }

  test("equiWidthHistogram: exact integer bins, total preserved, no overlap") {
    val values = mixed
    val df = values.toDF("v")
    val bins = Stats.equiWidthHistogram(df, "v", 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val mn = values.min
    val mx = values.max
    val w = (mx - mn + 8) / 8
    assert(bins.map(_._4).sum == values.size, "every value lands in a bin")
    for ((bin, lo, hi, cnt) <- bins) {
      assert(lo == mn + bin * w && hi == mn + (bin + 1) * w - 1,
        s"bin $bin bounds must follow the integer rule")
      assert(cnt == values.count(v => v >= lo && v <= hi),
        s"bin $bin count must be exact")
    }
    val ids = bins.map(_._1)
    assert(ids.distinct.length == ids.length, "bins must be disjoint")
  }

  test("single-value input collapses to one bin of width >= 1") {
    val df = Seq.fill(42)(7L).toDF("v")
    val bins = Stats.equiWidthHistogram(df, "v", 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(bins.length == 1)
    assert(bins.head._1 == 0L && bins.head._2 == 7L && bins.head._4 == 42L)
  }

  test("production cross-check: percentile_approx at tight accuracy agrees") {
    // the approximate production path (one pass, mergeable sketch) lands
    // on the exact answer at high accuracy on integer data — the
    // exact/approx pair mirrors the heavy-hitters sketch + recount stance
    val df = mixed.toDF("v")
    val approx = df.agg(
        percentile_approx(col("v"), lit(0.5), lit(100000)).as("p50"))
      .as[Long].head()
    val exact = Stats.exactQuantiles(df, "v", Seq(("p50", 500)))
      .as[(String, Long)].collect().head._2
    assert(math.abs(approx - exact) <= 1,
      s"approx $approx must land within 1 of exact $exact")
  }

  test("validation: bad fractions and duplicate labels fail loud") {
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException] {
      Stats.exactQuantiles(df, "v", Seq(("p0", 0)))
    }
    intercept[IllegalArgumentException] {
      Stats.exactQuantiles(df, "v", Seq(("x", 1001)))
    }
    intercept[IllegalArgumentException] {
      Stats.exactQuantiles(df, "v", Seq(("x", 500), ("x", 900)))
    }
    intercept[IllegalArgumentException] {
      Stats.exactQuantiles(df, "v", Seq.empty)
    }
  }

  test("keySkewReport: exact counts, floor-division share, deterministic tie cut") {
    // 10×a, 5×b, 5×c, 2×(NULL) — b/c tie on count, cut must take both
    // before NULL (keys ASC after cnt DESC; NULL sorts last in Spark asc)
    val rows = Seq.fill(10)(Some("a")) ++ Seq.fill(5)(Some("b")) ++
      Seq.fill(5)(Some("c")) ++ Seq.fill(2)(Option.empty[String])
    val df = rows.toDF("k")
    val got = Stats.keySkewReport(df, Seq("k"), topK = 3)
      .as[(Option[String], Long, Long)].collect().toSeq
    assert(got == Seq(
      (Some("a"), 10L, 454L),   // 10000/22 = 454.5… floored
      (Some("b"), 5L, 227L),
      (Some("c"), 5L, 227L)))
    // topK past the key count returns every group incl. the NULL key
    val all = Stats.keySkewReport(df, Seq("k"), topK = 10)
      .as[(Option[String], Long, Long)].collect().toSeq
    assert(all.length == 4 && all.last == ((None, 2L, 90L)))
  }

  test("keySkewReport plans as TakeOrderedAndProject, never a global sort") {
    val df = Seq.tabulate(100)(i => (s"k${i % 7}", i)).toDF("k", "v")
    val plan = Stats.keySkewReport(df, Seq("k"), topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
    intercept[IllegalArgumentException] {
      Stats.keySkewReport(df, Seq.empty, topK = 5)
    }
    intercept[IllegalArgumentException] {
      Stats.keySkewReport(df, Seq("k"), topK = 0)
    }
  }

  // --------------------------------------------------------------------
  // Fixed-bound (mergeable) histogram + quantiles-from-histogram

  test("fixedWidthHistogram matches the driver reference and clamps out-of-range") {
    val values = Seq(-7L, 0L, 1L, 49L, 50L, 99L, 100L, 512L, 9999L)
    val got = Stats.fixedWidthHistogram(values.toDF("v"), "v",
        lo = 0L, width = 50L, nBins = 8)
      .as[(Long, Long)].collect().toMap
    def bin(v: Long) = math.max(0L, math.min(7L, Math.floorDiv(v, 50L)))
    val want = values.groupBy(bin).map { case (b, vs) => b -> vs.size.toLong }
    assert(got == want)
    assert(got(0L) == 4L)  // -7 clamps in, 0/1/49 land natively
    assert(got(7L) == 2L)  // 512 and 9999 clamp to the top bin
  }

  test("histogramMerge of shard histograms equals the whole-frame histogram") {
    val vals = Seq.tabulate(500)(i => (i.toLong * 31) % 400)
    val (l, r) = vals.splitAt(211)
    def h(vs: Seq[Long]) = Stats.fixedWidthHistogram(vs.toDF("v"), "v",
      lo = 0L, width = 25L, nBins = 16)
    val merged = Stats.histogramMerge(h(l), h(r))
      .as[(Long, Long)].collect().toMap
    val whole = h(vals).as[(Long, Long)].collect().toMap
    assert(merged == whole)
  }

  test("histogramQuantiles brackets the exact quantile; width=1 in-range is exact") {
    val vals = mixed
    val hist = Stats.fixedWidthHistogram(vals.toDF("v"), "v",
      lo = 0L, width = 100L, nBins = 10)
    val got = Stats.histogramQuantiles(hist, lo = 0L, width = 100L, probs)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    for ((label, pm) <- probs) {
      val exact = refQuantile(vals, pm)
      val (lo, hi) = got(label)
      assert(exact >= lo && exact <= hi, s"$label: $exact not in [$lo,$hi]")
    }
    // width=1 over an in-range domain degenerates to the exact rule
    val h1 = Stats.fixedWidthHistogram(vals.toDF("v"), "v",
      lo = 0L, width = 1L, nBins = 1000)
    val q1 = Stats.histogramQuantiles(h1, lo = 0L, width = 1L, probs)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    for ((label, pm) <- probs)
      assert(q1(label) == refQuantile(vals, pm), s"$label width-1")
  }

  test("fixed histogram family is partition-independent and guards params") {
    val vals = Seq.tabulate(300)(i => (i.toLong * 13) % 200)
    def h(df: org.apache.spark.sql.DataFrame) =
      Stats.fixedWidthHistogram(df, "v", lo = 0L, width = 10L, nBins = 20)
    val a = h(vals.toDF("v")).as[(Long, Long)].collect().toMap
    val b = h(vals.toDF("v").repartition(13)).as[(Long, Long)].collect().toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      Stats.fixedWidthHistogram(vals.toDF("v"), "v", 0L, 0L, 10)
    }
    intercept[IllegalArgumentException] {
      Stats.fixedWidthHistogram(vals.toDF("v"), "v", 0L, 10L, 0)
    }
    intercept[IllegalArgumentException] {
      Stats.histogramQuantiles(h(vals.toDF("v")), 0L, 10L, Seq.empty)
    }
  }

  test("equi-depth buckets: near-equal populations, boundary ties go low") {
    // 0..999 → 4 buckets of exactly 250; boundaries are type-1 quantiles
    val df = spark.range(1000).selectExpr("id AS v")
    val bnd = Stats.equiDepthBoundaries(df, "v", 4)
    assert(bnd.orderBy("idx").as[(Int, Long)].collect().toSeq ==
      Seq((1, 249L), (2, 499L), (3, 749L)))
    val buckets = Stats.discretize(df, "v", bnd)
      .groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(buckets == Map(0 -> 250L, 1 -> 250L, 2 -> 250L, 3 -> 250L))
    // a value equal to a boundary lands in the LOWER bucket
    val one = Stats.discretize(Seq(249L).toDF("v"), "v", bnd)
      .select("bucket").as[Int].head()
    assert(one == 0)
    // heavy ties: bucket populations shift by tie mass, never crash
    val ties = Seq.fill(100)(5L) ++ (0L until 100L)
    val b2 = Stats.equiDepthBoundaries(ties.toDF("v"), "v", 4)
    val pops = Stats.discretize(ties.toDF("v"), "v", b2)
      .groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(pops.values.sum == 200L)
    intercept[IllegalArgumentException] {
      Stats.equiDepthBoundaries(df, "v", 3) // does not divide 1000
    }
  }

  test("groupTrend: exact OLS slope cores, rebase, trunc-toward-zero, null on flat x") {
    val df = Seq(
      // group a: y = 2x → slope exactly 2 (rebase from x=100)
      ("a", 100L, 0L), ("a", 101L, 2L), ("a", 102L, 4L),
      // group b: slope −9/6 = −1.5; ×7 → −63 div 6 = −10 (trunc, not −11)
      ("b", 0L, 3L), ("b", 1L, 1L), ("b", 2L, 0L),
      // group c: zero x-variance → null slope
      ("c", 5L, 1L), ("c", 5L, 9L)
    ).toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.groupTrend(d, "g", "x", "y", outScale = 7L)
        .as[(String, Long, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = run(df)
    assert(got("a") == ((3L, Some(14L))))   // 2 × 7
    assert(got("b") == ((3L, Some(-10L)))) // −10.5 truncates toward zero
    assert(got("c") == ((2L, None)))
    // partition independence: decimal sufficient statistics are exact
    assert(run(df.repartition(5)) == got)
    intercept[IllegalArgumentException] {
      Stats.groupTrend(df, "g", "x", "y", outScale = 0L)
    }
  }

  test("categoryDrift: an empty snapshot reads as all-zero shares, not a crash") {
    val a = Seq("en", "en", "de").toDF("lang")
    val rows = Stats.categoryDrift(a, a.limit(0), "lang")
      .select("lang", "share_a_pm", "share_b_pm")
      .as[(String, Long, Long)].collect().toSet
    assert(rows == Set(("en", 666L, 0L), ("de", 333L, 0L)))
  }

  test("categoryDrift: integer shares, |delta|, vanished categories surface") {
    val a = (Seq.fill(60)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("fr"))
      .toDF("lang")
    val b = (Seq.fill(90)("en") ++ Seq.fill(10)("zh")).toDF("lang")
    val got = Stats.categoryDrift(a, b, "lang")
      .select("lang", "n_a", "n_b", "share_a_pm", "share_b_pm", "delta_pm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 60L, 90L, 600L, 900L, 300L)))
    assert(got("de") == (("de", 30L, 0L, 300L, 0L, 300L)))   // vanished
    assert(got("zh") == (("zh", 0L, 10L, 0L, 100L, 100L)))   // appeared
    assert(got("fr") == (("fr", 10L, 0L, 100L, 0L, 100L)))
    assert(got.size == 4)
  }

  test("categoryDriftFromCounts == categoryDrift on the same snapshots, " +
       "including from a driver-local counts frame") {
    val a = (Seq.fill(60)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("fr"))
      .toDF("lang")
    val b = (Seq.fill(90)("en") ++ Seq.fill(10)("zh")).toDF("lang")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("lang", "n_a", "n_b", "share_a_pm", "share_b_pm", "delta_pm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val whole = key(Stats.categoryDrift(a, b, "lang"))
    val fromCounts = key(Stats.categoryDriftFromCounts(
      a.groupBy($"lang").agg(count(lit(1)).as("n_a")),
      b.groupBy($"lang").agg(count(lit(1)).as("n_b")), "lang"))
    assert(fromCounts == whole, "counts-input variant diverged")
    // the monitor shape: the FROZEN side collected once (≤ #categories
    // rows) and replayed as a LocalRelation — identical output again
    val bAgg = b.groupBy($"lang").agg(count(lit(1)).as("n_b"))
    val bLocal = spark.createDataFrame(
      java.util.Arrays.asList(bAgg.collect(): _*), bAgg.schema)
    val fromLocal = key(Stats.categoryDriftFromCounts(
      a.groupBy($"lang").agg(count(lit(1)).as("n_a")), bLocal, "lang"))
    assert(fromLocal == whole, "local frozen-counts variant diverged")
  }

  test("qiniAucMilli: hand trapezoid — tent curve integrates to its " +
       "area; null effect at the terminal point") {
    // scores 8..1 desc, alternating arms; outcomes put both treated
    // hits in the top half, both control hits in the bottom half.
    // bins=4 -> curve (0,0),(2,1000),(4,2000),(6,1000),(8,0):
    // area2 = 2000+6000+6000+2000 = 16000; q_final = 0 (null overall)
    // auuc = 16000/(2*8) = 1000; coef = (16000 - 0*8)/16 = 1000
    val df = Seq(
      (true, 1L, 8L), (false, 0L, 7L), (true, 1L, 6L), (false, 0L, 5L),
      (true, 0L, 4L), (false, 1L, 3L), (true, 0L, 2L), (false, 1L, 1L))
      .toDF("t", "y", "s")
    val got = Stats.qiniAucMilli(df, "t", "y", "s", bins = 4)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().head
    assert(got == ((8L, 4L, 0L, Some(1000L), Some(1000L))), s"got $got")
    // a depth with NO controls yet has an undefined curve point ->
    // scalar is NULL, not a silently-skipped segment
    val noCtl = Seq((true, 1L, 4L), (true, 1L, 3L),
      (false, 0L, 2L), (false, 0L, 1L)).toDF("t", "y", "s")
    val n2 = Stats.qiniAucMilli(noCtl, "t", "y", "s", bins = 2)
      .select("auuc_milli", "qini_coef_milli")
      .as[(Option[Long], Option[Long])].collect().head
    assert(n2 == ((None, None)), s"expected NULLs, got $n2")
  }

  test("upliftCalibrationMilli: per-bin mean prediction vs realized " +
       "uplift, NULL when a bin lacks an arm") {
    // preds 8..1 desc, bins=2: top bin {8,7,6,5} has pt=2/2t vs
    // pc=0/2c -> realized +1000; mean_pred = 1000*26/4 = 6500.
    // bottom bin {4,3,2,1}: pt=0/2t vs pc=2/2c -> realized -1000;
    // mean_pred = 1000*10/4 = 2500
    val df = Seq(
      (true, 1L, 8L), (false, 0L, 7L), (true, 1L, 6L), (false, 0L, 5L),
      (true, 0L, 4L), (false, 1L, 3L), (true, 0L, 2L), (false, 1L, 1L))
      .toDF("t", "y", "p")
    val got = Stats.upliftCalibrationMilli(df, "t", "y", "p", bins = 2)
      .orderBy($"bin")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 2L, 6500L, Some(1000L)),
      (2L, 4L, 2L, 2L, 2500L, Some(-1000L))), s"got $got")
    // single-arm bin -> realized NULL, mean_pred still reported
    val oneArm = Seq((true, 1L, 2L), (true, 0L, 2L),
      (false, 1L, 1L), (false, 0L, 1L)).toDF("t", "y", "p")
    val g2 = Stats.upliftCalibrationMilli(oneArm, "t", "y", "p", bins = 2)
      .orderBy($"bin")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(g2 == Seq(
      (1L, 2L, 2L, 0L, 2000L, None),
      (2L, 2L, 0L, 2L, 1000L, None)), s"got $g2")
  }

  test("srmCheckMilli: textbook 60/40 fires at alpha=.05, balanced " +
       "split doesn't, matched expectation zeroes out") {
    // 60/40 on n=100 vs design 500pm: D = 10,000, chi2 =
    // 10^3*10^8/(100*500*500) = 4000 milli (4.0 > 3.841 -> SRM)
    val skewed = (Seq.fill(60)(true) ++ Seq.fill(40)(false)).toDF("arm")
    val g1 = Stats.srmCheckMilli(skewed, "arm")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().head
    assert(g1 == ((60L, 40L, 500L, Some(4000L), Some(1L))), s"got $g1")
    val even = (Seq.fill(50)(true) ++ Seq.fill(50)(false)).toDF("arm")
    val g2 = Stats.srmCheckMilli(even, "arm")
      .select("chi2_milli", "srm")
      .as[(Option[Long], Option[Long])].collect().head
    assert(g2 == ((Some(0L), Some(0L))), s"got $g2")
    // same 60/40 against a DESIGNED 600pm: D = 0 exactly
    val g3 = Stats.srmCheckMilli(skewed, "arm", expectAPm = 600L)
      .select("chi2_milli", "srm")
      .as[(Option[Long], Option[Long])].collect().head
    assert(g3 == ((Some(0L), Some(0L))), s"got $g3")
  }

  test("postStratifiedAteMilli: Simpson fixture — pooled says -20, " +
       "every stratum says +10; single-arm stratum excluded visibly") {
    // stratum A: treated (10,10) vs control (0)  -> delta +10,000
    // stratum B: treated (100) vs control (90,90) -> delta +10,000
    // pooled: (120/3 - 180/3) = -20,000 — the paradox on display
    // stratum C: treated-only row -> excluded, counted
    val df = Seq(
      (true, 10L, "A"), (true, 10L, "A"), (false, 0L, "A"),
      (true, 100L, "B"), (false, 90L, "B"), (false, 90L, "B"),
      (true, 7L, "C"))
      .toDF("arm", "x", "s")
    val got = Stats.postStratifiedAteMilli(df, "arm", "x", "s")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().head
    assert(got == ((6L, 2L, 1L, 1L, Some(-20000L), Some(10000L))),
      s"got $got")
    // no stratum with both arms -> NULLs, everything excluded
    val oneArm = Seq((true, 1L, "A"), (true, 2L, "B")).toDF("arm", "x", "s")
    val g2 = Stats.postStratifiedAteMilli(oneArm, "arm", "x", "s")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().head
    assert(g2 == ((0L, 0L, 2L, 2L, None, None)), s"got $g2")
  }

  test("weighted quantiles: weight units, not rows, drive the rank") {
    // values 1,2,3 with weights 1,1,8 → W=10: p50 threshold ceil(5)=5 →
    // first v with cum ≥ 5 is 3 (unweighted median would say 2)
    val df = Seq((1L, 1L), (2L, 1L), (3L, 8L)).toDF("v", "wt")
    val got = Stats.exactWeightedQuantiles(df, "v", "wt",
      Seq(("p10", 100), ("p20", 200), ("p50", 500), ("p99", 990)))
      .as[(String, Long)].collect().toMap
    assert(got == Map("p10" -> 1L, "p20" -> 2L, "p50" -> 3L, "p99" -> 3L))
    // all-weights-1 degenerates to the unweighted rule
    val vals = (1L to 100L).map((_, 1L))
    val w1 = Stats.exactWeightedQuantiles(vals.toDF("v", "wt"), "v", "wt",
      Seq(("p50", 500))).as[(String, Long)].collect().toMap
    val u = Stats.exactQuantiles(vals.map(_._1).toDF("v"), "v",
      Seq(("p50", 500))).as[(String, Long)].collect().toMap
    assert(w1 == u)
    // zero/negative/null weights are excluded, not crashes
    val mixed = Seq((1L, 0L), (2L, -5L), (5L, 3L)).toDF("v", "wt")
    assert(Stats.exactWeightedQuantiles(mixed, "v", "wt",
      Seq(("p50", 500))).as[(String, Long)].head() == (("p50", 5L)))
  }

  test("robust outlier report: Tukey fences in integer arithmetic") {
    // group a: 1..100 plus two wild outliers; group b: clean
    val a = ((1L to 100L) ++ Seq(10000L, -10000L)).map(("a", _))
    val b = (1L to 50L).map(("b", _))
    val rep = Stats.robustOutlierReport((a ++ b).toDF("g", "v"), "g", "v")
      .select("g", "n", "q1", "med", "q3", "n_outliers")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // quartiles of 102 values: ranks ceil(25.5)=26, 51, 77 over the
    // sorted multiset — the two outliers sit at the extremes
    assert(rep("a")._3 == 25L && rep("a")._4 == 50L && rep("a")._5 == 76L)
    // fences via ×2 math: 2v < 2·25−3·51 = −103 (v < −51.5) or
    // 2v > 2·76+3·51 = 305 (v > 152.5) → only the two ±10000 rows
    assert(rep("a")._6 == 2L)
    assert(rep("b")._6 == 0L)
    // median/quartiles have 25% breakdown: the wild points moved q1/q3
    // by at most one rank vs the clean 1..100 (26/51/76)
    assert(math.abs(rep("a")._3 - 26L) <= 1)
  }

  private def auc(rows: Seq[(Long, Boolean)]) =
    Stats.aucPpm(rows.toDF("s", "y"), "s", "y")
      .as[(Long, Long, Long)].collect().head

  test("aucPpm: separation, reversal, ties, and the textbook middle case") {
    // perfect separation → 1.0; total reversal → 0.0
    assert(auc(Seq((1L, false), (2L, false), (10L, true), (11L, true)))
      == ((2L, 2L, 1000000L)))
    assert(auc(Seq((10L, false), (11L, false), (1L, true), (2L, true)))
      == ((2L, 2L, 0L)))
    // all scores tied → exactly 1/2 by the midrank convention
    assert(auc(Seq((5L, true), (5L, false), (5L, true), (5L, false)))._3
      == 500000L)
    // hand case: pos {3, 1}, neg {2, 0} → pairs: 3>2,3>0,1>0 win, 1<2
    // lose → AUC 3/4
    assert(auc(Seq((3L, true), (1L, true), (2L, false), (0L, false)))._3
      == 750000L)
    // mixed ties: pos {2, 1}, neg {2, 0} → 2v2 tie=½, 2>0, 1<2, 1>0 →
    // 2.5/4 = 0.625
    assert(auc(Seq((2L, true), (1L, true), (2L, false), (0L, false)))._3
      == 625000L)
    // partition independence on a larger random case
    val rnd = new scala.util.Random(3)
    val big = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextBoolean()))
    val one = auc(big)
    val again = Stats.aucPpm(big.toDF("s", "y").repartition(7), "s", "y")
      .as[(Long, Long, Long)].collect().head
    assert(one == again)
    // brute-force pair count cross-check on the same data
    val pos = big.filter(_._2).map(_._1); val neg = big.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(one._3 == 1000000L * wins / (2L * pos.size * neg.size))
  }

  test("concentrationPpm: monopoly, even split, and hand-mixed case") {
    val df = Seq(
      ("mono", "x"), ("mono", "x"), ("mono", "x"),
      ("even", "a"), ("even", "b"), ("even", "c"), ("even", "d"),
      ("mix", "a"), ("mix", "a"), ("mix", "b")).toDF("g", "c")
    val got = Stats.concentrationPpm(df, "g", "c")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("mono") == ((3L, 1L, 1000000L, 0L)))
    assert(got("even") == ((4L, 4L, 250000L, 750000L)))
    // mix: n=3, Σn² = 4+1 = 5 → hhi 5·10⁶/9 = 555555, gini 444444
    assert(got("mix") == ((3L, 2L, 555555L, 444444L)))
    // partition independence
    val again = Stats.concentrationPpm(df.repartition(7), "g", "c")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(again == Stats.concentrationPpm(df, "g", "c")
      .as[(String, Long, Long, Long, Long)].collect().toSet)
  }

  test("autocorrPpm: alternating, trending, constant, and short series") {
    def ac(rows: Seq[(String, Long, Long)]): Map[String, (Long, Option[Long])] =
      Stats.autocorrPpm(rows.toDF("g", "o", "v"), "g", "o", "v", lagK = 1)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
        .toMap
    // perfectly alternating 0,1,0,1… → r = −1 → signed r² = −10⁶
    val alt = ac((1L to 8L).map(i => ("a", i, i % 2)))
    assert(alt("a") == ((7L, Some(-1000000L))))
    // strictly linear trend → r = +1 → +10⁶
    val lin = ac((1L to 8L).map(i => ("t", i, 10 * i)))
    assert(lin("t") == ((7L, Some(1000000L))))
    // constant series → zero variance → NULL
    val const = ac((1L to 5L).map(i => ("c", i, 7L)))
    assert(const("c") == ((4L, None)))
    // single pair → n < 2 → NULL
    val short = ac(Seq(("s", 1L, 3L), ("s", 2L, 9L)))
    assert(short("s") == ((1L, None)))
    // hand case: series (2,4,3) → pairs x=(2,4), y=(4,3): n=2 sx=6
    // sy=7 sxy=20 sxx=20 syy=25 → cov=40−42=−2, varx=40−36=4,
    // vary=50−49=1 → signed r² = −10⁶·4/4 = −1000000
    val hand = ac(Seq(("h", 1L, 2L), ("h", 2L, 4L), ("h", 3L, 3L)))
    assert(hand("h") == ((2L, Some(-1000000L))))
  }

  test("cupedAdjustMilli: known theta, adjustment direction, degenerate covariate") {
    // units: x perfectly predicts y (y = 2x) → theta = 2.0 = 2_000_000 ppm
    val units = Seq(
      (0L, 1.0, 2.0), (0L, 3.0, 6.0), (1L, 2.0, 4.0), (1L, 4.0, 8.0))
      .toDF("variant", "x", "y")
    val got = Stats.cupedAdjustMilli(units, "variant", "x", "y")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // global x̄ = 2.5; v0: ȳ=4, x̄=2 → adj = 4 − 2·(2−2.5) = 5
    // v1: ȳ=6, x̄=3 → adj = 6 − 2·(3−2.5) = 5 — adjustment removes the
    // covariate imbalance entirely when y = θx
    assert(got(0L) == ((2L, 4000L, 5000L)))
    assert(got(1L) == ((2L, 6000L, 5000L)))
    // constant covariate → theta NULL → adj NULL
    val degen = Stats.cupedAdjustMilli(
        Seq((0L, 1.0, 2.0), (1L, 1.0, 6.0)).toDF("variant", "x", "y"),
        "variant", "x", "y")
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(degen == Map(0L -> true, 1L -> true))
  }

  test("aucPpm: single-class and empty inputs surface NULL, not ANSI div error") {
    val onlyPos = Stats.aucPpm(Seq((1L, true), (2L, true)).toDF("s", "y"), "s", "y")
      .collect().head
    assert(onlyPos.getLong(0) == 2L && onlyPos.getLong(1) == 0L && onlyPos.isNullAt(2))
    val onlyNeg = Stats.aucPpm(Seq((1L, false)).toDF("s", "y"), "s", "y")
      .collect().head
    assert(onlyNeg.getLong(0) == 0L && onlyNeg.getLong(1) == 1L && onlyNeg.isNullAt(2))
    val empty = Stats.aucPpm(Seq.empty[(Long, Boolean)].toDF("s", "y"), "s", "y")
      .collect().head
    assert(empty.isNullAt(2))
  }

  test("reliabilityBuckets: bin math, out-of-range exclusion, validation") {
    val rows = Seq(
      (50000L, true), (99999L, false),          // bucket 0: 2 rows, 1 pos
      (100000L, true), (150000L, true),         // bucket 1: 2 rows, 2 pos
      (999999L, false),                         // bucket 9
      (1000000L, true), (-1L, true))            // out of range: dropped
    val got = Stats.reliabilityBuckets(rows.toDF("s", "y"), "s", "y")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      0L -> ((2L, 1L, 74999L, 500000L)),
      1L -> ((2L, 2L, 125000L, 1000000L)),
      9L -> ((1L, 0L, 999999L, 0L))))
    intercept[IllegalArgumentException] {
      Stats.reliabilityBuckets(rows.toDF("s", "y"), "s", "y", bins = 3)
    }
  }

  test("winsorize clamps into per-group type-1 fences, flags movers") {
    // group a: 1..100 → p50‰ fence = value at rank ceil(50·100/1000)=5,
    // p950 fence = rank 95; group b: all 7s → fences 7/7, nothing clips
    val rows = (1L to 100L).map(v => ("a", v, v)) ++
      (101L to 110L).map(i => ("b", i, 7L))
    val got = Stats.winsorize(rows.toDF("g", "id", "v"), "g", "v",
        loPm = 50, hiPm = 950)
      .select($"g", $"id", $"v", $"winsorized", $"clipped")
      .as[(String, Long, Long, Long, Long)].collect()
    val a = got.filter(_._1 == "a")
    assert(a.filter(_._3 < 5L).forall(r => r._4 == 5L && r._5 == 1L))
    assert(a.filter(_._3 > 95L).forall(r => r._4 == 95L && r._5 == 1L))
    assert(a.filter(r => r._3 >= 5L && r._3 <= 95L)
      .forall(r => r._4 == r._3 && r._5 == 0L))
    assert(a.count(_._5 == 1L) == 9L)   // 1..4 and 96..100
    assert(got.filter(_._1 == "b").forall(r => r._4 == 7L && r._5 == 0L))
    intercept[IllegalArgumentException] {
      Stats.winsorize(rows.toDF("g", "id", "v"), "g", "v", 950, 50)
    }
  }

  test("quantileNormalize maps group ranks onto the global distribution") {
    // group a: 1..4 (low scale); group b: 101..104 (high scale) —
    // normalization must give BOTH groups the same 8-value global
    // profile positionally: rank k of 4 → pm in {250,500,750,1000} →
    // global quantiles at ranks ceil(pm·8/1000) = {2,4,6,8}
    val rows = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      ("b", 5L, 101L), ("b", 6L, 102L), ("b", 7L, 103L), ("b", 8L, 104L))
      .toDF("g", "id", "v")
    val got = Stats.quantileNormalize(rows, "g", "v", "id")
      .select($"g", $"id", $"v", $"pm", $"normalized")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
    // sorted global values: 1,2,3,4,101,102,103,104 → ranks 2,4,6,8 =
    // 2, 4, 102, 104
    assert(got(("a", 1L)) == ((250L, 2L)))
    assert(got(("a", 4L)) == ((1000L, 104L)))
    assert(got(("b", 5L)) == ((250L, 2L)))
    assert(got(("b", 8L)) == ((1000L, 104L)))
    // both groups normalize to the identical value multiset
    val byG = Stats.quantileNormalize(rows, "g", "v", "id")
      .select($"g", $"normalized").as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.toSeq }
    assert(byG("a") == byG("b"))
    // identity: normalizing ONE group against itself returns its own
    // values at every rank
    val one = (1L to 10L).map(v => ("x", v, v * 7)).toDF("g", "id", "v")
    val idm = Stats.quantileNormalize(one, "g", "v", "id")
      .select($"v", $"normalized").as[(Long, Long)].collect()
    assert(idm.forall { case (v, n) => v == n })
    // partition independence
    val a1 = Stats.quantileNormalize(rows.repartition(5), "g", "v", "id")
      .select($"g", $"id", $"pm", $"normalized")
      .as[(String, Long, Long, Long)].collect().toSet
    val a2 = Stats.quantileNormalize(rows, "g", "v", "id")
      .select($"g", $"id", $"pm", $"normalized")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a1 == a2)
  }

  test("chiSquare2x2Milli: textbook value, independence, degenerate margins") {
    def chi(rows: Seq[(Boolean, Boolean)]) =
      Stats.chiSquare2x2Milli(rows.toDF("g", "y"), "g", "y")
        .select($"n", $"a", $"b", $"c", $"d", $"chi2_milli")
        .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    // [10 20 / 30 40]: χ² = 100·(400−600)²/(30·70·40·60) = 4000000/5040000
    // = 0.7936… → 793 milli
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(20)((true, false)) ++
      Seq.fill(30)((false, true)) ++ Seq.fill(40)((false, false))
    assert(chi(rows) == ((100L, 10L, 20L, 30L, 40L, Some(793L))))
    // perfectly proportional margins → χ² = 0 exactly
    val indep = Seq.fill(10)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(20)((false, true)) ++ Seq.fill(20)((false, false))
    assert(chi(indep)._6 == Some(0L))
    // empty outcome column → undefined, surfaced as NULL not a crash
    assert(chi(Seq((true, true), (false, true)))._6.isEmpty)
    // partition independence
    val a = chi(rows)
    val b = Stats.chiSquare2x2Milli(rows.toDF("g", "y").repartition(7), "g", "y")
      .select($"n", $"a", $"b", $"c", $"d", $"chi2_milli")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(a == b)
  }

  test("chiSquareKxMMilli: agrees with the 2x2 closed form, full grid") {
    // same [10 20 / 30 40] design as the 2x2 test → identical χ² 793
    val rows = Seq.fill(10)(("g1", "y")) ++ Seq.fill(20)(("g1", "n")) ++
      Seq.fill(30)(("g2", "y")) ++ Seq.fill(40)(("g2", "n"))
    val got = Stats.chiSquareKxMMilli(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(got._1 == 100L && got._2 == 1L)
    // per-cell flooring can shave at most cells·1 milli vs the 2x2 form
    assert(math.abs(got._3 - 793L) <= 4)
    // absent cell contributes expected mass: 3 categories, one (c,y)
    // combination never observed — dof counts the full grid
    val sparse = Seq(("a", "y"), ("a", "n"), ("b", "y"), ("b", "n"),
      ("c", "n"), ("c", "n"))
    val s = Stats.chiSquareKxMMilli(sparse.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(s._2 == 2L && s._3 > 0L)
  }

  private def kappa(rows: Seq[(String, String)]) =
    Stats.cohenKappaPpm(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().head

  test("cohenKappaPpm: perfect, chance-level, degenerate, negative") {
    // perfect agreement → 1.0
    assert(kappa(Seq(("x", "x"), ("y", "y"), ("x", "x"))) == ((3L, 3L, 1000000L)))
    // textbook 2×2: [20 5 / 10 15]: po=35/50=0.7,
    // pe=(25·30+25·20)/2500=0.5 → κ = 0.2/0.5 = 0.4
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    assert(kappa(rows) == ((50L, 35L, 400000L)))
    // both annotators constant → pe = 1 → κ defined 0 here
    assert(kappa(Seq(("x", "x"), ("x", "x")))._3 == 0L)
    // systematic disagreement → negative κ (truncated toward zero)
    // a=[0 2 / 2 0]: po=0, pe=0.5 → κ = −1
    assert(kappa(Seq(("x", "y"), ("x", "y"), ("y", "x"), ("y", "x")))._3
      == -1000000L)
    // partition independence
    val big = rows ++ rows
    val one = kappa(big)
    val again = Stats.cohenKappaPpm(big.toDF("a", "b").repartition(5), "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(one == again)
  }

  test("benfordDeviationPpm: textual digits, complete grid, exclusions") {
    // group g: values 1,1,19,2,3000 → digits 1×3, 2×1, 3×1 of n=5
    // 0 and negatives excluded
    val df = Seq(("g", 1L), ("g", 1L), ("g", 19L), ("g", 2L), ("g", 3000L),
      ("g", 0L), ("g", -7L)).toDF("grp", "v")
    val got = Stats.benfordDeviationPpm(df, "grp", "v")
      .as[(String, Int, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._5, r._6, r._7))).toMap
    assert(got.keySet == (1 to 9).toSet)            // complete grid
    assert(got(1) == ((3L, 600000L, 301030L, 298970L)))
    assert(got(2) == ((1L, 200000L, 176091L, 23909L)))
    assert(got(3) == ((1L, 200000L, 124939L, 75061L)))
    assert(got(9) == ((0L, 0L, 45757L, 45757L)))    // absent digit
    // the pinned masses sum to exactly 10^6
    assert(got.values.map(_._3).sum == 1000000L)
    // a perfectly Benford-weighted multiset has dev < any single mass:
    // shares themselves are floor-divided, so dev is the flooring residue
    val bent = (1 to 9).flatMap(d => Seq.fill(
      Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)(d - 1))(("b", d.toLong)))
    val dev = Stats.benfordDeviationPpm(bent.toDF("grp", "v"), "grp", "v")
      .agg(org.apache.spark.sql.functions.sum($"dev_ppm"))
      .as[Long].collect().head
    assert(dev < 10000L, s"near-Benford multiset scored dev=$dev")
  }

  test("giniCoefficientPpm: equality, extremes, tie-safety, exclusions") {
    // perfectly equal → 0
    val eq = Seq.fill(4)(("e", 10L)).toDF("grp", "v")
    def gini(df: org.apache.spark.sql.DataFrame) =
      Stats.giniCoefficientPpm(df, "grp", "v")
        .as[(String, Long, Long, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(gini(eq)("e") == ((4L, 40L, Some(0L))))
    // one unit holds everything: G = (n−1)/n = 3/4
    val mono = Seq(("m", 0L), ("m", 0L), ("m", 0L), ("m", 100L)).toDF("grp", "v")
    assert(gini(mono)("m") == ((4L, 100L, Some(750000L))))
    // textbook small case {1,2,3,4}: G = (2·(1+4+9+16) − 5·10)/(4·10) = 1/4
    val t = Seq(("t", 1L), ("t", 2L), ("t", 3L), ("t", 4L)).toDF("grp", "v")
    assert(gini(t)("t") == ((4L, 10L, Some(250000L))))
    // ties: {2,2,4} via histogram ≡ sorted-rank formula
    // 2Σi·x = 2(2+4+12)=36; (n+1)S=32; nS=24 → G=4/24=1/6→166666
    val ties = Seq(("y", 2L), ("y", 2L), ("y", 4L)).toDF("grp", "v")
    assert(gini(ties)("y") == ((3L, 8L, Some(166666L))))
    // all-zero total → NULL; negatives excluded
    val z = Seq(("z", 0L), ("z", 0L), ("z", -5L)).toDF("grp", "v")
    assert(gini(z)("z") == ((2L, 0L, None)))
    // partition independence
    val big = (1L to 200L).map(("b", _)).toDF("grp", "v")
    assert(gini(big) == gini(big.repartition(7)))
  }

  test("ksTwoSamplePpm: hand CDF gap, identical samples, empty side") {
    // a = {1,2,3,4}, b = {3,4,5,6}: D = 1/2 at v=2 (F_a=0.5, F_b=0)
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val got = Stats.ksTwoSamplePpm(a, b, "v")
      .as[(Long, Long, Option[Long], Long)].collect().head
    assert(got == ((4L, 4L, Some(500000L), 2L)))
    // symmetric: swapping sides keeps D and the argmax value
    val swapped = Stats.ksTwoSamplePpm(b, a, "v")
      .as[(Long, Long, Option[Long], Long)].collect().head
    assert(swapped == ((4L, 4L, Some(500000L), 2L)))
    // identical samples → D = 0; at_value = earliest value (all tie)
    val same = Stats.ksTwoSamplePpm(a, a, "v")
      .as[(Long, Long, Option[Long], Long)].collect().head
    assert(same == ((4L, 4L, Some(0L), 1L)))
    // one empty side → NULL statistic
    val empty = Seq.empty[Long].toDF("v")
    val e = Stats.ksTwoSamplePpm(a, empty, "v")
      .as[(Long, Long, Option[Long], Long)].collect().head
    assert(e._1 == 4L && e._2 == 0L && e._3.isEmpty)
    // partition independence
    val p = Stats.ksTwoSamplePpm(a.repartition(3), b.repartition(5), "v")
      .as[(Long, Long, Option[Long], Long)].collect().head
    assert(p == got)
  }

  test("equiDepthHistogram: balanced bins, tie cohesion, sum preserved") {
    // 1..12 into 4 bins of 3
    val df = (1L to 12L).map(("g", _)).toDF("grp", "v")
    val got = Stats.equiDepthHistogram(df, "grp", "v", bins = 4)
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(1 -> ((1L, 3L, 3L)), 2 -> ((4L, 6L, 3L)),
      3 -> ((7L, 9L, 3L)), 4 -> ((10L, 12L, 3L))))
    // heavy tie: one value spanning a boundary stays whole
    val ties = (Seq.fill(7)(5L) ++ Seq(9L)).map(("t", _)).toDF("grp", "v")
    val gt = Stats.equiDepthHistogram(ties, "grp", "v", bins = 2)
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    // cum(5)=7 of n=8 → bin ceil(14/8)=2: ALL the 5s land in bin 2
    assert(gt == Map(2 -> ((5L, 9L, 8L))))
    // counts always reconstruct the group size; partition independent
    val rnd = new scala.util.Random(7)
    val big = (1 to 500).map(i => ("r", rnd.nextInt(40).toLong + 1)).toDF("grp", "v")
    val bins = Stats.equiDepthHistogram(big.repartition(9), "grp", "v", 8)
      .as[(String, Int, Long, Long, Long)].collect()
    assert(bins.map(_._5).sum == 500L)
    assert(bins.map(_._2).distinct.length == bins.length)
    val again = Stats.equiDepthHistogram(big, "grp", "v", 8)
      .as[(String, Int, Long, Long, Long)].collect().toSet
    assert(again == bins.toSet)
  }

  test("cusumChangepoint: level shift found, ties earliest, scale rule") {
    // series 10,10,10,30,30: mean 18; S'_t = 5·pre_t − t·90
    // t=1: 50−90=−40; t=2: 100−180=−80; t=3: 150−270=−120 (peak); t=4: 200−360=−160?
    // wait: pre_4 = 60 → 300 − 360 = −60. argmax |S'| = t=3 (120) → cp day 3
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("a", 4L, 30L), ("a", 5L, 30L)).toDF("g", "p", "v")
    val got = Stats.cusumChangepoint(df, "g", "p", "v")
      .as[(String, Long, Long, Long)].collect().head
    assert(got == (("a", 5L, 3L, 120L)))
    // symmetric series: |S'| ties at t=1 and t=2 → earliest period wins
    val sym = Seq(("s", 1L, 0L), ("s", 2L, 5L), ("s", 3L, 10L))
      .toDF("g", "p", "v")
    val g2 = Stats.cusumChangepoint(sym, "g", "p", "v")
      .as[(String, Long, Long, Long)].collect().head
    assert(g2 == (("s", 3L, 1L, 15L)))
    // single-period group absent; partition independence
    val single = Seq(("x", 1L, 9L)).toDF("g", "p", "v")
    assert(Stats.cusumChangepoint(single, "g", "p", "v").count() == 0)
    val rep = Stats.cusumChangepoint(df.repartition(7), "g", "p", "v")
      .as[(String, Long, Long, Long)].collect().head
    assert(rep == got)
  }

  test("pearsonR2Ppm: exact lines, sign, NULL on constant columns") {
    // y = 3x + 7: perfect positive — r² = 10⁶ exactly, sign +1
    val up = Seq.tabulate(50)(i => ("u", i.toLong, 3L * i + 7))
      .toDF("g", "x", "y")
    // y = −2x: perfect negative — r² = 10⁶, sign −1
    val dn = Seq.tabulate(50)(i => ("d", i.toLong, -2L * i))
      .toDF("g", "x", "y")
    // constant y — zero variance → NULL r², sign 0
    val ct = Seq.tabulate(50)(i => ("c", i.toLong, 5L)).toDF("g", "x", "y")
    val got = Stats.pearsonR2Ppm(up.union(dn).union(ct), "g", "x", "y")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("u") == ((50L, 1L, Some(1000000L))))
    assert(got("d") == ((50L, -1L, Some(1000000L))))
    assert(got("c") == ((50L, 0L, None)))
  }

  test("pearsonR2Ppm: NULL pairs excluded, partition-independent") {
    val rows = Seq(("g", Some(1L), Some(10L)), ("g", Some(2L), Some(30L)),
      ("g", Some(3L), Some(20L)), ("g", Some(4L), Some(50L)),
      ("g", None, Some(99L)), ("g", Some(9L), None))
    val df = rows.toDF("g", "x", "y")
    val a = Stats.pearsonR2Ppm(df, "g", "x", "y").collect().head
    assert(a.getLong(1) == 4L, "NULL x or y rows must not count")
    val b = Stats.pearsonR2Ppm(df.repartition(7), "g", "x", "y")
      .collect().head
    assert(a == b)
  }

  test("mannKendall: monotone, reversed, tied, driver reference") {
    def ref(vs: Seq[Long]): (Long, Long) = {
      val pairs = for (i <- vs.indices; j <- vs.indices if i < j)
        yield java.lang.Long.signum(vs(j) - vs(i)).toLong
      (pairs.size.toLong, pairs.sum)
    }
    val series = Map(
      "inc" -> Seq(1L, 2L, 5L, 9L), // S = 6 of 6 → tau 10⁶
      "dec" -> Seq(9L, 4L, 2L, 1L),
      "tie" -> Seq(3L, 3L, 3L),
      "mix" -> Seq(5L, 1L, 4L, 4L, 8L, 2L))
    val df = series.toSeq.flatMap { case (g, vs) =>
      vs.zipWithIndex.map { case (v, i) => (g, i.toLong, v) }
    }.toDF("g", "o", "v")
    val got = Stats.mannKendall(df, "g", "o", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for ((g, vs) <- series) {
      val (np, s) = ref(vs)
      assert(got(g) == ((np, s, 1000000L * s / np)), s"group $g")
    }
    assert(got("inc")._3 == 1000000L)
    assert(got("dec")._3 == -1000000L)
    assert(got("tie")._3 == 0L)
    // single-period groups emit nothing
    val single = Seq(("x", 1L, 9L)).toDF("g", "o", "v")
    assert(Stats.mannKendall(single, "g", "o", "v").count() == 0)
  }

  test("theilSenSlopePpm: median pairwise slope vs driver reference") {
    def ref(pts: Seq[(Long, Long)]): Long = {
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
      } yield 1000000L * (pts(j)._2 - pts(i)._2) /
          (pts(j)._1 - pts(i)._1)).sorted
      slopes(((slopes.size + 1) / 2) - 1) // type-1 median, ceil(n/2)
    }
    // exact line y = 4x + 1 → every slope 4·10⁶
    val line = Seq.tabulate(9)(i => (i.toLong, 4L * i + 1))
    // one wild outlier the median must shrug off
    val robust = Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L),
      (4L, 4000L))
    val df = (line.map { case (o, v) => ("line", o, v) } ++
      robust.map { case (o, v) => ("rob", o, v) }).toDF("g", "o", "v")
    val got = Stats.theilSenSlopePpm(df, "g", "o", "v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("line") == ((36L, 4000000L)))
    assert(got("rob")._2 == ref(robust))
    assert(got("rob")._2 == 10000000L, "outlier must not drag the median")
    val rep = Stats.theilSenSlopePpm(df.repartition(11), "g", "o", "v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep == got)
  }

  test("totalVariationPpm: identical, disjoint, NULL keys, reference") {
    def mk(rows: Seq[String]) =
      rows.map(Tuple1(_)).toDF("k")
    val a = mk(Seq("x", "x", "y", "z"))
    // identical mix → 0
    val same = Stats.totalVariationPpm(a, mk(Seq("x", "x", "y", "z")), "k")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(same == ((4L, 4L, 3L, Some(0L))))
    // disjoint supports → 10⁶
    val disj = Stats.totalVariationPpm(a, mk(Seq("p", "q")), "k")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(disj._4.contains(1000000L))
    // hand case: a = {x:2,y:2}, b = {x:3,y:1} → ½(|¼| + |¼|) = 250000
    val hand = Stats.totalVariationPpm(
        mk(Seq("x", "x", "y", "y")), mk(Seq("x", "x", "x", "y")), "k")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(hand._4.contains(250000L))
    // NULL keys are a category of their own
    val withNull = Seq(Some("x"), None, None).map(Tuple1(_)).toDF("k")
    val nl = Stats.totalVariationPpm(withNull, mk(Seq("x")), "k")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(nl._1 == 3L && nl._3 == 2L)
    assert(nl._4.contains(666666L)) // |⅓−1|/2 + |⅔−0|/2 = ⅔
  }

  test("bootstrapMeanCiMilli: constant data collapses the CI; bounds bracket") {
    // constant value: every replicate mean is exactly 1000·c
    val const = Seq.tabulate(100)(i => ("c", i.toLong, 7L))
      .toDF("g", "id", "v")
    val c = Stats.bootstrapMeanCiMilli(const, "g", "id", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(c == (("c", 100L, 7000L, 40L, 7000L, 7000L)))
    // spread data: lo ≤ point ≤ hi, CI strictly inside the value range,
    // and the whole result is partition-independent
    val spread = Seq.tabulate(200)(i => ("s", i.toLong, (i % 50).toLong))
      .toDF("g", "id", "v")
    val a = Stats.bootstrapMeanCiMilli(spread, "g", "id", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(a._5 <= a._3 && a._3 <= a._6, s"lo ≤ mean ≤ hi violated: $a")
    assert(a._5 > 0L && a._6 < 49000L, "CI must be far inside the range")
    val b = Stats.bootstrapMeanCiMilli(spread.repartition(13), "g", "id", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(a == b, "resampling must be deterministic in the row ids")
  }

  test("permutationTestMilli: strong effect hits the add-one floor, null effect p=1") {
    // 20 vs 20 units, disjoint values → no reshuffle can match
    val effect = Seq.tabulate(40)(i =>
      (i.toLong, (i % 2).toLong, if (i % 2 == 1) 1000L else 0L))
      .toDF("id", "variant", "v")
    val e = Stats.permutationTestMilli(effect, "variant", "id", "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(e == ((40L, 1000000L, 39L, 25L)),
      "p must floor at 1/(P+1) = 25 per-mille")
    // identical values → every permutation ties the observed 0 → p = 1
    val nullEff = Seq.tabulate(40)(i => (i.toLong, (i % 2).toLong, 5L))
      .toDF("id", "variant", "v")
    val z = Stats.permutationTestMilli(nullEff, "variant", "id", "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(z == ((40L, 0L, 39L, 1000L)))
    // partition independence
    val r = Stats.permutationTestMilli(effect.repartition(9),
        "variant", "id", "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == e)
  }

  test("anovaFMicro: hand case, zero-within NULL, single-group NULL") {
    // a = {0,2}, b = {10,12}: SSB = 100, SSW = 4, F = 50 exactly
    val df = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L))
      .toDF("g", "v")
    val got = Stats.anovaFMicro(df, "g", "v")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(got == ((2L, 4L, 100000L, 4000L, Some(50000000L))))
    // zero within-variance → NULL (infinite F), SS still surfaced
    val sep = Seq(("a", 0L), ("a", 0L), ("b", 10L), ("b", 10L))
      .toDF("g", "v")
    val s = Stats.anovaFMicro(sep, "g", "v")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(s._4 == 0L && s._5.isEmpty)
    // one group → no between df → NULL
    val one = Seq(("a", 1L), ("a", 5L)).toDF("g", "v")
    assert(Stats.anovaFMicro(one, "g", "v")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head._5.isEmpty)
  }

  test("lorenzPoints: equal mass is the diagonal, one holder is the corner") {
    // 10 equal units → share(d) = d·10⁵ exactly
    val eq = Seq.tabulate(10)(i => ("e", 5L)).toDF("g", "v")
    val e = Stats.lorenzPoints(eq, "g", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4.get).toMap
    assert((1 to 10).forall(d => e(d.toLong) == d * 100000L))
    // nine zeros + one holder → flat 0 until the last decile
    val corner = (Seq.fill(9)(("c", 0L)) :+ (("c", 100L))).toDF("g", "v")
    val c = Stats.lorenzPoints(corner, "g", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4.get).toMap
    assert((1 to 9).forall(d => c(d.toLong) == 0L) && c(10L) == 1000000L)
    // rank cut inside a tie block takes pro-rata mass: 4 equal units,
    // decile 5 → rank 2 of 4 → exactly half the mass
    val tie = Seq.fill(4)(("t", 10L)).toDF("g", "v")
    val t = Stats.lorenzPoints(tie, "g", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4.get).toMap
    assert(t(5L) == 500000L && t(10L) == 1000000L)
    // zero mass → NULL shares; partition independence
    val z = Seq(("z", 0L), ("z", 0L)).toDF("g", "v")
    assert(Stats.lorenzPoints(z, "g", "v")
      .as[(String, Long, Long, Option[Long])].collect().forall(_._4.isEmpty))
    val rep = Stats.lorenzPoints(corner.repartition(7), "g", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4.get).toMap
    assert(rep == c)
  }

  test("abcClasses: crossing item stays up, ties order by id, boundaries exact") {
    // masses 80/15/5: A=80% exactly at the boundary → item2 is B
    val df = Seq((1L, 80L), (2L, 15L), (3L, 5L)).toDF("id", "v")
    val got = Stats.abcClasses(df, "id", "v")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got(1L) == ((80L, "A")))
    assert(got(2L) == ((95L, "B")))
    assert(got(3L) == ((100L, "C")))
    // an item CROSSING 80% from below stays A (before-cum comparison)
    val cross = Seq((1L, 79L), (2L, 20L), (3L, 1L)).toDF("id", "v")
    val g2 = Stats.abcClasses(cross, "id", "v")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(g2 == Map(1L -> "A", 2L -> "A", 3L -> "C"),
      "item 2 crosses the 80% line from 79% — it must stay A")
    // equal masses tie on id ascending; partition-independent
    val ties = Seq((5L, 10L), (3L, 10L), (4L, 10L), (1L, 10L))
      .toDF("id", "v")
    val t1 = Stats.abcClasses(ties.repartition(7), "id", "v")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(t1 == Map(1L -> 10L, 3L -> 20L, 4L -> 30L, 5L -> 40L))
  }

  test("dispersionIndexMilli: Poisson-like 1000, constant 0, zero-mean NULL") {
    val df = Seq(("p", 0L), ("p", 2L), ("k", 7L), ("k", 7L),
      ("z", 0L), ("z", 0L)).toDF("g", "v")
    val got = Stats.dispersionIndexMilli(df, "g", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("p") == ((2L, 1000L, Some(1000L)))) // var 1, mean 1
    assert(got("k") == ((2L, 7000L, Some(0L))))    // constant
    assert(got("z") == ((2L, 0L, None)))           // undefined ratio
    // negative values are excluded (count-series contract)
    val neg = Seq(("n", -5L), ("n", 3L)).toDF("g", "v")
    assert(Stats.dispersionIndexMilli(neg, "g", "v")
      .collect().head.getLong(1) == 1L)
  }

  test("spearmanR2Ppm: monotone nonlinear scores 10⁶ where Pearson can't") {
    // y = x³ on distinct x: perfectly monotone — Spearman 10⁶ exactly
    val cubic = Seq.tabulate(30)(i => ("m", i.toLong, i.toLong * i * i))
      .toDF("g", "x", "y")
    val sp = Stats.spearmanR2Ppm(cubic, "g", "x", "y")
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(sp == (("m", 30L, 1L, Some(1000000L))))
    val pe = Stats.pearsonR2Ppm(cubic, "g", "x", "y")
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(pe._4.exists(_ < 1000000L),
      "Pearson must NOT see the cubic as a perfect fit")
    // monotone decreasing → sign −1, still 10⁶
    val dec = Seq.tabulate(30)(i => ("d", i.toLong, -(i.toLong * i)))
      .toDF("g", "x", "y")
    val sd = Stats.spearmanR2Ppm(dec, "g", "x", "y")
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(sd._3 == -1L && sd._4.contains(1000000L))
  }

  test("spearmanR2Ppm: ties midrank exactly; partition-independent") {
    // all-tied y → zero rank variance → NULL
    val tied = Seq.tabulate(20)(i => ("t", i.toLong, 5L)).toDF("g", "x", "y")
    assert(Stats.spearmanR2Ppm(tied, "g", "x", "y")
      .as[(String, Long, Long, Option[Long])].collect().head._4.isEmpty)
    val mixed = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 20L),
      ("g", 4L, 15L), ("g", 5L, 20L), ("g", 6L, 30L)).toDF("g", "x", "y")
    val a = Stats.spearmanR2Ppm(mixed, "g", "x", "y").collect().head
    val b = Stats.spearmanR2Ppm(mixed.repartition(7), "g", "x", "y")
      .collect().head
    assert(a == b)
  }

  test("cramersV2Ppm: perfect association 10⁶, independence 0, constant NULL") {
    // bijective 3×3, 2 rows per cell (18 = 3²·2 keeps every floor exact)
    val perfect = (0 until 18).map(i => (s"a${i % 3}", s"b${i % 3}"))
      .toDF("a", "b")
    val p = Stats.cramersV2Ppm(perfect, "a", "b")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(p == ((18L, 4L, 36000L, Some(1000000L))))
    // exact independence: every (a, b) cell equal
    val indep = (for (a <- 0 until 3; b <- 0 until 3; _ <- 0 until 2)
      yield (s"a$a", s"b$b")).toDF("a", "b")
    val i = Stats.cramersV2Ppm(indep, "a", "b")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(i._3 == 0L && i._4.contains(0L))
    // constant second margin → min(k,m) = 1 → NULL
    val const = Seq(("x", "only"), ("y", "only")).toDF("a", "b")
    assert(Stats.cramersV2Ppm(const, "a", "b")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("madReport: hand medians, 3-MAD flags, degenerate mad=0") {
    // values 1..9 + outlier 1000: med = 5 (type-1 over 10 values picks
    // the 5th), devs = {4,3,2,1,0,1,2,3,4,995} → mad = 2 (5th of the
    // sorted devs 0,1,1,2,2,3,3,4,4,995); 3-MAD rule flags dev > 6.
    val df = ((1L to 9L) :+ 1000L).map(("g", _)).toDF("g", "v")
    val r = Stats.madReport(df, "g", "v")
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(r == (("g", 10L, 5L, 2L, 1L)))
    // over half identical → mad = 0: every deviating row flags
    val const = (Seq.fill(6)(7L) ++ Seq(1L, 2L)).map(("c", _)).toDF("g", "v")
    val c = Stats.madReport(const, "g", "v")
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(c == (("c", 8L, 7L, 0L, 2L)))
  }

  test("madReport: partition independence and custom k") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i =>
      (s"g${i % 3}", rnd.nextInt(1000).toLong)).toDF("g", "v")
    val a = Stats.madReport(df, "g", "v", kMilli = 1500)
      .collect().map(_.toSeq).toSet
    val b = Stats.madReport(df.repartition(11), "g", "v", kMilli = 1500)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("crossCorrPpm: lagged copy peaks at its lag, lag 0 equals pearson") {
    // y is x shifted by 2: perfect correlation at lag 2, noise elsewhere
    val xs = Seq(5L, 9L, 2L, 7L, 3L, 8L, 1L, 6L, 4L, 10L)
    val rows = xs.indices.map { i =>
      val y = if (i >= 2) xs(i - 2) else 0L
      ("s", i.toLong, xs(i), y)
    }
    val df = rows.toDF("g", "t", "x", "y")
    val r = Stats.crossCorrPpm(df, "g", "t", "x", "y", maxLag = 3)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(v => v._2 -> ((v._3, v._4, v._5))).toMap
    assert(r(2L)._3.contains(1000000L), s"lag-2 must be perfect: $r")
    assert(r(2L)._2 == 1L)
    assert(r(0L)._3.exists(_ < 1000000L))
    // pair counts shrink with lag: n(lag) = 10 − lag
    assert((0L to 3L).forall(l => r(l)._1 == 10L - l))
    // lag 0 must equal pearsonR2Ppm of the aligned series
    val p = Stats.pearsonR2Ppm(df, "g", "x", "y")
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(r(0L)._2 == p._3 && r(0L)._3 == p._4)
  }

  test("splitGainPpm: perfect predictor, independent feature, NULL branch") {
    // label = parity; f_perfect mirrors it, f_indep is constant,
    // f_null puts half the rows in the NULL child (its own branch)
    val df = (0 until 40).map { i =>
      val lab = i % 2
      (s"l$lab", s"p$lab", "const",
        if (i < 20) null.asInstanceOf[String] else s"h${i % 2}")
    }.toDF("lab", "f_perfect", "f_indep", "f_null")
    val r = Stats.splitGainPpm(df,
        Seq("f_perfect", "f_indep", "f_null"), "lab")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    // parent: 2 balanced labels → impurity = 500000 ppm
    assert(r("f_perfect") == (("f_perfect", 40L, 2L, 500000L, 0L, 500000L)))
    assert(r("f_indep")._5 == 500000L && r("f_indep")._6 == 0L)
    // NULL child: 20 rows, balanced (impurity 500000); h0/h1 pure
    // → weighted = (20·500000)/40 = 250000, gain = 250000
    assert(r("f_null") == (("f_null", 40L, 3L, 500000L, 250000L, 250000L)))
    intercept[IllegalArgumentException](
      Stats.splitGainPpm(df, Seq.empty, "lab"))
    intercept[IllegalArgumentException](
      Stats.splitGainPpm(df, Seq("f_indep", "f_indep"), "lab"))
  }

  test("splitGainPpm: partition independence, NULL labels excluded") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 300).map { i =>
      (if (i % 17 == 0) null else s"l${rnd.nextInt(3)}",
        s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(2)}")
    }.toDF("lab", "fa", "fb")
    val a = Stats.splitGainPpm(df, Seq("fa", "fb"), "lab")
      .collect().map(_.toSeq).toSet
    val b = Stats.splitGainPpm(df.repartition(13), Seq("fa", "fb"), "lab")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // NULL labels never count
    val n = Stats.splitGainPpm(df, Seq("fa"), "lab")
      .select(col("n")).as[Long].collect().head
    assert(n == (0 until 300).count(_ % 17 != 0))
  }

  test("correlationMatrixPpm: perfect pairs, pairwise-complete n, matches pearson") {
    // b = 2a (r = +1), c = 100 − a (r = −1); d observed on half the keys
    val rows = (1L to 10L).flatMap { k =>
      Seq((k, "a", k), (k, "b", 2 * k), (k, "c", 100 - k)) ++
        (if (k <= 5) Seq((k, "d", k * k)) else Nil)
    }
    val df = rows.toDF("k", "m", "v")
    val got = Stats.correlationMatrixPpm(df, "k", "m", "v")
      .as[(String, String, Long, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", "b")) == ((10L, 1L, Some(1000000L))))
    assert(got(("a", "c")) == ((10L, -1L, Some(1000000L))))
    assert(got(("b", "c"))._2 == -1L)
    assert(got(("a", "d"))._1 == 5L, "pairwise-complete n over d's keys")
    assert(got.size == 6, "C(4,2) unordered pairs")
    // each pair must equal the dedicated two-column pearson
    val wide = (1L to 5L).map(k => ("g", k, k * k)).toDF("g", "x", "y")
    val p = Stats.pearsonR2Ppm(wide, "g", "x", "y").collect().head
    assert(got(("a", "d"))._2 == p.getLong(2) &&
      got(("a", "d"))._3 == Option(p.get(3)).map(_.asInstanceOf[Long]))
  }

  test("gainsTable: perfect ranker, tie cohesion, lift endpoints") {
    // scores 1..100 (one row each), label = score > 80: a perfect
    // ranker — decile 1 (scores 91+) captures 10/20, decile 2 the rest
    val df = (1L to 100L).map(v => (v, if (v > 80) 1L else 0L))
      .toDF("s", "y")
    val got = Stats.gainsTable(df, "s", "y", bins = 10)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(got.length == 10)
    assert(got(0) == ((1L, 10L, 10L, 10L, 10L,
      Some(500000L), Some(5000000L))))
    assert(got(1)._5 == 20L && got(1)._6.contains(1000000L))
    assert(got(9) == ((10L, 10L, 0L, 100L, 20L,
      Some(1000000L), Some(1000000L))))
    // tied scores stay in one bucket: 50 rows of score 7, 50 of 3
    val tied = (Seq.fill(50)((7L, 1L)) ++ Seq.fill(50)((3L, 0L)))
      .toDF("s", "y")
    val tg = Stats.gainsTable(tied, "s", "y", bins = 4)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(tg.map(_._1).toSeq == Seq(2L, 4L),
      s"value-level bins: each tie block lands whole: $tg")
    val rep = Stats.gainsTable(tied.repartition(7), "s", "y", 4)
      .collect().map(_.toSeq).toSet
    assert(rep == tg.map(t => Seq[Any](t._1, t._2, t._3, t._4, t._5,
      t._6.orNull, t._7.orNull)).toSet)
    intercept[IllegalArgumentException](Stats.gainsTable(df, "s", "y", 1))
  }

  test("bestSplitThreshold: perfect cut found, ties to smallest, argmax exact") {
    // label = v >= 5: threshold 4 splits perfectly (left 1..4, right 5..8)
    val perfect = (1L to 8L).flatMap(v =>
      Seq.fill(3)(("g", v, if (v >= 5) 1L else 0L))).toDF("g", "v", "y")
    val r = Stats.bestSplitThreshold(perfect, "g", "v", "y")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // parent = 500000 (balanced), perfect split → gain = parent
    assert(r == (("g", 24L, 500000L, 4L, 500000L, 12L, 12L)))
    // constant label → every gain 0, tie breaks to the SMALLEST value
    val flat = (1L to 5L).map(v => ("f", v, 1L)).toDF("g", "v", "y")
    val rf = Stats.bestSplitThreshold(flat, "g", "v", "y")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(rf._4 == 1L && rf._5 == 0L)
    // driver argmax reference on random data
    val rnd = new scala.util.Random(9)
    val rows = (0 until 500).map(_ =>
      ("r", rnd.nextInt(20).toLong, rnd.nextInt(2).toLong))
    def gainAt(t: Long): (Long, Long) = {
      val n = rows.size.toLong; val pos = rows.map(_._3).sum
      val parent = 1000000L -
        (1000000L * (pos * pos + (n - pos) * (n - pos))) / (n * n)
      val l = rows.filter(_._2 <= t)
      val (lw, lp) = (l.size.toLong, l.map(_._3).sum)
      val (rw, rp) = (n - lw, pos - lp)
      val lt = (1000000L * (lp * lp + (lw - lp) * (lw - lp))) / lw
      val rt = (1000000L * (rp * rp + (rw - rp) * (rw - rp))) / rw
      (parent, parent - (1000000L - (lt + rt) / n))
    }
    val cands = rows.map(_._2).distinct.sorted.dropRight(1)
    val best = cands.map(t => (gainAt(t)._2, t))
      .sortBy(p => (-p._1, p._2)).head
    val rr = Stats.bestSplitThreshold(rows.toDF("g", "v", "y"), "g", "v", "y")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert((rr._5, rr._4) == best, s"got $rr want $best")
    val rr2 = Stats.bestSplitThreshold(
        rows.toDF("g", "v", "y").repartition(13), "g", "v", "y")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(rr == rr2)
  }

  test("topKWithOthers: reconciling rollup, tie rule, no-residual case") {
    val df = Seq(("a", 50L), ("a", 50L), ("b", 90L), ("c", 80L),
      ("d", 10L), ("e", 10L)).toDF("k", "v")
    val got = Stats.topKWithOthers(df, "k", "v", k = 2)
      .as[(String, Long, Long, Long)].collect().sortBy(_._4)
    // a=100, b=90, c=80, d=10, e=10 → top2 = a, b; OTHER = 100 (3 keys)
    assert(got.toSeq == Seq(("a", 100L, 1L, 1L), ("b", 90L, 1L, 2L),
      ("OTHER", 100L, 3L, 3L)))
    assert(got.map(_._2).sum == 290L, "Σ output must equal Σ input")
    // tie at the cut: b=90, c=90 → key order decides
    val tie = Seq(("b", 90L), ("c", 90L), ("a", 100L)).toDF("k", "v")
    val t2 = Stats.topKWithOthers(tie, "k", "v", 2)
      .as[(String, Long, Long, Long)].collect().sortBy(_._4)
    assert(t2.map(_._1).toSeq == Seq("a", "b", "OTHER"))
    // k >= distinct keys → no OTHER row
    val small = Stats.topKWithOthers(tie, "k", "v", 5)
      .as[(String, Long, Long, Long)].collect()
    assert(small.length == 3 && !small.exists(_._1 == "OTHER"))
    intercept[IllegalArgumentException](Stats.topKWithOthers(df, "k", "v", 0))
  }

  test("rollingCorrPpm: perfect window, gap shrinks n, head NULL") {
    // y = x: every ≥2-point window is exactly 10⁶; time 5 sits alone
    // in its value-based window after the gap
    val rows = Seq(0L, 1L, 2L, 5L).map(t => ("s", t, t + 1, t + 1))
    val df = rows.toDF("g", "t", "x", "y")
    val got = Stats.rollingCorrPpm(df, "g", "t", "x", "y",
        windowPeriods = 3)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> ((r._3, r._5))).toMap
    assert(got(0L) == ((1L, None)), "first point has n=1 → NULL")
    assert(got(1L) == ((2L, Some(1000000L))))
    assert(got(2L) == ((3L, Some(1000000L))))
    assert(got(5L) == ((1L, None)), "gap must shrink the window to n=1")
    // anti-correlated window
    val mix = Seq(("m", 0L, 1L, 9L), ("m", 1L, 2L, 7L), ("m", 2L, 3L, 5L))
      .toDF("g", "t", "x", "y")
    val m = Stats.rollingCorrPpm(mix, "g", "t", "x", "y", 3)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> ((r._4, r._5))).toMap
    assert(m(2L) == ((-1L, Some(1000000L))))
    val rep = Stats.rollingCorrPpm(df.repartition(5), "g", "t", "x", "y", 3)
      .collect().map(_.toSeq).toSet
    assert(rep == Stats.rollingCorrPpm(df, "g", "t", "x", "y", 3)
      .collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException](
      Stats.rollingCorrPpm(df, "g", "t", "x", "y", 1))
  }

  test("isotonicFit: hand PAVA pools, monotone output, guards") {
    // raw rates by score: .5, 0, 1, .5 → PAVA pools (1,2)→.25 and
    // (3,4)→.75
    val rows = Seq((1L, 1L), (1L, 0L), (2L, 0L), (2L, 0L),
      (3L, 1L), (3L, 1L), (4L, 1L), (4L, 0L))
    val df = rows.toDF("score", "y")
    val got = Stats.isotonicFit(df, "score", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, 0.25), (2L, 2L, 0.25),
      (3L, 2L, 0.75), (4L, 2L, 0.75)))
    // already isotonic → untouched; fully reversed → one global block
    val iso = Seq((1L, 0L), (2L, 1L), (3L, 1L))
    val gi = Stats.isotonicFit(iso.toDF("score", "y"), "score", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(gi.map(_._3).toSeq == Seq(0.0, 1.0, 1.0))
    val rev = Seq((1L, 1L), (2L, 0L))
    val gr = Stats.isotonicFit(rev.toDF("score", "y"), "score", "y")
      .as[(Long, Long, Double)].collect()
    assert(gr.forall(_._3 == 0.5))
    intercept[IllegalArgumentException](
      Stats.isotonicFit(df, "score", "y", maxScores = 2))
    intercept[IllegalArgumentException](
      Stats.isotonicFit(Seq((1L, -1L)).toDF("score", "y"), "score", "y"))
  }

  test("isotonicFit: monotone + mass-preserving on random data, partition-independent") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 2000).map { _ =>
      val s = rnd.nextInt(40).toLong
      (s, if (rnd.nextInt(40) < s) 1L else 0L) // noisy increasing rate
    }
    val df = rows.toDF("score", "y")
    val fit = Stats.isotonicFit(df, "score", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(fit.sliding(2).forall(p => p(0)._3 <= p(1)._3), "must be monotone")
    // PAVA preserves total mass: Σ w·rate = Σ y exactly up to float
    val mass = fit.map(r => r._2 * r._3).sum
    assert(math.abs(mass - rows.map(_._2).sum) < 1e-6)
    val fit2 = Stats.isotonicFit(df.repartition(13), "score", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(fit.toSeq == fit2.toSeq)
  }

  test("isotonicFitBucketed: identity cells match exact PAVA, huge " +
       "score spans stay bounded, monotone") {
    // scores 0..39 with buckets=40 over span 40: cell = score exactly,
    // so the bucketed fit IS the exact fit
    val rnd = new scala.util.Random(7)
    val rows = (0 until 2000).map { _ =>
      val s = rnd.nextInt(40).toLong
      (s, if (rnd.nextInt(40) < s) 1L else 0L)
    }
    val df = rows.toDF("score", "y")
    val exact = Stats.isotonicFit(df, "score", "y")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val bucketed = Stats.isotonicFitBucketed(df, "score", "y",
        buckets = 40)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(bucketed == exact)
    // a score domain the exact form's maxScores could NEVER admit:
    // ±2^61-scale span, every value distinct — bucketed stays ≤
    // `buckets` rows, no overflow, monotone, mass-preserving
    val wide = (0 until 500).map { i =>
      val s = (i.toLong - 250L) * (1L << 52)
      (s, if (i >= 250) 1L else 0L)
    }
    val wfit = Stats.isotonicFitBucketed(wide.toDF("score", "y"),
        "score", "y", buckets = 16)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(wfit.length <= 16 && wfit.length >= 2)
    assert(wfit.sliding(2).forall(p => p(0)._3 <= p(1)._3))
    assert(math.abs(wfit.map(r => r._2 * r._3).sum - 250.0) < 1e-6)
    assert(wfit.map(_._2).sum == 500L, "every row lands in some cell")
    intercept[IllegalArgumentException](
      Stats.isotonicFitBucketed(df, "score", "y", buckets = 1))
  }

  test("trimmedMeanMilli: outlier immunity, exact fences, empty-keep NULL") {
    // 1..20 + outlier 1000: [10%, 90%] fences keep 3..19 → mean 11
    val df = ((1L to 20L) :+ 1000L).map(("g", _)).toDF("g", "v")
    val r = Stats.trimmedMeanMilli(df, "g", "v", loPm = 100, hiPm = 900)
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(r == (("g", 21L, 17L, Some(11000L))))
    val r2 = Stats.trimmedMeanMilli(df.repartition(7), "g", "v", 100, 900)
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(r2 == r)
    intercept[IllegalArgumentException](
      Stats.trimmedMeanMilli(df, "g", "v", 900, 100))
  }

  test("crossCorrPpm: constant side NULL, partition independence") {
    val const = (0 to 9).map(i => ("c", i.toLong, 5L, i.toLong))
      .toDF("g", "t", "x", "y")
    assert(Stats.crossCorrPpm(const, "g", "t", "x", "y", 2)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .forall(_._5.isEmpty))
    val rnd = new scala.util.Random(11)
    val df = (0 to 40).map(i =>
      ("g", i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .toDF("g", "t", "x", "y")
    val a = Stats.crossCorrPpm(df, "g", "t", "x", "y", 4)
      .collect().map(_.toSeq).toSet
    val b = Stats.crossCorrPpm(df.repartition(13), "g", "t", "x", "y", 4)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("brierDecompositionPpm: hand-computed Murphy split, range " +
       "filter, p=10^6 clamps to top bin") {
    // bins=2 (width 500000): bin0 = {(2e5,F)×2, (2e5,T)}; bin1 =
    // {(8e5,T), (8e5,F), (1e6,F)} — a forecast of EXACTLY 1.0 clamps
    // into the top bin (not dropped); p<0 still vanishes.
    // tsq = 7.2e11 + 1.68e12 = 2.4e12 → brier 400000; f̄ = (2e5,
    // 866666), ō = (333333, 333333) = ōbar → res 0; rel =
    // (3·133333² + 3·533333²) div 6e6 = 151110; unc = 333333·666667
    // div 1e6 = 222222
    val df = (Seq((200000L, false), (200000L, false), (200000L, true),
        (800000L, true), (800000L, false), (1000000L, false)) ++
      Seq((-5L, true))) // filtered
      .toDF("p", "y")
    val r = Stats.brierDecompositionPpm(df, "p", "y", bins = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == ((6L, 2L, 400000L, 151110L, 0L, 222222L)),
      s"got $r")
  }

  test("mcnemarMilli: hand discordant cells, all-concordant NULL") {
    val df = (Seq.fill(5)((true, true, false)) ++
      Seq.fill(2)((true, false, true)) ++
      Seq.fill(3)((true, true, true))).toDF("y", "a", "b")
    val r = Stats.mcnemarMilli(df, "y", "a", "b")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().head
    // b=5, c=2: (b−c)²/(b+c) = 9/7 → 1285; cc: (|3|−1)²/7 = 4/7 → 571
    assert(r == ((10L, 5L, 2L, Some(1285L), Some(571L))), s"got $r")
    val conc = Seq((true, true, true), (false, false, false))
      .toDF("y", "a", "b")
    val r2 = Stats.mcnemarMilli(conc, "y", "a", "b")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().head
    assert(r2 == ((2L, 0L, 0L, None, None)))
  }

  test("fanoFactorPpm: shared spine zeros count, regular series = 0") {
    // span from BOTH groups: lo=0, hi=2, H=3. g: counts {0:2, 2:1}
    // (period 1 a genuine zero) → 10⁶(3·5−9)/(3·3) = 666666; h: {1:2}
    // → 10⁶(3·4−4)/(3·2) = 1333333
    val df = Seq(("g", 0L), ("g", 0L), ("g", 2L), ("h", 1L), ("h", 1L))
      .toDF("g", "t")
    val got = Stats.fanoFactorPpm(df, "g", "t")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 3L, 3L, 1000L, Some(666666L))))
    assert(got("h") == (("h", 3L, 2L, 666L, Some(1333333L))))
    // one event per period across the whole span: variance 0 → fano 0
    val reg = Seq(("r", 0L), ("r", 1L), ("r", 2L)).toDF("g", "t")
    assert(Stats.fanoFactorPpm(reg, "g", "t")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .head._5.contains(0L))
  }

  test("rollingAnomalyFlags: spike flags, warmup NULL, gap shrinks, " +
       "partition independence") {
    val series = (0L to 9L).map(d => ("g", d, 10L)) :+ (("g", 10L, 100L))
    val df = series.toDF("g", "t", "x")
    val got = Stats.rollingAnomalyFlags(df, "g", "t", "x",
        windowPeriods = 5, k = 3, minPeriods = 3)
      .as[(String, Long, Long, Long, Option[Boolean])].collect()
      .map(r => r._2 -> r).toMap
    assert(got(0L)._5.isEmpty && got(2L)._5.isEmpty) // < 3 baseline rows
    assert(got(3L) == (("g", 3L, 10L, 3L, Some(false))))
    // day 10 vs a constant baseline (σ = 0): any deviation flags
    assert(got(10L) == (("g", 10L, 100L, 5L, Some(true))))
    // a gap empties the RANGE frame: baseline count 0 → NULL
    val gap = (0L to 3L).map(d => ("g", d, 10L)) :+ (("g", 20L, 10L))
    val g20 = Stats.rollingAnomalyFlags(gap.toDF("g", "t", "x"),
        "g", "t", "x", 5, 3, 3)
      .as[(String, Long, Long, Long, Option[Boolean])].collect()
      .find(_._2 == 20L).get
    assert(g20._4 == 0L && g20._5.isEmpty)
    val a = Stats.rollingAnomalyFlags(df, "g", "t", "x", 5, 3, 3)
      .collect().map(_.toSeq).toSet
    val b = Stats.rollingAnomalyFlags(df.repartition(7), "g", "t", "x",
        5, 3, 3).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("durbinWatsonMilli: hand DW, constant NULL, single point") {
    // [1,2,4]: Σd²=5, nS2−S1²=14 → DW = 15000//14 = 1071
    val df = (Seq(("g", 0L, 1L), ("g", 1L, 2L), ("g", 2L, 4L)) ++
      Seq(("c", 0L, 3L), ("c", 1L, 3L)) ++ Seq(("s", 0L, 9L)))
      .toDF("g", "t", "x")
    val got = Stats.durbinWatsonMilli(df, "g", "t", "x")
      .as[(String, Long, Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 3L, Some(1071L))), s"got $got")
    assert(got("c") == (("c", 2L, None)))  // constant → denominator 0
    assert(got("s") == (("s", 1L, None)))  // single point → denominator 0
  }

  test("momentsByGroup: hand moments, constant NULL, negative skew sign") {
    // [1,2,3,4,10]: μ=4, m2=10, m3=36, m4=278.8 → g1²=1.296,
    // kurt=2.788 → excess −212000 ppm
    val df = (Seq(1L, 2L, 3L, 4L, 10L).map(("g", _)) ++
      Seq(("c", 7L), ("c", 7L)) ++
      Seq(1L, 2L, 3L, 4L, 10L).map(v => ("m", -v))).toDF("g", "x")
    val got = Stats.momentsByGroup(df, "g", "x")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 5L, 1L, Some(1296000L), Some(-212000L))),
      s"got ${got("g")}")
    // mirrored values: skew sign flips, magnitude and kurtosis hold
    assert(got("m") == (("m", 5L, -1L, Some(1296000L), Some(-212000L))))
    // constant series: M2 = 0 → both NULL (sign 0)
    assert(got("c") == (("c", 2L, 0L, None, None)))
  }

  test("calibrationErrorPpm: ECE/MCE over the Brier fixture bins") {
    // bins=2: bin0 {2e5F,2e5F,2e5T}: fb=200000, ob=333333, gap=133333;
    // bin1 {8e5T,8e5F}: fb=800000, ob=500000, gap=300000;
    // ECE=(3·133333+2·300000)//5=199999, MCE=300000
    val df = Seq((200000L, false), (200000L, false), (200000L, true),
      (800000L, true), (800000L, false)).toDF("p", "y")
    val r = Stats.calibrationErrorPpm(df, "p", "y", bins = 2)
      .as[(Long, Long, Long)].collect().head
    assert(r == ((5L, 199999L, 300000L)), s"got $r")
  }

  test("shrunkRatesPpm: sparse keys pull to the prior, heavy keys " +
       "stay near raw") {
    // prior Beta(2, 8): mean 200000 ppm, worth 10 observations
    val df = (Seq(("sparse", 1L), ("sparse", 1L)) ++   // 2/2 raw = 1e6
      (1 to 100).map(i => ("heavy", if (i <= 50) 1L else 0L)))
      .toDF("k", "h")
    val got = Stats.shrunkRatesPpm(df, "k", "h", 2L, 8L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // sparse: (2+2)/(2+10) = 1/3; heavy: (50+2)/(100+10)
    assert(got("sparse") == (("sparse", 2L, 2L, 1000000L, 333333L)),
      s"got $got")
    assert(got("heavy") == (("heavy", 100L, 50L, 500000L, 472727L)))
    intercept[IllegalArgumentException](
      Stats.shrunkRatesPpm(df, "k", "h", 0L, 0L))
  }

  test("ksUniformPpm: perfect uniform = 0, point mass detected on " +
       "both step sides, out-of-support fails loud") {
    val uni = (0L to 9L).toDF("v")
    assert(Stats.ksUniformPpm(uni, "v", 0L, 9L)
      .as[(Long, Long)].collect().head == ((10L, 0L)))
    // all mass at the TOP value: F̂ below F everywhere until the jump —
    // the bottom-of-step check catches D = 9/10
    val top = Seq.fill(5)(9L).toDF("v")
    assert(Stats.ksUniformPpm(top, "v", 0L, 9L)
      .as[(Long, Long)].collect().head == ((5L, 900000L)))
    // all mass at the BOTTOM: top-of-step side, same D
    val bot = Seq.fill(5)(0L).toDF("v")
    assert(Stats.ksUniformPpm(bot, "v", 0L, 9L)
      .as[(Long, Long)].collect().head == ((5L, 900000L)))
    // building the plan is lazy — no job, no error, until evaluation
    val q = Stats.ksUniformPpm(Seq(11L).toDF("v"), "v", 0L, 9L)
    q.queryExecution.executedPlan // plans fine; raise_error is lazy
    val e = intercept[Exception](q.collect())
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(e).contains("outside the declared support"))
  }

  test("designEffectMilli: equal clusters = exactly 1, skew inflates") {
    val eq = Seq(1L, 1L, 2L, 2L, 3L, 3L).toDF("c")
    val r = Stats.designEffectMilli(eq, "c")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((6L, 3L, 1000L, 6L)), s"got $r")
    // sizes (4, 1, 1): deff = 3·18/36 = 1.5 → n_eff = 4
    val sk = Seq(1L, 1L, 1L, 1L, 2L, 3L).toDF("c")
    val s2 = Stats.designEffectMilli(sk, "c")
      .as[(Long, Long, Long, Long)].collect().head
    assert(s2 == ((6L, 3L, 1500L, 4L)), s"got $s2")
  }

  test("cemAttMicro: matched strata only, unmatched mass surfaces") {
    val df = Seq(
      ("s1", true, 10L), ("s1", true, 20L), ("s1", false, 5L),
      ("s2", true, 8L),                 // no control → treat unmatched
      ("s3", false, 7L)                 // no treat → ctrl unmatched
    ).toDF("s", "t", "x")
    val r = Stats.cemAttMicro(df, "t", "s", "x")
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().head
    // s1: means 15 vs 5 → +10; ATT = (2·10e6)/2 = 10e6
    assert(r == ((5L, 3L, 1L, 2L, 1L, 1L, Some(10000000L))), s"got $r")
    val none = Stats.cemAttMicro(
      Seq(("s", true, 1L)).toDF("s", "t", "x"), "t", "s", "x")
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().head
    assert(none._7.isEmpty && none._5 == 1L)
  }

  test("captureRecapture: hand Chapman estimate and variance") {
    val a = Seq(1L, 2L, 3L).toDF("id")
    val b = Seq(2L, 3L, 4L, 5L).toDF("id")
    val r = Stats.captureRecapture(a, b, "id")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // n̂ = 4·5/3 − 1 = 5 (the true population);
    // var = 1000·4·5·1·2 // (9·4) = 1111
    assert(r == ((3L, 4L, 2L, 5L, 1111L)), s"got $r")
    // duplicate observations collapse before counting
    val r2 = Stats.captureRecapture(a.union(a), b, "id")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r2 == r)
  }

  test("conformalResidualQuantile: (n+1) adjustment, tiny-n NULL") {
    // residuals |a−f| = 1..9 (n=9): k = ceil(10·0.8) = 8 → q̂ = 8
    // (a plain 80% type-1 quantile would give ceil(7.2) = 8th of 9 —
    // same here, so also pin the n where they differ: n=4, k=ceil(4)=4)
    val df = (1L to 9L).map(r => ("g", 100L + r, 100L)) ++
      (1L to 4L).map(r => ("h", 100L + r, 100L)) ++
      Seq(("tiny", 105L, 100L)) // n=1: k = ceil(2·0.8) = 2 > 1 → NULL
    val got = Stats.conformalResidualQuantile(df.toDF("g", "a", "f"),
        "g", "a", "f", alphaPm = 200)
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 9L, Some(8L))), s"got $got")
    assert(got("h") == (("h", 4L, Some(4L))))
    assert(got("tiny") == (("tiny", 1L, None)))
    intercept[IllegalArgumentException](
      Stats.conformalResidualQuantile(df.toDF("g", "a", "f"), "g", "a",
        "f", 0))
  }

  test("conformalResidualQuantile: empirical coverage meets the level " +
       "on an exchangeable split") {
    // deterministic LCG "noise": calibration = even ids, test = odd —
    // exchangeable by construction. Coverage on the test slice must
    // be >= 1 − α (up to discreteness slack on 250 points).
    def noise(i: Long): Long = (i * 1103515245L + 12345L) % 1000L
    val rows = (1L to 500L).map(i => ("g", 5000L + noise(i), 5000L, i))
    val cal = rows.filter(_._4 % 2 == 0)
      .map(r => (r._1, r._2, r._3)).toDF("g", "a", "f")
    val qhat = Stats.conformalResidualQuantile(cal, "g", "a", "f",
        alphaPm = 200)
      .as[(String, Long, Option[Long])].collect().head._3.get
    val test = rows.filter(_._4 % 2 == 1)
    val covered = test.count(r => math.abs(r._2 - r._3) <= qhat)
    val coverage = covered.toDouble / test.size
    assert(coverage >= 0.8 - 0.05,
      s"conformal coverage broke: $coverage with q_hat=$qhat")
  }

  test("mantelHaenszelMilli: confounder-balanced OR, no-discordant NULL") {
    // two strata, each with a=2,b=1,c=1,d=2 (n=6):
    // f1 = (1e6·4)//6 = 666666 each; f2 = (1e6·1)//6 = 166666 each
    // → OR_milli = 1000·1333332 // 333332 = 4000 (true OR = 4)
    def stratum(s: String) = Seq(
      (s, true, true), (s, true, true), (s, true, false),
      (s, false, true), (s, false, false), (s, false, false))
    val df = (stratum("s1") ++ stratum("s2")).toDF("s", "e", "y")
    val r = Stats.mantelHaenszelMilli(df, "s", "e", "y")
      .as[(Long, Long, Option[Long])].collect().head
    assert(r == ((12L, 2L, Some(4000L))), s"got $r")
    // perfectly concordant table: OR infinite → NULL
    val conc = Seq(("s", true, true), ("s", false, false))
      .toDF("s", "e", "y")
    assert(Stats.mantelHaenszelMilli(conc, "s", "e", "y")
      .as[(Long, Long, Option[Long])].collect().head._3.isEmpty)
  }

  test("didMicro: hand parallel-trends estimate, empty cell NULLs") {
    // treat: 10 → 25 (+15); ctrl: 20 → 31 (+11) → DiD = +4
    val df = Seq(
      (true, false, 10L), (true, true, 25L),
      (false, false, 20L), (false, true, 31L)).toDF("t", "p", "x")
    val r = Stats.didMicro(df, "t", "p", "x")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long])].collect().head
    assert(r == ((4L, Some(10000000L), Some(25000000L), Some(20000000L),
      Some(31000000L), Some(4000000L))), s"got $r")
    // a missing cell poisons only what depends on it
    val partial = Stats.didMicro(
      Seq((true, false, 10L), (false, false, 20L), (false, true, 30L))
        .toDF("t", "p", "x"), "t", "p", "x")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long])].collect().head
    assert(partial._3.isEmpty && partial._6.isEmpty &&
      partial._2 == Some(10000000L), s"got $partial")
  }

  test("postStratifiedMeanMilli: reweighted mean, missing-stratum NULL, " +
       "unweighted rows counted") {
    val target = Seq("a" -> 500L, "b" -> 500L)
    val df = Seq(
      ("v1", "a", 10L), ("v1", "a", 20L), ("v1", "b", 30L),
      ("v2", "a", 10L),                       // stratum b missing
      ("v3", "a", 10L), ("v3", "b", 20L), ("v3", "c", 99L) // c unweighted
    ).toDF("v", "s", "x")
    val got = Stats.postStratifiedMeanMilli(df, "v", "s", "x", target)
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // v1: 0.5·15 + 0.5·30 = 22.5 (raw mean 20)
    assert(got("v1") == (("v1", 3L, 0L, 0L, 20000L, Some(22500L))),
      s"got $got")
    assert(got("v2") == (("v2", 1L, 1L, 0L, 10000L, None)))
    assert(got("v3") == (("v3", 3L, 0L, 1L, 43000L, Some(15000L))))
    intercept[IllegalArgumentException](
      Stats.postStratifiedMeanMilli(df, "v", "s", "x",
        Seq("a" -> 900L, "b" -> 200L)))
  }

  test("olsMilli: exact plane recovered, collinear NULL, n<3 NULL") {
    // y = 2 + 3·x1 − x2 on a 4×3 grid: betas exact in milli
    val grid = for (x1 <- 0L to 3L; x2 <- 0L to 2L)
      yield ("g", 2 + 3 * x1 - x2, x1, x2)
    val df = (grid ++
      Seq(0L, 1L, 2L).map(i => ("col", 5 + i, i, 2 * i)) ++ // x2 = 2·x1
      Seq(("tiny", 1L, 1L, 2L), ("tiny", 2L, 2L, 1L))
    ).toDF("g", "y", "x1", "x2")
    val got = Stats.olsMilli(df, "g", "y", "x1", "x2")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("g") ==
      (("g", 12L, Some(2000L), Some(3000L), Some(-1000L))), s"got $got")
    assert(got("col") == (("col", 3L, None, None, None)))
    assert(got("tiny") == (("tiny", 2L, None, None, None)))
    // partition independence (pure map-side-partial aggregation)
    val a = Stats.olsMilli(df, "g", "y", "x1", "x2").collect()
      .map(_.toSeq).toSet
    val b = Stats.olsMilli(df.repartition(7), "g", "y", "x1", "x2")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("chiSquareGofMilli: hand chi2, absent-expected contributes, " +
       "unexpected category goes loud NULL") {
    // a:3, b:1 vs 500/500 → χ² = 1 exactly
    val df = Seq("a", "a", "a", "b").toDF("c")
    val r = Stats.chiSquareGofMilli(df, "c",
        Seq("a" -> 500L, "b" -> 500L))
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r == ((4L, 2L, 0L, Some(1000L))), s"got $r")
    // expected 'c' never observed: its e=1 still contributes 1.0
    val r2 = Stats.chiSquareGofMilli(Seq("a", "a", "b", "b").toDF("c"),
        "c", Seq("a" -> 500L, "b" -> 250L, "c" -> 250L))
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r2 == ((4L, 3L, 0L, Some(2000L))), s"got $r2")
    // observed category with no declared mass: undefined, loud
    val r3 = Stats.chiSquareGofMilli(Seq("a", "z").toDF("c"), "c",
        Seq("a" -> 1000L))
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r3 == ((2L, 1L, 1L, None)), s"got $r3")
    intercept[IllegalArgumentException](
      Stats.chiSquareGofMilli(df, "c", Seq("a" -> 700L, "b" -> 200L)))
    intercept[IllegalArgumentException](
      Stats.chiSquareGofMilli(df, "c", Seq("a" -> 500L, "a" -> 500L)))
  }

  test("rocCurvePoints: hand confusion prefixes, degenerate label NULLs") {
    // scores desc: t=3 (w2,p1), t=2 (w1,p1), t=1 (w1,p0); P=2, N=2
    val df = Seq((3L, 1L), (3L, 0L), (2L, 1L), (1L, 0L)).toDF("s", "y")
    val got = Stats.rocCurvePoints(df, "s", "y")
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(3L) == ((3L, 1L, 1L, Some(500000L), Some(500000L),
      500000L)), s"got $got")
    assert(got(2L) == ((2L, 2L, 1L, Some(1000000L), Some(500000L),
      666666L)))
    assert(got(1L) == ((1L, 2L, 2L, Some(1000000L), Some(1000000L),
      500000L)))
    // all-positive labels: fpr NULL everywhere; all-negative: tpr NULL
    val allPos = Stats.rocCurvePoints(
      Seq((2L, 1L), (1L, 1L)).toDF("s", "y"), "s", "y")
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)].collect()
    assert(allPos.forall(_._5.isEmpty) && allPos.forall(_._4.nonEmpty))
    val allNeg = Stats.rocCurvePoints(
      Seq((2L, 0L), (1L, 0L)).toDF("s", "y"), "s", "y")
      .as[(Long, Long, Long, Option[Long], Option[Long], Long)].collect()
    assert(allNeg.forall(_._4.isEmpty) && allNeg.forall(_._5.nonEmpty))
  }

  test("averagePrecisionPpm: hand AP, perfect ranking = 1e6, " +
       "no-positive NULL") {
    val df = Seq((3L, 1L), (3L, 0L), (2L, 1L), (1L, 0L)).toDF("s", "y")
    // AP = (1·500000 + 1·666666 + 0·500000) // 2 = 583333
    val r = Stats.averagePrecisionPpm(df, "s", "y")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r == ((4L, 2L, 500000L, Some(583333L))), s"got $r")
    val perfect = Stats.averagePrecisionPpm(
      Seq((5L, 1L), (4L, 1L), (2L, 0L), (1L, 0L)).toDF("s", "y"),
      "s", "y").as[(Long, Long, Long, Option[Long])].collect().head
    assert(perfect == ((4L, 2L, 500000L, Some(1000000L))))
    val nopos = Stats.averagePrecisionPpm(
      Seq((2L, 0L), (1L, 0L)).toDF("s", "y"), "s", "y")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(nopos == ((2L, 0L, 0L, None)))
  }

  test("welchT2Milli: hand t², one-sided group, degenerate NULLs") {
    // A=[1,2,3] (s²=1), B=[5,7] (s²=2): t² = 16/(1/3+1) = 12 exactly
    val df = (Seq(1L, 2L, 3L).map(("g", true, _)) ++
      Seq(5L, 7L).map(("g", false, _)) ++
      Seq(("one", true, 4L), ("one", true, 5L)) ++       // no false side
      Seq(("tiny", true, 1L), ("tiny", false, 2L)) ++    // n1 < 2
      Seq(("cst", true, 3L), ("cst", true, 3L),          // both constant
        ("cst", false, 3L), ("cst", false, 3L))).toDF("g", "f", "x")
    val got = Stats.welchT2Milli(df, "g", "f", "x")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 3L, 2L, Some(-1L), Some(12000L))),
      s"got ${got("g")}")
    assert(got("one") == (("one", 2L, 0L, None, None)))
    assert(got("tiny") == (("tiny", 1L, 1L, Some(-1L), None)))
    assert(got("cst") == (("cst", 2L, 2L, Some(0L), None)))
  }

  test("kendallTau2Ppm: perfect concordance/discordance, tie correction, " +
       "all-tie NULL, partition independence") {
    val df = (Seq((1L, 1L), (2L, 2L), (3L, 3L)).map { case (x, y) =>
        ("up", x, y) } ++
      Seq((1L, 3L), (2L, 2L), (3L, 1L)).map { case (x, y) =>
        ("dn", x, y) } ++
      // ties: (1,1),(1,2),(2,3) → C=2, D=0, N1=2, N2=0 → τ² = 2/3
      Seq(("tie", 1L, 1L), ("tie", 1L, 2L), ("tie", 2L, 3L)) ++
      Seq(("allx", 1L, 1L), ("allx", 1L, 2L))).toDF("g", "x", "y")
    val got = Stats.kendallTau2Ppm(df, "g", "x", "y")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("up") == (("up", 3L, 1L, Some(1000000L))), s"got $got")
    assert(got("dn") == (("dn", 3L, -1L, Some(1000000L))))
    assert(got("tie") == (("tie", 3L, 1L, Some(666666L))))
    assert(got("allx") == (("allx", 2L, 0L, None)))
    val a = Stats.kendallTau2Ppm(df, "g", "x", "y").collect()
      .map(_.toSeq).toSet
    val b = Stats.kendallTau2Ppm(df.repartition(7), "g", "x", "y")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("youdenOptimalPpm: perfect split, lowest-threshold tie-break, degenerate") {
    import spark.implicits._
    // pos {10,20}, neg {1,2}: J peaks at threshold 10 (tpr 1, fpr 0)
    val sep = Seq((10L, true), (20L, true), (1L, false), (2L, false))
      .toDF("s", "y")
    val r = Stats.youdenOptimalPpm(sep, "s", "y")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == ((10L, 2L, 0L, 1000000L, 0L, 1000000L)), s"got $r")
    // J ties at thresholds 4 and 2 (both 500000) → lowest wins
    val tie = Seq((4L, true), (2L, true), (3L, false), (1L, false))
      .toDF("s", "y")
    val r2 = Stats.youdenOptimalPpm(tie, "s", "y")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r2 == ((2L, 2L, 1L, 1000000L, 500000L, 500000L)), s"got $r2")
    // single-class labels → every point degenerate → one all-NULL row
    val one = Seq((1L, true), (2L, true)).toDF("s", "y")
    val r3 = Stats.youdenOptimalPpm(one, "s", "y")
      .as[(Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])].collect().head
    assert(r3._1.isEmpty && r3._6.isEmpty, s"got $r3")
  }

  test("cohensD2Milli: hand pooled effect size, sign lanes, degenerate NULL") {
    import spark.implicits._
    // A{2,4} vs B{0,2}: Δmean=2, pooled s²=2 → d=√2, d²=2 → 2000 milli
    val df = Seq((true, 2L), (true, 4L), (false, 0L), (false, 2L))
      .toDF("f", "v")
    val r = Stats.cohensD2Milli(df, "f", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r == ((2L, 2L, 1L, Some(2000L))), s"got $r")
    // flip the groups → sign −1, magnitude identical
    val inv = Stats.cohensD2Milli(
      df.select(not(col("f")).as("f"), col("v")), "f", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(inv._3 == -1L && inv._4.contains(2000L), s"got $inv")
    // equal means → sign 0, d² = 0
    val eq = Seq((true, 1L), (true, 3L), (false, 2L), (false, 2L))
      .toDF("f", "v")
    val re = Stats.cohensD2Milli(eq, "f", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(re._3 == 0L && re._4.contains(0L), s"got $re")
    // both groups constant → pooled variance 0 → NULL (even with a gap)
    val const = Seq((true, 5L), (true, 5L), (false, 3L), (false, 3L))
      .toDF("f", "v")
    assert(Stats.cohensD2Milli(const, "f", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
    // one-sided input → NULL
    val oneSide = Seq((true, 1L), (true, 2L)).toDF("f", "v")
    assert(Stats.cohensD2Milli(oneSide, "f", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("groupSequentialObfMilli: hand z² schedule, OBF boundary, " +
       "degenerate NULL, early crossing") {
    import spark.implicits._
    // look 1: A 9/10 vs B 1/10 → z² = (9·10−1·10)²·20/(10·10·10·10)
    //       = 12.8 → 12800 milli; bound 4162·2 div 1 = 8324 → crossed
    // look 2 adds A 0/10, B 0/10 → cum (9/20 vs 1/20):
    //   z² = 160²·40/(20·20·10·30) = 8.533… → 8533; bound 4162 → crossed
    val look1B = (1 to 9).map(_ => (1L, false, 0L)) ++ Seq((1L, false, 1L))
    val data = ((1 to 10).map(i => (1L, true, if (i <= 9) 1L else 0L)) ++
      look1B ++
      (1 to 10).map(_ => (2L, true, 0L)) ++
      (1 to 10).map(_ => (2L, false, 0L))).toDF("look", "arm", "hit")
    val r = Stats.groupSequentialObfMilli(data, "look", "arm", "hit",
        looks = 2)
      .orderBy("look")
      .as[(Long, Long, Long, Long, Long, Long, Option[Long], Long)]
      .collect().toSeq
    assert(r == Seq(
      (1L, 10L, 10L, 9L, 1L, 8324L, Some(12800L), 1L),
      (2L, 20L, 20L, 9L, 1L, 4162L, Some(8533L), 1L)), s"got $r")
    // Pocock: the same z² path against a FLAT bound — early looks are
    // cheaper to cross than OBF's (5823 < 8324 at look 1), the final
    // look pricier (5823 > 4162)
    val p = Stats.groupSequentialObfMilli(data, "look", "arm", "hit",
        looks = 2, zFinal2Milli = 5823L, schedule = "pocock")
      .orderBy("look").select("look", "bound2_milli", "crossed")
      .as[(Long, Long, Long)].collect().toSeq
    assert(p == Seq((1L, 5823L, 1L), (2L, 5823L, 1L)), s"got $p")
    // degenerate: empty arm at a look → NULL z², crossed 0
    val oneArm = Seq((1L, true, 1L), (1L, true, 0L)).toDF("look", "arm", "hit")
    val d = Stats.groupSequentialObfMilli(oneArm, "look", "arm", "hit",
        looks = 1)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long], Long)]
      .collect().head
    assert(d._7.isEmpty && d._8 == 0L, s"got $d")
    // out-of-range looks are filtered, never smeared into the schedule
    val oob = Seq((0L, true, 1L), (3L, false, 1L), (1L, true, 1L),
      (1L, false, 0L)).toDF("look", "arm", "hit")
    val o = Stats.groupSequentialObfMilli(oob, "look", "arm", "hit",
      looks = 2).orderBy("look").select("look", "na", "nb")
      .as[(Long, Long, Long)].collect().toSeq
    assert(o == Seq((1L, 1L, 1L)), s"got $o")
  }

  test("qiniCurveMilli: hand depths, no-control NULL, harmful negative") {
    // scores desc: (40 T y1) (30 C y0) | (20 T y0) (10 C y1), bins=2
    // depth1: Yt=1 Nc=1 Yc=0 → 1000; depth2: Yt=1·2−1·2 → 0
    val df = Seq((true, 1L, 40L), (false, 0L, 30L),
      (true, 0L, 20L), (false, 1L, 10L)).toDF("tr", "y", "s")
    val got = Stats.qiniCurveMilli(df, "tr", "y", "s", bins = 2)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, 1L, 0L, Some(1000L)),
      (2L, 2L, 2L, 1L, 1L, Some(0L))), s"got $got")
    // top depth all-treated → no controls yet → NULL; full depth
    // resolves
    val noc = Seq((true, 1L, 20L), (false, 0L, 10L)).toDF("tr", "y", "s")
    val g2 = Stats.qiniCurveMilli(noc, "tr", "y", "s", bins = 2)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(g2 == Seq((1L, 1L, 0L, 1L, 0L, None),
      (2L, 1L, 1L, 1L, 0L, Some(1000L))), s"got $g2")
    // harmful segment: control converts, treated doesn't → NEGATIVE
    // through the sign-magnitude lane
    val bad = Seq((true, 0L, 40L), (false, 1L, 30L)).toDF("tr", "y", "s")
    val g3 = Stats.qiniCurveMilli(bad, "tr", "y", "s", bins = 2)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(g3.last._6 == Some(-1000L), s"got $g3")
  }

  test("mdeProbeMicro: hand floor schedule, underpowered read") {
    // a=(10,20,30): var-num 3·1400−3600=600 → term=10⁶·600 div 18 =
    // 33333333; b=(10,20,30,40): 4·3000−10⁴=2000 → 10⁶·2000 div 48 =
    // 41666666; mde2 = 7849·74999999 div 1000 = 588674992
    // d = 1000·|60·4−100·3| div 12 = 5000 → diff2 = 25·10⁶ → 0
    val df = Seq((true, 10L), (true, 20L), (true, 30L),
      (false, 10L), (false, 20L), (false, 30L), (false, 40L))
      .toDF("f", "x")
    val r = Stats.mdeProbeMicro(df, "f", "x")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(r == ((3L, 4L, Some(588674992L), Some(25000000L), Some(0L))),
      s"got $r")
  }

  test("mdeProbeMicro: separated tight groups are powered; n<2 NULL") {
    // a=(1000,1001), b=(1,2): each var-num 1 → term 250000 per side,
    // mde2 = 7849·500000 div 1000 = 3924500; d = 1000·3996 div 4 =
    // 999000 → diff2 = 998001000000 ≥ mde2 → powered
    val sep = Seq((true, 1000L), (true, 1001L), (false, 1L),
      (false, 2L)).toDF("f", "x")
    val r = Stats.mdeProbeMicro(sep, "f", "x")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(r == ((2L, 2L, Some(3924500L), Some(998001000000L),
      Some(1L))), s"got $r")
    // a side has one row → every lane NULL
    val thin = Seq((true, 5L), (false, 1L), (false, 2L)).toDF("f", "x")
    val t = Stats.mdeProbeMicro(thin, "f", "x")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(t._1 == 1L && t._3.isEmpty && t._4.isEmpty && t._5.isEmpty,
      s"got $t")
  }

  test("quantileTreatmentEffect: constant shift reads at every decile," +
      " empty arm emits nothing") {
    // treated 10,20,…,100; control = treated − 5. Type-1 rule at
    // pm=k·100 with n=10: rank ⌈k⌉ → q_t = 10k, q_c = 10k − 5, so the
    // whole schedule is a flat qte = 5.
    val rows = (1 to 10).flatMap(i =>
      Seq((true, i * 10L), (false, i * 10L - 5L)))
    val probs = (1 to 9).map(i => (s"d$i", i * 100))
    val got = Stats.quantileTreatmentEffect(rows.toDF("arm", "v"),
        "arm", "v", probs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(got == (1 to 9).map(k =>
      (k * 100L, 10L, 10L, k * 10L, k * 10L - 5L, 5L)), s"got $got")
    // one-arm input: the inner per-mille join leaves nothing
    val oneArm = Seq((true, 1L), (true, 2L)).toDF("arm", "v")
    assert(Stats.quantileTreatmentEffect(oneArm, "arm", "v", probs)
      .count() == 0L)
    // duplicate-heavy: all values equal → every quantile is that value
    val flat = Seq((true, 7L), (true, 7L), (false, 7L)).toDF("arm", "v")
    val f = Stats.quantileTreatmentEffect(flat, "arm", "v",
        Seq(("p50", 500))).as[(Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(f == ((500L, 2L, 1L, 7L, 7L, 0L)), s"got $f")
  }
}
