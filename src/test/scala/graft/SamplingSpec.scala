package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  lazy val ids = spark.range(0, 10000).select($"id")

  test("split assignment is a pure function of the id: stable across reruns and repartitioning") {
    val a = Sampling.assignSplits(ids, Sampling.xxKey($"id"),
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
      .as[(Long, String)].collect().toMap
    val b = Sampling.assignSplits(ids.repartition(17), Sampling.xxKey($"id"),
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
      .as[(Long, String)].collect().toMap
    assert(a == b, "assignment must not depend on partitioning")
  }

  test("per-mille weights hold approximately and splits are exhaustive+disjoint") {
    val counts = Sampling.assignSplits(ids, Sampling.xxKey($"id"),
        Seq("train" -> 900, "val" -> 50, "test" -> 50))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 9000) < 300)
    assert(math.abs(counts("val") - 500) < 150)
    assert(math.abs(counts("test") - 500) < 150)
  }

  test("appending new rows never migrates existing assignments") {
    val first = Sampling.assignSplits(spark.range(0, 1000).select($"id"),
        Sampling.xxKey($"id"), Seq("train" -> 900, "val" -> 100))
      .as[(Long, String)].collect().toMap
    val grown = Sampling.assignSplits(spark.range(0, 5000).select($"id"),
        Sampling.xxKey($"id"), Seq("train" -> 900, "val" -> 100))
      .as[(Long, String)].collect().toMap
    assert(first.forall { case (id, s) => grown(id) == s })
  }

  test("sampleByHash keeps a stable subset of the requested size") {
    val kept = Sampling.sampleByHash(ids, Sampling.xxKey($"id"), 100)
      .as[Long].collect().toSet
    assert(math.abs(kept.size - 1000) < 150)
    val again = Sampling.sampleByHash(ids.repartition(5), Sampling.xxKey($"id"), 100)
      .as[Long].collect().toSet
    assert(kept == again)
    // nested sampling property: a smaller fraction is a subset
    val fewer = Sampling.sampleByHash(ids, Sampling.xxKey($"id"), 50)
      .as[Long].collect().toSet
    assert(fewer.subsetOf(kept))
  }

  test("weights must be positive per-mille summing to 1000; output collision rejected") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(ids, Sampling.xxKey($"id"), Seq("a" -> 999))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(ids.withColumn("split", lit("x")),
        Sampling.xxKey($"id"), Seq("a" -> 1000))
    }
  }

  test("stratified sampling applies per-stratum rates; stays stable under re-weighting") {
    val rows = spark.range(0, 9000)
      .select($"id", concat(lit("s"), pmod($"id", lit(3))).as("stratum"))
    val kept = Sampling.stratifiedSampleByHash(rows, Sampling.xxKey($"id"),
        $"stratum", Seq("s0" -> 1000, "s1" -> 200), defaultPerMille = 0)
      .as[(Long, String)].collect()
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum.getOrElse("s0", 0) == 3000, "rate 1000 keeps everything")
    assert(byStratum.get("s2").isEmpty, "default 0 drops the unmapped stratum")
    assert(math.abs(byStratum("s1") - 600) < 150, s"rate 200 ≈ 600 rows, got $byStratum")
    // re-weighting s1 upward only ADDS rows — survivors never churn
    val wider = Sampling.stratifiedSampleByHash(rows, Sampling.xxKey($"id"),
        $"stratum", Seq("s0" -> 1000, "s1" -> 500), defaultPerMille = 0)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(kept.map(_._1).toSet.subsetOf(wider))
  }

  test("mixture sampling derives per-group rates from target shares; clamps oversubscribed groups") {
    // groups: g0 = 6000 rows, g1 = 2000, g2 = 1000, plus g3 absent from
    // the shares and some null-group rows
    val rows = spark.range(0, 9000)
      .select($"id", when(pmod($"id", lit(10)) === 9, lit(null).cast("string"))
        .otherwise(concat(lit("g"),
          when($"id" % 9 < 6, 0).when($"id" % 9 < 8, 1).otherwise(2))).as("g"))
    // target 1000 rows at shares 50% g0 / 30% g1 / 20% g2:
    // rate_g0 = 500*1000/6000 ≈ 83, rate_g1 = 300*1000/2000 = 150,
    // rate_g2 = 200*1000/1000 = 200 per-mille
    val kept = Sampling.sampleToMixture(rows, Sampling.xxKey($"id"), $"g",
        Seq("g0" -> 500, "g1" -> 300, "g2" -> 200), targetTotal = 1000L)
      .as[(Long, String)].collect()
    val by = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!by.contains(null) && !by.keys.exists(_ == "g3"),
      "null and unshared groups are dropped")
    // binomial tolerance: expected 450/270/180 of the non-null population
    assert(math.abs(by("g0") - 450) < 120, s"g0 ≈ 450, got $by")
    assert(math.abs(by("g1") - 270) < 100, s"g1 ≈ 270, got $by")
    assert(math.abs(by("g2") - 180) < 90, s"g2 ≈ 180, got $by")
    // a group whose target exceeds its population keeps everything
    val small = spark.range(0, 1100)
      .select($"id", when($"id" < 100, "rare").otherwise("big").as("g"))
    val clamped = Sampling.sampleToMixture(small, Sampling.xxKey($"id"), $"g",
        Seq("rare" -> 500, "big" -> 500), targetTotal = 400L)
      .as[(Long, String)].collect()
    assert(clamped.count(_._2 == "rare") == 100,
      "oversubscribed group clamps to keep-all")
    // membership is a pure function of the id: raising the target only
    // ever ADDS rows (same stability contract as the stratified sampler)
    val keptSet = kept.map(_._1).toSet
    val wider = Sampling.sampleToMixture(rows, Sampling.xxKey($"id"), $"g",
        Seq("g0" -> 500, "g1" -> 300, "g2" -> 200), targetTotal = 2000L)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(keptSet.subsetOf(wider), "survivors never churn as the target grows")
    // contract validation
    intercept[IllegalArgumentException] {
      Sampling.sampleToMixture(rows, Sampling.xxKey($"id"), $"g",
        Seq("g0" -> 999), targetTotal = 10L)
    }
    intercept[IllegalArgumentException] {
      Sampling.sampleToMixture(rows, Sampling.xxKey($"id"), $"g",
        Seq("g0" -> 500, "g0" -> 500), targetTotal = 10L)
    }
  }

  test("weighted mixture derives rates from weight sums, not row counts") {
    // two groups with EQUAL row counts but 10× different weights: a
    // count-based mixture would give them equal rates; the weighted
    // form must downsample the heavy group 10× harder
    val rows = spark.range(0, 2000)
      .select($"id", when($"id" % 2 === 0, "heavy").otherwise("light").as("g"),
        when($"id" % 2 === 0, 100L).otherwise(10L).as("w"))
    // weights: heavy = 100k, light = 10k. target 10k at 50/50 shares →
    // rate_heavy = 5000*1000/100000 = 50‰, rate_light = 5000*1000/10000
    // = 500‰ — kept WEIGHT ≈ 5k each despite the 10× row asymmetry
    val kept = Sampling.sampleToMixtureWeighted(rows, Sampling.xxKey($"id"),
        $"g", $"w", Seq("heavy" -> 500, "light" -> 500), targetWeight = 10000L)
      .as[(Long, String, Long)].collect()
    val wBy = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(math.abs(wBy("heavy") - 5000L) < 2500, s"heavy weight ≈ 5k, got $wBy")
    assert(math.abs(wBy("light") - 5000L) < 2500, s"light weight ≈ 5k, got $wBy")
    // oversubscribed on WEIGHT clamps to keep-all
    val clamped = Sampling.sampleToMixtureWeighted(rows, Sampling.xxKey($"id"),
        $"g", $"w", Seq("heavy" -> 500, "light" -> 500), targetWeight = 30000L)
      .as[(Long, String, Long)].collect()
    assert(clamped.count(_._2 == "light") == 1000,
      "light's 15k budget exceeds its 10k population → keep-all")
    // a zero-weight group has nothing to budget and is dropped
    val zero = rows.withColumn("w", when($"g" === "light", 0L).otherwise($"w"))
    val z = Sampling.sampleToMixtureWeighted(zero, Sampling.xxKey($"id"),
        $"g", $"w", Seq("heavy" -> 500, "light" -> 500), targetWeight = 10000L)
      .as[(Long, String, Long)].collect()
    assert(!z.exists(_._2 == "light"), "zero-weight group must drop, not divide by zero")
    // survivors never churn as the target grows
    val keptSet = kept.map(_._1).toSet
    val wider = Sampling.sampleToMixtureWeighted(rows, Sampling.xxKey($"id"),
        $"g", $"w", Seq("heavy" -> 500, "light" -> 500), targetWeight = 20000L)
      .as[(Long, String, Long)].collect().map(_._1).toSet
    assert(keptSet.subsetOf(wider))
    // plan shape: counts join + map-only filter, no window
    val plan = Sampling.sampleToMixtureWeighted(rows, Sampling.xxKey($"id"),
        $"g", $"w", Seq("heavy" -> 500, "light" -> 500), targetWeight = 10000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "weighted mixture must not plan a window")
    assert(plan.contains("partial_sum"), "weight sums must combine map-side")
  }

  test("temperature sampling flattens head groups toward n^alpha; alpha=1 is proportional") {
    // head = 8000 rows, mid = 1500, tail = 500: at alpha=0.5 the kept
    // sizes go as sqrt(n) → sqrt ratios 89.4 : 38.7 : 22.4 ≈ 59/26/15%
    // of the target, vs 80/15/5% raw
    val rows = spark.range(0, 10000)
      .select($"id", when($"id" < 8000, "head")
        .when($"id" < 9500, "mid").otherwise("tail").as("g"))
    val kept = Sampling.sampleToTemperature(rows, Sampling.xxKey($"id"),
        $"g", alpha = 0.5, targetTotal = 2000L)
      .as[(Long, String)].collect()
    val by = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // expected ≈ 2000 · sqrt share: head ≈ 1188, mid ≈ 514, tail ≈ 297
    assert(math.abs(by("head") - 1188) < 200, s"head ≈ 1188, got $by")
    assert(math.abs(by("mid") - 514) < 130, s"mid ≈ 514, got $by")
    assert(math.abs(by("tail") - 297) < 100, s"tail ≈ 297, got $by")
    // flattening: head's kept share < raw share, tail's kept share > raw
    val tot = kept.length.toDouble
    assert(by("head") / tot < 0.8 && by("tail") / tot > 0.05,
      s"alpha=0.5 must flatten the mixture, got $by")
    // alpha = 1: n^1 = n → k_g ∝ n → every rate equals target/total —
    // proportional downsampling, no flattening
    val prop = Sampling.sampleToTemperature(rows, Sampling.xxKey($"id"),
        $"g", alpha = 1.0, targetTotal = 2000L)
      .as[(Long, String)].collect()
    val byP = prop.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(byP("head") - 1600) < 200, s"alpha=1 head ≈ 1600, got $byP")
    assert(math.abs(byP("tail") - 100) < 60, s"alpha=1 tail ≈ 100, got $byP")
    // survivors never churn as the target grows (pure-key membership)
    val wider = Sampling.sampleToTemperature(rows, Sampling.xxKey($"id"),
        $"g", alpha = 0.5, targetTotal = 4000L)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(kept.map(_._1).toSet.subsetOf(wider),
      "survivors never churn as the target grows")
    // null groups drop; a target above the population clamps keep-all
    val withNull = spark.range(0, 1000).select($"id",
      when($"id" % 10 === 9, lit(null).cast("string")).otherwise("g").as("g"))
    val keptN = Sampling.sampleToTemperature(withNull, Sampling.xxKey($"id"),
        $"g", alpha = 0.5, targetTotal = 5000L)
      .as[(Long, String)].collect()
    assert(keptN.forall(_._2 == "g"), "null-group rows are dropped")
    assert(keptN.length == 900, "oversubscribed target clamps to keep-all")
    // contract validation
    intercept[IllegalArgumentException] {
      Sampling.sampleToTemperature(rows, Sampling.xxKey($"id"), $"g",
        alpha = 0.0, targetTotal = 10L)
    }
    intercept[IllegalArgumentException] {
      Sampling.sampleToTemperature(rows, Sampling.xxKey($"id"), $"g",
        alpha = 1.5, targetTotal = 10L)
    }
  }

  test("salted lcg keys decorrelate decisions drawn from the same id") {
    val keys = ids.select($"id",
        Sampling.lcgKey($"id").as("k0"),
        Sampling.lcgKey($"id", salt = 777L).as("k1"))
      .as[(Long, Long, Long)].collect()
    assert(keys.forall { case (_, k0, k1) => k0 >= 0 && k0 < 1000 && k1 >= 0 && k1 < 1000 })
    // composing sample(keep k0<250) with split(k1<900) must NOT send
    // every surviving row to one split — the unsalted composition would
    val kept = keys.filter(_._2 < 250)
    val trainFrac = kept.count(_._3 < 900).toDouble / kept.length
    assert(math.abs(trainFrac - 0.9) < 0.05,
      s"salted split must stay ~900 per-mille among sampled rows, got $trainFrac")
  }

  test("property: salted key pairs pass a chi-square independence test; additive salting fails it") {
    // the round-4 trap, pinned as a statistical property so it can never
    // silently regress: keys drawn from the same id under different
    // salts must be jointly uniform. 10x10 decile contingency table over
    // 100k ids, X² = Σ (obs - exp)²/exp with exp from the marginals;
    // df = 81, so X² ≲ 124 at α = 0.001 — threshold 150 is generous for
    // a correct key and astronomically far below any correlated one.
    val n = 100000L
    val big = spark.range(n).toDF("id")
    def chi2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): Double = {
      val cells = big.select((a / 100).cast("int").as("da"), (b / 100).cast("int").as("db"))
        .groupBy("da", "db").count()
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val rowT = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val colT = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      (for (ra <- rowT.keys; cb <- colT.keys) yield {
        val exp = rowT(ra).toDouble * colT(cb) / n
        val obs = cells.getOrElse((ra, cb), 0L).toDouble
        (obs - exp) * (obs - exp) / exp
      }).sum
    }
    for ((s1, s2) <- Seq((0L, 777L), (777L, 12345L), (42L, 43L))) {
      val x2 = chi2(Sampling.lcgKey($"id", s1), Sampling.lcgKey($"id", s2))
      assert(x2 < 150.0, s"salts ($s1, $s2): X² = $x2 — keys are correlated")
    }
    // power check: the ADDITIVE-only "salt" (the round-4 bug — a shifted
    // residue survives mod 1000 as a near-rotation) must blow the same
    // statistic up by orders of magnitude, proving the test can detect
    // exactly the failure it exists to prevent
    val additive = pmod(
      pmod(($"id" + lit(777L)) * lit(1103515245L) + lit(12345L), lit(1000000007L)),
      lit(1000L))
    val broken = chi2(Sampling.lcgKey($"id", 0L), additive)
    assert(broken > 10000.0,
      s"additive salting must register as correlated, got X² = $broken")
  }

  test("stratified rates are validated") {
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSampleByHash(ids.withColumn("st", lit("a")),
        Sampling.xxKey($"id"), $"st", Seq("a" -> 1001))
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSampleByHash(ids.withColumn("st", lit("a")),
        Sampling.xxKey($"id"), $"st", Seq("a" -> 500, "a" -> 600))
    }
  }

  test("assignment is map-only: no shuffle in the plan") {
    val plan = Sampling.assignSplits(ids, Sampling.xxKey($"id"),
        Seq("train" -> 900, "val" -> 100))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split assignment must not shuffle:\n$plan")
  }

  // ---- capPerGroupExact -------------------------------------------

  lazy val grouped = spark.range(0, 3000)
    .select($"id", (
      when($"id" < 2000, lit("big"))          // 2000 rows
        .when($"id" < 2900, lit("mid"))       // 900 rows
        .otherwise(lit("small"))).as("g"))    // 100 rows

  test("capPerGroupExact keeps exactly min(n_g, N) rows per group, the N smallest keys") {
    val capped = Sampling.capPerGroupExact(grouped,
      Sampling.lcgKeyRaw($"id"), $"g", $"id", maxPerGroup = 500)
    val counts = capped.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 500L, "mid" -> 500L, "small" -> 100L))
    // exactly the window-rank reference rows, not just the right counts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy(Sampling.lcgKeyRaw($"id"), $"id")
    val ref = grouped.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 500).select($"id").as[Long].collect().toSet
    assert(capped.select($"id").as[Long].collect().toSet == ref)
  }

  test("capPerGroupExact descending keeps the LARGEST keys (best-N retention)") {
    val best = Sampling.capPerGroupExact(grouped, $"id", $"g", $"id",
      maxPerGroup = 3, ascending = false)
      .select($"g", $"id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
    assert(best("big") == Set(1999L, 1998L, 1997L))
    assert(best("mid") == Set(2899L, 2898L, 2897L))
    assert(best("small") == Set(2999L, 2998L, 2997L))
  }

  test("capPerGroupExact: NULL groups are capped as their own group; NULL keys drop") {
    val df = spark.range(0, 100).select($"id",
      when($"id" % 2 === 0, lit("a")).otherwise(lit(null: String)).as("g"),
      when($"id" < 90, $"id").as("k"))
    val capped = Sampling.capPerGroupExact(df, $"k", $"g", $"id", maxPerGroup = 10)
    val byG = capped.groupBy("g").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byG == Map(Some("a") -> 10L, None -> 10L))
    // the 10 smallest non-null keys of each group — never a null-key row
    assert(capped.select($"id").as[Long].collect().toSet ==
      ((0L until 20L).filter(_ % 2 == 0) ++ (1L until 20L by 2)).toSet)
  }

  test("capPerGroupExact is partition-independent and validates its cap") {
    val a = Sampling.capPerGroupExact(grouped,
      Sampling.lcgKeyRaw($"id"), $"g", $"id", 37).select($"id").as[Long].collect().toSet
    val b = Sampling.capPerGroupExact(grouped.repartition(13),
      Sampling.lcgKeyRaw($"id"), $"g", $"id", 37).select($"id").as[Long].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Sampling.capPerGroupExact(grouped, $"id", $"g", $"id", 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.capPerGroupExact(grouped, $"id", $"g", $"id", (1 << 20) + 1)
    }
  }

  test("waterFillBudget hits the budget exactly, small groups keep all, level is even") {
    // groups: 10, 100, 1000, 1000 rows
    val df = spark.range(0, 2110).select($"id",
      when($"id" < 10, "tiny").when($"id" < 110, "small")
        .when($"id" < 1110, "bigA").otherwise("bigB").as("g"))
    val kept = Sampling.waterFillBudget(df, Sampling.lcgKeyRaw($"id"), $"g",
      $"id", totalBudget = 500L)
    val byG = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    // λ = (500-10)/3 = 163 (< 1000 after tiny absorbed); wait: walk:
    // sorted [10,100,1000,1000]; cand=125>=10 → cand=(490)/3=163>=100 →
    // cand=(390)/2=195<1000 → λ=195, spent=110+390=500, extra 0
    assert(byG == Map("tiny" -> 10L, "small" -> 100L,
      "bigA" -> 195L, "bigB" -> 195L))
    assert(byG.values.sum == 500L)
  }

  test("waterFillBudget distributes the remainder to the first capped groups; over-budget keeps all") {
    val df = spark.range(0, 300).select($"id",
      (concat(lit("g"), ($"id" % 3).cast("string"))).as("g"))  // 100 each
    val kept = Sampling.waterFillBudget(df, Sampling.lcgKeyRaw($"id"), $"g",
      $"id", totalBudget = 200L)
    // λ = 66, spent 198, extra 2 → g0,g1 keep 67; g2 keeps 66
    val byG = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG == Map("g0" -> 67L, "g1" -> 67L, "g2" -> 66L))
    // membership is the capPerGroupExact rule: smallest (key, id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy(Sampling.lcgKeyRaw($"id"), $"id")
    val ranked = df.withColumn("rn", row_number().over(w))
    val expect = ranked.filter(($"g" =!= "g2" && $"rn" <= 67) ||
        ($"g" === "g2" && $"rn" <= 66))
      .select($"id").as[Long].collect().toSet
    assert(kept.select($"id").as[Long].collect().toSet == expect)
    assert(Sampling.waterFillBudget(df, Sampling.lcgKeyRaw($"id"), $"g",
      $"id", totalBudget = 300L).count() == 300L)
    assert(Sampling.waterFillBudget(df, Sampling.lcgKeyRaw($"id"), $"g",
      $"id", totalBudget = 0L).count() == 0L)
  }

  test("waterFillBudget caps NULL groups as their own group, partition-independent") {
    val df = spark.range(0, 200).select($"id",
      when($"id" % 2 === 0, "a").otherwise(lit(null: String)).as("g"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.waterFillBudget(d, Sampling.lcgKeyRaw($"id"), $"g", $"id", 100L)
    val byG = run(df).groupBy("g").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byG == Map(Some("a") -> 50L, None -> 50L))
    assert(run(df).select($"id").as[Long].collect().toSet ==
      run(df.repartition(11)).select($"id").as[Long].collect().toSet)
  }

  test("capPerGroupExact plans a partial aggregate, never a window") {
    val plan = Sampling.capPerGroupExact(grouped,
        Sampling.lcgKeyRaw($"id"), $"g", $"id", 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("windowspecdefinition"),
      s"exact cap must not plan a window:\n$plan")
    assert(plan.contains("partial_bottomklong"),
      s"quota buffers must combine map-side:\n$plan")
  }

  test("epochOrders: each epoch a distinct permutation, deterministic, guarded") {
    val df = (1L to 200L).toList.toDF("id")
    val got = Sampling.epochOrders(df, $"id", epochs = 3)
      .select($"id", $"epoch", $"epoch_rank")
      .as[(Long, Int, Long)].collect()
    assert(got.length == 600)
    val byEpoch = got.groupBy(_._2)
    // every epoch is a full permutation of 1..200
    (1 to 3).foreach { e =>
      assert(byEpoch(e).map(_._3).sorted.toSeq == (1L to 200L),
        s"epoch $e is not a permutation")
    }
    // epochs genuinely reshuffle: the same id gets different ranks
    val r1 = byEpoch(1).map(r => r._1 -> r._3).toMap
    val r2 = byEpoch(2).map(r => r._1 -> r._3).toMap
    assert((1L to 200L).count(i => r1(i) != r2(i)) > 150,
      "epoch orders must differ for most rows")
    // deterministic across partitionings
    val again = Sampling.epochOrders(df.repartition(7), $"id", epochs = 3)
      .select($"id", $"epoch", $"epoch_rank")
      .as[(Long, Int, Long)].collect().toSet
    assert(again == got.toSet)
    intercept[IllegalArgumentException] {
      Sampling.epochOrders(df.withColumn("epoch", lit(1)), $"id", 2)
    }
    intercept[IllegalArgumentException] {
      Sampling.epochOrders(df, $"id", epochs = 0)
    }
  }

  test("systematicPps: sample points land exactly, heavy rows repeat") {
    // weights: 3,4,10,1,2 → cums 3,7,17,18,20; stride 5, phase 5 →
    // points at 5,10,15,20. id1 covers (0,3] none; id2 (3,7] → {5};
    // id3 (7,17] → {10,15} = 2 copies; id4 (17,18] none; id5 (18,20] → {20}
    val df = Seq((1L, 3L), (2L, 4L), (3L, 10L), (4L, 1L), (5L, 2L))
      .toDF("id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.systematicPps(d, Seq($"id"), "w", stride = 5L, phase = 5L)
        .select($"id", $"cum", $"copies")
        .as[(Long, Long, Long)].collect().toSet
    val got = run(df)
    assert(got == Set((2L, 7L, 1L), (3L, 17L, 2L), (5L, 20L, 1L)))
    // total copies == number of sample points ≤ total weight / stride
    assert(got.toSeq.map(_._3).sum == 4L)
    // partitioning-invariant (prefix sum is range-partition + offsets)
    assert(run(df.repartition(7)) == got)
    // phase=1 shifts the lattice: points 1,6,11,16 → id1 {1}, id2 {6},
    // id3 {11,16}, id4/id5 none
    val shifted = Sampling.systematicPps(df, Seq($"id"), "w", 5L, 1L)
      .select($"id", $"copies").as[(Long, Long)].collect().toSet
    assert(shifted == Set((1L, 1L), (2L, 1L), (3L, 2L)))
    // zero-weight rows are never sampled, never shift the lattice
    val withZero = Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("id", "w")
    val z = Sampling.systematicPps(withZero, Seq($"id"), "w", 5L, 5L)
      .select($"id", $"copies").as[(Long, Long)].collect().toSet
    assert(z == Set((2L, 1L)))
    intercept[IllegalArgumentException] {
      Sampling.systematicPps(df, Seq($"id"), "w", 0L, 1L)
    }
    intercept[IllegalArgumentException] {
      Sampling.systematicPps(df, Seq($"id"), "w", 5L, 6L)
    }
  }

  test("sequentialPoissonSample: exact k per group, weight-sensitive, stable") {
    // 200 rows per group: 100 heavy (w=1000) + 100 light (w=1)
    val rows = for (g <- Seq("a", "b"); i <- 0 until 200) yield
      (g, (if (g == "a") 0 else 1000) + i.toLong,
        if (i < 100) 1000L else 1L)
    val df = rows.toDF("g", "id", "w")
    val got = Sampling.sequentialPoissonSample(df, $"g", $"id", "w", 40)
      .as[(String, Long, Long)].collect()
    assert(got.groupBy(_._1).forall(_._2.length == 40),
      "exactly k survivors per group")
    val heavyShare = got.count(_._3 == 1000L)
    assert(heavyShare >= 70, // E[heavy] ≈ 80 of 80: w-ratio 1000:1
      s"heavy rows must dominate the πps sample, got $heavyShare/80")
    // deterministic in the ids, not the layout
    val again = Sampling.sequentialPoissonSample(
        df.repartition(13), $"g", $"id", "w", 40)
      .as[(String, Long, Long)].collect()
    assert(got.sortBy(_._2).sameElements(again.sortBy(_._2)))
    // groups smaller than k keep everything; w <= 0 and NULL never enter
    val small = Seq(("s", 1L, Some(5L)), ("s", 2L, Some(0L)),
      ("s", 3L, None)).toDF("g", "id", "w")
    val kept = Sampling.sequentialPoissonSample(small, $"g", $"id", "w", 10)
      .as[(String, Long, Option[Long])].collect()
    assert(kept.map(_._2).toSet == Set(1L))
  }
}
