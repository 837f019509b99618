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
}
