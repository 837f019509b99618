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

  test("assignment is map-only: no shuffle in the plan") {
    val plan = Sampling.assignSplits(ids, Sampling.xxKey($"id"),
        Seq("train" -> 900, "val" -> 100))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split assignment must not shuffle:\n$plan")
  }
}
