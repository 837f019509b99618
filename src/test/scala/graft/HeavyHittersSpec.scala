package graft

import graft.ops.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("sketch guarantee: every item with partition count > n/k is tracked") {
    // adversarial stream: 5 heavy items interleaved with 5000 distinct
    // light ones that constantly churn the counters
    val heavy = (1 to 5).flatMap(h => Seq.fill(400)(s"heavy$h"))
    val light = (1 to 5000).map(i => s"light$i")
    val stream = new scala.util.Random(7).shuffle(heavy ++ light)
    val k = 64   // n = 7000, n/k ≈ 109 < 400 → all heavies must survive
    val tracked = HeavyHitters.sketchItems(stream.iterator, k).toSet
    assert(tracked.size <= k)
    assert((1 to 5).forall(h => tracked.contains(s"heavy$h")),
      s"lost a guaranteed heavy hitter; tracked ${tracked.size}")
  }

  test("end-to-end equals the exact groupBy/HAVING on real documents") {
    val words = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(explode(split($"text", " ")).as("w")).as[String]
    val exact = words.toDF("w").groupBy("w").count()
      .filter($"count" >= 20)
      .as[(String, Long)].collect().toMap
    val got = HeavyHitters.heavyHitters(words, minCount = 20)
      .as[(String, Long)].collect().toMap
    assert(got == exact)
    assert(got.nonEmpty, "fixture must contain heavy hitters")
  }

  test("explicit small k still yields exact counts for surviving items (precision by recount)") {
    val words = (Seq.fill(500)("a") ++ Seq.fill(300)("b") ++
      (1 to 200).map(i => s"x$i")).toDS()
    // k=8 → n/k = 125: both a (500) and b (300) guaranteed
    val got = HeavyHitters.heavyHitters(words, minCount = 300, k = 8)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 500L, "b" -> 300L))
  }

  test("derived k clamps to [1024, 2^27] without int overflow") {
    assert(HeavyHitters.deriveK(100L, 1L) == 1024)
    // 4n/minCount ≥ 2^31 — the regime that used to overflow Int
    val big = HeavyHitters.deriveK(Long.MaxValue / 8, 1L)
    assert(big == HeavyHitters.MaxK && big > 0)
    assert(HeavyHitters.deriveK(1L << 40, 1L << 20) == (1L << 22).toInt)
  }

  test("oversized candidate sets fall back to a planner-chosen join (no forced broadcast)") {
    val words = (Seq.fill(500)("a") ++ Seq.fill(300)("b") ++
      (1 to 200).map(i => s"x$i")).toDS()
    // broadcastLimit=0 forces the fallback path; result must be identical
    val got = HeavyHitters.heavyHitters(words, minCount = 300, k = 8,
        broadcastLimit = 0L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 500L, "b" -> 300L))
  }

  test("explicit k beyond the sketch-memory cap is rejected") {
    val words = Seq("a").toDS()
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(words, minCount = 1, k = HeavyHitters.MaxK + 1)
    }
  }
}
