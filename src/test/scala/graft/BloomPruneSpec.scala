package graft

import graft.ops.BloomPrune
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  lazy val big = spark.range(0, 10000).select($"id".as("k"), ($"id" * 2).as("payload"))
  lazy val small = spark.range(0, 10000).filter($"id" % 37 === 0)
    .select($"id".as("sk"))

  test("pruned semi join equals the plain semi join") {
    val got = BloomPrune.semiJoinPruned(big, small, "k", "sk")
      .as[(Long, Long)].collect().toSet
    val ref = big.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(got == ref)
    assert(got.nonEmpty && got.size < 10000, "fixture must actually prune")
  }

  test("an undersized (high-FP) sketch still yields the exact result") {
    // 64 bits for 271 keys → FP rate near 1; the exact join must clean up
    val got = BloomPrune.semiJoinPruned(big, small, "k", "sk",
        expectedItems = 16, numBits = 64)
      .as[(Long, Long)].collect().toSet
    val ref = big.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("the sketch never false-negatives: every build key passes mightContain") {
    val bf = BloomPrune.bloomBytes(small, "sk", expectedItems = 1000, numBits = 1 << 14)
    val misses = small.filter(!BloomPrune.mightContain(bf, $"sk")).count()
    assert(misses == 0, "a Bloom filter must not drop true members")
  }

  test("the sketch actually filters: most non-members are rejected before the join") {
    val bf = BloomPrune.bloomBytes(small, "sk", expectedItems = 1000, numBits = 1 << 17)
    val passed = big.filter(BloomPrune.mightContain(bf, $"k")).count()
    val members = small.count()
    assert(passed < members * 2,
      s"sketch passed $passed of 10000 rows for $members members — not selective")
  }

  test("an empty build side yields an empty result, not a crash") {
    val none = small.filter($"sk" < 0)
    // the aggregate over zero rows returns a null sketch; might_contain
    // on a null bloom is null → the filter drops every row, and the
    // exact join agrees
    assert(BloomPrune.semiJoinPruned(big, none, "k", "sk").count() == 0)
  }

  test("mismatched key widths still match: int fact key vs long build key") {
    // xxhash64 is type-sensitive — without widening, every cross-type
    // match would be a bloom false negative and silently vanish
    val bInt = big.select($"k".cast("int").as("k"), $"payload")
    val got = BloomPrune.semiJoinPruned(bInt, small, "k", "sk")
      .as[(Int, Long)].collect().toSet
    val ref = bInt.join(small.select($"sk".as("k")), Seq("k"), "left_semi")
      .as[(Int, Long)].collect().toSet
    assert(got == ref && got.nonEmpty)
  }

  test("keys with no lossless common type are rejected, not silently empty") {
    val bStr = big.select($"k".cast("string").as("k"))
    val e = intercept[IllegalArgumentException] {
      BloomPrune.semiJoinPruned(bStr, small, "k", "sk")
    }
    assert(e.getMessage.contains("lossless common type"))
  }

  test("null keys on either side never match (SQL equality semantics)") {
    val b = Seq(Option(1L), Option(2L), None).toDF("k")
    val sm = Seq(Option(1L), None).toDF("sk")
    val got = BloomPrune.semiJoinPruned(b, sm, "k", "sk")
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(1L)))
  }

  test("sketch size is bounded by numBits, not by key count") {
    val few = BloomPrune.bloomBytes(small.limit(10), "sk", 1L << 16, 1L << 20)
    val many = BloomPrune.bloomBytes(big.select($"k".as("sk")), "sk", 1L << 16, 1L << 20)
    assert(math.abs(few.length - many.length) <= 16,
      s"serialized sketch must be ~numBits/8 regardless of input (${few.length} vs ${many.length})")
    assert(many.length <= (1 << 20) / 8 + 64)
  }

  test("the probe plans as a scan-side filter, not a join") {
    val bf = BloomPrune.bloomBytes(small, "sk", 1000, 1 << 14)
    val plan = big.filter(BloomPrune.mightContain(bf, $"k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("Filter"),
      s"expected a filter with the bloom probe:\n${plan.take(400)}")
    assert(!plan.contains("Join"), "the probe itself must not plan a join")
  }
}
