package graft

import graft.ops.Salting
import org.apache.spark.sql.functions._

/** ops/Salting — the salted join must be semantically invisible
  * (exact multiset equality with the plain join, duplicates included)
  * while actually spreading the hot key across salt sub-keys. */
class SaltingSpec extends SparkTestBase {
  import spark.implicits._

  // 5000 rows of hot key 0, a tail of 50 other keys — the skew shape
  private lazy val big = ((0 until 5000).map(i => (0L, i.toLong)) ++
    (1 to 50).flatMap(k => (0 until 20).map(i => (k.toLong, i.toLong))))
    .toDF("k", "payload")
  private lazy val small = (0L to 50L).map(k => (k, s"dim_$k"))
    .toDF("k", "name")

  private def asMultiset(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, String)].collect().toSeq
      .groupBy(identity).map { case (r, rs) => r -> rs.size }

  test("salted inner join equals the plain join as a multiset") {
    val salted = Salting.saltedEquiJoin(big, small, Seq("k"), 8)
    val plain = big.join(small, Seq("k"))
    assert(asMultiset(salted) == asMultiset(plain))
  }

  test("salted left join keeps unmatched big rows exactly once") {
    val bigger = big.unionByName(Seq((99L, 1L), (99L, 2L))
      .toDF("k", "payload"))
    val salted = Salting.saltedEquiJoin(bigger, small, Seq("k"), 8, "left")
    val plain = bigger.join(small, Seq("k"), "left")
    val sm = salted.as[(Long, Long, Option[String])].collect().toSeq
      .groupBy(identity).map { case (r, rs) => r -> rs.size }
    val pm = plain.as[(Long, Long, Option[String])].collect().toSeq
      .groupBy(identity).map { case (r, rs) => r -> rs.size }
    assert(sm == pm)
    assert(sm.get((99L, 1L, Option.empty[String])).contains(1))
  }

  test("duplicate keys on both sides preserve join multiplicity") {
    val l = Seq((1L, 10L), (1L, 10L), (1L, 11L)).toDF("k", "payload")
    val r = Seq((1L, "a"), (1L, "a"), (1L, "b"))
      .toDF("k", "name")
    val salted = Salting.saltedEquiJoin(l, r, Seq("k"), 4)
      .as[(Long, Long, String)].collect().toSeq
      .groupBy(identity).map { case (x, xs) => x -> xs.size }
    // 2 identical (1,10) rows × 2 identical (1,a) rows = 4, etc.
    assert(salted((1L, 10L, "a")) == 4)
    assert(salted((1L, 10L, "b")) == 2)
    assert(salted((1L, 11L, "a")) == 2)
    assert(salted((1L, 11L, "b")) == 1)
  }

  test("the hot key actually spreads across the salt space") {
    val salts = big.where($"k" === 0L)
      .withColumn("__salt",
        pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select($"__salt").distinct().as[Long].collect().toSet
    assert(salts.size == 8,
      s"5000 hot-key rows must reach all 8 salts, got ${salts.size}")
  }

  test("right/full joins and bad factors fail loud") {
    intercept[IllegalArgumentException] {
      Salting.saltedEquiJoin(big, small, Seq("k"), 8, "right")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedEquiJoin(big, small, Seq("k"), 0)
    }
    intercept[IllegalArgumentException] {
      Salting.saltedEquiJoin(big, small, Seq.empty, 8)
    }
  }
}
