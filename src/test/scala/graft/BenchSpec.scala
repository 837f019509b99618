package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the one contract Bench has with the driver: the emitted JSON
  * line must fit the driver's 2000-byte stdout tail window. Rounds 3–5
  * each shipped a line that missed by a shrinking margin (r5: 2022 vs
  * 2000), so this spec serializes the WORST-CASE line over the real
  * SparkEntry.queries key set through the production serializer and
  * pins it under 1900 bytes — adding queries now fails here first,
  * not in the driver's `parsed: null`.
  */
class BenchSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("numeric short keys are unique across all registered queries") {
    val keys = names.map(Bench.shortKey)
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate bench keys: ${dups.mkString(",")}")
    assert(keys.forall(_.matches("\\d+")), "query names must start qNN_")
  }

  test("worst-case serialized bench line stays under 1980 bytes") {
    // worst case: every query at the 999-ds clamp (the serializer caps
    // values there, so no wider line exists), a 3-decimal total, AND 4
    // failures (the failed-list cap). Budget history: guard was 1900
    // at 168 queries; the failed cap moved 8→4 to fund round-7 query
    // growth; the `q` key prefix was dropped at 178 queries; at 197
    // queries the per-entry key syntax itself went — values are now one
    // csv in numeric-ascending short-key order (keys implicit), which
    // holds ~400 queries at the 999 clamp.
    val worst = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i < 4) -1L else 999999L) }
    val line = Bench.serialize(worst, 9999.999, "/root/testdata/sf0.1", reps = 3)
    assert(line.length < 1980,
      s"bench line ${line.length}B would overflow the driver's 2000B tail window")
    assert(!line.contains("9999,") && line.contains("999"),
      "per-query values must clamp at 999 ds by construction")
  }

  test("serializer emits the driver contract fields with sf basename") {
    val line = Bench.serialize(Seq("q27_minhash_pairs" -> -1L, "q0_flagship" -> 13L),
      1.312, "/root/testdata/sf0.1", reps = 3)
    assert(line ==
      """{"metric":"total","value":1.312,"unit":"sec","qunit":"ds","reps":3,""" +
        """"nfail":1,"failed":["27"],"qorder":"numeric-asc",""" +
        """"qds":"13,-1","sf":"sf0.1"}""")
  }

  test("qds csv aligns with short keys sorted numerically, not lexically") {
    // q2 must sort before q10 (2 < 10) even though "10" < "2" lexically
    val line = Bench.serialize(
      Seq("q10_ntile" -> 3L, "q2_join_agg" -> 7L, "q1_agg" -> 5L),
      0.0, "/x/sf0.01", reps = 1)
    assert(line.contains(""""qds":"5,7,3""""), line)
  }

  test("failed list caps at 4 keys so a catastrophic run still fits the window") {
    val allFail = names.map(_ -> -1L)
    val line = Bench.serialize(allFail, 0.0, "/root/testdata/sf0.1", reps = 3)
    assert(line.length < 1900, s"all-fail line ${line.length}B overflows")
    assert(line.contains(s""""nfail":${names.size}"""))
  }
}
