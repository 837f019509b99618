package graft

import graft.functions.{JwOps, StringSimilarityFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler: textbook values, the rational-exactness
  * contract, eval/codegen parity, and agreement with an independent
  * driver-side double implementation. */
class StringSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Long =
    JwOps.ppm(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent float reference (the standard textbook formulation). */
  private def jwRef(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la); val bm = new Array[Boolean](lb)
    var m = 0
    for (i <- 0 until la) {
      val lo = math.max(0, i - window); val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bm(j) && a(i) == b(j)) { am(i) = true; bm(j) = true; m += 1; done = true }
        j += 1
      }
    }
    if (m == 0) return 0.0
    var k = 0; var bi = 0
    for (i <- 0 until la if am(i)) {
      while (!bm(bi)) bi += 1
      if (a(i) != b(bi)) k += 1
      bi += 1
    }
    val t = k / 2.0
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t) / m) / 3.0
    var l = 0
    while (l < 4 && l < la && l < lb && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1 - jaro)
  }

  test("textbook values, exact ppm") {
    assert(jw("MARTHA", "MARHTA") == 961111L)
    assert(jw("DIXON", "DICKSONX") == 813333L)
    assert(jw("same", "same") == 1000000L)
    assert(jw("", "") == 1000000L)
    assert(jw("abc", "") == 0L && jw("", "abc") == 0L)
    assert(jw("abc", "xyz") == 0L)
  }

  test("transpositions penalized less than substitutions; symmetry") {
    assert(jw("abcd", "abdc") == 933333L)
    assert(jw("abcd", "abxd") == 866666L)
    assert(jw("abcd", "abdc") > jw("abcd", "abxd"))
    val rnd = new scala.util.Random(23)
    val words = (0 until 50).map(_ =>
      (0 until 1 + rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString)
    for (a <- words.take(20); b <- words.take(20)) {
      assert(jw(a, b) == jw(b, a), s"asymmetric on ($a, $b)")
      // exact ppm agrees with the float reference to the rounding digit
      val ref = math.floor(jwRef(a, b) * 1e6).toLong
      assert(math.abs(jw(a, b) - ref) <= 1L, s"($a, $b): ${jw(a, b)} vs $ref")
    }
  }

  test("column path: codegen result equals the kernel; nulls propagate") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("graft", "graft"), (null, "x"))
      .toDF("a", "b")
      .repartition(2) // defeat ConvertToLocalRelation: force a real stage
      .withColumn("jw",
        StringSimilarityFunctions.jaroWinklerPpm(col("a"), col("b")))
    val got = df.collect()
      .map(r => Option(r.get(0)) -> Option(r.get(2))).toMap
    assert(got(Some("MARTHA")).contains(961111L))
    assert(got(Some("DWAYNE")).contains(jw("DWAYNE", "DUANE")))
    assert(got(Some("graft")).contains(1000000L))
    assert(got(None).isEmpty, "null input must yield null")
    // the kernel call appears inside a codegen'd (starred) stage —
    // inspect AFTER execution: AQE's pre-run plan hides codegen spans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"not codegen'd:\n$plan")
  }

  test("SQL registration: jaro_winkler_ppm callable from spark.sql") {
    graft.functions.VectorFunctions.registerSql(spark)
    Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .createOrReplaceTempView("jw_test")
    val r = spark.sql("SELECT jaro_winkler_ppm(a, b) AS jw FROM jw_test")
      .as[Long].head()
    assert(r == 961111L)
  }

  test("oversized input fails loud") {
    val big = "x" * 4001
    intercept[IllegalArgumentException](jw(big, "x"))
  }
}
