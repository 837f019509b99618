package graft

import graft.ops.Profiler
import org.apache.spark.sql.functions._

/** ops/Profiler — ANALYZE-style column report on a hand-built frame. */
class ProfilerSpec extends SparkTestBase {
  import spark.implicits._

  test("profileColumns: nulls, distincts, native-order min/max, modal ties") {
    val df = Seq(
      (10L, Some("b"), "x"),
      (9L, Some("a"), "x"),
      (100L, None, "y"),
      (9L, Some("a"), "z")
    ).toDF("k", "s", "t")
    val got = Profiler.profileColumns(df, Seq("k", "s", "t"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    // k: native numeric order → min 9, max 100 (lexicographic would
    // say min "10", max "9"); mode 9 (count 2)
    assert(got("k") == (("k", 4L, 0L, 3L, "9", "100", "9", 2L)))
    assert(got("s") == (("s", 4L, 1L, 2L, "a", "b", "a", 2L)))
    // t: counts x=2, y=1, z=1 → mode x
    assert(got("t") == (("t", 4L, 0L, 3L, "x", "z", "x", 2L)))
    // modal tie breaks toward the larger rendered value
    val tie = Seq("p", "p", "q", "q").toDF("c")
    val m = Profiler.profileColumns(tie, Seq("c"))
      .select($"top_value", $"top_count").as[(String, Long)].collect().head
    assert(m == (("q", 2L)))
    // all-null column: distinct 0, no modal value
    val nulls = Seq[Option[String]](None, None).toDF("c")
    val nn = Profiler.profileColumns(nulls, Seq("c"))
      .as[(String, Long, Long, Long, Option[String], Option[String],
        Option[String], Option[Long])].collect().head
    assert(nn._3 == 2L && nn._4 == 0L && nn._7.isEmpty)
    intercept[IllegalArgumentException] {
      Profiler.profileColumns(df, Seq("k", "nope"))
    }
    intercept[IllegalArgumentException] {
      Profiler.profileColumns(df, Nil)
    }
    // partition independence
    val a = Profiler.profileColumns(df.repartition(7), Seq("k", "s", "t"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .collect().toSet
    assert(a == got.values.toSet)
  }

  test("approxProfile: shared basics, HLL accuracy, all-null column") {
    val df = spark.range(0, 2000).selectExpr(
      "id AS k",                       // 2000 distinct
      "CAST(id % 7 AS STRING) AS s",   // 7 distinct
      "CAST(NULL AS STRING) AS z")     // all null
    val exact = Profiler.profileColumns(df, Seq("k", "s", "z"))
      .select($"column", $"n_distinct").as[(String, Long)].collect().toMap
    val got = Profiler.approxProfile(df, Seq("k", "s", "z"), b = 6)
      .collect().map(r => r.getString(0) -> r).toMap
    // basics identical to the exact profile
    assert(got("k").getLong(1) == 2000L && got("k").getLong(2) == 0L)
    assert(got("z").getLong(2) == 2000L)
    assert(got("k").getString(3) == "0" && got("s").getString(4) == "6")
    // estimates within HLL error for b=6 (±~13% at 1σ; allow 3σ), and
    // the small set essentially exact via the small-range correction
    val estK = got("k").getDouble(7)
    assert(math.abs(estK - exact("k")) / exact("k") < 0.4, s"estK=$estK")
    val estS = got("s").getDouble(7)
    assert(math.abs(estS - exact("s")) < 1.0, s"estS=$estS")
    // all-null column: zero occupied buckets, the all-empty harmonic
    // denominator 64·2^58, estimate 0 distinct
    assert(got("z").getInt(5) == 0)
    assert(got("z").getDecimal(6).toBigInteger ==
      (BigInt(64) << 58).bigInteger)
    assert(got("z").getDouble(7) == 0.0)
    // deterministic hash → registers partition-independent
    val again = Profiler.approxProfile(df.repartition(13), Seq("k", "s", "z"),
      b = 6).collect().map(r => r.getString(0) -> r.getDecimal(6)).toMap
    assert(again.forall { case (c, d) => d == got(c).getDecimal(6) })
  }

  test("functionalDependencies: holds, violations, NULL semantics") {
    // k → a holds; k → b violated by k=2 ({x, y}) and k=3 ({x, NULL});
    // NULL determinant rows are excluded entirely
    val df = Seq(
      (Some(1L), "a1", Some("x")), (Some(1L), "a1", Some("x")),
      (Some(2L), "a2", Some("x")), (Some(2L), "a2", Some("y")),
      (Some(3L), "a3", Some("x")), (Some(3L), "a3", None),
      (None, "zz", Some("q")))
      .toDF("k", "a", "b")
    val got = Profiler.functionalDependencies(df,
        Seq(("k", "a"), ("k", "b")))
      .as[(String, String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("k", "a")) == (("k", "a", 3L, 0L, 1L, true)))
    assert(got(("k", "b")) == (("k", "b", 3L, 2L, 2L, false)))
    // row multiplicity never matters: duplicating rows changes nothing
    val doubled = df.unionByName(df)
    val again = Profiler.functionalDependencies(doubled,
        Seq(("k", "a"), ("k", "b")))
      .collect().map(_.toSeq).toSet
    assert(again == got.values.map(t =>
      Seq[Any](t._1, t._2, t._3, t._4, t._5, t._6)).toSet)
    intercept[IllegalArgumentException](
      Profiler.functionalDependencies(df, Seq.empty))
    intercept[IllegalArgumentException](
      Profiler.functionalDependencies(df, Seq(("k", "a"), ("k", "a"))))
  }
}
