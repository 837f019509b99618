package graft

import graft.ops.DataQuality
import graft.ops.DataQuality._
import org.apache.spark.sql.functions._

/** ops/DataQuality — declarative constraint suite: per-rule counters vs
  * hand-computed truth, the single-scan claim for row-level rules, FK
  * null-tuple semantics, and the quarantine mirror. */
class DataQualitySpec extends SparkTestBase {
  import spark.implicits._

  // (id, grp, qty, flag)
  private def frame = Seq(
    (1L, Option(1L), 10.0, "A"),
    (2L, Option(1L), -3.0, "B"),        // range + set violation
    (3L, Option.empty[Long], 200.0, "A"), // null grp + range violation
    (4L, Option(2L), 20.0, "A"),
    (4L, Option(2L), 30.0, "R"),        // dup id with row 4
    (5L, Option(9L), 40.0, "R")         // grp 9 is an FK orphan
  ).toDF("id", "grp", "qty", "flag")

  private def ref = Seq(1L, 2L, 3L).toDF("ref_id")

  private def report = DataQuality.check(frame, Seq(
    NotNull("grp"),
    InRange("qty", 0, 100),
    InSet("flag", Seq("A", "R")),
    Satisfies("positive_qty", col("qty") > 0),
    Unique(Seq("id")),
    ForeignKey(Seq("grp"), ref, Seq("ref_id"))))

  test("per-rule counters match hand-computed truth") {
    val got = report.select("rule", "target", "n_rows", "n_violations",
      "passed").as[(String, String, Long, Long, Int)].collect().toSet
    val want = Set(
      ("not_null", "grp", 6L, 1L, 0),
      ("in_range", "qty", 6L, 2L, 0),      // -3 and 200
      ("in_set", "flag", 6L, 1L, 0),       // B
      ("satisfies", "positive_qty", 6L, 1L, 0),
      ("unique", "id", 6L, 2L, 0),         // both copies of id=4
      ("foreign_key", "grp", 6L, 1L, 0))   // grp=9; null tuple skipped
    assert(got == want)
  }

  test("min_group_size: k-anonymity counts every row of a rare combination") {
    // flags: A×3, B×1, R×2
    def rep(k: Long) = DataQuality.check(frame,
        Seq(MinGroupSize(Seq("flag"), k)))
      .select("rule", "target", "n_rows", "n_violations")
      .as[(String, String, Long, Long)].head()
    assert(rep(2) == (("min_group_size", "flag>=2", 6L, 1L)))   // B
    assert(rep(3) == (("min_group_size", "flag>=3", 6L, 3L)))   // B + both R
    assert(rep(1) == (("min_group_size", "flag>=1", 6L, 0L)))
    intercept[IllegalArgumentException] { MinGroupSize(Seq("flag"), 0) }
  }

  test("clean table passes every rule") {
    val clean = Seq((1L, 1L, 5.0, "A"), (2L, 2L, 6.0, "R"))
      .toDF("id", "grp", "qty", "flag")
    val rep = DataQuality.check(clean, Seq(
      NotNull("grp"), InRange("qty", 0, 100), Unique(Seq("id")),
      ForeignKey(Seq("grp"), ref, Seq("ref_id"))))
    assert(rep.agg(min("passed"), max("n_violations"))
      .as[(Int, Long)].head() == ((1, 0L)))
  }

  test("row-level rules fuse into one scan (one Aggregate over one source)") {
    val rowOnly = DataQuality.check(frame, Seq(
      NotNull("grp"), InRange("qty", 0, 100), InSet("flag", Seq("A", "R")),
      Satisfies("p", col("qty") > 0)))
    val scans = rowOnly.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 1,
      s"row-level suite should read the input once, saw ${scans.size} scans")
  }

  test("quarantine tags each bad row with its first failing rule") {
    val q = DataQuality.quarantine(frame, Seq(
      NotNull("grp"), InRange("qty", 0, 100), InSet("flag", Seq("A", "R"))))
    val got = q.select("id", "failed_rule").as[(Long, String)]
      .collect().toSet
    assert(got == Set(
      (2L, "in_range(qty)"),   // range fires before set in rule order
      (3L, "not_null(grp)")))
  }

  test("FK on multi-column tuples and empty-violation coalesce") {
    val df = Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 9L))
      .toDF("k1", "k2", "v")
    val refs = Seq((1L, "a"), (2L, "b"), (9L, "x")).toDF("r1", "r2")
    val rep = DataQuality.check(df,
      Seq(ForeignKey(Seq("k1", "k2"), refs, Seq("r1", "r2"))))
    assert(rep.select("n_violations").as[Long].head() == 1L) // (3,c)
  }

  test("privacyReport: k/l violation counts, NULL-sensitive l=0") {
    val df = Seq(
      ("a", "s1"), ("a", "s1"), ("a", "s2"),      // n=3, l=2
      ("b", "s1"),                                // n=1, l=1
      ("c", null), ("c", null)                    // n=2, l=0
    ).toDF("q", "sv")
    val r = DataQuality.privacyReport(df, Seq("q"), "sv", k = 2, l = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == ((6L, 3L, 1L, 1L, 1L, 0L, 2L)), s"got $r")
    // partition independence (pure groupBy chain)
    val a = DataQuality.privacyReport(df, Seq("q"), "sv", 2, 2)
      .collect().map(_.toSeq).toSet
    val b = DataQuality.privacyReport(df.repartition(5), Seq("q"), "sv",
      2, 2).collect().map(_.toSeq).toSet
    assert(a == b)
    intercept[IllegalArgumentException](
      DataQuality.privacyReport(df, Seq.empty, "sv", 2, 2))
  }

  test("tClosenessReport: hand EMD, identical-dist group at 0, B=1 edge") {
    import spark.implicits._
    // g1 all bucket 0, g2 all bucket 1; global (½, ½):
    // each group's 1-D EMD = ½ → t = 500000, both violate t > 0.25;
    // the NULL-keyed and NULL-bucket rows fall out VISIBLY (n_excluded)
    val df = (Seq(("g1", 0L), ("g1", 0L), ("g2", 1L), ("g2", 1L))
      .map { case (q, b) => (q, Some(b)) } ++
      Seq((null.asInstanceOf[String], Some(0L)), ("g1", None)))
      .toDF("q", "b")
    val r = DataQuality.tClosenessReport(df, Seq("q"), "b", tPpm = 250000)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r == ((4L, 2L, 2L, 2L, 500000L, 2L)), s"got $r")
    // missing-bucket grid rows still count: the skew group has no b=1
    // cell, yet its CDF gap at b=0 is what the EMD measures
    val mixed = Seq(("even", 0L), ("even", 1L), ("skew", 0L),
      ("skew", 0L)).toDF("q", "b")
    val r2 = DataQuality.tClosenessReport(mixed, Seq("q"), "b", 400000)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // global (¾, ¼): even group cum diffs |1·4−3·2|=2 → t=¼;
    // skew group |2·4−3·2|=2 → t=¼ — both 250000, no violations
    assert(r2 == ((4L, 0L, 2L, 2L, 250000L, 0L)), s"got $r2")
    // single bucket → EMD undefined-trivial, pinned 0
    val one = Seq(("a", 5L), ("b", 5L)).toDF("q", "b")
    val r3 = DataQuality.tClosenessReport(one, Seq("q"), "b", 100)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r3 == ((2L, 0L, 2L, 1L, 0L, 0L)), s"got $r3")
    intercept[IllegalArgumentException](
      DataQuality.tClosenessReport(df, Seq("q"), "b", -1))
  }
}
