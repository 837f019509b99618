package graft

import graft.ops.RankTests

/** Hand-computed oracles for the nonparametric test suite — every
  * statistic checked against the textbook formula evaluated by hand
  * (shown in the comments), including tie handling, degenerate-input
  * NULLs, and partition independence for the window-free passes. */
class RankTestsSpec extends SparkTestBase {
  import spark.implicits._

  test("mannWhitneyMilli: hand ranks with ties, all-tied NULL") {
    // A{1,2} vs B{2,3,3}: midranks 1→1, 2→2.5, 3→4.5; R_A=3.5,
    // U_A=0.5; T=12; σ²=2.7; z=(0.5−3)/1.6432 → z²=2.3148
    val df = Seq((true, 1L), (true, 2L), (false, 2L), (false, 3L),
      (false, 3L)).toDF("f", "v")
    val r = RankTests.mannWhitneyMilli(df, "f", "v")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(r == ((2L, 3L, 1L, 12L, Some(2314L))), s"got $r")
    // single distinct value: variance 0 → NULL
    val tied = Seq((true, 5L), (false, 5L), (false, 5L)).toDF("f", "v")
    assert(RankTests.mannWhitneyMilli(tied, "f", "v")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head._5.isEmpty)
    // empty group: NULL
    val oneSided = Seq((true, 1L), (true, 2L)).toDF("f", "v")
    assert(RankTests.mannWhitneyMilli(oneSided, "f", "v")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head._5.isEmpty)
  }

  test("kruskalWallisMilli: three groups with ties, pinned floors") {
    // a{1,2} b{2,3} c{3,3}: midranks 1→1, 2→2.5, 3→5; doubled R2:
    // a=7, b=15, c=20; S=⌊49/2⌋+⌊225/2⌋+⌊400/2⌋=336;
    // H=3·336/42−21 = 3.0 (pinned); T=30, H_tie=3000·210//180=3500
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L),
      ("c", 3L), ("c", 3L)).toDF("g", "v")
    val r = RankTests.kruskalWallisMilli(df, "g", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r == ((6L, 3L, 3000L, Some(3500L))), s"got $r")
    // all values identical → tie correction undefined
    val tied = Seq(("a", 7L), ("b", 7L), ("c", 7L)).toDF("g", "v")
    assert(RankTests.kruskalWallisMilli(tied, "g", "v")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("wilcoxonSignedRankMilli: zero-diff drop, tie-corrected z2") {
    // diffs +1,+1,−2,+3 (one 0 dropped): |d| ranks 1→1.5, 2→3, 3→4;
    // W⁺=7; 4N=8; 48σ²=2·4·5·9−6=354; z²=4/7.375=0.5424
    val df = Seq((11L, 10L), (21L, 20L), (8L, 10L), (13L, 10L),
      (5L, 5L)).toDF("x", "y")
    val r = RankTests.wilcoxonSignedRankMilli(df, "x", "y")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r == ((4L, 14L, 6L, Some(542L))), s"got $r")
    // all pairs equal → n=0 → NULL
    val eq = Seq((3L, 3L), (4L, 4L)).toDF("x", "y")
    assert(RankTests.wilcoxonSignedRankMilli(eq, "x", "y")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("mannKendallMilli: S with ties, constant series NULL") {
    // x=[1,2,2,1,3] over t=0..4: S=4; ties Σt(t−1)(2t+5)=36;
    // var18=5·4·15−36=264; z²=(3)²·18/264=0.6136
    val df = (Seq((0L, 1L), (1L, 2L), (2L, 2L), (3L, 1L), (4L, 3L))
      .map { case (t, x) => ("g", t, x) } ++
      Seq(("c", 0L, 5L), ("c", 1L, 5L), ("c", 2L, 5L))).toDF("g", "t", "x")
    val got = RankTests.mannKendallMilli(df, "g", "t", "x")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 5L, 4L, 264L, Some(613L))), s"got $got")
    // constant series: every pair tied → var18 = 0 → NULL
    assert(got("c")._4 == 0L && got("c")._5.isEmpty)
  }

  test("logRankMilli: two cohorts, censoring joins at-risk only") {
    // all observed: G1{1,2} G0{1,1}: t=1 d=3,d1=1,n=4,n1=2;
    // t=2 d=1,d1=1,n=1,n1=1; O1=2, E1=1.5+1=2.5, V=0.25 → χ²=1
    val df = Seq((1L, true, true), (2L, true, true),
      (1L, false, true), (1L, false, true)).toDF("dur", "f", "obs")
    val r = RankTests.logRankMilli(df, "dur", "f", "obs")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r == ((2L, 2500000L, 250000L, Some(1000L))), s"got $r")
    // + censored (g1, t=2): at-risk grows, events don't:
    // t=1: E1+=1e6·9//5, V+=1e6·36//100; t=2: n1=n → V+=0
    val cens = Seq((1L, true, true), (2L, true, true),
      (1L, false, true), (1L, false, true), (2L, true, false))
      .toDF("dur", "f", "obs")
    val r2 = RankTests.logRankMilli(cens, "dur", "f", "obs")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r2 == ((2L, 2800000L, 360000L, Some(1777L))), s"got $r2")
    // no events at all → V=0 → NULL
    val none = Seq((1L, true, false), (2L, false, false))
      .toDF("dur", "f", "obs")
    assert(RankTests.logRankMilli(none, "dur", "f", "obs")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("friedmanMilli: no-tie textbook identity, in-block ties, " +
       "incomplete blocks filtered") {
    // 3 blocks × 3 treatments, ranks b1/b2 = (1,2,3), b3 = (2,1,3):
    // R = (4,5,9); χ² = 12/(3·3·4)·(16+25+81) − 3·3·4 = 4.667
    val df = Seq(
      ("b1", "a", 1L), ("b1", "b", 2L), ("b1", "c", 3L),
      ("b2", "a", 1L), ("b2", "b", 2L), ("b2", "c", 3L),
      ("b3", "a", 2L), ("b3", "b", 1L), ("b3", "c", 3L),
      ("b4", "a", 9L) // incomplete block — must be dropped
    ).toDF("blk", "trt", "v")
    val r = RankTests.friedmanMilli(df, "blk", "trt", "v")
      .as[(Long, Long, Option[Long])].collect().head
    assert(r == ((3L, 3L, Some(4666L))), s"got $r")
    // one block with an in-block tie: ranks (1.5, 1.5, 3) →
    // χ² = (k−1)·Σ(R_j−R̄)²/(A−C) = 2·1.5/1.5 = 2
    val tie = Seq(("b1", "a", 1L), ("b1", "b", 1L), ("b1", "c", 2L))
      .toDF("blk", "trt", "v")
    val r2 = RankTests.friedmanMilli(tie, "blk", "trt", "v")
      .as[(Long, Long, Option[Long])].collect().head
    assert(r2 == ((1L, 3L, Some(2000L))), s"got $r2")
    // every block internally constant → denominator 0 → NULL
    val const = Seq(("b1", "a", 5L), ("b1", "b", 5L), ("b1", "c", 5L))
      .toDF("blk", "trt", "v")
    assert(RankTests.friedmanMilli(const, "blk", "trt", "v")
      .as[(Long, Long, Option[Long])].collect().head._3.isEmpty)
  }

  test("cochranArmitageMilli: hand trend, degenerate NULLs") {
    // scores 0,1,2 with (n,r)=(4,1),(4,2),(4,3): U=2, Var=2, z²=2
    val df = (Seq.fill(1)((0L, true)) ++ Seq.fill(3)((0L, false)) ++
      Seq.fill(2)((1L, true)) ++ Seq.fill(2)((1L, false)) ++
      Seq.fill(3)((2L, true)) ++ Seq.fill(1)((2L, false)))
      .toDF("w", "y")
    val r = RankTests.cochranArmitageMilli(df, "w", "y")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r == ((12L, 6L, 1L, Some(2000L))), s"got $r")
    // all successes → outcome constant → NULL
    val all = Seq((0L, true), (1L, true)).toDF("w", "y")
    assert(RankTests.cochranArmitageMilli(all, "w", "y")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
    // constant score → NULL
    val one = Seq((3L, true), (3L, false)).toDF("w", "y")
    assert(RankTests.cochranArmitageMilli(one, "w", "y")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("runsTestMilli: alternating max-runs, zero-z balanced, " +
       "at-mean drop to degenerate NULL") {
    // [5,1,5,1,5,1]: all alternate → 6 runs; μ=4, σ²=1.2, z²=10/3
    val alt = (0L to 5L).map(t => ("a", t, if (t % 2 == 0) 5L else 1L))
    // [5,5,1,1,5,1,5,5,1,1]: mean 3, runs AA|BB|A|B|AA|BB = 6 = μ → z²=0
    val bal = Seq(5L, 5L, 1L, 1L, 5L, 1L, 5L, 5L, 1L, 1L).zipWithIndex
      .map { case (v, t) => ("b", t.toLong, v) }
    // [2,2,2,4,0]: mean 2 — three at-mean rows drop, m=2 → σ²=0 → NULL
    val dg = Seq(2L, 2L, 2L, 4L, 0L).zipWithIndex
      .map { case (v, t) => ("d", t.toLong, v) }
    val df = (alt ++ bal ++ dg).toDF("g", "t", "x")
    val got = RankTests.runsTestMilli(df, "g", "t", "x")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 6L, 3L, 3L, 6L, Some(3333L))), s"got $got")
    assert(got("b") == (("b", 10L, 5L, 5L, 6L, Some(0L))))
    assert(got("d") == (("d", 2L, 1L, 1L, 2L, None)))
    // partition independence (lag window + broadcast stats join)
    val a = RankTests.runsTestMilli(df, "g", "t", "x").collect()
      .map(_.toSeq).toSet
    val b = RankTests.runsTestMilli(df.repartition(7), "g", "t", "x")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("bradleyTerryMicro: two-player fixed point = the exact odds, " +
       "symmetric cycle stays uniform, undefeated bounded") {
    // A beats B 3:1 → MLE ratio 3:1; MM reaches it in one step and
    // stays: (1500000, 500000)
    val ab = Seq(("A", "B", 3L), ("B", "A", 1L)).toDF("w", "l", "n")
    val got = RankTests.bradleyTerryMicro(ab, "w", "l", "n", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1500000L, "B" -> 500000L), s"got $got")
    // rock-paper-scissors: perfectly symmetric → all stay at 1e6
    val rps = Seq(("r", "s", 1L), ("s", "p", 1L), ("p", "r", 1L))
      .toDF("w", "l", "n")
    val cyc = RankTests.bradleyTerryMicro(rps, "w", "l", "n", iters = 4)
      .as[(String, Long)].collect().toMap
    assert(cyc == Map("r" -> 1000000L, "p" -> 1000000L,
      "s" -> 1000000L), s"got $cyc")
    // undefeated player: true MLE is infinite — grows boundedly,
    // never-winner floors at 1, no division blow-up
    val sweep = Seq(("A", "B", 2L)).toDF("w", "l", "n")
    val sw = RankTests.bradleyTerryMicro(sweep, "w", "l", "n", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(sw("B") == 1L && sw("A") > 1000000L, s"got $sw")
    // repeated pair rows aggregate before fitting
    val dup = Seq(("A", "B", 2L), ("A", "B", 1L), ("B", "A", 1L))
      .toDF("w", "l", "n")
    assert(RankTests.bradleyTerryMicro(dup, "w", "l", "n", iters = 3)
      .as[(String, Long)].collect().toMap == got)
  }

  test("holmAdjustPpm: prefix-max monotone, cap at 1e6, Holm >= BH") {
    // p = [10000, 20000, 20000, 500000, 900000] (m=5):
    // raw = 50000, 80000, 60000, 1000000, 900000
    // prefix max → 50000, 80000, 80000, 1000000, 1000000
    val df = Seq(("a", 10000L), ("b", 20000L), ("c", 20000L),
      ("d", 500000L), ("e", 900000L)).toDF("id", "p")
    val got = RankTests.holmAdjustPpm(df, "id", "p")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map("a" -> 50000L, "b" -> 80000L, "c" -> 80000L,
      "d" -> 1000000L, "e" -> 1000000L), s"got $got")
    // FWER control is never looser than FDR control: Holm ≥ BH
    val bh = RankTests.bhAdjustPpm(df, "id", "p")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got.forall { case (k, v) => v >= bh(k) })
  }

  test("bhAdjustPpm: suffix-min monotone q-values, tie rank by id") {
    val df = Seq(("a", 10000L), ("b", 20000L), ("c", 20000L),
      ("d", 500000L), ("e", 900000L)).toDF("id", "p")
    val got = RankTests.bhAdjustPpm(df, "id", "p")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // raws: a 50000, b 50000, c 33333, d 625000, e 900000;
    // suffix mins: 33333,33333,33333,625000,900000
    assert(got("a") == (("a", 10000L, 1L, 33333L)))
    assert(got("b") == (("b", 20000L, 2L, 33333L)))
    assert(got("c") == (("c", 20000L, 3L, 33333L)))
    assert(got("d") == (("d", 500000L, 4L, 625000L)))
    assert(got("e") == (("e", 900000L, 5L, 900000L)))
    // partition independence of the two global passes
    val a = RankTests.bhAdjustPpm(df, "id", "p").collect()
      .map(_.toSeq).toSet
    val b = RankTests.bhAdjustPpm(df.repartition(7), "id", "p")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
