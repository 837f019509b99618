package graft

import graft.ops.Resample
import org.apache.spark.sql.functions._

/** ops/Resample — LOCF gap-fill onto dense period spines. */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  test("gapFillLocf fills holes with the carried value, flags them") {
    val obs = Seq(
      ("a", 10L, 5L), ("a", 13L, 9L),        // gap at 11, 12
      ("b", 20L, 1L),                        // singleton: no fill
      ("c", 7L, 3L), ("c", 8L, 4L)           // dense: no fill
    ).toDF("g", "p", "v")
    val got = Resample.gapFillLocf(obs, "g", "p", "v")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 10L, 5L, 0L), ("a", 11L, 5L, 1L), ("a", 12L, 5L, 1L),
      ("a", 13L, 9L, 0L),
      ("b", 20L, 1L, 0L),
      ("c", 7L, 3L, 0L), ("c", 8L, 4L, 0L)))
    // every group's spine is dense: count == span
    val spans = Resample.gapFillLocf(obs, "g", "p", "v")
      .groupBy($"g").agg(count(lit(1)).as("n"),
        (max($"p") - min($"p") + 1).as("span"))
      .as[(String, Long, Long)].collect()
    assert(spans.forall(r => r._2 == r._3))
    // partition independence
    val again = Resample.gapFillLocf(obs.repartition(7), "g", "p", "v")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(again == got)
  }

  test("ewmaPpm: hand weights, head truncation, partition independence") {
    // decay 0.5, horizon 3: weights 4,2,1 (500^k·1000^(2-k) ∝ 4:2:1)
    val obs = Seq(("a", 1L, 8L), ("a", 2L, 4L), ("a", 3L, 1L)).toDF("g", "p", "v")
    val got = Resample.ewmaPpm(obs, "g", "p", "v", decayPm = 500, horizon = 3)
      .as[(String, Long, Long, Long)].collect().toMap2
    // p=1: only itself → 8.0; p=2: (4·4+2·8)/6 = 32/6 = 5.333…;
    // p=3: (4·1+2·4+1·8)/7 = 20/7 = 2.857142…
    assert(got(("a", 1L)) == ((8L, 8000000L)))
    assert(got(("a", 2L)) == ((4L, 5333333L)))
    assert(got(("a", 3L)) == ((1L, 2857142L)))
    // independent groups don't leak into each other's windows
    val multi = Resample.ewmaPpm(
        obs.unionByName(Seq(("b", 3L, 100L)).toDF("g", "p", "v")).repartition(5),
        "g", "p", "v", decayPm = 500, horizon = 3)
      .as[(String, Long, Long, Long)].collect()
    assert(multi.toMap2(("b", 3L)) == ((100L, 100000000L)))
    assert(multi.toMap2(("a", 3L)) == ((1L, 2857142L)))
    intercept[IllegalArgumentException] {
      Resample.ewmaPpm(obs, "g", "p", "v", decayPm = 1000, horizon = 3)
    }
    intercept[IllegalArgumentException] {
      Resample.ewmaPpm(obs, "g", "p", "v", decayPm = 500, horizon = 9)
    }
  }

  test("seasonalNaiveWape: lag-season error, zero-actuals NULL") {
    // season 2: forecasts read two ROWS back (dense-spine contract)
    val obs = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 13L),
      ("a", 4L, 16L),
      ("z", 1L, 5L), ("z", 2L, 7L), ("z", 3L, 0L), ("z", 4L, 0L))
      .toDF("g", "p", "v")
    val got = Resample.seasonalNaiveWape(obs, "g", "p", "v", season = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    // a: pairs (13 vs 10), (16 vs 20) → abs_err 7, Σv = 29 → 241379 ppm
    assert(got("a") == ((2L, 7L, 1000000L * 7 / 29)))
    // z: pairs (0 vs 5), (0 vs 7) → actuals sum 0 → NULL wape
    assert(got("z") == ((2L, 12L, -1L)))
  }

  test("holtForecastMilli: pinned table, warmup NULLs, trend leads the level") {
    import graft.ops.Resample
    val w = Resample.holtCoefficientsPpm(500, 300, 6)
    assert(w.sum == 1000000L, "coefficients must sum to exactly 10⁶")
    // constant series: forecast is the constant (in milli) past warmup
    val const = (0L until 12L).map(d => ("c", d, 40L)).toDF("g", "p", "v")
    val c = Resample.holtForecastMilli(const, "g", "p", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4).toMap
    assert((0L to 5L).forall(c(_).isEmpty), "warmup prefix must be NULL")
    assert((6L to 11L).forall(c(_).contains(40000L)))
    // linear growth: the forecast must LEAD the current level (the
    // trend term working) and equal the driver-applied table exactly
    val lin = (0L until 12L).map(d => ("l", d, 10L * d)).toDF("g", "p", "v")
    val got = Resample.holtForecastMilli(lin, "g", "p", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4).toMap
    val refAt = (t: Long) =>
      (0 to 6).map(k => w(k) * 10L * (t - k)).sum / 1000L
    assert((6L to 11L).forall(t => got(t).contains(refAt(t))))
    assert(got(11L).get > 110000L,
      "trend-aware forecast must exceed the last observed level")
  }

  test("seasonalIndices: flat series all 10⁶; a hot slot scales exactly") {
    import graft.ops.Resample
    // 4 full weeks, constant 10/day → every weekday index = 10⁶
    val flat = (0L until 28L).map(d => ("f", d, 10L)).toDF("g", "p", "v")
    val f = Resample.seasonalIndices(flat, "g", "p", "v", season = 7)
      .as[(String, Long, Long, Long, Option[Long])].collect()
    assert(f.length == 7 && f.forall(r => r._3 == 4L && r._5.contains(1000000L)))
    // slot 0 doubled: slot mean 20, overall mean 80/7 per... exact:
    // idx(0) = 10⁶·(80·28)/(4·320) = 1750000; others 10⁶·40·28/(4·320)
    val hot = (0L until 28L).map(d =>
      ("h", d, if (d % 7 == 0) 20L else 10L)).toDF("g", "p", "v")
    val h = Resample.seasonalIndices(hot, "g", "p", "v", season = 7)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._5.get).toMap
    assert(h(0L) == 1750000L && h(1L) == 875000L)
    // zero group total → NULL indices
    val zero = Seq(("z", 0L, 0L), ("z", 1L, 0L)).toDF("g", "p", "v")
    assert(Resample.seasonalIndices(zero, "g", "p", "v", 7)
      .as[(String, Long, Long, Long, Option[Long])]
      .collect().forall(_._5.isEmpty))
  }

  test("seasonalStrengthPpm: pure cycle = 1e6, anti-phase mix = 0, " +
       "constant NULL") {
    // season 2: [10,2,10,2] is ALL cycle; [10,2,2,10] mixes phases so
    // slot means equal the grand mean → SSB 0; constant → SST 0
    val df = (Seq(10L, 2L, 10L, 2L).zipWithIndex.map { case (v, p) =>
        ("cyc", p.toLong, v) } ++
      Seq(10L, 2L, 2L, 10L).zipWithIndex.map { case (v, p) =>
        ("mix", p.toLong, v) } ++
      Seq(("cst", 0L, 5L), ("cst", 1L, 5L))).toDF("g", "p", "v")
    val got = Resample.seasonalStrengthPpm(df, "g", "p", "v", season = 2)
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("cyc") == (("cyc", 4L, 2L, 64000L, 64000L,
      Some(1000000L))), s"got $got")
    assert(got("mix") == (("mix", 4L, 2L, 0L, 64000L, Some(0L))))
    assert(got("cst") == (("cst", 2L, 2L, 0L, 0L, None)))
  }

  test("decomposeAdditive: hand components reconcile, constant series " +
       "decomposes to zero seasonal/remainder") {
    // season 2, halfWindow 1, series [10,2,10,2]:
    // trend milli = 6000, 7333, 4666, 6000; detr = 4000, −5333,
    // 5334, −4000; seasonal ph0 = 4667, ph1 = −4666
    val df = Seq(10L, 2L, 10L, 2L).zipWithIndex
      .map { case (v, p) => ("g", p.toLong, v) }.toDF("g", "p", "v")
    val got = Resample.decomposeAdditive(df, "g", "p", "v",
        season = 2, halfWindow = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(got(0L) == (("g", 0L, 10L, 6000L, 4667L, -667L)), s"got $got")
    assert(got(1L) == (("g", 1L, 2L, 7333L, -4666L, -667L)))
    assert(got(2L) == (("g", 2L, 10L, 4666L, 4667L, 667L)))
    assert(got(3L) == (("g", 3L, 2L, 6000L, -4666L, 666L)))
    // trend + seasonal + remainder ≡ 1000·value at every point
    got.values.foreach { r =>
      assert(r._4 + r._5 + r._6 == 1000 * r._3, s"decomposition leak: $r")
    }
    val cst = Resample.decomposeAdditive(
      Seq(("c", 0L, 5L), ("c", 1L, 5L), ("c", 2L, 5L)).toDF("g", "p", "v"),
      "g", "p", "v", season = 2, halfWindow = 1)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(cst.forall(r => r._4 == 5000L && r._5 == 0L && r._6 == 0L))
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[(A, B), (C, D)] =
      rows.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
  }
}
