package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series regularization — gap-fill a per-(group, period)
  * observation frame onto a dense period spine with last-observation-
  * carried-forward (LOCF): the resample step between raw events and
  * anything that assumes regular sampling (trend fits, bar charts,
  * day-over-day ratios — a missing day silently skews them all).
  *
  * Input contract: at most ONE row per (group, period) — pre-aggregate
  * first (the OHLC/TWAP ops are the usual upstream). Each group fills
  * its own [min period, max period] span; `filled = 1` rows carry the
  * latest earlier observation of that group. Leading rows before a
  * group's first observation cannot exist by construction (the spine
  * starts at the group's min).
  *
  * Scale shape: bounds are one map-side-partial groupBy; the spine is
  * `sequence(min, max)` exploded per group — array length = the
  * group's span in periods (a daily grain spans thousands, not
  * billions; the period GRAIN bounds it, document the grain choice,
  * not the data size). The LOCF window partitions by group ordered by
  * period — state bounded by one group's span. One join on
  * (group, period). */
object Resample {

  def gapFillLocf(obs: DataFrame, groupCol: String, periodCol: String,
                  valueCol: String): DataFrame = {
    val o = obs.select(col(groupCol).as("__g"),
      col(periodCol).cast("long").as("__p"), col(valueCol).as("__v"))
    val bounds = o.groupBy(col("__g"))
      .agg(min(col("__p")).as("__mn"), max(col("__p")).as("__mx"))
    val spine = bounds.select(col("__g"),
      explode(sequence(col("__mn"), col("__mx"))).as("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(o, Seq("__g", "__p"), "left")
      .withColumn("__filled", when(col("__v").isNull, 1L).otherwise(0L))
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
      .select(col("__g").as(groupCol), col("__p").as(periodCol),
        col("__v").as(valueCol), col("__filled").as("filled"))
  }

  /** BOUNDED-HORIZON EWMA in exact integer ppm: per (group, period) the
    * exponentially-weighted mean of the last `horizon` observations
    * with per-mille decay `decayPm` — weight of the k-periods-ago value
    * is decayPm^k/1000^k, truncated to the horizon so every weight is
    * an exact integer after scaling by 1000^(horizon−1). Missing lags
    * (series head) drop out of numerator AND denominator, so early
    * rows are exact weighted means of what exists — no warm-up bias.
    * `ewma_ppm = 10⁶·Σ vₖ·wₖ div Σ wₖ`: the smoothed trend line every
    * daily-metric dashboard draws, reproducible bit-for-bit by any
    * engine from the same integer rule.
    *
    * Input contract: at most one row per (group, period) (pre-aggregate
    * upstream, the [[gapFillLocf]] sibling contract); values
    * integer-domain (counts, cents).
    *
    * Scale shape: ONE group-partitioned window evaluating horizon−1
    * lag() calls (state = horizon rows per group); no joins, no
    * collects. horizon ≤ 8 keeps 10⁶·v·1000^7 inside DECIMAL(38,0) for
    * values to ~10¹⁰. */
  def ewmaPpm(obs: DataFrame, groupCol: String, periodCol: String,
              valueCol: String, decayPm: Int, horizon: Int = 8): DataFrame = {
    require(decayPm >= 1 && decayPm <= 999,
      s"decayPm must be in [1, 999], got $decayPm")
    require(horizon >= 2 && horizon <= 8,
      s"horizon must be in [2, 8], got $horizon")
    // exact integer weights: w_k = decayPm^k · 1000^(horizon-1-k)
    val w: IndexedSeq[BigInt] = (0 until horizon).map { k =>
      BigInt(decayPm).pow(k) * BigInt(1000).pow(horizon - 1 - k)
    }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__p"))
    val d = "decimal(38,0)"
    val base = obs.select(col(groupCol).as("__g"),
        col(periodCol).cast("long").as("__p"),
        col(valueCol).cast("long").as("__v0"))
    val lagged = (1 until horizon).foldLeft(base) { (df, k) =>
      df.withColumn(s"__v$k", lag(col("__v0"), k).over(win))
    }
    val num = (0 until horizon).map { k =>
      coalesce(col(s"__v$k").cast(d) * lit(w(k).toString()).cast(d),
        lit(0).cast(d))
    }.reduce(_ + _)
    val den = (0 until horizon).map { k =>
      when(col(s"__v$k").isNull, lit(0).cast(d))
        .otherwise(lit(w(k).toString()).cast(d))
    }.reduce(_ + _)
    lagged.withColumn("__num", num).withColumn("__den", den)
      .select(col("__g").as(groupCol), col("__p").as(periodCol),
        col("__v0").as(valueCol),
        expr("CAST((1000000 * __num) div __den AS BIGINT)").as("ewma_ppm"))
  }

  /** SEASONAL-NAIVE FORECAST EVALUATION: score "this period = same
    * period last season" (the baseline every real forecaster must beat)
    * with WAPE in exact integer ppm — per group, over the periods where
    * a season-ago observation exists:
    * `wape_ppm = 10⁶·Σ|vₜ − vₜ₋ₛ| div Σ vₜ`. Integer-domain values;
    * NULL when the actuals sum to zero.
    *
    * Output per group: (group, n_periods, abs_err, wape_ppm).
    *
    * Input contract: one row per (group, period) on a DENSE spine —
    * run [[gapFillLocf]] first if periods can be missing, otherwise
    * lag(season) silently reads an older period.
    *
    * Scale shape: one group-partitioned lag window + one map-side-
    * partial groupBy; shuffles carry group cardinality. */
  def seasonalNaiveWape(obs: DataFrame, groupCol: String, periodCol: String,
                        valueCol: String, season: Int): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__p"))
    obs.select(col(groupCol).as("__g"), col(periodCol).cast("long").as("__p"),
        col(valueCol).cast("long").as("__v"))
      .withColumn("__f", lag(col("__v"), season).over(win))
      .where(col("__f").isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_periods"),
        sum(abs(col("__v") - col("__f"))).as("abs_err"),
        sum(col("__v")).as("__sv"))
      .select(col("__g").as(groupCol), col("n_periods"), col("abs_err"),
        when(col("__sv") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((1000000 * CAST(abs_err AS DECIMAL(38,0))) div __sv AS BIGINT)"))
          .as("wape_ppm"))
  }

  /** The bounded-horizon HOLT coefficient table: running the level /
    * trend recurrences l' = αy + (1−α)(l+b), b' = β(l'−l) + (1−β)b for
    * `horizon` steps from a cold start (l = y_{t−H}, b = 0) makes the
    * one-step forecast f = l_t + b_t an exact LINEAR combination of
    * the last H+1 observations. Coefficients are computed in exact
    * decimal arithmetic and rounded ONCE to ppm (HALF_EVEN) — the
    * pinned-literal contract ([[ewmaPpm]]'s bounded-horizon trick
    * extended to double exponential smoothing); they sum to exactly
    * 10⁶ up to the rounding of each entry. Index k = weight of
    * y_{t−k}. */
  def holtCoefficientsPpm(alphaPm: Int, betaPm: Int,
                          horizon: Int): Seq[Long] = {
    require(alphaPm >= 1 && alphaPm <= 999, s"alphaPm in [1,999]: $alphaPm")
    require(betaPm >= 0 && betaPm <= 999, s"betaPm in [0,999]: $betaPm")
    require(horizon >= 1 && horizon <= 24, s"horizon in [1,24]: $horizon")
    val mc = new java.math.MathContext(50)
    val kilo = BigDecimal(1000)
    val a = BigDecimal(alphaPm) / kilo
    val b = BigDecimal(betaPm) / kilo
    val h = horizon
    var l = Vector.tabulate(h + 1)(k => if (k == h) BigDecimal(1)
      else BigDecimal(0))
    var t = Vector.fill(h + 1)(BigDecimal(0))
    for (j <- (h - 1) to 0 by -1) {
      val lp = Vector.tabulate(h + 1) { k =>
        val carried = (BigDecimal(1) - a) * (l(k) + t(k))
        if (k == j) carried + a else carried
      }
      val tp = Vector.tabulate(h + 1)(k =>
        b * (lp(k) - l(k)) + (BigDecimal(1) - b) * t(k))
      l = lp; t = tp
    }
    (0 to h).map { k =>
      ((l(k) + t(k)) * BigDecimal(1000000))
        .bigDecimal.round(mc)
        .setScale(0, java.math.RoundingMode.HALF_EVEN).longValueExact()
    }
  }

  /** HOLT LINEAR one-step forecast (double exponential smoothing) in
    * exact milli-units: at each series point, f_{t+1|t} = l_t + b_t
    * with the bounded-horizon cold start — evaluated as the pinned
    * [[holtCoefficientsPpm]] linear combination, so both engines
    * compute identical integers (no recurrence for them to round
    * differently). The trend-aware upgrade of [[ewmaPpm]]: a steadily
    * growing series forecasts AHEAD of its last level instead of
    * lagging it.
    *
    * Input contract: DENSE series — one row per consecutive (group,
    * period); run [[gapFillLocf]] first on gappy data. Points with
    * fewer than horizon+1 preceding observations emit NULL (the warmup
    * prefix), rather than a silently-degraded forecast.
    *
    * Output: (group, period, value, forecast_milli) — the forecast
    * made AT `period` for the next period.
    *
    * Scale shape: one group-partitioned lag window (bounded by a
    * group's own series), map-only arithmetic after it. */
  def holtForecastMilli(obs: DataFrame, groupCol: String,
                        periodCol: String, valueCol: String,
                        alphaPm: Int = 500, betaPm: Int = 300,
                        horizon: Int = 6): DataFrame = {
    val w = holtCoefficientsPpm(alphaPm, betaPm, horizon)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__p"))
    val lagged = obs.select(col(groupCol).as("__g"),
        col(periodCol).cast("long").as("__p"),
        col(valueCol).cast("long").as("__v"))
      .select(col("__g") +: col("__p") +: col("__v") +:
        (0 to horizon).map(k =>
          lag(col("__v"), k).over(win).as(s"__y$k")): _*)
    val anyNull = (0 to horizon).map(k => col(s"__y$k").isNull)
      .reduce(_ || _)
    val num = (0 to horizon).map(k =>
      s"${w(k)} * CAST(__y$k AS DECIMAL(38,0))").mkString(" + ")
    lagged.select(col("__g").as(groupCol), col("__p").as(periodCol),
      col("__v").as(valueCol),
      when(anyNull, lit(null).cast("long"))
        .otherwise(expr(s"CAST(($num) div 1000 AS BIGINT)"))
        .as("forecast_milli"))
  }

  /** CLASSICAL SEASONAL INDICES (multiplicative): per group and season
    * slot (period mod `season`), the slot's mean as an exact-ppm ratio
    * of the group's overall mean — the weekday/hour-of-day seasonality
    * profile a forecaster divides out before trend-fitting, and the
    * "is Tuesday really 2× Sunday" readout itself. Cross-multiplied to
    * one integer division: 10⁶·(Σ_slot·n_total) div (n_slot·Σ_total),
    * so no mean is ever rounded before the ratio. Index 10⁶ = an
    * average slot; NULL when the group total is 0.
    *
    * Input contract: one row per (group, period) series point, periods
    * non-negative integers ([[ewmaPpm]]'s contract).
    *
    * Output: (group, season_slot, n_periods, sum_value, index_ppm).
    *
    * Scale shape: one map-side-partial groupBy on (group, slot), a
    * |groups|-row total frame broadcast back. Nothing beyond the slot
    * grid crosses the shuffle. */
  def seasonalIndices(obs: DataFrame, groupCol: String, periodCol: String,
                      valueCol: String, season: Int): DataFrame = {
    require(season >= 2, s"season must be >= 2, got $season")
    val d38 = "decimal(38,0)"
    val slots = obs.select(col(groupCol).as("__g"),
        pmod(col(periodCol).cast("long"), lit(season.toLong)).as("__s"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(col("__g"), col("__s"))
      .agg(count(lit(1)).as("n_periods"), sum(col("__v")).as("sum_value"))
    val totals = slots.groupBy(col("__g").as("__gt"))
      .agg(sum(col("n_periods")).as("__nt"), sum(col("sum_value")).as("__st"))
    slots.join(broadcast(totals), col("__g") <=> col("__gt"))
      .select(col("__g").as(groupCol), col("__s").as("season_slot"),
        col("n_periods"), col("sum_value"),
        when(col("__st") === 0, lit(null).cast("long"))
          .otherwise(expr(
            s"""CAST((1000000 * CAST(sum_value AS $d38) * __nt)
               |div (CAST(n_periods AS $d38) * __st) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("index_ppm"))
  }

  /** ADDITIVE DECOMPOSITION (STL-lite) per group — split a series into
    * trend + seasonal + remainder with pinned integer arithmetic:
    * trend = centered moving mean over ±h periods (RANGE frame — a
    * gap shrinks the window rather than reaching across it; edges
    * shrink too, the classical-decomposition convention), detrended =
    * 1000·x − trend, seasonal = per-phase mean of the detrended
    * values, remainder = detrended − seasonal. Every division is
    * sign-magnitude (sgn·(|Σ| div c)) so engines can't disagree on
    * negative rounding; everything else is signed ADDITION.
    *
    * Read [[seasonalStrengthPpm]] first to know whether the seasonal
    * component means anything; this op gives you the component VALUES
    * for plotting/anomaly baselines.
    *
    * Output per (group, period): (group, period, value, trend_milli,
    * seasonal_milli, remainder_milli).
    *
    * Scale shape: one group-partitioned RANGE window (bounded by a
    * group's series), one (group, phase) groupBy broadcast back, all
    * else map-only. */
  def decomposeAdditive(obs: DataFrame, groupCol: String,
                        periodCol: String, valueCol: String,
                        season: Int, halfWindow: Int): DataFrame = {
    require(season >= 2, s"season must be >= 2, got $season")
    require(halfWindow >= 1 && halfWindow <= 10000,
      s"halfWindow must be in [1, 10000], got $halfWindow")
    val base = obs.select(col(groupCol).as("__g"),
        col(periodCol).cast("long").as("__p"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__g").isNotNull && col("__p").isNotNull &&
        col("__x").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__p"))
      .rangeBetween(-halfWindow.toLong, halfWindow.toLong)
    val detr = base
      .withColumn("__ts", sum(col("__x")).over(w))
      .withColumn("__tc", count(lit(1)).over(w))
      .withColumn("__trend", signum(col("__ts")).cast("long") *
        expr("(1000 * abs(__ts)) div __tc"))
      .withColumn("__detr", lit(1000L) * col("__x") - col("__trend"))
      .withColumn("__ph", pmod(col("__p"), lit(season.toLong)))
    val seas = detr.groupBy(col("__g").as("__gs"), col("__ph").as("__phs"))
      .agg(sum(col("__detr")).as("__ss"), count(lit(1)).as("__sc"))
      .select(col("__gs"), col("__phs"),
        (signum(col("__ss")).cast("long") *
          expr("abs(__ss) div __sc")).as("__seasonal"))
    detr.join(broadcast(seas),
        col("__g") <=> col("__gs") && col("__ph") === col("__phs"))
      .select(col("__g").as(groupCol), col("__p").as(periodCol),
        col("__x").as(valueCol), col("__trend").as("trend_milli"),
        col("__seasonal").as("seasonal_milli"),
        (col("__detr") - col("__seasonal")).as("remainder_milli"))
  }

  /** SEASONAL STRENGTH per group — "how much of this series' variance
    * does the seasonal cycle explain?": the η² of the season-slot
    * factor, SSB/SST over slots phase = period mod season. 0 = no
    * seasonality, →1 = the calendar IS the series; read it before
    * trusting [[seasonalIndices]] (indices always exist; strength says
    * whether they mean anything) or choosing [[seasonalNaiveWape]] as
    * the baseline.
    *
    * Exact pinned-floor integer (the [[Stats.anovaFMicro]] recipe, per
    * group): A = Σ_slots (10³·s² div c); SSB₍milli₎ = A − 10³·S² div n;
    * SST₍milli₎ = 10³·ΣX² − 10³·S² div n;
    * strength_ppm = 10⁶·max(0, SSB) div SST (the per-slot floors can
    * push a true-zero SSB a few milli-units negative — clamped, so the
    * one division stays over non-negatives).
    *
    * Output per group: (group, n, n_slots, ssb_milli, sst_milli,
    * strength_ppm) — strength NULL for constant series (SST = 0).
    *
    * Scale shape: one (group, slot) map-side-partial groupBy, then a
    * group-grain rollup — the slot grid crosses the shuffle, rows
    * never do twice. */
  def seasonalStrengthPpm(obs: DataFrame, groupCol: String,
                          periodCol: String, valueCol: String,
                          season: Int): DataFrame = {
    require(season >= 2, s"season must be >= 2, got $season")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    obs.select(col(groupCol).as("__g"),
        pmod(col(periodCol).cast("long"), lit(season.toLong)).as("__s"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy(col("__g"), col("__s"))
      .agg(count(lit(1)).cast(d38).as("__c"),
        sum(col("__v").cast(d38)).as("__sv"),
        sum((col("__v") * col("__v")).cast(d38)).as("__sq"))
      .groupBy(col("__g"))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("__k"),
        sum(col("__sv")).as("__st"), sum(col("__sq")).as("__sst"),
        sum(expr("(1000 * __sv * __sv) div __c")).as("__a"))
      .select(col("__g").as(groupCol), col("__n").cast("long").as("n"),
        col("__k").cast("long").as("n_slots"),
        expr("CAST(__a - (1000 * __st * __st) div __n AS BIGINT)")
          .as("ssb_milli"),
        expr("CAST(1000 * __sst - (1000 * __st * __st) div __n AS BIGINT)")
          .as("sst_milli"),
        when(expr("1000 * __sst - (1000 * __st * __st) div __n") === 0,
            lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * greatest(CAST(0 AS DECIMAL(38,0)),
              |  __a - (1000 * __st * __st) div __n))
              |div (1000 * __sst - (1000 * __st * __st) div __n)
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("strength_ppm"))
  }
}
