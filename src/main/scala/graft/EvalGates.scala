package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 gates — ML-evaluation, burstiness/anomaly, graph link
  * prediction, profiling, and finance-window operators (q287+). Split
  * out of `AnalyticsGates` the way that file was split from
  * `CoreQueries`: one domain file per round keeps each under ~1000
  * lines; `SparkEntry` unions the maps.
  *
  * Shared conventions (the CoreQueries contract): events.ts normalized
  * to epoch-µs long by `CoreQueries.tRead`, day grain = `ts div
  * 86400000000` ↔ DuckDB `epoch_us(ts)//86400000000`, exact integer /
  * decimal arithmetic with `div` ↔ HUGEINT `//` (both truncate toward
  * zero on the NON-NEGATIVE quantities every division here is over),
  * surfaced aggregates BIGINT.
  */
object EvalGates {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    CoreQueries.tRead(s, dir, name)

  private val dayUs = 86400000000L
  private val hourUs = 3600000000L

  // BRIER + MURPHY DECOMPOSITION (ops/Stats.brierDecompositionPpm):
  // the q199 reliability spine (value-cents ×20 as a ppm forecast of
  // the purchase label) summarized to one row — overall Brier plus the
  // REL/RES/UNC split, pinned-floor integer form.
  def q287_brier(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.brierDecompositionPpm(
      t(s, dir, "events").select(
        least(lit(999999L), floor(col("value") * 100).cast("long") * 20)
          .as("score_ppm"),
        (col("event_type") === "purchase").as("label")),
      "score_ppm", "label", bins = 10)

  // McNEMAR PAIRED TEST (ops/Stats.mcnemarMilli): two deterministic
  // rule classifiers of the purchase label — A thresholds value-cents
  // at 3500, B fires on event_id % 3 — compared on their discordant
  // cells; χ²₁ and the continuity-corrected variant in milli.
  def q288_mcnemar(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.mcnemarMilli(
      t(s, dir, "events").select(
        (col("event_type") === "purchase").as("label"),
        (floor(col("value") * 100).cast("long") >= 3500L).as("pred_a"),
        (col("event_id") % 3 === 0).as("pred_b")),
      "label", "pred_a", "pred_b")

  // FANO FACTOR (ops/Stats.fanoFactorPpm): burstiness of HOURLY event
  // arrivals per type over the shared global hour spine — zero hours
  // count (they enter through the span, never as rows).
  def q289_fano(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.fanoFactorPpm(
      t(s, dir, "events").select(col("event_type"),
        expr(s"ts div ${hourUs}L").as("hour")),
      "event_type", "hour")

  // ROLLING ANOMALY FLAGS (ops/Stats.rollingAnomalyFlags): each day's
  // event count per type vs its own trailing-14-day baseline
  // (self-excluded), 3σ in the cross-multiplied exact-integer form;
  // < 7 baseline days = NULL ("unknown", not "normal"). Flag surfaced
  // as INT 1/0/NULL — engines' boolean hash surfaces differ.
  def q290_rolling_anomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("day"))
      .agg(count(lit(1)).as("cnt"))
    graft.ops.Stats.rollingAnomalyFlags(daily, "event_type", "day",
        "cnt", windowPeriods = 14, k = 3, minPeriods = 7)
      .withColumn("is_anomaly", col("is_anomaly").cast("int"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q287_brier"           -> q287_brier _,
    "q288_mcnemar"         -> q288_mcnemar _,
    "q289_fano"            -> q289_fano _,
    "q290_rolling_anomaly" -> q290_rolling_anomaly _)

  val oracleSql: Map[String, String] = Map(
    "q287_brier" ->
      """WITH s AS (SELECT least(999999, CAST(floor(value*100) AS BIGINT)*20) AS p,
        |                  event_type='purchase' AS y FROM events),
        |f AS (SELECT p, y FROM s WHERE p IS NOT NULL AND p >= 0 AND p < 1000000),
        |b AS (SELECT p//100000 AS bk, count(*) AS n,
        |             sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
        |             sum(p) AS sp,
        |             sum((p - CASE WHEN y THEN 1000000 ELSE 0 END)
        |               * (p - CASE WHEN y THEN 1000000 ELSE 0 END)) AS sq
        |      FROM f GROUP BY 1),
        |t AS (SELECT sum(n) AS tn, sum(pos) AS tpos FROM b),
        |m AS (SELECT b.n, b.sq, b.sp//b.n AS fb, (1000000*b.pos)//b.n AS ob,
        |             (1000000*t.tpos)//t.tn AS obar, t.tn, t.tpos FROM b, t)
        |SELECT CAST(max(tn) AS BIGINT) AS n, CAST(max(tpos) AS BIGINT) AS n_pos,
        |  CAST(sum(sq) // (max(tn)*1000000) AS BIGINT) AS brier_ppm,
        |  CAST(sum(n*(fb-ob)*(fb-ob)) // (max(tn)*1000000) AS BIGINT)
        |    AS reliability_ppm,
        |  CAST(sum(n*(ob-obar)*(ob-obar)) // (max(tn)*1000000) AS BIGINT)
        |    AS resolution_ppm,
        |  CAST((max(obar)*(1000000-max(obar))) // 1000000 AS BIGINT)
        |    AS uncertainty_ppm
        |FROM m""".stripMargin,
    "q288_mcnemar" ->
      """WITH s AS (SELECT event_type='purchase' AS y,
        |                  CAST(floor(value*100) AS BIGINT) >= 3500 AS a,
        |                  event_id % 3 = 0 AS b2 FROM events),
        |f AS (SELECT y, a, b2 FROM s
        |      WHERE y IS NOT NULL AND a IS NOT NULL AND b2 IS NOT NULL),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN a = y AND b2 <> y THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN a <> y AND b2 = y THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM f)
        |SELECT n, b, c,
        |  CASE WHEN b + c = 0 THEN NULL
        |       ELSE CAST((1000*(b-c)*(b-c)) // (b+c) AS BIGINT) END
        |    AS mcnemar_milli,
        |  CASE WHEN b + c = 0 THEN NULL
        |       ELSE CAST((1000*greatest(abs(b-c)-1, 0)*greatest(abs(b-c)-1, 0))
        |                 // (b+c) AS BIGINT) END AS mcnemar_cc_milli
        |FROM agg""".stripMargin,
    "q289_fano" ->
      """WITH c AS (SELECT event_type AS g, epoch_us(ts)//3600000000 AS tt,
        |                  count(*) AS cnt
        |           FROM events GROUP BY 1, 2),
        |sp AS (SELECT min(tt) AS lo, max(tt) AS hi FROM c),
        |m AS (SELECT g, sum(cnt) AS s, sum(cnt*cnt) AS q FROM c GROUP BY 1)
        |SELECT m.g AS event_type, CAST(sp.hi - sp.lo + 1 AS BIGINT) AS n_periods,
        |  CAST(m.s AS BIGINT) AS n_events,
        |  CAST((1000*m.s) // (sp.hi - sp.lo + 1) AS BIGINT) AS mean_milli,
        |  CASE WHEN m.s = 0 THEN NULL
        |       ELSE CAST((1000000*((sp.hi - sp.lo + 1)*m.q - m.s*m.s))
        |                 // ((sp.hi - sp.lo + 1)*m.s) AS BIGINT) END AS fano_ppm
        |FROM m, sp""".stripMargin,
    "q290_rolling_anomaly" ->
      """WITH d AS (SELECT event_type AS g, epoch_us(ts)//86400000000 AS tt,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1, 2),
        |w AS (SELECT g, tt, x,
        |        count(x) OVER win AS c, sum(x) OVER win AS s,
        |        sum(x*x) OVER win AS q
        |      FROM d WINDOW win AS (PARTITION BY g ORDER BY tt
        |        RANGE BETWEEN 14 PRECEDING AND 1 PRECEDING))
        |SELECT g AS event_type, CAST(tt AS BIGINT) AS day, x AS cnt,
        |  CAST(c AS BIGINT) AS n_baseline,
        |  CASE WHEN c < 7 THEN NULL
        |       WHEN (c*x-s)*(c*x-s) > 9*(c*q-s*s) THEN 1 ELSE 0 END
        |    AS is_anomaly
        |FROM w""".stripMargin)
}
