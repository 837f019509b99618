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

  // MANN–WHITNEY U (ops/RankTests.mannWhitneyMilli): do purchase
  // events carry higher value-cents than non-purchase events —
  // the rank-sum two-sample test, tie-corrected, z² in milli.
  def q291_mann_whitney(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.mannWhitneyMilli(
      t(s, dir, "events").select(
        (col("event_type") === "purchase").as("f"),
        floor(col("value") * 100).cast("long").as("v")),
      "f", "v")

  // KRUSKAL–WALLIS H (ops/RankTests.kruskalWallisMilli): does ANY
  // event type's value distribution sit higher — the k-group rank
  // ANOVA over value-cents, raw and tie-corrected H in milli.
  def q292_kruskal_wallis(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.kruskalWallisMilli(
      t(s, dir, "events").select(col("event_type"),
        floor(col("value") * 100).cast("long").as("v")),
      "event_type", "v")

  // WILCOXON SIGNED-RANK (ops/RankTests.wilcoxonSignedRankMilli):
  // per-user paired spend — first half of the observation span vs the
  // second half (pairing on the user removes between-user variance).
  def q293_wilcoxon(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val mid = ev.agg(expr("(min(ts) + max(ts)) div 2").as("__mid"))
    val pairs = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("ts") < col("__mid"),
          floor(col("value") * 100).cast("long")).otherwise(0L)), lit(0L))
          .as("x"),
        coalesce(sum(when(col("ts") >= col("__mid"),
          floor(col("value") * 100).cast("long")).otherwise(0L)), lit(0L))
          .as("y"))
    graft.ops.RankTests.wilcoxonSignedRankMilli(pairs, "x", "y")
  }

  // MANN–KENDALL SIGNIFICANCE (ops/RankTests.mannKendallMilli):
  // extends q231's S/τ with the tie-corrected variance and z² — is
  // each event type's daily volume actually trending.
  def q294_mann_kendall_z(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.mannKendallMilli(
      t(s, dir, "events")
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("day"))
        .agg(count(lit(1)).as("cnt")),
      "event_type", "day", "cnt")

  // LOG-RANK TEST (ops/RankTests.logRankMilli): do even- and odd-id
  // user cohorts retain differently — durations are per-user active
  // spans in days (closed cohort: all observed), the survival-curve
  // comparison behind q285's Kaplan–Meier plot.
  def q295_log_rank(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.logRankMilli(
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg((max(expr(s"ts div ${dayUs}L")) -
          min(expr(s"ts div ${dayUs}L"))).as("dur"))
        .withColumn("f", col("user_id") % 2 === 0)
        .withColumn("obs", lit(true)),
      "dur", "f", "obs")

  // BENJAMINI–HOCHBERG FDR (ops/RankTests.bhAdjustPpm): each day's
  // purchase-share ppm treated as the test battery's p-value column —
  // the monotone q-value adjustment a 150-test dashboard applies
  // before calling any day anomalous.
  def q296_bh_adjust(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.bhAdjustPpm(
      t(s, dir, "events")
        .groupBy(expr(s"ts div ${dayUs}L").as("day"))
        .agg(expr(
          """(1000000 * sum(CASE WHEN event_type = 'purchase'
            |THEN 1 ELSE 0 END)) div count(1)"""
            .stripMargin.replace("\n", " ")).as("p")),
      "day", "p")

  // MAX DRAWDOWN (ops/EventAnalytics.maxDrawdown): each event type's
  // daily revenue-cents series against its own running peak — worst
  // absolute and relative (ppm-of-peak) fall.
  def q297_drawdown(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.maxDrawdown(
      t(s, dir, "events")
        .where(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("v")),
      "event_type", "day", "v")

  // ECE / MCE (ops/Stats.calibrationErrorPpm): the q287 forecast's
  // expected and max calibration error — the one-row dashboard
  // numbers next to the Brier decomposition.
  def q298_ece(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.calibrationErrorPpm(
      t(s, dir, "events").select(
        least(lit(999999L), floor(col("value") * 100).cast("long") * 20)
          .as("score_ppm"),
        (col("event_type") === "purchase").as("label")),
      "score_ppm", "label", bins = 10)

  // FRIEDMAN TEST (ops/RankTests.friedmanMilli): do the five event
  // types keep the same daily-volume ORDER across days — blocks are
  // days, treatments event types, tie-exact within-block ranks.
  def q299_friedman(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.friedmanMilli(
      t(s, dir, "events").where(col("event_type").isNotNull)
        .groupBy(expr(s"ts div ${dayUs}L").as("blk"), col("event_type"))
        .agg(count(lit(1)).as("cnt")),
      "blk", "event_type", "cnt")

  // COCHRAN–ARMITAGE (ops/RankTests.cochranArmitageMilli): is the
  // purchase share trending over the day index — the ordered 2×k
  // proportion-trend test with the epoch-day as the score.
  def q300_trend_prop(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.cochranArmitageMilli(
      t(s, dir, "events").where(col("event_type").isNotNull).select(
        expr(s"ts div ${dayUs}L").as("w"),
        (col("event_type") === "purchase").as("y")),
      "w", "y")

  // MOMENTS (ops/Stats.momentsByGroup): shape diagnostics of each
  // event type's daily-count series — exact skew² and excess kurtosis
  // from integer power sums, square-root-free.
  def q301_moments(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.momentsByGroup(
      t(s, dir, "events").where(col("event_type").isNotNull)
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("dy"))
        .agg(count(lit(1)).as("x")),
      "event_type", "x")

  // RUNS TEST (ops/RankTests.runsTestMilli): is each event type's
  // daily volume sequence RANDOM around its mean, or does it clump —
  // mean-cut runs with the exact cross-multiplied z².
  def q302_runs_test(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.runsTestMilli(
      t(s, dir, "events").where(col("event_type").isNotNull)
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("day"))
        .agg(count(lit(1)).as("cnt")),
      "event_type", "day", "cnt")

  // DURBIN–WATSON (ops/Stats.durbinWatsonMilli): lag-1 serial
  // correlation of each type's daily-count series in the [0,4]
  // econometrics convention — 2 = white, <2 = momentum.
  def q303_durbin_watson(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.durbinWatsonMilli(
      t(s, dir, "events").where(col("event_type").isNotNull)
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("day"))
        .agg(count(lit(1)).as("cnt")),
      "event_type", "day", "cnt")

  // WELCH'S t² (ops/Stats.welchT2Milli): the unequal-variance A/B test
  // per event type — even/odd user_id split on whole-dollar values; a
  // null split, so t² should hover near 0 (and the arithmetic is exact
  // either way).
  def q304_welch_t2(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.welchT2Milli(
      t(s, dir, "events").where(col("user_id").isNotNull)
        .select(col("event_type"), (col("user_id") % 2 === 0).as("f"),
          floor(col("value")).cast("long").as("v")),
      "event_type", "f", "v")

  // KENDALL τ-b² (ops/Stats.kendallTau2Ppm): concordance between each
  // type's daily event count and daily cents volume — positive by
  // construction (more events ⇒ more volume), with the tie correction
  // exercised on the repeated daily counts.
  def q305_kendall_tau(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.kendallTau2Ppm(
      t(s, dir, "events").where(col("value").isNotNull)
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("dd"))
        .agg(count(lit(1)).as("x"),
          sum(floor(col("value") * 100).cast("long")).as("y")),
      "event_type", "x", "y")

  // ROC CURVE (ops/Stats.rocCurvePoints): full threshold sweep of the
  // q272 planted classifier — whole-dollar score band vs the XOR
  // label; one row per distinct band with exact (tp, fp) prefixes.
  def q306_roc_points(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.rocCurvePoints(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(expr("CAST(floor(value*100) AS LONG) div 100").as("s"),
          ((floor(col("value") * 100).cast("long") >= 3500) =!=
            (col("event_id") % 7 === 0)).cast("long").as("y")),
      "s", "y")

  // AVERAGE PRECISION (ops/Stats.averagePrecisionPpm): the PR-AUC
  // step estimator on the same planted score/label — the imbalance-
  // robust single number next to q198's ROC-AUC.
  def q307_avg_precision(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.averagePrecisionPpm(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(expr("CAST(floor(value*100) AS LONG) div 100").as("s"),
          ((floor(col("value") * 100).cast("long") >= 3500) =!=
            (col("event_id") % 7 === 0)).cast("long").as("y")),
      "s", "y")

  // IVM EXTREMA (ops/Ivm.extremaMaterialize/applyExtremaDelta/
  // extremaSnapshot): min/max maintained under RETRACTS — the q175
  // changelog split (post-cutoff inserts, %7 retracts) driven through
  // the per-key value-multiset auxiliary view, so deleting a current
  // minimum never rescans the base. Oracle recomputes from scratch —
  // incremental ≡ recompute is the whole claim.
  def q308_ivm_extrema(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Ivm
    val li = t(s, dir, "lineitem")
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cents = floor(col("l_extendedprice") * 100).cast("long")
    val aux = Ivm.extremaMaterialize(
      li.filter(col("l_shipdate") < cutoff)
        .select(col("l_partkey"), cents.as("v")),
      Seq("l_partkey"), "v")
    val changes = li.filter(col("l_shipdate") >= cutoff)
      .select(col("l_partkey"), cents.as("v"), lit(1).as("op"))
      .unionByName(li.filter(col("l_shipdate") < cutoff &&
          col("l_orderkey") % 7 === 0)
        .select(col("l_partkey"), cents.as("v"), lit(-1).as("op")))
    Ivm.extremaSnapshot(
      Ivm.applyExtremaDelta(aux, changes, Seq("l_partkey"), "v"),
      Seq("l_partkey"), "v")
  }

  // MODULARITY (ops/GraphOps.modularityPpm): does the q196 supplier
  // co-purchase graph cluster along nations? Newman Q of the
  // nation partition in exact sign + ppm — slightly negative here
  // (co-purchases are nation-agnostic), which is the point: the score
  // grades ANY partition, not just detected communities.
  def q309_modularity(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = o.as("a").join(o.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("x"), col("b.sk").as("y"))
      .agg(count(lit(1)).as("co")).filter(col("co") >= 25)
    graft.ops.GraphOps.modularityPpm(edges, "x", "y",
      t(s, dir, "supplier"), "s_suppkey", "s_nationkey")
  }

  // SEASONAL STRENGTH (ops/Resample.seasonalStrengthPpm): η² of the
  // weekday factor on each type's daily counts — "is there a weekly
  // cycle worth modeling?" Pinned-floor anovaF arithmetic per group.
  def q310_seasonal_strength(s: SparkSession, dir: String): DataFrame =
    graft.ops.Resample.seasonalStrengthPpm(
      t(s, dir, "events").where(col("event_type").isNotNull)
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("dd"))
        .agg(count(lit(1)).as("v")),
      "event_type", "dd", "v", season = 7)

  // POINT-IN-POLYGON (ops/Spatial.pointInPolygon): geofence the q262
  // LCG customer points against a literal pentagon — crossing-number
  // rule folded into one map-only codegen expression, per-nation
  // inside counts. Exact integer cross-products, no joins at all.
  def q311_geofence(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "customer").select(
      col("c_custkey").as("id"), col("c_nationkey").as("nat"),
      ((col("c_custkey") * 1103515245L + 12345L) % 50000L).as("x"),
      ((col("c_custkey") * 69069L + 1L) % 50000L).as("y"))
    graft.ops.Spatial.pointInPolygon(pts, "x", "y",
        Seq((5000L, 5000L), (45000L, 10000L), (40000L, 40000L),
          (20000L, 45000L), (8000L, 30000L)))
      .groupBy(col("nat").as("c_nationkey"))
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("inside"), 1L).otherwise(0L)).as("n_inside"))
  }

  // K-ANONYMITY / L-DIVERSITY (ops/DataQuality.privacyReport): the
  // pre-release privacy screen on customers — quasi-identifiers
  // (nation, segment), sensitive attribute = account-balance sign,
  // k = 15, l = 2. One row of exact violation counts.
  def q312_privacy(s: SparkSession, dir: String): DataFrame =
    graft.ops.DataQuality.privacyReport(
      t(s, dir, "customer").select(col("c_nationkey"),
        col("c_mktsegment"), (col("c_acctbal") >= 0).as("sv")),
      Seq("c_nationkey", "c_mktsegment"), "sv", k = 15, l = 2)

  // CHI-SQUARE GOODNESS-OF-FIT / SRM (ops/Stats.chiSquareGofMilli):
  // the sample-ratio-mismatch screen — observed event-type mix vs the
  // declared uniform 200‰ design, exact pinned-floor χ²·10³.
  def q313_srm_check(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.chiSquareGofMilli(
      t(s, dir, "events"), "event_type",
      Seq("click" -> 200L, "error" -> 200L, "purchase" -> 200L,
        "signup" -> 200L, "view" -> 200L))

  // TWO-COVARIATE OLS (ops/Stats.olsMilli): daily revenue regressed on
  // time AND volume per event type — the "controlling for X" fit,
  // exact Cramer determinants in DECIMAL(38,0), betas in truncated
  // milli. x1 = day mod 1000 keeps the moment matrix small (the
  // documented centering stance).
  def q314_ols(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.olsMilli(
      t(s, dir, "events")
        .where(col("event_type").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("d0"))
        .agg(count(lit(1)).as("x2"),
          sum(floor(col("value") * 100).cast("long")).as("y"))
        .select(col("event_type"), pmod(col("d0"), lit(1000L)).as("x1"),
          col("x2"), col("y")),
      "event_type", "y", "x1", "x2")

  // PERSONALIZED PAGERANK (ops/GraphOps.personalizedPageRank): the
  // q134 document graph re-ranked FROM a trusted seed set (doc_id %
  // 97 == 0) — restart mass only on seeds, unreachable nodes exactly
  // 0. Same unrolled-CTE oracle replay, bit-for-bit.
  def q315_ppr(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nFrame = docs.agg(count(lit(1)).as("__n"))
    val e1 = docs.select(col("doc_id").as("src"),
      expr("doc_id div 2").as("dst"))
    val e2 = docs.crossJoin(broadcast(nFrame))
      .select(col("doc_id").as("src"),
        expr("(doc_id * doc_id + 1) % __n").as("dst"))
    graft.ops.GraphOps.personalizedPageRank(e1.unionByName(e2),
        "src", "dst", docs.where(col("doc_id") % 97 === 0),
        "doc_id", iters = 3, dampingPm = 850)
      .select(col("node").as("doc_id"), col("rank_micro"))
  }

  // POST-STRATIFIED MEAN (ops/Stats.postStratifiedMeanMilli): the
  // composition-drift-adjusted A/B readout — user-parity variants,
  // event-type strata re-weighted to the uniform 200‰ design mix.
  // Pinned-floor micro-mean per stratum, milli surface.
  def q316_post_stratified(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.postStratifiedMeanMilli(
      t(s, dir, "events")
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select(when(col("user_id") % 2 === 0, "even").otherwise("odd")
          .as("variant"), col("event_type"),
          floor(col("value") * 100).cast("long").as("cents")),
      "variant", "event_type", "cents",
      Seq("click" -> 200L, "error" -> 200L, "purchase" -> 200L,
        "signup" -> 200L, "view" -> 200L))

  // BRADLEY–TERRY (ops/RankTests.bradleyTerryMicro): the arena-style
  // pairwise-preference ranking — event types play daily-volume
  // head-to-heads (tie days drop), 3 MM iterations in exact integer
  // micro; the oracle replays the unrolled recurrence bit-for-bit.
  def q317_bradley_terry(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "events").where(col("event_type").isNotNull)
      .groupBy(col("event_type").as("g"),
        expr(s"ts div ${dayUs}L").as("dd"))
      .agg(count(lit(1)).as("c"))
    val m = d.as("a").join(d.as("b"),
        col("a.dd") === col("b.dd") && col("a.g") < col("b.g"))
      .where(col("a.c") =!= col("b.c"))
      .select(when(col("a.c") > col("b.c"), col("a.g"))
          .otherwise(col("b.g")).as("w"),
        when(col("a.c") > col("b.c"), col("b.g"))
          .otherwise(col("a.g")).as("l"))
      .groupBy(col("w"), col("l")).agg(count(lit(1)).as("n"))
    graft.ops.RankTests.bradleyTerryMicro(m, "w", "l", "n", iters = 3)
  }

  // DIFFERENCE-IN-DIFFERENCES (ops/Stats.didMicro): even-user "treat"
  // vs odd "control", pre/post the q225 Jan-16 split — four pinned-
  // floor micro cell means, estimate by pure signed addition (no
  // signed division anywhere).
  def q318_did(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.didMicro(
      t(s, dir, "events")
        .where(col("user_id").isNotNull && col("value").isNotNull)
        .select((col("user_id") % 2 === 0).as("treat"),
          (expr(s"ts div ${dayUs}L") >= 19738L).as("post"),
          floor(col("value") * 100).cast("long").as("cents")),
      "treat", "post", "cents")

  // NELSON–AALEN (ops/EventAnalytics.nelsonAalenPpm): cumulative
  // hazard by tenure — the prefix-SUM companion to q285's KM product,
  // riding the checkpoint-offset running sum over the q227 life table.
  def q319_nelson_aalen(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.nelsonAalenPpm(
      t(s, dir, "events"), "user_id", "ts", periodUs = dayUs)

  // ROLLING DISTINCT ACTIVES (ops/EventAnalytics.rollingActive): exact
  // 7-day weekly-active-PURCHASERS per observed day (the full event
  // stream saturates at the fixture's 150 users — purchases vary
  // 56..146) — (period, id) pairs replicate forward 7 slots and
  // de-duplicate; the approximate sibling is q183's sliding HLL merge.
  def q320_wau(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.rollingActive(
      t(s, dir, "events").where(col("user_id").isNotNull &&
          col("event_type") === "purchase")
        .select(expr(s"ts div ${dayUs}L").as("dd"), col("user_id")),
      "dd", "user_id", window = 7)

  // SPLIT CONFORMAL (ops/Stats.conformalResidualQuantile): the 80%
  // prediction-interval radius for the q228 seasonal-naive forecast —
  // k-th smallest |residual| with the finite-sample (n+1) adjustment.
  def q321_conformal(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("dd"))
    val daily = t(s, dir, "events").where(col("event_type").isNotNull)
      .groupBy(col("event_type").as("g"),
        expr(s"ts div ${dayUs}L").as("dd"))
      .agg(count(lit(1)).as("cnt"))
    val cal = daily.withColumn("fc", lag(col("cnt"), 7).over(w))
      .where(col("fc").isNotNull)
    graft.ops.Stats.conformalResidualQuantile(cal, "g", "cnt", "fc",
        alphaPm = 200)
      .withColumnRenamed("g", "event_type")
  }

  // MANTEL–HAENSZEL (ops/Stats.mantelHaenszelMilli): pooled odds
  // ratio of (user parity → big-ticket event) stratified by event
  // type — the Simpson-proof 2×2 family capstone next to q203/q215.
  def q322_mantel_haenszel(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.mantelHaenszelMilli(
      t(s, dir, "events")
        .where(col("event_type").isNotNull && col("user_id").isNotNull
          && col("value").isNotNull)
        .select(col("event_type"), (col("user_id") % 2 === 0).as("e"),
          (floor(col("value") * 100).cast("long") >= 3500L).as("y")),
      "event_type", "e", "y")

  // DEGREE ASSORTATIVITY (ops/GraphOps.degreeAssortativity): do
  // high-degree suppliers co-purchase with other hubs? Slightly
  // disassortative here (hub-and-spoke), like most co-occurrence
  // graphs — exact endpoint-degree Pearson over both orientations.
  def q323_assortativity(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = o.as("a").join(o.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("x"), col("b.sk").as("y"))
      .agg(count(lit(1)).as("co")).filter(col("co") >= 25)
    graft.ops.GraphOps.degreeAssortativity(edges, "x", "y")
  }

  // ADDITIVE DECOMPOSITION (ops/Resample.decomposeAdditive): each
  // type's daily counts split into ±3-day trend, weekday seasonal,
  // and remainder — sign-magnitude divisions throughout so negative
  // rounding can't drift between engines.
  def q324_decompose(s: SparkSession, dir: String): DataFrame =
    graft.ops.Resample.decomposeAdditive(
      t(s, dir, "events").where(col("event_type").isNotNull)
        .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("dd"))
        .agg(count(lit(1)).as("cnt")),
      "event_type", "dd", "cnt", season = 7, halfWindow = 3)

  // COARSENED EXACT MATCHING (ops/Stats.cemAttMicro): ATT of user
  // parity on spend, matched within (event_type, weekday) strata —
  // the observational causal estimator next to q318's DiD; unmatched
  // mass surfaces in counts, never silently drops.
  def q325_cem_att(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.cemAttMicro(
      t(s, dir, "events")
        .where(col("user_id").isNotNull && col("event_type").isNotNull
          && col("value").isNotNull)
        .select((col("user_id") % 2 === 0).as("treat"),
          concat(col("event_type"), lit("#"),
            pmod(expr(s"ts div ${dayUs}L"), lit(7L)).cast("string"))
            .as("stratum"),
          floor(col("value") * 100).cast("long").as("cents")),
      "treat", "stratum", "cents")

  // CAPTURE–RECAPTURE (ops/Stats.captureRecapture): Chapman estimate
  // of the true user population from two PARTIAL purchase samples
  // (first 7 days vs last 15) — n̂ recovers the fixture's 150 users
  // from 143- and 145-user catches.
  def q326_capture_recapture(s: SparkSession, dir: String): DataFrame = {
    def sample(cond: org.apache.spark.sql.Column) =
      t(s, dir, "events").where(col("event_type") === "purchase" &&
        col("user_id").isNotNull && cond)
    graft.ops.Stats.captureRecapture(
      sample(expr(s"ts div ${dayUs}L") < 19730L),
      sample(expr(s"ts div ${dayUs}L") >= 19745L), "user_id")
  }

  // VOCABULARY RICHNESS (llm/LanguageModel.vocabularyRichness): Chao1
  // lower bound + Good–Turing unseen mass per language — the corpus-
  // saturation diagnostic next to q107's frequency spectrum (exercises
  // the f2 = 0 bias-corrected branch on this closed-vocab fixture).
  def q327_vocab_richness(s: SparkSession, dir: String): DataFrame =
    graft.llm.LanguageModel.vocabularyRichness(
      t(s, dir, "documents"), "text", Seq("lang"))

  // HOLM STEP-DOWN (ops/RankTests.holmAdjustPpm): the FWER adjustment
  // over q296's p-value battery — prefix-max of (m−rank+1)-scaled
  // p-values, checkpoint-offset scan, no global window.
  def q328_holm_adjust(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.holmAdjustPpm(
      t(s, dir, "events")
        .groupBy(expr(s"ts div ${dayUs}L").as("day"))
        .agg(expr(
          """(1000000 * sum(CASE WHEN event_type = 'purchase'
            |THEN 1 ELSE 0 END)) div count(1)"""
            .stripMargin.replace("\n", " ")).as("p")),
      "day", "p")

  // KISH DESIGN EFFECT (ops/Stats.designEffectMilli): variance
  // inflation of user-clustered event data — the n_eff correction a
  // user-randomized A/B divides by before quoting power.
  def q329_design_effect(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.designEffectMilli(
      t(s, dir, "events").where(col("user_id").isNotNull), "user_id")

  // EMPIRICAL-BAYES SHRINKAGE (ops/Stats.shrunkRatesPpm): per-user
  // purchase rates pulled toward a Beta(5, 20) prior (the 200‰ design
  // mean, worth 25 observations) — the smoothed-CTR ranking fix.
  def q330_shrunk_rates(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.shrunkRatesPpm(
      t(s, dir, "events").where(col("user_id").isNotNull)
        .select(col("user_id"),
          (col("event_type") === "purchase").cast("long").as("h")),
      "user_id", "h", priorAlpha = 5L, priorBeta = 20L)

  // ONE-SAMPLE KS vs DISCRETE UNIFORM (ops/Stats.ksUniformPpm): is
  // user_id mod 97 uniform on [0, 96]? It is NOT (150 users wrap the
  // residue ring 1.55 times) — D ≈ 0.159, which is the point: the
  // audit catches exactly this kind of modulo bias in a partitioner.
  def q331_ks_uniform(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.ksUniformPpm(
      t(s, dir, "events").where(col("user_id").isNotNull)
        .select((col("user_id") % 97).as("v")),
      "v", lo = 0L, hi = 96L)

  // RICH CLUB (ops/GraphOps.richClubPpm): the supplier co-purchase
  // hubs densify from 36% at k=5 to 59% at k=40 — the cutoff profile
  // behind q323's single assortativity number. One tagged pass, the
  // whole k-list rides a literal explode.
  def q332_rich_club(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = o.as("a").join(o.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("x"), col("b.sk").as("y"))
      .agg(count(lit(1)).as("co")).filter(col("co") >= 25)
    graft.ops.GraphOps.richClubPpm(edges, "x", "y",
      Seq(5L, 10L, 20L, 40L))
  }

  // RECIPROCITY (ops/GraphOps.reciprocityPpm): the q134 document
  // graph is a near-pure broadcast hierarchy — 1.4% of directed links
  // are returned; self-loops excluded by contract.
  def q333_reciprocity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nFrame = docs.agg(count(lit(1)).as("__n"))
    val e = docs.select(col("doc_id").as("src"),
        expr("doc_id div 2").as("dst"))
      .unionByName(docs.crossJoin(broadcast(nFrame))
        .select(col("doc_id").as("src"),
          expr("(doc_id * doc_id + 1) % __n").as("dst")))
    graft.ops.GraphOps.reciprocityPpm(e, "src", "dst")
  }

  // RESTRICTED MEAN SURVIVAL TIME (ops/EventAnalytics.rmstMilli):
  // ∫₀³⁰ S(t)dt over the q285 KM curve — 28.77 days of average
  // lifetime inside the 30-day window, exact step-function area.
  def q334_rmst(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.rmstMilli(
      t(s, dir, "events"), "user_id", "ts", periodUs = dayUs,
      tauPeriods = 30L)

  // COHORT VALUE CURVES (ops/EventAnalytics.cohortValue): weekly
  // first-purchase cohorts (121/27/2 users) and their cumulative
  // spend per member by age — the LTV table next to q158's retention
  // triangle. Divides by who STARTED, exact milli.
  def q335_cohort_ltv(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.cohortValue(
      t(s, dir, "events").where(col("event_type") === "purchase" &&
          col("value").isNotNull)
        .select(col("user_id"), col("ts"),
          floor(col("value") * 100).cast("long").as("cents")),
      "user_id", "ts", "cents", periodUs = dayUs, bucketPeriods = 7L)

  // HARRELL'S C-INDEX (ops/EventAnalytics.cIndexPpm): does total spend
  // RANK user tenures? The predictive-validity number next to the
  // q285/q334 life-table reads — subjects are users (tenure in days,
  // "event" = the user ever purchased, score = lifetime cents),
  // bucketed 32×32 so the pair enumeration stays a bounded grid.
  def q376_c_index(s: SparkSession, dir: String): DataFrame = {
    val subj = t(s, dir, "events").where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg((max(expr(s"ts div ${dayUs}L")) -
          min(expr(s"ts div ${dayUs}L"))).as("tenure"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("event"),
        coalesce(sum(floor(col("value") * 100).cast("long")), lit(0L))
          .as("score"))
    graft.ops.EventAnalytics.cIndexPpm(subj, "tenure", "event",
      "score", timeBuckets = 32, scoreBuckets = 32)
  }

  // QINI UPLIFT CURVE (ops/Stats.qiniCurveMilli): does lifetime spend
  // rank where the user-parity "treatment" moved purchases? The
  // null-effect experiment read next to q371's underpowered probe —
  // the curve should wobble around 0, and the gate hashes every
  // depth's reweighted increment.
  def q377_qini_curve(s: SparkSession, dir: String): DataFrame = {
    // outcome = a BIG purchase (≥ 20,000 cents) — every user has some
    // purchase, so the plain flag is degenerate; the big-ticket flag
    // converts 21% of users at sf0.01
    val subj = t(s, dir, "events").where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
            floor(col("value") * 100).cast("long") >= 20000L, 1L)
          .otherwise(0L)).as("event"),
        coalesce(sum(floor(col("value") * 100).cast("long")), lit(0L))
          .as("score"))
      .select((col("user_id") % 2 === 0).as("treated"), col("event"),
        col("score"))
    graft.ops.Stats.qiniCurveMilli(subj, "treated", "event", "score",
      bins = 10)
  }

  // q377's uplift subject frame (parity "treatment", big-ticket
  // outcome, lifetime-cents score) — shared by the curve (q377), its
  // AUUC scalar (q378) and the calibration table (q379)
  private def upliftSubjects(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
            floor(col("value") * 100).cast("long") >= 20000L, 1L)
          .otherwise(0L)).as("event"),
        coalesce(sum(floor(col("value") * 100).cast("long")), lit(0L))
          .as("score"))
      .select(col("user_id"), (col("user_id") % 2 === 0).as("treated"),
        col("event"), col("score"))

  // AUUC / QINI COEFFICIENT (ops/Stats.qiniAucMilli): the leaderboard
  // scalar over q377's curve — integer trapezoid vs the random
  // diagonal on the SAME subject frame, so the null-effect experiment
  // should land the coefficient near 0 (the wobble integrates out).
  def q378_qini_auc(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.qiniAucMilli(
      upliftSubjects(s, dir).select(col("treated"), col("event"),
        col("score")),
      "treated", "event", "score", bins = 10)

  // UPLIFT CALIBRATION (ops/Stats.upliftCalibrationMilli): per
  // predicted-uplift bin, predicted vs realized treatment effect —
  // the decision-layer readout next to q377/q378. The gate's
  // "prediction" is a deterministic null predictor in milli
  // (score % 400 − 200), so realized uplift should wobble around 0
  // while mean_pred walks the [−200, 199] ramp — a MIScalibrated
  // pair, which is exactly what the table must expose.
  def q379_uplift_calibration(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.upliftCalibrationMilli(
      upliftSubjects(s, dir).select(col("treated"), col("event"),
        expr("score % 400 - 200").as("pred")),
      "treated", "event", "pred", bins = 10)

  // SAMPLE-RATIO MISMATCH (ops/Stats.srmCheckMilli): the assignment
  // sanity gate every A/B readout should run FIRST — user-parity
  // assignment measured at the EVENT grain (the realistic SRM setup:
  // assignment is per-user, logging is per-event, and heavy users
  // skew the realized split). One-df chi-square vs the designed 500
  // per-mille, pinned 3841 critical value.
  def q381_srm_check(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.srmCheckMilli(
      t(s, dir, "events").where(col("user_id").isNotNull)
        .select((col("user_id") % 2 === 0).as("arm")),
      "arm", expectAPm = 500L)

  // POST-STRATIFIED ATE (ops/Stats.postStratifiedAteMilli): the
  // pooled diff-in-means vs the event-type-stratified weighted delta
  // on the parity split — when arm composition differs across strata
  // the pooled number confounds mix with effect; the gate surfaces
  // both so the disagreement is the readout.
  def q382_post_strat_ate(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.postStratifiedAteMilli(
      t(s, dir, "events")
        .where(col("value").isNotNull && col("user_id").isNotNull &&
          col("event_type").isNotNull)
        .select((col("user_id") % 2 === 0).as("arm"),
          floor(col("value") * 100).cast("long").as("cents"),
          col("event_type").as("stratum")),
      "arm", "cents", "stratum")

  // QUANTILE TREATMENT EFFECTS (ops/Stats.quantileTreatmentEffect):
  // the distributional companion of q382's ATE on the q377 subject
  // frame — per decile, the treated arm's exact type-1 spend quantile
  // minus the control arm's, every cell an exact integer in cents.
  // On the parity null experiment the schedule should wobble around 0
  // at every depth; a whale-only effect would light up only d9.
  def q384_qte(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.quantileTreatmentEffect(
      upliftSubjects(s, dir).select(col("treated"), col("score")),
      "treated", "score", (1 to 9).map(i => (s"d$i", i * 100)))

  // RANKER AGREEMENT (llm/Relevance.rankerAgreement): top-20 set
  // Jaccard between q266's two rankers (exact cosine vs the Hamming
  // sign sketch) per query — quantifies how much the fusion actually
  // widens recall before paying for it.
  def q336_ranker_agreement(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qs = emb.where(col("vec_id") < 8)
    // dense leg through the unified ANN dispatch (Similarity.topK):
    // exact below bruteForceThreshold (oracle unchanged), LSH/indexed
    // past it — the q336 sf1 rehearsal flagged the direct brute call;
    // this is its documented scale route, spec-pinned in LlmOpsSpec.
    val dense = graft.llm.Similarity.topK(
        qs, emb, "vec_id", "embedding", k = 20)
      .select(col("query_id"), col("cand_id"))
    val ham = graft.llm.Similarity.hammingTopK(
        qs, emb, idCol = "vec_id", vecCol = "embedding", dim = 64, k = 20)
      .select(col("query_id"), col("cand_id"))
    graft.llm.Relevance.rankerAgreement(dense, ham, "query_id",
      "cand_id")
  }

  // DAG HIERARCHY CLOSURE (ops/Hierarchy.ancestors): the diamond-heavy
  // bill-of-materials case the q202 tree gate can't exercise — every
  // doc has TWO parents (doc−1 and doc−2), so each (node, ancestor)
  // pair is reachable along exponentially many paths and only the
  // per-hop frontier distinct keeps the closure at one row per
  // (node, ancestor, depth). Oracle = DuckDB WITH RECURSIVE ... UNION
  // (distinct) — the same dedup-as-you-go semantics.
  def q337_hierarchy_dag(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").where(col("doc_id") >= 2)
    val edges = d.select(col("doc_id").as("child"),
        (col("doc_id") - 1).as("parent"))
      .unionByName(d.select(col("doc_id").as("child"),
        (col("doc_id") - 2).as("parent")))
    graft.ops.Hierarchy.ancestors(edges, "child", "parent", maxDepth = 8)
  }

  // RANK-BIASED OVERLAP (llm/Relevance.rboPpm): the rank-WEIGHTED
  // companion of q336's set Jaccard over the same two rankers —
  // p = 9/10 persistence, per-depth pinned floors summed in ppm, so
  // top-rank disagreement costs more than tail disagreement.
  def q340_rbo(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qs = emb.where(col("vec_id") < 8)
    val dense = graft.llm.Similarity.topK(
        qs, emb, "vec_id", "embedding", k = 20)
      .select(col("query_id"), col("cand_id"), col("rnk"))
    val ham = graft.llm.Similarity.hammingTopK(
        qs, emb, idCol = "vec_id", vecCol = "embedding", dim = 64, k = 20)
      .select(col("query_id"), col("cand_id"), col("rnk"))
    graft.llm.Relevance.rboPpm(dense, ham, "query_id", "cand_id",
      "rnk", k = 20)
  }

  // GROUP-SEQUENTIAL OBF BOUNDARIES (ops/Stats.groupSequentialObfMilli):
  // five interim looks over the event horizon — arm = user_id parity,
  // hit = purchase, look = the day index binned into fifths of the
  // observed [min_day, max_day] span via a broadcast 1-row frame
  // (lazy, the q343 nFrame shape). The exact integer z² schedule is
  // compared against the one-constant OBF boundary 4162·K div k
  // (1000·2.04², the published C_B(5, 0.05) table value) — the
  // sequential-monitoring piece missing from the fixed-horizon A/B
  // battery (q316, q328–q331).
  def q364_group_sequential(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(expr(s"ts div ${dayUs}L").as("day"),
        (col("user_id") % 2 === 0).as("arm"),
        (col("event_type") === "purchase").cast("long").as("hit"))
    val mm = e.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val binned = e.crossJoin(broadcast(mm))
      .select(expr("1L + ((day - __d0) * 5) div (__d1 - __d0 + 1)")
        .as("look"), col("arm"), col("hit"))
    graft.ops.Stats.groupSequentialObfMilli(binned, "look", "arm",
      "hit", looks = 5)
  }

  // POCOCK FLAT BOUNDARIES (schedule = "pocock"): the same five looks
  // as q364 against Pocock's constant critical z² (5823 =
  // round(1000·2.413²), the published C_P(5, 0.05)) — the
  // cheap-early-stop / expensive-final-look design next to OBF's
  // conservative-early schedule, on the identical cumulative z² path.
  def q366_pocock_sequential(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .where(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(expr(s"ts div ${dayUs}L").as("day"),
        (col("user_id") % 2 === 0).as("arm"),
        (col("event_type") === "purchase").cast("long").as("hit"))
    val mm = e.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val binned = e.crossJoin(broadcast(mm))
      .select(expr("1L + ((day - __d0) * 5) div (__d1 - __d0 + 1)")
        .as("look"), col("arm"), col("hit"))
    graft.ops.Stats.groupSequentialObfMilli(binned, "look", "arm",
      "hit", looks = 5, zFinal2Milli = 5823L, schedule = "pocock")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q364_group_sequential" -> q364_group_sequential _,
    "q366_pocock_sequential" -> q366_pocock_sequential _,
    "q340_rbo"             -> q340_rbo _,
    "q337_hierarchy_dag"   -> q337_hierarchy_dag _,
    "q287_brier"           -> q287_brier _,
    "q288_mcnemar"         -> q288_mcnemar _,
    "q289_fano"            -> q289_fano _,
    "q290_rolling_anomaly" -> q290_rolling_anomaly _,
    "q291_mann_whitney"    -> q291_mann_whitney _,
    "q292_kruskal_wallis"  -> q292_kruskal_wallis _,
    "q293_wilcoxon"        -> q293_wilcoxon _,
    "q294_mann_kendall_z"  -> q294_mann_kendall_z _,
    "q295_log_rank"        -> q295_log_rank _,
    "q296_bh_adjust"       -> q296_bh_adjust _,
    "q297_drawdown"        -> q297_drawdown _,
    "q298_ece"             -> q298_ece _,
    "q299_friedman"        -> q299_friedman _,
    "q300_trend_prop"      -> q300_trend_prop _,
    "q301_moments"         -> q301_moments _,
    "q302_runs_test"       -> q302_runs_test _,
    "q303_durbin_watson"   -> q303_durbin_watson _,
    "q304_welch_t2"        -> q304_welch_t2 _,
    "q305_kendall_tau"     -> q305_kendall_tau _,
    "q306_roc_points"      -> q306_roc_points _,
    "q307_avg_precision"   -> q307_avg_precision _,
    "q308_ivm_extrema"     -> q308_ivm_extrema _,
    "q309_modularity"      -> q309_modularity _,
    "q310_seasonal_strength" -> q310_seasonal_strength _,
    "q311_geofence"        -> q311_geofence _,
    "q312_privacy"         -> q312_privacy _,
    "q313_srm_check"       -> q313_srm_check _,
    "q314_ols"             -> q314_ols _,
    "q315_ppr"             -> q315_ppr _,
    "q316_post_stratified" -> q316_post_stratified _,
    "q317_bradley_terry"   -> q317_bradley_terry _,
    "q318_did"             -> q318_did _,
    "q319_nelson_aalen"    -> q319_nelson_aalen _,
    "q320_wau"             -> q320_wau _,
    "q321_conformal"       -> q321_conformal _,
    "q322_mantel_haenszel" -> q322_mantel_haenszel _,
    "q323_assortativity"   -> q323_assortativity _,
    "q324_decompose"       -> q324_decompose _,
    "q325_cem_att"         -> q325_cem_att _,
    "q326_capture_recapture" -> q326_capture_recapture _,
    "q327_vocab_richness"  -> q327_vocab_richness _,
    "q328_holm_adjust"     -> q328_holm_adjust _,
    "q329_design_effect"   -> q329_design_effect _,
    "q330_shrunk_rates"    -> q330_shrunk_rates _,
    "q331_ks_uniform"      -> q331_ks_uniform _,
    "q332_rich_club"       -> q332_rich_club _,
    "q333_reciprocity"     -> q333_reciprocity _,
    "q334_rmst"            -> q334_rmst _,
    "q335_cohort_ltv"      -> q335_cohort_ltv _,
    "q336_ranker_agreement" -> q336_ranker_agreement _,
    "q376_c_index"         -> q376_c_index _,
    "q377_qini_curve"      -> q377_qini_curve _,
    "q378_qini_auc"        -> q378_qini_auc _,
    "q379_uplift_calibration" -> q379_uplift_calibration _,
    "q381_srm_check"       -> q381_srm_check _,
    "q382_post_strat_ate"  -> q382_post_strat_ate _,
    "q384_qte"             -> q384_qte _)

  /** 9^(d−1) / 10^d rows for the q340 oracle — generated here so the
    * HUGEINT literals can't drift from [[graft.llm.Relevance.rboPpm]]'s
    * long powers. */
  private val rboPowRows: String = {
    val p9 = Iterator.iterate(BigInt(1))(_ * 9).take(20).toSeq
    val p10 = Iterator.iterate(BigInt(10))(_ * 10).take(20).toSeq
    (1 to 20).map(d =>
      s"(${d}, ${p9(d - 1)}::HUGEINT, ${p10(d - 1)}::HUGEINT)")
      .mkString(", ")
  }

  val oracleSql: Map[String, String] = Map(
    "q366_pocock_sequential" ->
      """WITH e AS (
        |  SELECT epoch_us(ts)//86400000000 AS day,
        |         (user_id % 2 = 0) AS arm,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |b AS (SELECT 1 + ((e.day - mm.d0) * 5) // (mm.d1 - mm.d0 + 1)
        |        AS look, arm, hit
        |      FROM e, mm),
        |per AS (SELECT look,
        |          sum(CASE WHEN arm THEN 1 ELSE 0 END) AS na_k,
        |          sum(CASE WHEN arm THEN 0 ELSE 1 END) AS nb_k,
        |          sum(CASE WHEN arm THEN hit ELSE 0 END) AS xa_k,
        |          sum(CASE WHEN arm THEN 0 ELSE hit END) AS xb_k
        |        FROM b WHERE look BETWEEN 1 AND 5 GROUP BY 1),
        |cum AS (SELECT a.look,
        |          sum(b.na_k) AS na, sum(b.nb_k) AS nb,
        |          sum(b.xa_k) AS xa, sum(b.xb_k) AS xb
        |        FROM per a JOIN per b ON b.look <= a.look GROUP BY 1),
        |z AS (SELECT look, na, nb, xa, xb,
        |        5823 AS bound2,
        |        CASE WHEN na = 0 OR nb = 0 OR xa + xb = 0
        |               OR xa + xb = na + nb THEN NULL
        |          ELSE (1000 * (CAST(xa AS HUGEINT)*nb - CAST(xb AS HUGEINT)*na)
        |                     * (CAST(xa AS HUGEINT)*nb - CAST(xb AS HUGEINT)*na)
        |                     * (na + nb))
        |            // (CAST(na AS HUGEINT) * nb * (xa + xb)
        |                * (na + nb - xa - xb))
        |        END AS z2
        |      FROM cum)
        |SELECT CAST(look AS BIGINT) AS look,
        |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CAST(xa AS BIGINT) AS xa, CAST(xb AS BIGINT) AS xb,
        |  CAST(bound2 AS BIGINT) AS bound2_milli,
        |  CAST(z2 AS BIGINT) AS z2_milli,
        |  CAST(CASE WHEN z2 IS NOT NULL AND z2 >= bound2
        |       THEN 1 ELSE 0 END AS BIGINT) AS crossed
        |FROM z""".stripMargin,
    "q364_group_sequential" ->
      """WITH e AS (
        |  SELECT epoch_us(ts)//86400000000 AS day,
        |         (user_id % 2 = 0) AS arm,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |b AS (SELECT 1 + ((e.day - mm.d0) * 5) // (mm.d1 - mm.d0 + 1)
        |        AS look, arm, hit
        |      FROM e, mm),
        |per AS (SELECT look,
        |          sum(CASE WHEN arm THEN 1 ELSE 0 END) AS na_k,
        |          sum(CASE WHEN arm THEN 0 ELSE 1 END) AS nb_k,
        |          sum(CASE WHEN arm THEN hit ELSE 0 END) AS xa_k,
        |          sum(CASE WHEN arm THEN 0 ELSE hit END) AS xb_k
        |        FROM b WHERE look BETWEEN 1 AND 5 GROUP BY 1),
        |cum AS (SELECT a.look,
        |          sum(b.na_k) AS na, sum(b.nb_k) AS nb,
        |          sum(b.xa_k) AS xa, sum(b.xb_k) AS xb
        |        FROM per a JOIN per b ON b.look <= a.look GROUP BY 1),
        |z AS (SELECT look, na, nb, xa, xb,
        |        (4162 * 5) // look AS bound2,
        |        CASE WHEN na = 0 OR nb = 0 OR xa + xb = 0
        |               OR xa + xb = na + nb THEN NULL
        |          ELSE (1000 * (CAST(xa AS HUGEINT)*nb - CAST(xb AS HUGEINT)*na)
        |                     * (CAST(xa AS HUGEINT)*nb - CAST(xb AS HUGEINT)*na)
        |                     * (na + nb))
        |            // (CAST(na AS HUGEINT) * nb * (xa + xb)
        |                * (na + nb - xa - xb))
        |        END AS z2
        |      FROM cum)
        |SELECT CAST(look AS BIGINT) AS look,
        |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CAST(xa AS BIGINT) AS xa, CAST(xb AS BIGINT) AS xb,
        |  CAST(bound2 AS BIGINT) AS bound2_milli,
        |  CAST(z2 AS BIGINT) AS z2_milli,
        |  CAST(CASE WHEN z2 IS NOT NULL AND z2 >= bound2
        |       THEN 1 ELSE 0 END AS BIGINT) AS crossed
        |FROM z""".stripMargin,
    "q340_rbo" ->
      s"""WITH norm AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |        AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings),
        |cpairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(
        |        list_zip(q.embedding, c.embedding),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)
        |          AS DECIMAL(38,15)))) AS DOUBLE)
        |      / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE))
        |      AS cosine
        |  FROM norm q JOIN norm c
        |    ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |dense AS (SELECT query_id, cand_id, rnk FROM
        |  (SELECT *, row_number() OVER (PARTITION BY query_id
        |     ORDER BY cosine DESC, cand_id ASC) AS rnk FROM cpairs)
        |  WHERE rnk <= 20),
        |sk AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1,33),
        |      i -> CASE WHEN embedding[i] > 0
        |        THEN (1::BIGINT << (i-1)) ELSE 0 END)) AS BIGINT) AS w0,
        |    CAST(list_sum(list_transform(range(33,65),
        |      i -> CASE WHEN embedding[i] > 0
        |        THEN (1::BIGINT << (i-33)) ELSE 0 END)) AS BIGINT) AS w1
        |  FROM embeddings),
        |hpairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
        |      AS hamming
        |  FROM sk q JOIN sk c
        |    ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |ham AS (SELECT query_id, cand_id, rnk FROM
        |  (SELECT *, row_number() OVER (PARTITION BY query_id
        |     ORDER BY hamming ASC, cand_id ASC) AS rnk FROM hpairs)
        |  WHERE rnk <= 20),
        |shared AS (
        |  SELECT d.query_id, greatest(d.rnk, h.rnk) AS first_d
        |  FROM dense d JOIN ham h USING (query_id, cand_id)),
        |powt(d, p9, p10) AS (SELECT * FROM (VALUES $rboPowRows)),
        |spine AS (
        |  SELECT query_id, p.d AS depth,
        |    CAST(count(*) AS HUGEINT) AS x, max(p.p9) AS p9,
        |    max(p.p10) AS p10
        |  FROM shared JOIN powt p ON p.d >= shared.first_d
        |  GROUP BY 1, 2),
        |terms AS (
        |  SELECT query_id,
        |    CAST(sum((1000000::HUGEINT * p9 * x) // (p10 * depth))
        |      AS BIGINT) AS rbo
        |  FROM spine GROUP BY 1),
        |uq AS (SELECT DISTINCT query_id FROM dense
        |       UNION SELECT DISTINCT query_id FROM ham)
        |SELECT uq.query_id,
        |  CAST(coalesce(terms.rbo, 0) AS BIGINT) AS rbo_ppm
        |FROM uq LEFT JOIN terms USING (query_id)""".stripMargin,
    "q337_hierarchy_dag" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS c, doc_id - 1 AS p FROM documents WHERE doc_id >= 2
        |  UNION
        |  SELECT doc_id AS c, doc_id - 2 AS p FROM documents WHERE doc_id >= 2),
        |anc AS (
        |  SELECT c AS node, p AS ancestor, 1 AS depth FROM e
        |  UNION
        |  SELECT anc.node, e.p, anc.depth + 1
        |  FROM anc JOIN e ON e.c = anc.ancestor
        |  WHERE anc.depth < 8)
        |SELECT CAST(node AS BIGINT) AS node,
        |  CAST(ancestor AS BIGINT) AS ancestor,
        |  CAST(depth AS INT) AS depth FROM anc""".stripMargin,
    "q287_brier" ->
      """WITH s AS (SELECT least(999999, CAST(floor(value*100) AS BIGINT)*20) AS p,
        |                  event_type='purchase' AS y FROM events),
        |f AS (SELECT p, y FROM s WHERE p IS NOT NULL AND p >= 0 AND p <= 1000000),
        |b AS (SELECT least(p//100000, 9) AS bk, count(*) AS n,
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
        |FROM w""".stripMargin,
    "q291_mann_whitney" ->
      """WITH b AS (SELECT event_type='purchase' AS f,
        |                  CAST(floor(value*100) AS BIGINT) AS v
        |           FROM events
        |           WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |h AS (SELECT v, count(*) AS t,
        |             sum(CASE WHEN f THEN 1 ELSE 0 END) AS a
        |      FROM b GROUP BY v),
        |r AS (SELECT v, t, a,
        |             2*(sum(t) OVER (ORDER BY v) - t) + t + 1 AS r2 FROM h),
        |agg AS (SELECT sum(a) AS na, sum(t-a) AS nb, sum(a*r2) AS ra2,
        |               sum(t*t*t - t) AS tt FROM r)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(ra2 - na*(na+1) AS BIGINT) AS u2_a,
        |  CAST(tt AS BIGINT) AS tie_t,
        |  CASE WHEN na=0 OR nb=0 OR (na+nb+1)*(na+nb)*(na+nb-1) = tt
        |       THEN NULL
        |       ELSE CAST((3000*(ra2 - na*(na+1) - na*nb)
        |                  *(ra2 - na*(na+1) - na*nb)*(na+nb)*(na+nb-1))
        |            // (na*nb*((na+nb+1)*(na+nb)*(na+nb-1) - tt))
        |            AS BIGINT) END AS z2_milli
        |FROM agg""".stripMargin,
    "q292_kruskal_wallis" ->
      """WITH gv AS (SELECT event_type AS g,
        |                   CAST(floor(value*100) AS BIGINT) AS v,
        |                   count(*) AS c
        |            FROM events
        |            WHERE value IS NOT NULL AND event_type IS NOT NULL
        |            GROUP BY 1,2),
        |h AS (SELECT v, sum(c) AS t FROM gv GROUP BY v),
        |r AS (SELECT v, t,
        |             2*(sum(t) OVER (ORDER BY v) - t) + t + 1 AS r2 FROM h),
        |pg AS (SELECT g, sum(c) AS ng, sum(c*r.r2) AS rg2
        |       FROM gv JOIN r USING(v) GROUP BY g),
        |ti AS (SELECT sum(t*t*t - t) AS tt FROM r),
        |ag AS (SELECT sum(ng) AS n, count(*) AS k,
        |              sum((rg2*rg2)//ng) AS s FROM pg),
        |hm AS (SELECT n, k,
        |         greatest(CAST((3000*s)//(n*(n+1)) - 3000*(n+1) AS BIGINT),
        |                  0) AS h_milli, ti.tt
        |       FROM ag, ti)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k, h_milli,
        |  CASE WHEN n*n*n - n = tt THEN NULL
        |       ELSE CAST((h_milli*(n*n*n - n))//(n*n*n - n - tt) AS BIGINT)
        |       END AS h_tie_milli
        |FROM hm""".stripMargin,
    "q293_wilcoxon" ->
      """WITH sp AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts)))//2
        |              AS mid FROM events),
        |u AS (SELECT user_id,
        |        coalesce(sum(CASE WHEN epoch_us(ts) < sp.mid
        |          THEN CAST(floor(value*100) AS BIGINT) ELSE 0 END), 0) AS x,
        |        coalesce(sum(CASE WHEN epoch_us(ts) >= sp.mid
        |          THEN CAST(floor(value*100) AS BIGINT) ELSE 0 END), 0) AS y
        |      FROM events, sp GROUP BY user_id),
        |d AS (SELECT x - y AS dd FROM u WHERE x - y <> 0),
        |h AS (SELECT abs(dd) AS v, count(*) AS t,
        |             sum(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS a
        |      FROM d GROUP BY 1),
        |r AS (SELECT v, t, a,
        |             2*(sum(t) OVER (ORDER BY v) - t) + t + 1 AS r2 FROM h),
        |ag AS (SELECT coalesce(sum(t),0) AS n, coalesce(sum(a*r2),0) AS w2,
        |              coalesce(sum(t*t*t-t),0) AS tt FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(w2 AS BIGINT) AS w2_plus,
        |  CAST(tt AS BIGINT) AS tie_t,
        |  CASE WHEN n = 0 THEN NULL
        |       ELSE CAST((3000*(2*w2 - n*(n+1))*(2*w2 - n*(n+1)))
        |            // (2*n*(n+1)*(2*n+1) - tt) AS BIGINT) END AS z2_milli
        |FROM ag""".stripMargin,
    "q294_mann_kendall_z" ->
      """WITH d AS (SELECT event_type AS g, epoch_us(ts)//86400000000 AS tt,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1,2),
        |p AS (SELECT l.g, sum(CASE WHEN r.x > l.x THEN 1
        |                           WHEN r.x < l.x THEN -1 ELSE 0 END) AS s
        |      FROM d l JOIN d r ON l.g = r.g AND l.tt < r.tt GROUP BY l.g),
        |ti AS (SELECT g, sum(c) AS n, sum(c*(c-1)*(2*c+5)) AS tv
        |       FROM (SELECT g, x, count(*) AS c FROM d GROUP BY g, x)
        |       GROUP BY g)
        |SELECT p.g AS event_type, CAST(ti.n AS BIGINT) AS n,
        |  CAST(p.s AS BIGINT) AS s,
        |  CAST(ti.n*(ti.n-1)*(2*ti.n+5) - ti.tv AS BIGINT) AS var18,
        |  CASE WHEN ti.n*(ti.n-1)*(2*ti.n+5) - ti.tv = 0 THEN NULL
        |       ELSE CAST((18000*greatest(abs(p.s)-1,0)*greatest(abs(p.s)-1,0))
        |            // (ti.n*(ti.n-1)*(2*ti.n+5) - ti.tv) AS BIGINT)
        |       END AS z2_milli
        |FROM p JOIN ti ON p.g = ti.g""".stripMargin,
    "q295_log_rank" ->
      """WITH u AS (SELECT user_id,
        |             max(epoch_us(ts)//86400000000)
        |               - min(epoch_us(ts)//86400000000) AS dur,
        |             user_id % 2 = 0 AS f FROM events GROUP BY user_id),
        |lt AS (SELECT dur AS t, count(*) AS c,
        |              sum(CASE WHEN f THEN 1 ELSE 0 END) AS c1
        |       FROM u GROUP BY dur),
        |ar AS (SELECT t, c AS d, c1 AS d1,
        |         sum(c) OVER (ORDER BY t DESC) AS nall,
        |         sum(c1) OVER (ORDER BY t DESC) AS n1
        |       FROM lt),
        |ag AS (SELECT sum(d1) AS o1, sum((1000000*d*n1)//nall) AS e1,
        |              sum(CASE WHEN nall <= 1 THEN 0
        |                  ELSE (1000000*d*n1*(nall-n1)*(nall-d))
        |                       //(nall*nall*(nall-1)) END) AS v
        |       FROM ar WHERE d > 0)
        |SELECT CAST(coalesce(o1,0) AS BIGINT) AS o1,
        |  CAST(coalesce(e1,0) AS BIGINT) AS e1_ppm,
        |  CAST(coalesce(v,0) AS BIGINT) AS v_ppm,
        |  CASE WHEN coalesce(v,0)=0 THEN NULL
        |       ELSE CAST((1000*(1000000*o1-e1)*(1000000*o1-e1))
        |            //(1000000*v) AS BIGINT) END AS chi2_milli
        |FROM ag""".stripMargin,
    "q296_bh_adjust" ->
      """WITH dd AS (SELECT epoch_us(ts)//86400000000 AS dy, count(*) AS n,
        |              sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
        |                AS pos
        |           FROM events GROUP BY 1),
        |p AS (SELECT dy, (1000000*pos)//n AS p_ppm FROM dd),
        |m AS (SELECT count(*) AS m FROM p),
        |r AS (SELECT dy, p_ppm,
        |             row_number() OVER (ORDER BY p_ppm, dy) AS prank FROM p),
        |raw AS (SELECT r.dy, r.p_ppm, r.prank,
        |          least(1000000, (r.p_ppm*m.m)//r.prank) AS rw FROM r, m)
        |SELECT dy AS day, CAST(p_ppm AS BIGINT) AS p_ppm,
        |  CAST(prank AS BIGINT) AS p_rank,
        |  CAST(min(rw) OVER (ORDER BY prank DESC) AS BIGINT) AS q_ppm
        |FROM raw""".stripMargin,
    "q297_drawdown" ->
      """WITH d AS (SELECT event_type, epoch_us(ts)//86400000000 AS dy,
        |                  sum(CAST(floor(value*100) AS BIGINT)) AS v
        |           FROM events
        |           WHERE value IS NOT NULL AND event_type IS NOT NULL
        |           GROUP BY 1,2),
        |w AS (SELECT event_type, dy, v,
        |        max(v) OVER (PARTITION BY event_type ORDER BY dy) AS peak
        |      FROM d)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_periods,
        |  CAST(arg_max(v, dy) AS BIGINT) AS final_value,
        |  CAST(max(peak) AS BIGINT) AS peak,
        |  CAST(max(peak - v) AS BIGINT) AS max_dd,
        |  CAST(max(CASE WHEN peak > 0 THEN (1000000*(peak-v))//peak END)
        |    AS BIGINT) AS max_dd_ppm
        |FROM w GROUP BY event_type""".stripMargin,
    "q298_ece" ->
      """WITH s AS (SELECT least(999999,
        |                    CAST(floor(value*100) AS BIGINT)*20) AS p,
        |                  event_type='purchase' AS y FROM events),
        |f AS (SELECT p, y FROM s WHERE p IS NOT NULL AND y IS NOT NULL
        |      AND p >= 0 AND p <= 1000000),
        |b AS (SELECT least(p//100000, 9) AS bk, count(*) AS n,
        |             sum(CASE WHEN y THEN 1 ELSE 0 END) AS pos,
        |             sum(p) AS sp FROM f GROUP BY 1),
        |g AS (SELECT n, abs((1000000*pos)//n - sp//n) AS gap FROM b)
        |SELECT CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(n*gap)//sum(n) AS BIGINT) AS ece_ppm,
        |  CAST(max(gap) AS BIGINT) AS mce_ppm FROM g""".stripMargin,
    "q299_friedman" ->
      """WITH d AS (SELECT epoch_us(ts)//86400000000 AS b, event_type AS j,
        |                  CAST(count(*) AS BIGINT) AS v
        |           FROM events WHERE event_type IS NOT NULL GROUP BY 1,2),
        |kk AS (SELECT count(DISTINCT j) AS k FROM d),
        |cb AS (SELECT b FROM d GROUP BY b
        |       HAVING count(DISTINCT j) = (SELECT k FROM kk)),
        |ib AS (SELECT d.* FROM d JOIN cb USING(b)),
        |bv AS (SELECT b, v, count(*) AS t FROM ib GROUP BY b, v),
        |rk AS (SELECT b, v,
        |         2*(sum(t) OVER (PARTITION BY b ORDER BY v) - t) + t + 1
        |           AS r2
        |       FROM bv),
        |rr AS (SELECT ib.j, rk.r2
        |       FROM ib JOIN rk ON ib.b = rk.b AND ib.v = rk.v),
        |pj AS (SELECT j, count(*) AS n, sum(r2) AS rj2, sum(r2*r2) AS sq
        |       FROM rr GROUP BY j),
        |ag AS (SELECT max(n) AS nb, count(*) AS k2, sum(sq) AS a4,
        |         sum((rj2 - n*((SELECT k FROM kk)+1))
        |            *(rj2 - n*((SELECT k FROM kk)+1))) AS num FROM pj)
        |SELECT CAST(nb AS BIGINT) AS n_blocks, CAST(k2 AS BIGINT) AS k,
        |  CASE WHEN a4 - nb*k2*(k2+1)*(k2+1) = 0 THEN NULL
        |       ELSE CAST((1000*(k2-1)*num) // (a4 - nb*k2*(k2+1)*(k2+1))
        |            AS BIGINT) END AS chi2_milli
        |FROM ag""".stripMargin,
    "q300_trend_prop" ->
      """WITH s AS (SELECT epoch_us(ts)//86400000000 AS w,
        |                  event_type='purchase' AS y
        |           FROM events WHERE event_type IS NOT NULL),
        |g AS (SELECT w, count(*) AS n,
        |             sum(CASE WHEN y THEN 1 ELSE 0 END) AS r
        |      FROM s GROUP BY w),
        |ag AS (SELECT sum(n) AS nn, sum(r) AS rr, sum(w*n) AS wn,
        |              sum(w*w*n) AS w2n, sum(w*r) AS wr FROM g)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(rr AS BIGINT) AS n_success,
        |  CAST(sign(nn*wr - wn*rr) AS BIGINT) AS trend_sign,
        |  CASE WHEN rr = 0 OR rr = nn OR nn*w2n - wn*wn = 0 THEN NULL
        |       ELSE CAST((1000*(nn*wr - wn*rr)*(nn*wr - wn*rr)*nn)
        |            // (rr*(nn-rr)*(nn*w2n - wn*wn)) AS BIGINT) END
        |    AS z2_milli
        |FROM ag""".stripMargin,
    "q301_moments" ->
      """WITH d AS (SELECT event_type AS g, epoch_us(ts)//86400000000 AS dy,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events WHERE event_type IS NOT NULL GROUP BY 1,2),
        |m AS (SELECT g, count(*) AS n, sum(x) AS s1, sum(x*x) AS s2,
        |             sum(x*x*x) AS s3, sum(x*x*x*x) AS s4 FROM d GROUP BY g),
        |c AS (SELECT g, n, n*s2 - s1*s1 AS m2,
        |             n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS m3,
        |             n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2
        |               - 3*s1*s1*s1*s1 AS m4
        |      FROM m)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(sign(m3) AS BIGINT) AS skew_sign,
        |  CASE WHEN m2 = 0 THEN NULL
        |       ELSE CAST((1000000*m3*m3)//(m2*m2*m2) AS BIGINT) END
        |    AS skew2_ppm,
        |  CASE WHEN m2 = 0 THEN NULL
        |       ELSE CAST((1000000*m4)//(m2*m2) AS BIGINT) - 3000000
        |       END AS ex_kurtosis_ppm
        |FROM c""".stripMargin,
    "q302_runs_test" ->
      """WITH d AS (SELECT event_type AS g, epoch_us(ts)//86400000000 AS tt,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events WHERE event_type IS NOT NULL GROUP BY 1,2),
        |st AS (SELECT g, count(*) AS n, sum(x) AS s1 FROM d GROUP BY g),
        |mk AS (SELECT d.g, d.tt, (st.n*d.x > st.s1) AS ab
        |       FROM d JOIN st USING(g) WHERE st.n*d.x <> st.s1),
        |lg AS (SELECT g, ab, lag(ab) OVER (PARTITION BY g ORDER BY tt)
        |         AS pv FROM mk),
        |ag AS (SELECT g, count(*) AS m,
        |         sum(CASE WHEN ab THEN 1 ELSE 0 END) AS n1,
        |         sum(CASE WHEN pv IS NULL OR pv <> ab THEN 1 ELSE 0 END)
        |           AS r
        |       FROM lg GROUP BY g)
        |SELECT g AS event_type, CAST(m AS BIGINT) AS n,
        |  CAST(n1 AS BIGINT) AS n_above, CAST(m - n1 AS BIGINT) AS n_below,
        |  CAST(r AS BIGINT) AS runs,
        |  CASE WHEN n1 = 0 OR m = n1 OR 2*n1*(m-n1) <= m THEN NULL
        |       ELSE CAST((1000*(m*r - m - 2*n1*(m-n1))
        |                  *(m*r - m - 2*n1*(m-n1))*(m-1))
        |            // (2*n1*(m-n1)*(2*n1*(m-n1) - m)) AS BIGINT) END
        |    AS z2_milli
        |FROM ag""".stripMargin,
    "q303_durbin_watson" ->
      """WITH d AS (SELECT event_type AS g, epoch_us(ts)//86400000000 AS tt,
        |                  CAST(count(*) AS BIGINT) AS x
        |           FROM events WHERE event_type IS NOT NULL GROUP BY 1,2),
        |lg AS (SELECT g, x, lag(x) OVER (PARTITION BY g ORDER BY tt) AS pv
        |       FROM d),
        |ag AS (SELECT g, count(*) AS n, sum(x) AS s1, sum(x*x) AS s2,
        |              sum((x-pv)*(x-pv)) AS d2 FROM lg GROUP BY g)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n*s2 - s1*s1 = 0 THEN NULL
        |       ELSE CAST((1000*n*coalesce(d2,0)) // (n*s2 - s1*s1)
        |            AS BIGINT) END AS dw_milli
        |FROM ag""".stripMargin,
    "q304_welch_t2" ->
      """WITH b AS (SELECT event_type AS g, (user_id % 2 = 0) AS f,
        |                  CAST(floor(value) AS BIGINT) AS v
        |           FROM events
        |           WHERE event_type IS NOT NULL AND value IS NOT NULL
        |             AND user_id IS NOT NULL),
        |ag AS (SELECT g,
        |        sum(CASE WHEN f THEN 1 END) AS n1,
        |        sum(CASE WHEN NOT f THEN 1 END) AS n2,
        |        sum(CASE WHEN f THEN v END) AS s11,
        |        sum(CASE WHEN NOT f THEN v END) AS s12,
        |        sum(CASE WHEN f THEN v*v END) AS s21,
        |        sum(CASE WHEN NOT f THEN v*v END) AS s22
        |       FROM b GROUP BY g)
        |SELECT g AS event_type, CAST(coalesce(n1,0) AS BIGINT) AS n1,
        |  CAST(coalesce(n2,0) AS BIGINT) AS n2,
        |  CASE WHEN n1 IS NULL OR n2 IS NULL THEN NULL
        |       ELSE CAST(sign(s11*n2 - s12*n1) AS BIGINT) END AS sign,
        |  CASE WHEN n1 IS NULL OR n2 IS NULL OR n1 < 2 OR n2 < 2
        |         OR (n1*s21 - s11*s11)*n2*n2*(n2-1)
        |          + (n2*s22 - s12*s12)*n1*n1*(n1-1) = 0 THEN NULL
        |       ELSE CAST((1000*(s11*n2 - s12*n1)*(s11*n2 - s12*n1)
        |                  *(n1-1)*(n2-1))
        |            // ((n1*s21 - s11*s11)*n2*n2*(n2-1)
        |              + (n2*s22 - s12*s12)*n1*n1*(n1-1)) AS BIGINT)
        |       END AS t2_milli
        |FROM ag""".stripMargin,
    "q305_kendall_tau" ->
      """WITH d AS (SELECT event_type AS g, epoch_us(ts)//86400000000 AS dd,
        |                  CAST(count(*) AS BIGINT) AS x,
        |                  CAST(sum(CAST(floor(value*100) AS BIGINT))
        |                    AS BIGINT) AS y
        |           FROM events
        |           WHERE event_type IS NOT NULL AND value IS NOT NULL
        |           GROUP BY 1,2),
        |cells AS (SELECT g, x, y, CAST(count(*) AS HUGEINT) AS c
        |          FROM d GROUP BY 1,2,3),
        |pr AS (SELECT a.g AS g,
        |         sum(CASE WHEN a.x < b.x AND a.y < b.y
        |             THEN a.c*b.c ELSE 0 END) AS cc,
        |         sum(CASE WHEN a.x < b.x AND a.y > b.y
        |             THEN a.c*b.c ELSE 0 END) AS dd
        |       FROM cells a JOIN cells b ON a.g = b.g
        |         AND (a.x < b.x OR (a.x = b.x AND a.y < b.y)) GROUP BY 1),
        |mx AS (SELECT g, sum(t*(t-1)) AS nn1, sum(t) AS n
        |       FROM (SELECT g, x, count(*) AS t FROM d GROUP BY 1,2)
        |       GROUP BY 1),
        |my AS (SELECT g, sum(t*(t-1)) AS nn2
        |       FROM (SELECT g, y, count(*) AS t FROM d GROUP BY 1,2)
        |       GROUP BY 1)
        |SELECT mx.g AS event_type, CAST(mx.n AS BIGINT) AS n,
        |  CAST(sign(coalesce(cc,0) - coalesce(dd,0)) AS BIGINT) AS sign,
        |  CASE WHEN mx.n*(mx.n-1) = nn1 OR mx.n*(mx.n-1) = nn2 THEN NULL
        |       ELSE CAST((1000000*4*(coalesce(cc,0)-coalesce(dd,0))
        |                          *(coalesce(cc,0)-coalesce(dd,0)))
        |            // ((mx.n*(mx.n-1) - nn1) * (mx.n*(mx.n-1) - nn2))
        |            AS BIGINT) END AS tau2_ppm
        |FROM mx JOIN my USING (g) LEFT JOIN pr ON pr.g = mx.g""".stripMargin,
    "q306_roc_points" ->
      """WITH e AS (SELECT CAST(floor(value*100) AS BIGINT)//100 AS s,
        |    CASE WHEN (CAST(floor(value*100) AS BIGINT) >= 3500)
        |              <> (event_id % 7 = 0) THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT s, CAST(count(*) AS BIGINT) AS w,
        |        CAST(sum(y) AS BIGINT) AS p FROM e GROUP BY 1),
        |c AS (SELECT s, w, p, sum(w) OVER (ORDER BY s DESC) AS cw,
        |        sum(p) OVER (ORDER BY s DESC) AS cp FROM h),
        |t AS (SELECT sum(w) AS n, sum(p) AS pos FROM h)
        |SELECT s AS threshold, CAST(cp AS BIGINT) AS tp,
        |  CAST(cw - cp AS BIGINT) AS fp,
        |  CASE WHEN pos = 0 THEN NULL
        |       ELSE CAST((1000000*cp)//pos AS BIGINT) END AS tpr_ppm,
        |  CASE WHEN n = pos THEN NULL
        |       ELSE CAST((1000000*(cw-cp))//(n-pos) AS BIGINT) END
        |    AS fpr_ppm,
        |  CAST((1000000*cp)//cw AS BIGINT) AS precision_ppm
        |FROM c CROSS JOIN t""".stripMargin,
    "q307_avg_precision" ->
      """WITH e AS (SELECT CAST(floor(value*100) AS BIGINT)//100 AS s,
        |    CASE WHEN (CAST(floor(value*100) AS BIGINT) >= 3500)
        |              <> (event_id % 7 = 0) THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT s, CAST(count(*) AS BIGINT) AS w,
        |        CAST(sum(y) AS BIGINT) AS p FROM e GROUP BY 1),
        |c AS (SELECT s, w, p, sum(w) OVER (ORDER BY s DESC) AS cw,
        |        sum(p) OVER (ORDER BY s DESC) AS cp FROM h)
        |SELECT CAST(sum(w) AS BIGINT) AS n,
        |  CAST(sum(p) AS BIGINT) AS n_pos,
        |  CAST((1000000*sum(p))//sum(w) AS BIGINT) AS prevalence_ppm,
        |  CASE WHEN sum(p) = 0 THEN NULL
        |       ELSE CAST(sum(p * ((1000000*cp)//cw))//sum(p) AS BIGINT)
        |       END AS ap_ppm
        |FROM c""".stripMargin,
    "q308_ivm_extrema" ->
      """WITH eff AS (
        |  SELECT l_partkey AS k, CAST(floor(l_extendedprice*100) AS BIGINT)
        |    AS v
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  UNION ALL
        |  SELECT l_partkey, CAST(floor(l_extendedprice*100) AS BIGINT)
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |    AND l_orderkey % 7 <> 0)
        |SELECT k AS l_partkey, min(v) AS v_min, max(v) AS v_max,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM eff GROUP BY 1""".stripMargin,
    "q309_modularity" ->
      """WITH o AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |           FROM lineitem),
        |e AS (SELECT a.sk AS x, b.sk AS y FROM o a JOIN o b
        |        ON a.ok = b.ok AND a.sk < b.sk
        |      GROUP BY 1, 2 HAVING count(*) >= 25),
        |asg AS (SELECT s_suppkey AS n, s_nationkey AS c FROM supplier),
        |tg AS (SELECT e.x, e.y, ax.c AS cx, ay.c AS cy
        |       FROM e JOIN asg ax ON e.x = ax.n
        |              JOIN asg ay ON e.y = ay.n),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM tg),
        |ec AS (SELECT cx AS c, CAST(count(*) AS HUGEINT) AS ee FROM tg
        |       WHERE cx = cy GROUP BY 1),
        |deg AS (SELECT n, count(*) AS d
        |        FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e)
        |        GROUP BY 1),
        |dc AS (SELECT asg.c, CAST(sum(deg.d) AS HUGEINT) AS dd
        |       FROM deg JOIN asg ON deg.n = asg.n GROUP BY 1),
        |agg AS (SELECT any_value(m.m) AS m, count(*) AS k,
        |          sum(4*m.m*coalesce(ec.ee,0) - dc.dd*dc.dd) AS num
        |        FROM dc LEFT JOIN ec ON dc.c = ec.c CROSS JOIN m)
        |SELECT CAST(m AS BIGINT) AS m,
        |  CAST(k AS BIGINT) AS n_communities,
        |  CAST(sign(num) AS BIGINT) AS sign,
        |  CASE WHEN m = 0 THEN NULL
        |       ELSE CAST((1000000*abs(num)) // (4*m*m) AS BIGINT) END
        |    AS q_ppm
        |FROM agg""".stripMargin,
    "q310_seasonal_strength" ->
      """WITH d AS (SELECT event_type AS g, epoch_us(ts)//86400000000
        |             AS dd, CAST(count(*) AS BIGINT) AS v
        |           FROM events WHERE event_type IS NOT NULL GROUP BY 1,2),
        |sl AS (SELECT g, dd % 7 AS s, count(*) AS c, sum(v) AS sv,
        |         sum(v*v) AS sq FROM d GROUP BY 1,2),
        |ag AS (SELECT g, sum(c) AS n, count(*) AS k, sum(sv) AS st,
        |         sum(sq) AS sst, sum((1000*sv*sv)//c) AS a
        |       FROM sl GROUP BY 1)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(k AS BIGINT) AS n_slots,
        |  CAST(a - (1000*st*st)//n AS BIGINT) AS ssb_milli,
        |  CAST(1000*sst - (1000*st*st)//n AS BIGINT) AS sst_milli,
        |  CASE WHEN 1000*sst - (1000*st*st)//n = 0 THEN NULL
        |       ELSE CAST((1000000*greatest(0, a - (1000*st*st)//n))
        |            // (1000*sst - (1000*st*st)//n) AS BIGINT) END
        |    AS strength_ppm
        |FROM ag""".stripMargin,
    "q311_geofence" ->
      """WITH p AS (SELECT c_custkey AS id, c_nationkey AS nat,
        |   (c_custkey*1103515245 + 12345) % 50000 AS x,
        |   (c_custkey*69069 + 1) % 50000 AS y FROM customer),
        |e(x1,y1,x2,y2) AS (VALUES (5000,5000,45000,10000),
        |  (45000,10000,40000,40000),(40000,40000,20000,45000),
        |  (20000,45000,8000,30000),(8000,30000,5000,5000)),
        |cr AS (SELECT p.id, p.nat,
        |  sum(CASE WHEN ((e.y1 > p.y) <> (e.y2 > p.y)) AND
        |       ((e.y2 > e.y1 AND (p.x - e.x1)*(e.y2 - e.y1)
        |           < (e.x2 - e.x1)*(p.y - e.y1))
        |        OR (e.y2 < e.y1 AND (p.x - e.x1)*(e.y2 - e.y1)
        |           > (e.x2 - e.x1)*(p.y - e.y1)))
        |      THEN 1 ELSE 0 END) AS cnt
        |  FROM p CROSS JOIN e GROUP BY 1,2)
        |SELECT nat AS c_nationkey, CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(sum(CASE WHEN cnt % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_inside
        |FROM cr GROUP BY 1""".stripMargin,
    "q312_privacy" ->
      """WITH pairs AS (SELECT c_nationkey, c_mktsegment,
        |    (c_acctbal >= 0) AS sv, count(*) AS c FROM customer
        |    GROUP BY 1,2,3),
        |g AS (SELECT c_nationkey, c_mktsegment, sum(c) AS n,
        |    sum(CASE WHEN sv IS NOT NULL THEN 1 ELSE 0 END) AS l
        |    FROM pairs GROUP BY 1,2)
        |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        | CAST(count(*) AS BIGINT) AS n_groups,
        | CAST(min(n) AS BIGINT) AS min_group_size,
        | CAST(sum(CASE WHEN n < 15 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS k_viol_groups,
        | CAST(sum(CASE WHEN n < 15 THEN n ELSE 0 END) AS BIGINT)
        |   AS k_viol_rows,
        | CAST(min(l) AS BIGINT) AS min_l,
        | CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS l_viol_groups
        |FROM g""".stripMargin,
    "q313_srm_check" ->
      """WITH obs AS (SELECT event_type AS c, CAST(count(*) AS BIGINT)
        |    AS o FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |exp(ce, p) AS (VALUES ('click',200),('error',200),
        |  ('purchase',200),('signup',200),('view',200)),
        |j AS (SELECT coalesce(o, 0) AS o, p
        |      FROM obs FULL JOIN exp ON obs.c = exp.ce),
        |t AS (SELECT sum(o) AS n FROM j)
        |SELECT CAST(t.n AS BIGINT) AS n,
        | CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS k_expected,
        | CAST(sum(CASE WHEN p IS NULL AND o > 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_unexpected,
        | CASE WHEN sum(CASE WHEN p IS NULL AND o > 0 THEN 1 ELSE 0 END)
        |        > 0 OR t.n = 0 THEN NULL
        |      ELSE CAST(sum(((1000*o - t.n*p)*(1000*o - t.n*p))
        |           // (t.n*p)) AS BIGINT) END AS chi2_milli
        |FROM j CROSS JOIN t GROUP BY t.n""".stripMargin,
    "q314_ols" -> {
      val det = "(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)" +
        " + s2*(s1*s12 - s11*s2))"
      val det0 = "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)" +
        " + s2*(s1y*s12 - s11*s2y))"
      val det1 = "(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)" +
        " + s2*(s1*s2y - s1y*s2))"
      val det2 = "(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)" +
        " + sy*(s1*s12 - s11*s2))"
      def beta(di: String, out: String) =
        s"CASE WHEN n < 3 OR $det = 0 THEN NULL ELSE " +
          s"CAST(CAST(sign($di) AS HUGEINT)*CAST(sign($det) AS HUGEINT)" +
          s"*((1000*abs($di))//abs($det)) AS BIGINT) END AS $out"
      s"""WITH dd AS (SELECT event_type AS g,
         |    epoch_us(ts)//86400000000 AS d0,
         |    CAST(count(*) AS BIGINT) AS x2,
         |    CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS y
         |  FROM events WHERE event_type IS NOT NULL
         |    AND value IS NOT NULL GROUP BY 1,2),
         |d AS (SELECT g, d0 % 1000 AS x1, x2, y FROM dd),
         |m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
         |  sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
         |  sum(CAST(x1 AS HUGEINT)*x1) AS s11,
         |  sum(CAST(x1 AS HUGEINT)*x2) AS s12,
         |  sum(CAST(x2 AS HUGEINT)*x2) AS s22,
         |  sum(CAST(y AS HUGEINT)) AS sy,
         |  sum(CAST(x1 AS HUGEINT)*y) AS s1y,
         |  sum(CAST(x2 AS HUGEINT)*y) AS s2y
         |  FROM d GROUP BY g)
         |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
         |  ${beta(det0, "b0_milli")},
         |  ${beta(det1, "b1_milli")},
         |  ${beta(det2, "b2_milli")}
         |FROM m""".stripMargin
    },
    "q315_ppr" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS (
        |  SELECT doc_id AS src, doc_id // 2 AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 1) % nn.n FROM documents, nn),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT node
        |          FROM (SELECT src AS node FROM e
        |                UNION ALL SELECT dst FROM e)),
        |r0 AS (SELECT node, CAST(CASE WHEN node % 97 = 0 THEN 1000000
        |         ELSE 0 END AS BIGINT) AS rank FROM nodes),
        |i1 AS (SELECT e.dst AS node, sum(r0.rank // deg.outdeg) AS m
        |       FROM e JOIN r0 ON e.src = r0.node
        |              JOIN deg ON e.src = deg.src GROUP BY 1),
        |r1 AS (SELECT nodes.node,
        |         CAST(CASE WHEN nodes.node % 97 = 0 THEN 150000
        |             ELSE 0 END
        |           + (850 * coalesce(i1.m, 0)) // 1000 AS BIGINT) AS rank
        |       FROM nodes LEFT JOIN i1 USING (node)),
        |i2 AS (SELECT e.dst AS node, sum(r1.rank // deg.outdeg) AS m
        |       FROM e JOIN r1 ON e.src = r1.node
        |              JOIN deg ON e.src = deg.src GROUP BY 1),
        |r2 AS (SELECT nodes.node,
        |         CAST(CASE WHEN nodes.node % 97 = 0 THEN 150000
        |             ELSE 0 END
        |           + (850 * coalesce(i2.m, 0)) // 1000 AS BIGINT) AS rank
        |       FROM nodes LEFT JOIN i2 USING (node)),
        |i3 AS (SELECT e.dst AS node, sum(r2.rank // deg.outdeg) AS m
        |       FROM e JOIN r2 ON e.src = r2.node
        |              JOIN deg ON e.src = deg.src GROUP BY 1),
        |r3 AS (SELECT nodes.node,
        |         CAST(CASE WHEN nodes.node % 97 = 0 THEN 150000
        |             ELSE 0 END
        |           + (850 * coalesce(i3.m, 0)) // 1000 AS BIGINT) AS rank
        |       FROM nodes LEFT JOIN i3 USING (node))
        |SELECT node AS doc_id, rank AS rank_micro FROM r3""".stripMargin,
    "q316_post_stratified" ->
      """WITH cells AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'even'
        |    ELSE 'odd' END AS v, event_type AS s,
        |    CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(floor(value*100) AS BIGINT)) AS HUGEINT) AS sm
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1,2),
        |tw(st, w) AS (VALUES ('click',200),('error',200),
        |  ('purchase',200),('signup',200),('view',200)),
        |j AS (SELECT v, n, sm, w
        |      FROM cells LEFT JOIN tw ON cells.s = tw.st),
        |g AS (SELECT v, sum(n) AS nt,
        |    sum(CASE WHEN w IS NOT NULL THEN 1 ELSE 0 END) AS k,
        |    sum(CASE WHEN w IS NULL THEN n ELSE 0 END) AS unw,
        |    sum(sm) AS st_all,
        |    sum(w * ((1000000*sm)//n)) AS acc
        |  FROM j GROUP BY v)
        |SELECT v AS variant, CAST(nt AS BIGINT) AS n,
        |  CAST(5 - k AS BIGINT) AS n_missing_strata,
        |  CAST(unw AS BIGINT) AS n_unweighted_rows,
        |  CAST((1000*st_all)//nt AS BIGINT) AS raw_mean_milli,
        |  CASE WHEN k < 5 THEN NULL
        |       ELSE CAST(acc//1000000 AS BIGINT) END AS post_mean_milli
        |FROM g""".stripMargin,
    "q317_bradley_terry" ->
      """WITH d AS (SELECT event_type AS g, epoch_us(ts)//86400000000
        |    AS dd, CAST(count(*) AS BIGINT) AS c
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1,2),
        |mt AS (SELECT CASE WHEN a.c > b.c THEN a.g ELSE b.g END AS w,
        |         CASE WHEN a.c > b.c THEN b.g ELSE a.g END AS l
        |       FROM d a JOIN d b ON a.dd = b.dd AND a.g < b.g
        |       WHERE a.c <> b.c),
        |m AS (SELECT w, l, CAST(count(*) AS HUGEINT) AS n
        |      FROM mt GROUP BY 1,2),
        |g AS (SELECT i, j, sum(n) AS nij FROM (
        |        SELECT w AS i, l AS j, n FROM m
        |        UNION ALL SELECT l, w, n FROM m) GROUP BY 1,2),
        |wi AS (SELECT w AS i, sum(n) AS ww FROM m GROUP BY 1),
        |nodes AS (SELECT DISTINCT i AS node FROM g),
        |r0 AS (SELECT node, CAST(1000000 AS HUGEINT) AS r FROM nodes),
        |d1 AS (SELECT g.i, sum((g.nij * 1000000000000)
        |         // (ra.r + rb.r)) AS dd
        |       FROM g JOIN r0 ra ON g.i = ra.node
        |              JOIN r0 rb ON g.j = rb.node GROUP BY 1),
        |r1 AS (SELECT nodes.node, greatest(CAST(1 AS HUGEINT),
        |         (coalesce(wi.ww, 0) * CAST(1000000000000 AS HUGEINT))
        |           // greatest(CAST(1 AS HUGEINT), coalesce(d1.dd, 0)))
        |         AS r
        |       FROM nodes LEFT JOIN wi ON nodes.node = wi.i
        |                  LEFT JOIN d1 ON nodes.node = d1.i),
        |d2 AS (SELECT g.i, sum((g.nij * 1000000000000)
        |         // (ra.r + rb.r)) AS dd
        |       FROM g JOIN r1 ra ON g.i = ra.node
        |              JOIN r1 rb ON g.j = rb.node GROUP BY 1),
        |r2 AS (SELECT nodes.node, greatest(CAST(1 AS HUGEINT),
        |         (coalesce(wi.ww, 0) * CAST(1000000000000 AS HUGEINT))
        |           // greatest(CAST(1 AS HUGEINT), coalesce(d2.dd, 0)))
        |         AS r
        |       FROM nodes LEFT JOIN wi ON nodes.node = wi.i
        |                  LEFT JOIN d2 ON nodes.node = d2.i),
        |d3 AS (SELECT g.i, sum((g.nij * 1000000000000)
        |         // (ra.r + rb.r)) AS dd
        |       FROM g JOIN r2 ra ON g.i = ra.node
        |              JOIN r2 rb ON g.j = rb.node GROUP BY 1),
        |r3 AS (SELECT nodes.node, greatest(CAST(1 AS HUGEINT),
        |         (coalesce(wi.ww, 0) * CAST(1000000000000 AS HUGEINT))
        |           // greatest(CAST(1 AS HUGEINT), coalesce(d3.dd, 0)))
        |         AS r
        |       FROM nodes LEFT JOIN wi ON nodes.node = wi.i
        |                  LEFT JOIN d3 ON nodes.node = d3.i)
        |SELECT node AS player, CAST(r AS BIGINT) AS rating_micro
        |FROM r3""".stripMargin,
    "q318_did" ->
      """WITH b AS (SELECT (user_id % 2 = 0) AS t,
        |    (epoch_us(ts)//86400000000 >= 19738) AS p,
        |    CAST(floor(value*100) AS BIGINT) AS x
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  (1000000 * sum(CASE WHEN t AND NOT p
        |     THEN CAST(x AS HUGEINT) END))
        |    // sum(CASE WHEN t AND NOT p THEN 1 END) AS mtp,
        |  (1000000 * sum(CASE WHEN t AND p THEN CAST(x AS HUGEINT) END))
        |    // sum(CASE WHEN t AND p THEN 1 END) AS mtq,
        |  (1000000 * sum(CASE WHEN NOT t AND NOT p
        |     THEN CAST(x AS HUGEINT) END))
        |    // sum(CASE WHEN NOT t AND NOT p THEN 1 END) AS mcp,
        |  (1000000 * sum(CASE WHEN NOT t AND p
        |     THEN CAST(x AS HUGEINT) END))
        |    // sum(CASE WHEN NOT t AND p THEN 1 END) AS mcq
        |  FROM b)
        |SELECT n, CAST(mtp AS BIGINT) AS m_treat_pre_micro,
        |  CAST(mtq AS BIGINT) AS m_treat_post_micro,
        |  CAST(mcp AS BIGINT) AS m_ctrl_pre_micro,
        |  CAST(mcq AS BIGINT) AS m_ctrl_post_micro,
        |  CAST(mtq - mtp - (mcq - mcp) AS BIGINT) AS did_micro
        |FROM a""".stripMargin,
    "q319_nelson_aalen" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(epoch_us(ts)//86400000000)
        |      - min(epoch_us(ts)//86400000000) AS tenure
        |  FROM events GROUP BY 1),
        |dt AS (SELECT tenure, CAST(count(*) AS BIGINT) AS d_t
        |       FROM u GROUP BY 1),
        |risk AS (
        |  SELECT tenure, d_t,
        |    CAST(sum(d_t) OVER (ORDER BY tenure DESC) AS BIGINT) AS n_t
        |  FROM dt),
        |hz AS (SELECT tenure, d_t, n_t,
        |    CAST((1000000*d_t) // n_t AS BIGINT) AS hazard_ppm
        |    FROM risk)
        |SELECT tenure, d_t, n_t, hazard_ppm,
        |  CAST(sum(hazard_ppm) OVER (ORDER BY tenure) AS BIGINT)
        |    AS cumhaz_ppm
        |FROM hz""".stripMargin,
    "q320_wau" ->
      """WITH d AS (SELECT DISTINCT epoch_us(ts)//86400000000 AS dd,
        |    user_id FROM events
        |    WHERE user_id IS NOT NULL AND event_type = 'purchase'),
        |p AS (SELECT DISTINCT dd FROM d)
        |SELECT p.dd AS period,
        |  CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_active
        |FROM p JOIN d ON d.dd BETWEEN p.dd - 6 AND p.dd
        |GROUP BY 1""".stripMargin,
    "q321_conformal" ->
      """WITH daily AS (SELECT event_type AS g,
        |    epoch_us(ts)//86400000000 AS dd,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1,2),
        |f AS (SELECT g, cnt,
        |    lag(cnt,7) OVER (PARTITION BY g ORDER BY dd) AS fc
        |      FROM daily),
        |r AS (SELECT g, abs(cnt - fc) AS rr FROM f WHERE fc IS NOT NULL),
        |h AS (SELECT g, rr, count(*) AS c FROM r GROUP BY 1,2),
        |cum AS (SELECT g, rr,
        |    sum(c) OVER (PARTITION BY g ORDER BY rr) AS cm FROM h),
        |t AS (SELECT g, count(*) AS n FROM r GROUP BY 1)
        |SELECT t.g AS event_type, CAST(t.n AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cm >= ((t.n+1)*800 + 999)//1000
        |    THEN rr END) AS BIGINT) AS q_hat
        |FROM t JOIN cum ON cum.g = t.g GROUP BY 1, t.n""".stripMargin,
    "q322_mantel_haenszel" ->
      """WITH b AS (SELECT event_type AS s, (user_id % 2 = 0) AS e,
        |    (CAST(floor(value*100) AS BIGINT) >= 3500) AS y
        |  FROM events WHERE event_type IS NOT NULL
        |    AND user_id IS NOT NULL AND value IS NOT NULL),
        |st AS (SELECT s,
        |    CAST(sum(CASE WHEN e AND y THEN 1 ELSE 0 END) AS HUGEINT)
        |      AS a,
        |    CAST(sum(CASE WHEN e AND NOT y THEN 1 ELSE 0 END)
        |      AS HUGEINT) AS bb,
        |    CAST(sum(CASE WHEN NOT e AND y THEN 1 ELSE 0 END)
        |      AS HUGEINT) AS c,
        |    CAST(sum(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END)
        |      AS HUGEINT) AS d,
        |    CAST(count(*) AS HUGEINT) AS n FROM b GROUP BY 1),
        |ag AS (SELECT sum(n) AS nt, count(*) AS k,
        |    sum((1000000 * a * d) // n) AS f1,
        |    sum((1000000 * bb * c) // n) AS f2 FROM st)
        |SELECT CAST(nt AS BIGINT) AS n, CAST(k AS BIGINT) AS n_strata,
        |  CASE WHEN f2 = 0 THEN NULL
        |       ELSE CAST((1000 * f1) // f2 AS BIGINT) END AS or_milli
        |FROM ag""".stripMargin,
    "q323_assortativity" ->
      """WITH o AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |           FROM lineitem),
        |e AS (SELECT a.sk AS x, b.sk AS y FROM o a JOIN o b
        |        ON a.ok = b.ok AND a.sk < b.sk
        |      GROUP BY 1, 2 HAVING count(*) >= 25),
        |bo AS (SELECT x, y FROM e UNION ALL SELECT y, x FROM e),
        |deg AS (SELECT x AS n, CAST(count(*) AS BIGINT) AS d
        |        FROM bo GROUP BY 1),
        |tg AS (SELECT dx.d AS xx, dy.d AS yy FROM bo
        |       JOIN deg dx ON bo.x = dx.n JOIN deg dy ON bo.y = dy.n),
        |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |  sum(CAST(xx AS HUGEINT)) AS sx, sum(CAST(yy AS HUGEINT)) AS sy,
        |  sum(CAST(xx AS HUGEINT)*yy) AS sxy,
        |  sum(CAST(xx AS HUGEINT)*xx) AS sxx,
        |  sum(CAST(yy AS HUGEINT)*yy) AS syy FROM tg),
        |c AS (SELECT n,
        |  (1000000 * (n*sxy - sx*sy)) // (n*n) AS cxy,
        |  (1000000 * (n*sxx - sx*sx)) // (n*n) AS vx,
        |  (1000000 * (n*syy - sy*sy)) // (n*n) AS vy FROM m)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sign(cxy) AS BIGINT) AS sign,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |       ELSE CAST((1000000 * cxy * cxy) // (vx * vy) AS BIGINT)
        |       END AS r2_ppm
        |FROM c""".stripMargin,
    "q324_decompose" ->
      """WITH daily AS (SELECT event_type AS g,
        |    epoch_us(ts)//86400000000 AS dd,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1,2),
        |tr AS (SELECT g, dd, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY dd
        |      RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ts,
        |    count(*) OVER (PARTITION BY g ORDER BY dd
        |      RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tc
        |  FROM daily),
        |dt AS (SELECT g, dd, cnt,
        |    CAST(sign(ts) AS BIGINT) * ((1000*abs(ts))//tc) AS trend,
        |    1000*cnt - CAST(sign(ts) AS BIGINT) * ((1000*abs(ts))//tc)
        |      AS detr,
        |    dd % 7 AS ph FROM tr),
        |se AS (SELECT g, ph, CAST(sign(sum(detr)) AS BIGINT)
        |         * (abs(sum(detr)) // count(*)) AS seasonal
        |       FROM dt GROUP BY 1,2)
        |SELECT dt.g AS event_type, dt.dd AS dd, dt.cnt AS cnt,
        |  CAST(dt.trend AS BIGINT) AS trend_milli,
        |  CAST(se.seasonal AS BIGINT) AS seasonal_milli,
        |  CAST(dt.detr - se.seasonal AS BIGINT) AS remainder_milli
        |FROM dt JOIN se ON dt.g = se.g AND dt.ph = se.ph""".stripMargin,
    "q325_cem_att" ->
      """WITH b AS (SELECT (user_id % 2 = 0) AS t,
        |    event_type || '#' ||
        |      CAST(epoch_us(ts)//86400000000 % 7 AS VARCHAR) AS s,
        |    CAST(floor(value*100) AS BIGINT) AS x
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND value IS NOT NULL),
        |cells AS (SELECT s,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS HUGEINT)
        |      AS nc,
        |    CAST(sum(CASE WHEN t THEN x ELSE 0 END) AS HUGEINT) AS st,
        |    CAST(sum(CASE WHEN NOT t THEN x ELSE 0 END) AS HUGEINT)
        |      AS sc
        |  FROM b GROUP BY 1),
        |ag AS (SELECT sum(nt + nc) AS n, count(*) AS k,
        |    sum(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END) AS km,
        |    sum(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END) AS ntm,
        |    sum(CASE WHEN nc = 0 THEN nt ELSE 0 END) AS ntu,
        |    sum(CASE WHEN nt = 0 THEN nc ELSE 0 END) AS ncu,
        |    sum(CASE WHEN nt > 0 AND nc > 0
        |        THEN nt * ((1000000*st)//nt - (1000000*sc)//nc)
        |        ELSE 0 END) AS acc
        |  FROM cells)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_strata,
        |  CAST(km AS BIGINT) AS n_strata_matched,
        |  CAST(ntm AS BIGINT) AS n_treat_matched,
        |  CAST(ntu AS BIGINT) AS n_treat_unmatched,
        |  CAST(ncu AS BIGINT) AS n_ctrl_unmatched,
        |  CASE WHEN ntm = 0 THEN NULL
        |       ELSE CAST(sign(acc) AS BIGINT)
        |            * CAST(abs(acc) // ntm AS BIGINT) END AS att_micro
        |FROM ag""".stripMargin,
    "q326_capture_recapture" ->
      """WITH fa AS (SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |      AND epoch_us(ts)//86400000000 < 19730),
        |fb AS (SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |      AND epoch_us(ts)//86400000000 >= 19745),
        |c AS (SELECT CAST((SELECT count(*) FROM fa) AS HUGEINT) AS n1,
        |        CAST((SELECT count(*) FROM fb) AS HUGEINT) AS n2,
        |        CAST((SELECT count(*) FROM fa JOIN fb USING (user_id))
        |          AS HUGEINT) AS m)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(m AS BIGINT) AS m,
        |  CAST(((n1+1)*(n2+1))//(m+1) - 1 AS BIGINT) AS n_hat,
        |  CAST((1000*(n1+1)*(n2+1)*(n1-m)*(n2-m))
        |    //((m+1)*(m+1)*(m+2)) AS BIGINT) AS var_milli
        |FROM c""".stripMargin,
    "q327_vocab_richness" ->
      """WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS w
        |    FROM documents),
        |c AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
        |      FROM w GROUP BY 1,2),
        |ag AS (SELECT lang, CAST(count(*) AS BIGINT) AS s_obs,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f1,
        |    CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f2
        |  FROM c GROUP BY 1)
        |SELECT lang, s_obs, n_tokens, f1, f2,
        |  CAST(1000*s_obs + CASE WHEN f2 > 0 THEN (1000*f1*f1)//(2*f2)
        |    ELSE (1000*f1*(f1-1))//2 END AS BIGINT) AS chao1_milli,
        |  CAST((1000000*f1)//n_tokens AS BIGINT) AS gt_unseen_ppm
        |FROM ag""".stripMargin,
    "q328_holm_adjust" ->
      """WITH dd AS (SELECT epoch_us(ts)//86400000000 AS dy,
        |    count(*) AS n,
        |    sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
        |      AS pos
        |  FROM events GROUP BY 1),
        |p AS (SELECT dy, (1000000*pos)//n AS p_ppm FROM dd),
        |m AS (SELECT count(*) AS m FROM p),
        |r AS (SELECT dy, p_ppm,
        |        row_number() OVER (ORDER BY p_ppm, dy) AS prank FROM p),
        |raw AS (SELECT r.dy, r.p_ppm, r.prank,
        |        least(1000000, r.p_ppm*(m.m - r.prank + 1)) AS rw
        |        FROM r, m)
        |SELECT dy AS day, CAST(p_ppm AS BIGINT) AS p_ppm,
        |  CAST(prank AS BIGINT) AS p_rank,
        |  CAST(least(1000000, max(rw) OVER (ORDER BY prank)) AS BIGINT)
        |    AS q_ppm
        |FROM raw""".stripMargin,
    "q329_design_effect" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS w
        |    FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |a AS (SELECT sum(w) AS n, CAST(count(*) AS HUGEINT) AS k,
        |        sum(w*w) AS w2 FROM c)
        |SELECT CAST(n AS BIGINT) AS n_rows,
        |  CAST(k AS BIGINT) AS n_clusters,
        |  CAST((1000*k*w2)//(n*n) AS BIGINT) AS deff_milli,
        |  CAST((1000*n)//((1000*k*w2)//(n*n)) AS BIGINT) AS n_eff
        |FROM a""".stripMargin,
    "q330_shrunk_rates" ->
      """WITH b AS (SELECT user_id AS k,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |g AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(h) AS BIGINT) AS x FROM b GROUP BY 1)
        |SELECT k AS user_id, n, x AS hits,
        |  CAST((1000000*x)//n AS BIGINT) AS raw_ppm,
        |  CAST((1000000*(x+5))//(n+25) AS BIGINT) AS shrunk_ppm
        |FROM g""".stripMargin,
    "q331_ks_uniform" ->
      """WITH h AS (SELECT user_id % 97 AS v,
        |    CAST(count(*) AS HUGEINT) AS c
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cm FROM h),
        |t AS (SELECT sum(c) AS n FROM h)
        |SELECT CAST(t.n AS BIGINT) AS n,
        | CAST((1000000 * max(greatest(abs(cm*97 - (v+1)*t.n),
        |   abs((cm-c)*97 - v*t.n)))) // (t.n*97) AS BIGINT) AS d_ppm
        |FROM cum, t GROUP BY t.n""".stripMargin,
    "q332_rich_club" ->
      """WITH o AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |           FROM lineitem),
        |e AS (SELECT a.sk AS x, b.sk AS y FROM o a JOIN o b
        |        ON a.ok = b.ok AND a.sk < b.sk
        |      GROUP BY 1, 2 HAVING count(*) >= 25),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM
        |        (SELECT x AS n FROM e UNION ALL SELECT y FROM e)
        |        GROUP BY 1),
        |ks(k) AS (VALUES (5), (10), (20), (40)),
        |nk AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS nn
        |       FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
        |tg AS (SELECT e.x, e.y, dx.d AS dxx, dy.d AS dyy FROM e
        |       JOIN deg dx ON e.x = dx.n JOIN deg dy ON e.y = dy.n),
        |mk AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS mm
        |       FROM ks JOIN tg ON tg.dxx > ks.k AND tg.dyy > ks.k
        |       GROUP BY 1)
        |SELECT CAST(ks.k AS BIGINT) AS k,
        |  CAST(coalesce(nk.nn, 0) AS BIGINT) AS n_nodes,
        |  CAST(coalesce(mk.mm, 0) AS BIGINT) AS n_edges,
        |  CASE WHEN coalesce(nk.nn, 0) < 2 THEN NULL
        |       ELSE CAST((2000000*coalesce(mk.mm,0))
        |         //(nk.nn*(nk.nn-1)) AS BIGINT) END AS phi_ppm
        |FROM ks LEFT JOIN nk ON ks.k = nk.k
        |        LEFT JOIN mk ON ks.k = mk.k""".stripMargin,
    "q333_reciprocity" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e0 AS (SELECT doc_id AS x, doc_id//2 AS y FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*doc_id + 1) % nn.n
        |  FROM documents, nn),
        |e AS (SELECT DISTINCT x, y FROM e0 WHERE x <> y),
        |j AS (SELECT e.x, e.y,
        |        CASE WHEN r.x IS NULL THEN 0 ELSE 1 END AS rc
        |      FROM e LEFT JOIN e r ON e.x = r.y AND e.y = r.x)
        |SELECT CAST(count(*) AS BIGINT) AS n_edges,
        |  CAST(sum(rc) AS BIGINT) AS n_reciprocal,
        |  CAST((1000000*sum(rc))//count(*) AS BIGINT)
        |    AS reciprocity_ppm
        |FROM j""".stripMargin,
    "q377_qini_curve" ->
      """WITH u AS (SELECT user_id % 2 = 0 AS tr,
        |    max(CASE WHEN event_type = 'purchase'
        |          AND CAST(floor(value*100) AS BIGINT) >= 20000
        |        THEN 1 ELSE 0 END) AS e,
        |    coalesce(sum(CAST(floor(value*100) AS BIGINT)), 0) AS s
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |hist AS (SELECT s,
        |    sum(CASE WHEN tr THEN 1 ELSE 0 END) AS wt,
        |    sum(CASE WHEN tr THEN e ELSE 0 END) AS pt,
        |    sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS wc,
        |    sum(CASE WHEN NOT tr THEN e ELSE 0 END) AS pc
        |  FROM u GROUP BY 1),
        |cum AS (SELECT *, sum(wt + wc) OVER (ORDER BY s DESC) AS cw
        |        FROM hist),
        |tot AS (SELECT sum(wt + wc) AS n FROM hist),
        |b AS (SELECT (10*cw + n - 1)//n AS bin, wt, pt, wc, pc
        |      FROM cum, tot),
        |bb AS (SELECT bin, sum(wt) AS wt, sum(pt) AS pt,
        |         sum(wc) AS wc, sum(pc) AS pc FROM b GROUP BY 1),
        |cb AS (SELECT bin,
        |         sum(wt) OVER (ORDER BY bin) AS cnt,
        |         sum(wc) OVER (ORDER BY bin) AS cnc,
        |         sum(pt) OVER (ORDER BY bin) AS cpt,
        |         sum(pc) OVER (ORDER BY bin) AS cpc FROM bb)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(cnt AS BIGINT) AS cum_nt, CAST(cnc AS BIGINT) AS cum_nc,
        |  CAST(cpt AS BIGINT) AS cum_pt, CAST(cpc AS BIGINT) AS cum_pc,
        |  CAST(CASE WHEN cnc = 0 THEN NULL
        |       ELSE CAST(sign(CAST(cpt AS HUGEINT)*cnc
        |                      - CAST(cpc AS HUGEINT)*cnt) AS HUGEINT)
        |            * ((1000 * abs(CAST(cpt AS HUGEINT)*cnc
        |                           - CAST(cpc AS HUGEINT)*cnt)) // cnc)
        |       END AS BIGINT) AS qini_milli
        |FROM cb""".stripMargin,
    "q378_qini_auc" ->
      """WITH u AS (SELECT user_id % 2 = 0 AS tr,
        |    max(CASE WHEN event_type = 'purchase'
        |          AND CAST(floor(value*100) AS BIGINT) >= 20000
        |        THEN 1 ELSE 0 END) AS e,
        |    coalesce(sum(CAST(floor(value*100) AS BIGINT)), 0) AS s
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |hist AS (SELECT s,
        |    sum(CASE WHEN tr THEN 1 ELSE 0 END) AS wt,
        |    sum(CASE WHEN tr THEN e ELSE 0 END) AS pt,
        |    sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS wc,
        |    sum(CASE WHEN NOT tr THEN e ELSE 0 END) AS pc
        |  FROM u GROUP BY 1),
        |cum AS (SELECT *, sum(wt + wc) OVER (ORDER BY s DESC) AS cw
        |        FROM hist),
        |tot AS (SELECT sum(wt + wc) AS n FROM hist),
        |b AS (SELECT (10*cw + n - 1)//n AS bin, wt, pt, wc, pc
        |      FROM cum, tot),
        |bb AS (SELECT bin, sum(wt) AS wt, sum(pt) AS pt,
        |         sum(wc) AS wc, sum(pc) AS pc FROM b GROUP BY 1),
        |cb AS (SELECT bin,
        |         sum(wt) OVER (ORDER BY bin) AS cnt,
        |         sum(wc) OVER (ORDER BY bin) AS cnc,
        |         sum(pt) OVER (ORDER BY bin) AS cpt,
        |         sum(pc) OVER (ORDER BY bin) AS cpc FROM bb),
        |q AS (SELECT bin, cnt + cnc AS cn,
        |        CASE WHEN cnc = 0 THEN NULL
        |        ELSE CAST(sign(CAST(cpt AS HUGEINT)*cnc
        |                       - CAST(cpc AS HUGEINT)*cnt) AS HUGEINT)
        |             * ((1000 * abs(CAST(cpt AS HUGEINT)*cnc
        |                            - CAST(cpc AS HUGEINT)*cnt)) // cnc)
        |        END AS qq
        |      FROM cb),
        |seg AS (SELECT bin, cn, qq,
        |          lag(cn, 1, 0) OVER (ORDER BY bin) AS pcn,
        |          lag(qq, 1, 0) OVER (ORDER BY bin) AS pq
        |        FROM q),
        |f AS (SELECT count(*) AS bins,
        |        sum(CASE WHEN qq IS NULL OR pq IS NULL
        |            THEN 1 ELSE 0 END) AS nullq,
        |        sum((coalesce(pq, 0) + coalesce(qq, 0))
        |            * CAST(cn - pcn AS HUGEINT)) AS area2,
        |        max(cn) AS n FROM seg),
        |qf AS (SELECT qq AS qfv FROM q ORDER BY bin DESC LIMIT 1)
        |SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n,
        |  CAST(COALESCE(bins, 0) AS BIGINT) AS bins,
        |  CAST(qfv AS BIGINT) AS q_final_milli,
        |  CAST(CASE WHEN nullq > 0 OR COALESCE(n, 0) = 0 THEN NULL
        |       ELSE CAST(sign(area2) AS HUGEINT)
        |            * (abs(area2) // (2 * CAST(n AS HUGEINT)))
        |       END AS BIGINT) AS auuc_milli,
        |  CAST(CASE WHEN nullq > 0 OR COALESCE(n, 0) = 0 THEN NULL
        |       ELSE CAST(sign(area2 - CAST(qfv AS HUGEINT) * n)
        |              AS HUGEINT)
        |            * (abs(area2 - CAST(qfv AS HUGEINT) * n)
        |               // (2 * CAST(n AS HUGEINT)))
        |       END AS BIGINT) AS qini_coef_milli
        |FROM f, qf""".stripMargin,
    "q381_srm_check" ->
      """WITH e AS (SELECT user_id % 2 = 0 AS a FROM events
        |           WHERE user_id IS NOT NULL),
        |c AS (SELECT sum(CASE WHEN a THEN 1 ELSE 0 END) AS na,
        |        sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS nb FROM e),
        |x AS (SELECT na, nb,
        |        CASE WHEN na + nb = 0 THEN NULL
        |        ELSE (1000 * (1000 * CAST(na AS HUGEINT)
        |                      - 500 * (na + nb))
        |              * (1000 * CAST(na AS HUGEINT)
        |                 - 500 * (na + nb)))
        |             // (CAST(na + nb AS HUGEINT) * 500 * 500)
        |        END AS chi FROM c)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(500 AS BIGINT) AS expect_a_pm,
        |  CAST(chi AS BIGINT) AS chi2_milli,
        |  CAST(CASE WHEN chi IS NULL THEN NULL
        |       WHEN chi > 3841 THEN 1 ELSE 0 END AS BIGINT) AS srm
        |FROM x""".stripMargin,
    "q382_post_strat_ate" ->
      """WITH e AS (SELECT user_id % 2 = 0 AS t,
        |    CAST(floor(value*100) AS BIGINT) AS x, event_type AS s
        |  FROM events WHERE value IS NOT NULL
        |    AND user_id IS NOT NULL AND event_type IS NOT NULL),
        |st AS (SELECT s,
        |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nc,
        |    sum(CASE WHEN t THEN CAST(x AS HUGEINT) ELSE 0 END) AS sa,
        |    sum(CASE WHEN NOT t THEN CAST(x AS HUGEINT) ELSE 0 END) AS sc
        |  FROM e GROUP BY 1),
        |k AS (SELECT *,
        |        CAST(sign(sa*nc - sc*na) AS HUGEINT)
        |        * ((1000 * abs(sa*nc - sc*na))
        |           // (CAST(na AS HUGEINT) * nc)) AS delta
        |      FROM st WHERE na > 0 AND nc > 0),
        |ex AS (SELECT count(*) AS xs,
        |         coalesce(sum(na + nc), 0) AS xr
        |       FROM st WHERE na = 0 OR nc = 0),
        |f AS (SELECT coalesce(sum(na + nc), 0) AS n, count(*) AS ns,
        |        sum(na) AS ta, sum(nc) AS tc,
        |        sum(sa) AS pa, sum(sc) AS pc,
        |        sum(CAST(na + nc AS HUGEINT) * delta) AS wsum FROM k)
        |SELECT CAST(n AS BIGINT) AS n, CAST(ns AS BIGINT) AS n_strata,
        |  CAST(xs AS BIGINT) AS n_excluded_strata,
        |  CAST(xr AS BIGINT) AS n_excluded_rows,
        |  CAST(CASE WHEN ns = 0 THEN NULL
        |       ELSE CAST(sign(pa*tc - pc*ta) AS HUGEINT)
        |            * ((1000 * abs(pa*tc - pc*ta))
        |               // (CAST(ta AS HUGEINT) * tc))
        |       END AS BIGINT) AS simple_ate_milli,
        |  CAST(CASE WHEN ns = 0 THEN NULL
        |       ELSE CAST(sign(wsum) AS HUGEINT)
        |            * (abs(wsum) // CAST(n AS HUGEINT))
        |       END AS BIGINT) AS post_strat_ate_milli
        |FROM f, ex""".stripMargin,
    "q384_qte" ->
      """WITH u AS (SELECT user_id % 2 = 0 AS tr,
        |    coalesce(sum(CAST(floor(value*100) AS BIGINT)), 0) AS s
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |p AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) * 100 AS pm),
        |tv AS (SELECT s, row_number() OVER (ORDER BY s) AS rn
        |       FROM u WHERE tr),
        |tn AS (SELECT count(*) AS n FROM u WHERE tr),
        |cv AS (SELECT s, row_number() OVER (ORDER BY s) AS rn
        |       FROM u WHERE NOT tr),
        |cn AS (SELECT count(*) AS n FROM u WHERE NOT tr),
        |qt AS (SELECT pm, tn.n AS n_t, tv.s AS q_t
        |       FROM p CROSS JOIN tn JOIN tv
        |         ON tv.rn = (p.pm * tn.n + 999) // 1000
        |       WHERE tn.n > 0),
        |qc AS (SELECT pm, cn.n AS n_c, cv.s AS q_c
        |       FROM p CROSS JOIN cn JOIN cv
        |         ON cv.rn = (p.pm * cn.n + 999) // 1000
        |       WHERE cn.n > 0)
        |SELECT CAST(qt.pm AS BIGINT) AS pm,
        |  CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
        |  CAST(q_t AS BIGINT) AS q_t, CAST(q_c AS BIGINT) AS q_c,
        |  CAST(q_t - q_c AS BIGINT) AS qte
        |FROM qt JOIN qc ON qt.pm = qc.pm""".stripMargin,
    "q379_uplift_calibration" ->
      """WITH u AS (SELECT user_id % 2 = 0 AS tr,
        |    max(CASE WHEN event_type = 'purchase'
        |          AND CAST(floor(value*100) AS BIGINT) >= 20000
        |        THEN 1 ELSE 0 END) AS e,
        |    coalesce(sum(CAST(floor(value*100) AS BIGINT)), 0) AS s
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |p AS (SELECT tr, e, s % 400 - 200 AS pr FROM u),
        |hist AS (SELECT pr,
        |    sum(CASE WHEN tr THEN 1 ELSE 0 END) AS wt,
        |    sum(CASE WHEN tr THEN e ELSE 0 END) AS pt,
        |    sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS wc,
        |    sum(CASE WHEN NOT tr THEN e ELSE 0 END) AS pc
        |  FROM p GROUP BY 1),
        |cum AS (SELECT *, sum(wt + wc) OVER (ORDER BY pr DESC) AS cw
        |        FROM hist),
        |tot AS (SELECT sum(wt + wc) AS n FROM hist),
        |b AS (SELECT (10*cw + n - 1)//n AS bin, wt, pt, wc, pc, pr
        |      FROM cum, tot),
        |bb AS (SELECT bin, sum(wt) AS nt, sum(wc) AS nc,
        |         sum(pt) AS post, sum(pc) AS posc,
        |         sum(CAST(pr AS HUGEINT) * (wt + wc)) AS sp
        |       FROM b GROUP BY 1)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(nt + nc AS BIGINT) AS n,
        |  CAST(nt AS BIGINT) AS n_t, CAST(nc AS BIGINT) AS n_c,
        |  CAST(CAST(sign(sp) AS HUGEINT)
        |       * ((1000 * abs(sp)) // (nt + nc)) AS BIGINT)
        |    AS mean_pred_milli,
        |  CAST(CASE WHEN nt = 0 OR nc = 0 THEN NULL
        |       ELSE CAST(sign(CAST(post AS HUGEINT)*nc
        |                      - CAST(posc AS HUGEINT)*nt) AS HUGEINT)
        |            * ((1000 * abs(CAST(post AS HUGEINT)*nc
        |                           - CAST(posc AS HUGEINT)*nt))
        |               // (CAST(nt AS HUGEINT) * nc))
        |       END AS BIGINT) AS realized_uplift_milli
        |FROM bb""".stripMargin,
    "q376_c_index" ->
      """WITH u AS (SELECT user_id,
        |    max(epoch_us(ts)//86400000000)
        |      - min(epoch_us(ts)//86400000000) AS t,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS e,
        |    coalesce(sum(CAST(floor(value*100) AS BIGINT)), 0) AS s
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |mm AS (SELECT min(t) AS tmin, max(t) AS tmax,
        |         min(s) AS smin, max(s) AS smax, count(*) AS n FROM u),
        |cells AS (SELECT
        |    CASE WHEN tmax = tmin THEN 0
        |      ELSE ((t - tmin) * 32) // (tmax - tmin + 1) END AS tb,
        |    CASE WHEN smax = smin THEN 0
        |      ELSE ((s - smin) * 32) // (smax - smin + 1) END AS sb,
        |    sum(e) AS ce, count(*) AS ca
        |  FROM u, mm GROUP BY 1, 2),
        |p AS (SELECT
        |    sum(CASE WHEN i.sb > j.sb
        |          THEN CAST(i.ce AS HUGEINT) * j.ca END) AS conc,
        |    sum(CASE WHEN i.sb = j.sb
        |          THEN CAST(i.ce AS HUGEINT) * j.ca END) AS ties,
        |    sum(CAST(i.ce AS HUGEINT) * j.ca) AS comp
        |  FROM cells i JOIN cells j ON j.tb > i.tb
        |  WHERE i.ce > 0)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(coalesce(comp, 0) AS BIGINT) AS n_comparable,
        |  CAST(coalesce(conc, 0) AS BIGINT) AS concordant,
        |  CAST(coalesce(ties, 0) AS BIGINT) AS tied,
        |  CAST(CASE WHEN coalesce(comp, 0) = 0 THEN NULL
        |       ELSE (1000000 * (2*coalesce(conc, 0)
        |                        + coalesce(ties, 0))) // (2*comp)
        |       END AS BIGINT) AS c_ppm
        |FROM p, mm""".stripMargin,
    "q334_rmst" ->
      """WITH RECURSIVE u AS (
        |  SELECT user_id,
        |    max(epoch_us(ts)//86400000000)
        |      - min(epoch_us(ts)//86400000000) AS tenure
        |  FROM events GROUP BY 1),
        |dt AS (SELECT tenure, CAST(count(*) AS BIGINT) AS d_t
        |       FROM u GROUP BY 1),
        |risk AS (SELECT tenure, d_t,
        |    CAST(sum(d_t) OVER (ORDER BY tenure DESC) AS BIGINT) AS n_t,
        |    row_number() OVER (ORDER BY tenure) AS rn
        |  FROM dt),
        |km AS (SELECT 0 AS rn, CAST(1000000 AS HUGEINT) AS s
        |       UNION ALL
        |       SELECT risk.rn, (km.s * (risk.n_t - risk.d_t)) // risk.n_t
        |       FROM km JOIN risk ON risk.rn = km.rn + 1),
        |steps AS (SELECT risk.tenure AS t, km.s,
        |    lead(risk.tenure) OVER (ORDER BY risk.tenure) AS nxt
        |  FROM risk JOIN km ON km.rn = risk.rn),
        |h AS (SELECT min(t) AS t0 FROM steps),
        |a AS (SELECT count(*) AS k,
        |    sum(s * greatest(0, least(coalesce(nxt, 30), 30)
        |      - least(t, 30))) AS area FROM steps)
        |SELECT CAST(30 AS BIGINT) AS tau, CAST(a.k AS BIGINT)
        |    AS n_steps,
        |  CAST((1000000 * least(h.t0, 30) + coalesce(a.area, 0)) // 1000
        |    AS BIGINT) AS rmst_milli
        |FROM a, h""".stripMargin,
    "q335_cohort_ltv" ->
      """WITH b AS (SELECT user_id AS u, epoch_us(ts)//86400000000 AS p,
        |    CAST(floor(value*100) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'
        |    AND user_id IS NOT NULL AND value IS NOT NULL),
        |f AS (SELECT u, min(p//7) AS cohort FROM b GROUP BY 1),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS s
        |       FROM f GROUP BY 1),
        |cells AS (SELECT f.cohort, b.p//7 - f.cohort AS age,
        |    CAST(sum(b.v) AS BIGINT) AS pv
        |  FROM b JOIN f ON b.u = f.u GROUP BY 1,2),
        |cum AS (SELECT cohort, age, pv,
        |    CAST(sum(pv) OVER (PARTITION BY cohort ORDER BY age)
        |      AS BIGINT) AS cv FROM cells)
        |SELECT cum.cohort, cum.age, sz.s AS n_users,
        |  cum.pv AS period_value, cum.cv AS cum_value,
        |  CAST((1000*cum.cv)//sz.s AS BIGINT) AS ltv_milli
        |FROM cum JOIN sz ON cum.cohort = sz.cohort""".stripMargin,
    "q336_ranker_agreement" ->
      """WITH norm AS (
        |  SELECT vec_id, embedding,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)
        |        AS DECIMAL(38,15)))) AS nrm
        |  FROM embeddings),
        |cpairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(
        |        list_zip(q.embedding, c.embedding),
        |        p -> CAST(CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)
        |          AS DECIMAL(38,15)))) AS DOUBLE)
        |      / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE))
        |      AS cosine
        |  FROM norm q JOIN norm c
        |    ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |dense AS (SELECT query_id, cand_id FROM
        |  (SELECT *, row_number() OVER (PARTITION BY query_id
        |     ORDER BY cosine DESC, cand_id ASC) AS rnk FROM cpairs)
        |  WHERE rnk <= 20),
        |sk AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(range(1,33),
        |      i -> CASE WHEN embedding[i] > 0
        |        THEN (1::BIGINT << (i-1)) ELSE 0 END)) AS BIGINT) AS w0,
        |    CAST(list_sum(list_transform(range(33,65),
        |      i -> CASE WHEN embedding[i] > 0
        |        THEN (1::BIGINT << (i-33)) ELSE 0 END)) AS BIGINT) AS w1
        |  FROM embeddings),
        |hpairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
        |      AS hamming
        |  FROM sk q JOIN sk c
        |    ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |ham AS (SELECT query_id, cand_id FROM
        |  (SELECT *, row_number() OVER (PARTITION BY query_id
        |     ORDER BY hamming ASC, cand_id ASC) AS rnk FROM hpairs)
        |  WHERE rnk <= 20),
        |na AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_a
        |       FROM dense GROUP BY 1),
        |nb AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_b
        |       FROM ham GROUP BY 1),
        |cm AS (SELECT dense.query_id, CAST(count(*) AS BIGINT) AS nc
        |       FROM dense JOIN ham USING (query_id, cand_id)
        |       GROUP BY 1)
        |SELECT na.query_id, na.n_a, nb.n_b,
        |  CAST(coalesce(cm.nc, 0) AS BIGINT) AS n_common,
        |  CAST((1000000*coalesce(cm.nc, 0))
        |    //(na.n_a + nb.n_b - coalesce(cm.nc, 0)) AS BIGINT)
        |    AS jaccard_ppm
        |FROM na JOIN nb USING (query_id)
        |        LEFT JOIN cm USING (query_id)""".stripMargin)
}
