package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 analytics gates — time-series smoothing/evaluation, graph
  * distance, concentration, experimentation, and survival operators
  * (q222+). Split out of `CoreQueries` (2700 lines) the way the LLM
  * gates were split by domain in round 7; `SparkEntry` unions the maps.
  *
  * Shared conventions (the CoreQueries contract): events.ts normalized
  * to epoch-µs long by `CoreQueries.tRead`, day grain = `ts div
  * 86400000000` ↔ DuckDB `epoch_us(ts)//86400000000`, exact integer /
  * decimal arithmetic with `div` ↔ HUGEINT `//` (both truncate toward
  * zero — DECIMAL `//` in DuckDB is fractional, never use it in an
  * oracle), surfaced aggregates BIGINT.
  */
object AnalyticsGates {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    CoreQueries.tRead(s, dir, name)

  private val dayUs = 86400000000L

  /** Daily event counts per type — the shared spine of the time-series
    * gates (EWMA, autocorrelation, WAPE). */
  private def dailyCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), expr(s"ts div ${dayUs}L").as("day"))
      .agg(count(lit(1)).as("cnt"))

  private val dailyCountsSql =
    """SELECT event_type, epoch_us(ts)//86400000000 AS day,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM events GROUP BY 1, 2""".stripMargin

  // EXPONENTIAL SMOOTHING (ops/Resample.ewmaPpm): bounded-horizon EWMA
  // of the daily event-count series per type, decay 0.7, horizon 8 —
  // exact integer weights (700^k·1000^(7−k)), missing lags drop out of
  // numerator and denominator, ppm surface. One lag window per series.
  def q222_ewma(s: SparkSession, dir: String): DataFrame =
    graft.ops.Resample.ewmaPpm(dailyCounts(s, dir),
      "event_type", "day", "cnt", decayPm = 700, horizon = 8)

  // BFS HOP DISTANCE (ops/GraphOps.hopDistance): unweighted shortest
  // paths from the minimum part id over a SPARSE part co-occurrence
  // graph (orders thinned 23×: the full co-purchase graph has diameter
  // ~1 at small sf — the thinned one spreads hops 0..10, an actual BFS).
  def q223_hop_distance(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .where(col("l_orderkey") % 23 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"), "o")
      .where(col("a.p") < col("b.p"))
      .select(col("a.p").as("x"), col("b.p").as("y"))
    val src = edges.agg(least(min(col("x")), min(col("y"))).as("node"))
    graft.ops.GraphOps.hopDistance(edges, "x", "y", src, maxHops = 12)
      .select(col("node"), col("hop").cast("int").as("hop"))
  }

  // CONCENTRATION (ops/Stats.concentrationPpm): customer-concentration
  // HHI + Gini–Simpson impurity per order priority, exact integer ppm.
  def q224_concentration(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.concentrationPpm(
        t(s, dir, "orders"), "o_orderpriority", "o_custkey")
      .withColumnRenamed("o_orderpriority", "priority")

  // CUPED (ops/Stats.cupedAdjustMilli): variance-reduced A/B readout —
  // units are users, variant = user_id parity, covariate x = pre-period
  // (before Jan 16) spend, metric y = post-period spend, both exact
  // DECIMAL(18,6) sums of the double `value`.
  def q225_cuped(s: SparkSession, dir: String): DataFrame = {
    val d = "decimal(18,6)"
    val split = 19738L // epoch-day of 2024-01-16
    val units = t(s, dir, "events")
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg(
        sum(when(expr(s"ts div ${dayUs}L") < split,
          col("value").cast(d)).otherwise(lit(0).cast(d))).as("x"),
        sum(when(expr(s"ts div ${dayUs}L") >= split,
          col("value").cast(d)).otherwise(lit(0).cast(d))).as("y"))
    graft.ops.Stats.cupedAdjustMilli(units, "variant", "x", "y")
  }

  // AUTOCORRELATION (ops/Stats.autocorrPpm): lag-1 signed-r² of each
  // type's daily count series — the momentum/mean-reversion diagnostic.
  def q226_autocorr(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.autocorrPpm(dailyCounts(s, dir),
      "event_type", "day", "cnt", lagK = 1)

  // SURVIVAL HAZARD (ops/EventAnalytics.hazardByTenure): discrete
  // life-table churn rates by whole-day tenure — d_t, at-risk suffix
  // sum n_t, hazard ppm; windowless (globalRunningSum descending).
  def q227_hazard(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.hazardByTenure(
      t(s, dir, "events"), "user_id", "ts", periodUs = dayUs)

  // FORECAST BASELINE (ops/Resample.seasonalNaiveWape): season-7
  // naive forecast of daily counts scored by exact-ppm WAPE per type.
  def q228_wape(s: SparkSession, dir: String): DataFrame =
    graft.ops.Resample.seasonalNaiveWape(dailyCounts(s, dir),
      "event_type", "day", "cnt", season = 7)

  // APPROX PROFILER (ops/Profiler.approxProfile): the q206 profiler's
  // 100 TB path made real — pass 2's exact (column, value) histogram
  // (shuffle ~rows on the o_orderkey id column) swapped for ONE
  // per-column HLL register build (shuffle ≤ k·2^b rows). Gate pins
  // the sketch's exact integer core (n_buckets, denom_units) with the
  // md5 gate hash; the float estimate stays spec-pinned.
  def q229_approx_profile(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profiler.approxProfile(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 10 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderpriority")).as("prio")),
        Seq("o_orderkey", "o_orderstatus", "prio"),
        b = 6, hashFn = graft.llm.TextAnalysis.md5Hash60, hashBits = 60)
      .select(col("column"), col("n"), col("n_null"),
        col("min_value"), col("max_value"), col("n_buckets"),
        col("denom_units").cast("long").as("denom_units"))

  // BENFORD FIRST-DIGIT AUDIT (ops/Stats.benfordDeviationPpm): price
  // cents per return flag vs the pinned ppm Benford masses — textual
  // digit extraction, complete 1..9 grid (absent digits emit count 0),
  // exact integer shares/deviations. TPC-H prices are uniform, so the
  // deviations are LARGE — which is the audit working, not failing.
  def q236_benford(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.benfordDeviationPpm(
      t(s, dir, "lineitem").select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents")),
      "l_returnflag", "cents")

  // CUSUM CHANGEPOINT (ops/Stats.cusumChangepoint): the most likely
  // level-shift day of each type's daily count series — argmax of the
  // n-scaled cumulative deviation |n·prefix_t − t·total|, all-integer,
  // ties earliest. One group-partitioned running-sum window.
  def q237_cusum(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.cusumChangepoint(dailyCounts(s, dir),
      "event_type", "day", "cnt")

  // EQUI-DEPTH HISTOGRAM (ops/Stats.equiDepthHistogram): 8 equal-count
  // value-cents bins per event type — optimizer/catalog statistics with
  // tie-safe value-level bin assignment, exact integer rank math.
  def q238_equi_depth(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.equiDepthHistogram(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(col("event_type"), floor(col("value") * 100).as("cents")),
      "event_type", "cents", bins = 8)

  // TWO-SAMPLE KS DRIFT (ops/Stats.ksTwoSamplePpm): purchase vs view
  // value-cents distributions — exact integer max-CDF-gap, the numeric
  // drift sibling of categoryDrift; windowless distributed prefix sums
  // over the value alphabet.
  def q239_ks_drift(s: SparkSession, dir: String): DataFrame = {
    def side(tpe: String) = t(s, dir, "events")
      .where(col("event_type") === tpe && col("value").isNotNull)
      .select(floor(col("value") * 100).as("cents"))
    graft.ops.Stats.ksTwoSamplePpm(side("purchase"), side("view"), "cents")
  }

  // GINI INEQUALITY (ops/Stats.giniCoefficientPpm): how unequally
  // customer spend distributes within each order priority — exact
  // tie-safe histogram Gini, the magnitude-ranking complement of
  // q224's share-squaring HHI.
  def q240_gini(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.giniCoefficientPpm(
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"), col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("spend")),
        "o_orderpriority", "spend")
      .withColumnRenamed("o_orderpriority", "priority")

  // PEARSON R² (ops/Stats.pearsonR2Ppm): how tightly each type's
  // hourly volume tracks total hourly traffic — r² ppm + covariance
  // sign from one six-sum pass over the joined hourly series. The
  // micro-unit moment reduction keeps every product n-independent.
  def q241_pearson(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"), expr(s"ts div ${hourUs}L").as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val totals = t(s, dir, "events")
      .groupBy(expr(s"ts div ${hourUs}L").as("hour"))
      .agg(count(lit(1)).as("total"))
    graft.ops.Stats.pearsonR2Ppm(
      hourly.join(totals, "hour"), "event_type", "cnt", "total")
  }

  // MANN–KENDALL (ops/Stats.mannKendall): distribution-free monotone
  // trend test over each type's daily count series — S sign sum +
  // tau_a ppm; the pair frame is days², never event rows.
  def q242_mann_kendall(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.mannKendall(dailyCounts(s, dir),
      "event_type", "day", "cnt")

  // THEIL–SEN (ops/Stats.theilSenSlopePpm): robust median-of-slopes
  // daily trend per type — the outlier-immune complement of q193's
  // OLS trend; slope histogram + type-1 median, exact integer.
  def q243_theil_sen(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.theilSenSlopePpm(dailyCounts(s, dir),
      "event_type", "day", "cnt")

  // TOTAL-VARIATION DRIFT (ops/Stats.totalVariationPpm): the scalar
  // lang-mix distance between the even/odd doc_id halves — ½Σ|p−q| in
  // exact ppm on the common n_a·n_b denominator; the categorical
  // sibling of q239's KS.
  def q244_tv_drift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.ops.Stats.totalVariationPpm(
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 === 1), "lang")
  }

  // POISSON BOOTSTRAP CI (ops/Stats.bootstrapMeanCiMilli): per-type
  // mean value-cents with a deterministic 40-replicate 95% CI — every
  // weight drawn from md5(event_id:rep) against the pinned Poisson(1)
  // thresholds, so both engines resample identically.
  def q245_bootstrap_ci(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.bootstrapMeanCiMilli(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).as("cents")),
      "event_type", "event_id", "cents",
      hashFn = graft.ops.Stats.md5Hash60)

  // PERMUTATION TEST (ops/Stats.permutationTestMilli): is the user-id
  // parity split's spend difference explainable by chance — 39 exact
  // md5-parity label reshuffles, add-one p-value in per-mille.
  def q246_perm_test(s: SparkSession, dir: String): DataFrame = {
    val units = t(s, dir, "events").where(col("value").isNotNull)
      .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("spend"))
    graft.ops.Stats.permutationTestMilli(units, "variant", "user_id",
      "spend", hashFn = graft.ops.Stats.md5Hash60)
  }

  // ONE-WAY ANOVA (ops/Stats.anovaFMicro): does event type explain any
  // of the value-cents variance — exact integer F in micro-units from
  // one (n, Σv, Σv²) pass.
  def q247_anova(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.anovaFMicro(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(col("event_type"), floor(col("value") * 100).as("cents")),
      "event_type", "cents")

  // K-CORE (ops/GraphOps.kCore): the 3-core of the thinned co-purchase
  // graph (q223's edge recipe) — peel to fixpoint with per-round
  // checkpoint pins, fail-loud on non-convergence; oracle = 12
  // unrolled peel rounds (converges ≤ 10 at every fixture SF).
  def q248_kcore(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .where(col("l_orderkey") % 23 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val edges = li.as("a").join(li.as("b"), "o")
      .where(col("a.p") < col("b.p"))
      .select(col("a.p").as("x"), col("b.p").as("y"))
    graft.ops.GraphOps.kCore(edges, "x", "y", k = 3)
  }

  // SPEARMAN (ops/Stats.spearmanR2Ppm): monotone association between
  // quantity and price per return flag — doubled midranks (tie-exact)
  // through the Pearson micro-moment recipe, sqrt-free in both engines.
  def q249_spearman(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.spearmanR2Ppm(
      t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice")).as("dollars")),
      "l_returnflag", "qty", "dollars")

  // ACTIVITY STREAKS (ops/EventAnalytics.activityStreaks): per-user
  // consecutive-active-day runs — the gaps-and-islands rank trick,
  // longest streak ties to the earliest start.
  def q250_streaks(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.activityStreaks(
        t(s, dir, "events")
          .select(col("user_id"), expr(s"ts div ${dayUs}L").as("day")),
        "user_id", "day")

  // DWELL TIME (ops/EventAnalytics.dwellByState): inter-event gaps
  // attributed to the preceding event's type — exact µs, (ts, id)
  // tie-deterministic.
  def q251_dwell(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.dwellByState(t(s, dir, "events"),
      "user_id", "event_type", "ts", "event_id")
      .withColumnRenamed("state", "event_type")

  // CRAMÉR'S V² (ops/Stats.cramersV2Ppm): effect size of the
  // priority×status association — the k×m chi-square normalized to
  // [0,1], exact integer end to end.
  def q252_cramers_v(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.cramersV2Ppm(t(s, dir, "orders"),
      "o_orderpriority", "o_orderstatus")

  // SEQUENTIAL POISSON SAMPLING (ops/Sampling.sequentialPoissonSample):
  // 50 length-weighted docs per language, deterministic πps without
  // replacement — priority = md5-60bit div n_chars, k-bounded bottom-k.
  def q253_pps_sample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.sequentialPoissonSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")),
        col("lang"), col("doc_id"), "n_chars", k = 50,
        hashFn = c => graft.ops.Stats.md5Hash60(concat(lit("sps:"), c)))

  // SEASONAL INDICES (ops/Resample.seasonalIndices): day-of-week
  // profile of each type's daily counts — exact-ppm slot-mean vs
  // overall-mean ratios, cross-multiplied to one division.
  def q254_seasonal(s: SparkSession, dir: String): DataFrame =
    graft.ops.Resample.seasonalIndices(dailyCounts(s, dir),
      "event_type", "day", "cnt", season = 7)

  // TIME-DECAY ATTRIBUTION (ops/EventAnalytics.timeDecayAttribution):
  // view/click credit for purchases with 1-day half-life power-of-two
  // decay over a 7-day lookback — the recency-weighted sibling of
  // q194's first/last/linear report.
  def q255_decay_attrib(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.timeDecayAttribution(t(s, dir, "events"),
      "user_id", "ts", "event_id", "event_type", convType = "purchase",
      touchTypes = Seq("view", "click"), lookbackUs = 7L * dayUs,
      halfLifeUs = dayUs)

  // LORENZ CURVE (ops/Stats.lorenzPoints): decile mass shares of
  // customer spend per priority — the curve q240's Gini integrates,
  // tie-exact pro-rata at rank cuts inside tie blocks.
  def q257_lorenz(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.lorenzPoints(
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"), col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("spend")),
        "o_orderpriority", "spend")
      .withColumnRenamed("o_orderpriority", "priority")

  // DISPERSION INDEX (ops/Stats.dispersionIndexMilli): variance-to-mean
  // of each type's daily counts — the Poisson-ness screen (1000 ≈
  // Poisson; above = bursty), one exact-integer pass.
  def q258_dispersion(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.dispersionIndexMilli(dailyCounts(s, dir),
      "event_type", "cnt")

  // HOLT LINEAR (ops/Resample.holtForecastMilli): trend-aware one-step
  // forecasts of the daily count series — the pinned ppm coefficient
  // table makes the double-exponential recurrence a literal linear
  // combination both engines evaluate identically.
  def q259_holt(s: SparkSession, dir: String): DataFrame =
    graft.ops.Resample.holtForecastMilli(dailyCounts(s, dir),
      "event_type", "day", "cnt")

  // ABC CLASSIFICATION (ops/Stats.abcClasses): parts triaged by
  // revenue mass — A holds the first 80%, B to 95%, C the tail;
  // crossing items stay in the upper class, (mass DESC, id) total
  // order, windowless global prefix sum.
  def q260_abc(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.abcClasses(
      t(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
          .as("revenue")),
      "l_partkey", "revenue")

  /** Deterministic synthetic coordinates for the spatial gates — two
    * LCG-style affine maps of the customer key into a 50000×50000
    * micro-unit box, integer arithmetic both engines share. Capped at
    * c_custkey ≤ 3000 so the pair count stays bounded as sf grows
    * (the q137 blocked-pairs precedent — within-radius pairs grow
    * quadratically with density). */
  private def geoPoints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").where(col("c_custkey") <= 3000)
      .select(col("c_custkey").as("id"),
        ((col("c_custkey") * 1103515245L + 12345L) % 50000L).as("x"),
        ((col("c_custkey") * 69069L + 1L) % 50000L).as("y"))

  private val geoPointsSql =
    """SELECT c_custkey AS id,
      |       (c_custkey*1103515245 + 12345) % 50000 AS x,
      |       (c_custkey*69069 + 1) % 50000 AS y
      |FROM customer WHERE c_custkey <= 3000""".stripMargin

  // SPATIAL RADIUS JOIN (ops/Spatial.radiusPairs): all point pairs
  // within 1500 micro-units — grid-cell candidate join (cell = radius,
  // 9-neighbor probe), exact integer squared distances; the oracle is
  // the brute-force O(n²) join the grid plan replaces.
  def q262_radius_pairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.Spatial.radiusPairs(geoPoints(s, dir),
      "id", "x", "y", radius = 1500L)

  // GRID DENSITY HOTSPOTS (ops/Spatial.gridHotspots): top-10 densest
  // 5000-unit cells by (n DESC, cx, cy) — the density diagnostic that
  // finds the skewed cells before a radius join concentrates on them.
  def q263_hotspots(s: SparkSession, dir: String): DataFrame =
    graft.ops.Spatial.gridHotspots(geoPoints(s, dir),
      "x", "y", cellSize = 5000L, k = 10)

  // MAD OUTLIERS (ops/Stats.madReport): median-absolute-deviation
  // screen over floor-cent event values per type — the 50%-breakdown
  // robust-scale sibling of q179's IQR fences, 3-MAD flag rule
  // cross-multiplied in exact integers.
  def q264_mad(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.madReport(
      t(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("cents")),
      "event_type", "cents")

  // CROSS-CORRELATION (ops/Stats.crossCorrPpm): daily views vs daily
  // purchases at lags 0..6 — "does x lead y" via the Pearson
  // micro-moment recipe per lag; the lag-exploded join is bounded by
  // periods×lags, never events.
  def q265_ccf(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(expr(s"ts div ${dayUs}L").as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .withColumn("series", lit("view->purchase"))
    graft.ops.Stats.crossCorrPpm(daily, "series", "day", "x", "y",
      maxLag = 6)
  }

  // GINI SPLIT GAIN (ops/Stats.splitGainPpm): which metadata field
  // best predicts a document's language — CART split gain per feature
  // in exact integer ppm (source dominates the id-residue placebo;
  // the placebo pins the near-zero branch of the arithmetic).
  def q267_split_gain(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").where(col("lang").isNotNull)
      .select(col("lang"), col("source"),
        expr("n_chars div 500").as("band"), (col("doc_id") % 5).as("resid"))
    graft.ops.Stats.splitGainPpm(d, Seq("source", "band", "resid"), "lang")
  }

  // ISOTONIC CALIBRATION (ops/Stats.isotonicFit): exact PAVA of the
  // purchase indicator on the dollar-bucket score — driver PAVA over
  // the ≤10³-level histogram; the oracle replays the minimax
  // characterization fit(k) = max_{i≤k} min_{j≥k} avg(i..j) in SQL
  // (values non-negative in the fixture, so div/floor-div agree).
  def q268_isotonic(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.isotonicFit(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(expr("CAST(floor(value*100) AS LONG) div 100").as("score"),
          (col("event_type") === "purchase").cast("long").as("y")),
      "score", "y")

  // BUCKETED ISOTONIC CALIBRATION (ops/Stats.isotonicFitBucketed):
  // the 100 TB route of q268 — the RAW cent score (thousands of
  // distinct values) is reduced to 50 exact equal-width cells over the
  // observed span before the driver PAVA, so the collected histogram
  // is bounded by construction. Cell representative = min observed
  // score (exact, SQL-replayable); oracle = same bucketing + the q268
  // minimax characterization over cells.
  def q338_isotonic_bucketed(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.isotonicFitBucketed(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(expr("CAST(floor(value*100) AS LONG)").as("score"),
          (col("event_type") === "purchase").cast("long").as("y")),
      "score", "y", buckets = 50)

  // TRIMMED MEAN (ops/Stats.trimmedMeanMilli): mean of floor-cent
  // values inside the exact [5%, 95%] type-1 fences per event type —
  // the drop-don't-clamp sibling of q208's winsorization.
  def q269_trimmed_mean(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.trimmedMeanMilli(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("cents")),
      "event_type", "cents")

  // CORRELATION MATRIX (ops/Stats.correlationMatrixPpm): every pair of
  // daily event-type series, exact r²·sign ppm — the metric-redundancy
  // screen; pairwise-complete on the day axis, one self-join bounded
  // by days×types.
  def q270_corr_matrix(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.correlationMatrixPpm(dailyCounts(s, dir),
      "day", "event_type", "cnt")

  // MAX CONCURRENCY (ops/EventAnalytics.maxConcurrency): peak number
  // of simultaneously-active users per day (activity span = [first,
  // last] event) + the earliest instant the peak is hit — sweep-line
  // over ±1 deltas, starts before ends at equal ts (inclusive
  // overlap), day-partitioned running count.
  def q271_concurrency(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "events")
      .groupBy(col("user_id"), expr(s"ts div ${dayUs}L").as("day"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    graft.ops.EventAnalytics.maxConcurrency(iv, "day", "s", "e")
  }

  // BEST SPLIT THRESHOLD (ops/Stats.bestSplitThreshold): the
  // distributed tree-split finder over the value histogram — label
  // planted as (cents ≥ 3500) XOR a 1-in-7 noise bit, so the argmax
  // must recover band 34 in every group through the noise.
  def q272_best_split(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(floor(value*100) AS LONG) div 100").as("band"),
        ((floor(col("value") * 100).cast("long") >= 3500) =!=
          (col("event_id") % 7 === 0)).cast("long").as("y"))
    graft.ops.Stats.bestSplitThreshold(e, "event_type", "band", "y")
  }

  // TOP SESSION PATHS (ops/EventAnalytics.topPaths): the 20 most
  // common 3-step event-type journeys per (user, day) session — the
  // Sankey source table; path order (ts, event_id), cut ties
  // (n DESC, path).
  def q273_top_paths(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.topPaths(
      t(s, dir, "events")
        .withColumn("day", expr(s"ts div ${dayUs}L")),
      Seq("user_id", "day"), "ts", "event_id", "event_type",
      steps = 3, k = 20)

  // PER-CLASS P/R/F1 (ops/EventAnalytics.classReport): the fixture's
  // lang labels vs q200's simulated noisy re-annotation (every 7th
  // doc flips to 'en') — per-class precision/recall/F1 in exact ppm;
  // 'en' trades perfect recall for precision, every other class the
  // reverse.
  def q274_class_report(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.classReport(
      t(s, dir, "documents").where(col("lang").isNotNull)
        .select(col("lang"),
          when(col("doc_id") % 7 === 0, "en").otherwise(col("lang"))
            .as("pred")),
      "lang", "pred")

  // CUMULATIVE GAINS (ops/Stats.gainsTable): decile targeting table
  // over the q272 planted score/label — the top half must capture
  // ~6/7 of positives (the signal), the tail the 1-in-7 noise.
  def q275_gains(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.gainsTable(
      t(s, dir, "events").where(col("value").isNotNull)
        .select(floor(col("value") * 100).cast("long").as("cents"),
          ((floor(col("value") * 100).cast("long") >= 3500) =!=
            (col("event_id") % 7 === 0)).cast("long").as("y")),
      "cents", "y", bins = 10)

  // FUNCTIONAL DEPENDENCIES (ops/Profiler.functionalDependencies):
  // schema-discovery probe — o_orderkey → o_orderdate must HOLD (key
  // uniqueness), the two non-key pairs must violate with real
  // violation counts. holds surfaced as 0/1 BIGINT (engine-stable).
  def q276_fd_check(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profiler.functionalDependencies(
        t(s, dir, "orders"),
        Seq(("o_orderkey", "o_orderdate"),
          ("o_custkey", "o_orderpriority"),
          ("o_orderdate", "o_orderpriority")))
      .withColumn("holds", col("holds").cast("long"))

  // SUBTREE ROLLUP (composite: Hierarchy.ancestors closure → value
  // join → per-ancestor aggregate): every node's descendant count and
  // descendant-inclusive n_chars total over the doc_id div 2 tree —
  // the org-chart / BOM rollup query WITH RECURSIVE exists for.
  def q277_subtree_rollup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").filter(col("doc_id") >= 1)
    val closure = graft.ops.Hierarchy.ancestors(
      docs.select(col("doc_id").as("child"),
        expr("doc_id div 2").as("parent")),
      "child", "parent", maxDepth = 12)
    val pairs = closure.select(col("node"), col("ancestor"))
      .unionByName(docs.select(col("doc_id").as("node"),
        col("doc_id").as("ancestor")))
    pairs.join(docs.select(col("doc_id").as("node"), col("n_chars")),
        "node")
      .groupBy(col("ancestor"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("n_chars")).as("subtree_chars"))
  }

  // SEASONAL ENVELOPE (composite: exactQuantilesByGroup over a struct
  // key): per (type, day-of-week) the p10/p50/p90 band of daily
  // counts — the expected-range envelope an anomaly monitor compares
  // today against. Struct group keys ride the existing quantile
  // machinery unchanged; epoch day 0 = Thursday, so dow = (day+4)%7.
  def q278_seasonal_envelope(s: SparkSession, dir: String): DataFrame = {
    val d2 = dailyCounts(s, dir)
      .select(struct(col("event_type").as("g"),
        ((col("day") + 4) % 7).as("dow")).as("gk"), col("cnt"))
    graft.ops.Stats.exactQuantilesByGroup(d2, "gk", "cnt",
        Seq(("p10", 100), ("p50", 500), ("p90", 900)))
      .groupBy(col("gk.g").as("event_type"),
        col("gk.dow").cast("long").as("dow"))
      .agg(max(when(col("label") === "p10", col("q"))).as("p10"),
        max(when(col("label") === "p50", col("q"))).as("p50"),
        max(when(col("label") === "p90", col("q"))).as("p90"))
  }

  // TOP MOVERS (lag window + distributed top-k): the 10 largest
  // week-over-week swings in event volume by |Δ| ppm — the BI
  // "what changed" table; ties broken by the (type, week) total
  // order, zero/absent baselines excluded (Δ undefined).
  def q279_top_movers(s: SparkSession, dir: String): DataFrame = {
    val wk = t(s, dir, "events")
      .groupBy(col("event_type").as("g"),
        expr("ts div 604800000000L").as("w"))
      .agg(count(lit(1)).as("cnt"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("w"))
    wk.withColumn("prev", lag(col("cnt"), 1).over(win))
      .where(col("prev").isNotNull && col("prev") > 0)
      .withColumn("delta_ppm", expr("(1000000 * (cnt - prev)) div prev"))
      .orderBy(abs(col("delta_ppm")).desc, col("g"), col("w"))
      .limit(10)
      .select(col("g").as("event_type"), col("w").as("week"),
        col("cnt"), col("prev"), col("delta_ppm"))
  }

  // NEAREST NEIGHBOR (ops/Spatial.nearestWithin): each point's closest
  // other point within 1500 units — grid candidates + min(struct)
  // argmin, distance ties to the smaller neighbor id.
  def q280_nearest(s: SparkSession, dir: String): DataFrame =
    graft.ops.Spatial.nearestWithin(geoPoints(s, dir),
      "id", "x", "y", radius = 1500L)

  // DBSCAN (ops/Spatial.dbscan): deterministic density clustering —
  // eps 1500 / minPts 4 over the synthetic point cloud; border points
  // pinned to their NEAREST core (classic DBSCAN is scan-order-
  // dependent there), labels = min core id per component.
  def q281_dbscan(s: SparkSession, dir: String): DataFrame =
    graft.ops.Spatial.dbscan(geoPoints(s, dir),
      "id", "x", "y", eps = 1500L, minPts = 4)

  // L1 TRAJECTORY LENGTH (ops/EventAnalytics.pathLengthL1): Manhattan
  // path length per user over LCG-synthesized per-event positions —
  // exact integer (Σ√· would be an order-sensitive float sum).
  def q282_trajectory(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.pathLengthL1(
      t(s, dir, "events").select(col("user_id"), col("ts"),
        col("event_id"),
        ((col("event_id") * 48271L) % 10000L).as("x"),
        ((col("event_id") * 16807L) % 10000L).as("y")),
      "user_id", "ts", "event_id", "x", "y")

  // ROLLING CORRELATION (ops/Stats.rollingCorrPpm): trailing-14-day
  // view↔purchase coupling at every day — six moment sums share one
  // RANGE frame, micro-moment ppm finish map-only.
  def q283_rolling_corr(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(expr(s"ts div ${dayUs}L").as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .withColumn("series", lit("view->purchase"))
    graft.ops.Stats.rollingCorrPpm(daily, "series", "day", "x", "y",
      windowPeriods = 14)
  }

  // TOP-K WITH OTHERS (ops/Stats.topKWithOthers): the dashboard
  // rollup — top-5 sources by total characters plus the reconcilable
  // OTHER residual (Σ output = Σ input exactly).
  def q284_top_others(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.topKWithOthers(
      t(s, dir, "documents").where(col("n_chars").isNotNull),
      "source", "n_chars", k = 5)

  // KAPLAN–MEIER (ops/EventAnalytics.kmSurvivalPpm): q227's life table
  // extended with the exact-integer survival recurrence S_t =
  // (S_{t−1}·(n_t−d_t)) div n_t — the pinned-floor form of Π(1−d/n)
  // both engines replay identically (a float window product would
  // hinge on association order).
  def q285_km_survival(s: SparkSession, dir: String): DataFrame =
    graft.ops.EventAnalytics.kmSurvivalPpm(
      t(s, dir, "events"), "user_id", "ts", periodUs = dayUs)

  // SUBTREE SHARE-OF-PARENT (composite over q277's rollup): each
  // node's descendant-inclusive mass as an exact ppm of its parent's —
  // the "which branch carries the weight" drill-down a BOM/org
  // hierarchy report reads next to the rollup itself.
  def q286_subtree_share(s: SparkSession, dir: String): DataFrame = {
    val roll = q277_subtree_rollup(s, dir)
      .select(col("ancestor"), col("subtree_chars"))
      .localCheckpoint() // consumed as both child and parent side
    val child = roll.where(col("ancestor") >= 1)
      .select(col("ancestor").as("node"),
        expr("ancestor div 2").as("parent"),
        col("subtree_chars").as("node_chars"))
    child.join(roll.select(col("ancestor").as("parent"),
        col("subtree_chars").as("parent_chars")), "parent")
      .select(col("node"), col("parent"), col("node_chars"),
        col("parent_chars"),
        when(col("parent_chars") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000 * node_chars) div parent_chars"))
          .as("share_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q222_ewma"          -> q222_ewma _,
    "q223_hop_distance"  -> q223_hop_distance _,
    "q224_concentration" -> q224_concentration _,
    "q225_cuped"         -> q225_cuped _,
    "q226_autocorr"      -> q226_autocorr _,
    "q227_hazard"        -> q227_hazard _,
    "q228_wape"          -> q228_wape _,
    "q229_approx_profile" -> q229_approx_profile _,
    "q236_benford"       -> q236_benford _,
    "q237_cusum"         -> q237_cusum _,
    "q238_equi_depth"    -> q238_equi_depth _,
    "q239_ks_drift"      -> q239_ks_drift _,
    "q240_gini"          -> q240_gini _,
    "q241_pearson"       -> q241_pearson _,
    "q242_mann_kendall"  -> q242_mann_kendall _,
    "q243_theil_sen"     -> q243_theil_sen _,
    "q244_tv_drift"      -> q244_tv_drift _,
    "q245_bootstrap_ci"  -> q245_bootstrap_ci _,
    "q246_perm_test"     -> q246_perm_test _,
    "q247_anova"         -> q247_anova _,
    "q248_kcore"         -> q248_kcore _,
    "q249_spearman"      -> q249_spearman _,
    "q250_streaks"       -> q250_streaks _,
    "q251_dwell"         -> q251_dwell _,
    "q252_cramers_v"     -> q252_cramers_v _,
    "q253_pps_sample"    -> q253_pps_sample _,
    "q254_seasonal"      -> q254_seasonal _,
    "q255_decay_attrib"  -> q255_decay_attrib _,
    "q257_lorenz"        -> q257_lorenz _,
    "q258_dispersion"    -> q258_dispersion _,
    "q259_holt"          -> q259_holt _,
    "q260_abc"           -> q260_abc _,
    "q262_radius_pairs"  -> q262_radius_pairs _,
    "q263_hotspots"      -> q263_hotspots _,
    "q264_mad"           -> q264_mad _,
    "q265_ccf"           -> q265_ccf _,
    "q267_split_gain"    -> q267_split_gain _,
    "q268_isotonic"      -> q268_isotonic _,
    "q338_isotonic_bucketed" -> q338_isotonic_bucketed _,
    "q269_trimmed_mean"  -> q269_trimmed_mean _,
    "q270_corr_matrix"   -> q270_corr_matrix _,
    "q271_concurrency"   -> q271_concurrency _,
    "q272_best_split"    -> q272_best_split _,
    "q273_top_paths"     -> q273_top_paths _,
    "q274_class_report"  -> q274_class_report _,
    "q275_gains"         -> q275_gains _,
    "q276_fd_check"      -> q276_fd_check _,
    "q277_subtree_rollup" -> q277_subtree_rollup _,
    "q278_seasonal_envelope" -> q278_seasonal_envelope _,
    "q279_top_movers"    -> q279_top_movers _,
    "q280_nearest"       -> q280_nearest _,
    "q281_dbscan"        -> q281_dbscan _,
    "q282_trajectory"    -> q282_trajectory _,
    "q283_rolling_corr"  -> q283_rolling_corr _,
    "q284_top_others"    -> q284_top_others _,
    "q285_km_survival"   -> q285_km_survival _,
    "q286_subtree_share" -> q286_subtree_share _)

  /** The Poisson(1) weight ladder over a 60-bit md5 hash expression —
    * the same pinned thresholds as Stats.poissonThresholds, rendered
    * as DuckDB SQL. */
  private def poissonCaseSql(u: String): String =
    "CASE " + graft.ops.Stats.poissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString(" ") +
      s" ELSE ${graft.ops.Stats.poissonThresholds.size} END"

  private def md5Hash60Sql(s: String): String =
    s"(('0x'||substring(md5($s),1,15))::BIGINT)"

  /** 12 unrolled k-core peel rounds (MATERIALIZED — chained CTEs
    * otherwise inline exponentially in DuckDB). Extra rounds past the
    * fixpoint are no-ops, so 12 is safe headroom over the ≤10 every
    * fixture SF needs; the Spark side asserts true convergence. */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val head =
      """WITH li AS MATERIALIZED (SELECT l_orderkey o, l_partkey p
        |  FROM lineitem WHERE l_orderkey % 23 = 0),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.p x, b.p y
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
        |und AS MATERIALIZED (SELECT x, y FROM e0
        |  UNION ALL SELECT y, x FROM e0),
        |n0 AS MATERIALIZED (SELECT DISTINCT x AS node FROM und)"""
        .stripMargin
    val peels = (1 to rounds).map { i =>
      s"""n$i AS MATERIALIZED (SELECT u.x AS node FROM und u
         |  JOIN n${i - 1} a ON a.node = u.x
         |  JOIN n${i - 1} b ON b.node = u.y
         |  GROUP BY 1 HAVING count(*) >= $k)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$peels
       |SELECT u.x AS node, CAST(count(*) AS BIGINT) AS deg
       |FROM und u JOIN n$rounds a ON a.node = u.x
       |JOIN n$rounds b ON b.node = u.y
       |GROUP BY 1""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // brute-force O(n²) distance join — the ground truth the grid
    // plan must reproduce exactly (inclusive radius, id_a < id_b)
    "q262_radius_pairs" ->
      s"""WITH pts AS ($geoPointsSql)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
        |FROM pts a JOIN pts b ON a.id < b.id
        |WHERE (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= 2250000"""
        .stripMargin,
    "q263_hotspots" ->
      s"""WITH pts AS ($geoPointsSql)
        |SELECT CAST(x//5000 AS BIGINT) AS cx, CAST(y//5000 AS BIGINT) AS cy,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM pts GROUP BY 1, 2 ORDER BY n DESC, cx, cy LIMIT 10"""
        .stripMargin,
    "q264_mad" ->
      """WITH e AS (SELECT event_type g, CAST(floor(value*100) AS BIGINT) v
        |           FROM events WHERE value IS NOT NULL),
        |c AS (SELECT g, v, count(*) cnt FROM e GROUP BY 1,2),
        |cum AS (SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v) cum FROM c),
        |t AS (SELECT g, sum(cnt) n FROM c GROUP BY 1),
        |med AS (SELECT cum.g, min(v) FILTER (WHERE cum >= (500*t.n+999)//1000) med
        |        FROM cum JOIN t ON t.g=cum.g GROUP BY 1),
        |d AS (SELECT e.g, abs(e.v - med.med) dev FROM e JOIN med ON med.g = e.g),
        |dc AS (SELECT g, dev, count(*) cnt FROM d GROUP BY 1,2),
        |dcum AS (SELECT g, dev, sum(cnt) OVER (PARTITION BY g ORDER BY dev) cum FROM dc),
        |dt AS (SELECT g, sum(cnt) n FROM dc GROUP BY 1),
        |mad AS (SELECT dcum.g, min(dev) FILTER (WHERE cum >= (500*dt.n+999)//1000) mad
        |        FROM dcum JOIN dt ON dt.g=dcum.g GROUP BY 1)
        |SELECT e.g AS event_type, CAST(count(*) AS BIGINT) AS n, med.med, mad.mad,
        |  CAST(count(*) FILTER (WHERE abs(e.v - med.med)*1000 > mad.mad*3000) AS BIGINT)
        |    AS n_outliers
        |FROM e JOIN med ON med.g=e.g JOIN mad ON mad.g=e.g
        |GROUP BY 1, med.med, mad.mad""".stripMargin,
    "q286_subtree_share" ->
      """WITH RECURSIVE anc AS (
        |  SELECT doc_id AS node, doc_id // 2 AS ancestor
        |  FROM documents WHERE doc_id >= 1
        |  UNION ALL
        |  SELECT node, ancestor // 2 FROM anc WHERE ancestor >= 1),
        |pairs AS (SELECT node, ancestor FROM anc
        |          UNION ALL
        |          SELECT doc_id, doc_id FROM documents WHERE doc_id >= 1),
        |roll AS (SELECT p.ancestor, CAST(sum(d.n_chars) AS BIGINT) AS chars
        |         FROM pairs p JOIN documents d ON d.doc_id = p.node
        |         GROUP BY 1)
        |SELECT c.ancestor AS node, c.ancestor // 2 AS parent,
        |  c.chars AS node_chars, pa.chars AS parent_chars,
        |  CASE WHEN pa.chars = 0 THEN NULL
        |       ELSE CAST((1000000*c.chars) // pa.chars AS BIGINT)
        |  END AS share_ppm
        |FROM roll c JOIN roll pa ON pa.ancestor = c.ancestor // 2
        |WHERE c.ancestor >= 1""".stripMargin,
    "q285_km_survival" ->
      """WITH RECURSIVE u AS (
        |  SELECT user_id,
        |    max(epoch_us(ts)//86400000000) - min(epoch_us(ts)//86400000000)
        |      AS tenure
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
        |       FROM km JOIN risk ON risk.rn = km.rn + 1)
        |SELECT risk.tenure, risk.d_t, risk.n_t,
        |  CAST((1000000*risk.d_t) // risk.n_t AS BIGINT) AS hazard_ppm,
        |  CAST(km.s AS BIGINT) AS surv_ppm
        |FROM risk JOIN km ON km.rn = risk.rn""".stripMargin,
    "q284_top_others" ->
      """WITH agg AS (SELECT source AS key,
        |         CAST(sum(n_chars) AS BIGINT) AS value
        |       FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |top AS (SELECT key, value,
        |          row_number() OVER (ORDER BY value DESC, key) AS rank
        |        FROM agg QUALIFY rank <= 5),
        |oth AS (SELECT 'OTHER' AS key, CAST(sum(value) AS BIGINT) AS value,
        |          CAST(count(*) AS BIGINT) AS n_keys
        |        FROM agg WHERE key NOT IN (SELECT key FROM top)
        |        HAVING count(*) > 0)
        |SELECT key, value, CAST(1 AS BIGINT) AS n_keys,
        |  CAST(rank AS BIGINT) AS rank
        |FROM top
        |UNION ALL
        |SELECT key, value, n_keys, CAST(6 AS BIGINT) FROM oth""".stripMargin,
    "q282_trajectory" ->
      """WITH e AS (SELECT user_id u, epoch_us(ts) AS ts, event_id AS id,
        |   (event_id*48271) % 10000 AS x,
        |   (event_id*16807) % 10000 AS y FROM events),
        |l AS (SELECT u,
        |        x - lag(x) OVER (PARTITION BY u ORDER BY ts, id) AS dx,
        |        y - lag(y) OVER (PARTITION BY u ORDER BY ts, id) AS dy
        |      FROM e)
        |SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(count(dx) AS BIGINT) AS n_moves,
        |  CAST(coalesce(sum(abs(dx)+abs(dy)), 0) AS BIGINT) AS l1_total
        |FROM l GROUP BY 1""".stripMargin,
    "q283_rolling_corr" ->
      """WITH d AS (SELECT epoch_us(ts)//86400000000 AS day,
        |  CAST(count(*) FILTER (WHERE event_type='view') AS HUGEINT) AS x,
        |  CAST(count(*) FILTER (WHERE event_type='purchase') AS HUGEINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT day, CAST(count(*) OVER w AS HUGEINT) AS n,
        |        sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |        sum(x*y) OVER w AS sxy, sum(x*x) OVER w AS sxx,
        |        sum(y*y) OVER w AS syy
        |      FROM d WINDOW w AS (ORDER BY day
        |        RANGE BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |r AS (SELECT day, n, (1000000*(n*sxy - sx*sy))//(n*n) AS cxy,
        |        (1000000*(n*sxx - sx*sx))//(n*n) AS vx,
        |        (1000000*(n*syy - sy*sy))//(n*n) AS vy FROM m)
        |SELECT 'view->purchase' AS series, CAST(day AS BIGINT) AS day,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN cxy > 0 THEN 1 WHEN cxy < 0 THEN -1 ELSE 0 END
        |       AS BIGINT) AS sign,
        |  CASE WHEN n < 2 OR vx = 0 OR vy = 0 THEN NULL
        |       ELSE CAST((1000000*cxy*cxy)//(vx*vy) AS BIGINT)
        |  END AS r2_ppm
        |FROM r""".stripMargin,
    "q281_dbscan" ->
      s"""WITH RECURSIVE pts AS ($geoPointsSql),
        |p AS (SELECT a.id AS ia, b.id AS ib,
        |        (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) AS d2
        |      FROM pts a JOIN pts b ON a.id < b.id
        |      WHERE (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= 2250000),
        |dir AS (SELECT ia AS id, ib AS nb, d2 FROM p
        |        UNION ALL SELECT ib, ia, d2 FROM p),
        |deg AS (SELECT id, count(*) AS deg FROM dir GROUP BY 1),
        |core AS (SELECT pts.id FROM pts LEFT JOIN deg USING (id)
        |         WHERE coalesce(deg, 0) + 1 >= 4),
        |ce AS (SELECT ia AS src, ib AS dst FROM p
        |         JOIN core ca ON ca.id = p.ia JOIN core cb ON cb.id = p.ib
        |       UNION
        |       SELECT ib, ia FROM p
        |         JOIN core ca ON ca.id = p.ia JOIN core cb ON cb.id = p.ib),
        |walk AS (
        |  SELECT src AS node, src AS lbl FROM ce
        |  UNION
        |  SELECT ce.dst, w.lbl FROM walk w JOIN ce ON ce.src = w.node),
        |comp AS (SELECT node, min(lbl) AS comp FROM walk GROUP BY 1),
        |corelab AS (SELECT c.id, coalesce(comp.comp, c.id) AS cluster
        |            FROM core c LEFT JOIN comp ON comp.node = c.id),
        |bor AS (SELECT d.id, cl.cluster,
        |          row_number() OVER (PARTITION BY d.id
        |            ORDER BY d.d2, d.nb) AS rn
        |        FROM dir d JOIN corelab cl ON cl.id = d.nb
        |        WHERE d.id NOT IN (SELECT id FROM core)),
        |lab AS (SELECT id, 'core' AS role, cluster FROM corelab
        |        UNION ALL
        |        SELECT id, 'border', cluster FROM bor WHERE rn = 1)
        |SELECT pts.id, coalesce(lab.role, 'noise') AS role, lab.cluster
        |FROM pts LEFT JOIN lab ON lab.id = pts.id""".stripMargin,
    "q280_nearest" ->
      s"""WITH pts AS ($geoPointsSql),
        |p AS (SELECT a.id AS ia, b.id AS ib,
        |        (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) AS d2
        |      FROM pts a JOIN pts b ON a.id <> b.id
        |      WHERE (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= 2250000),
        |r AS (SELECT ia, ib, d2,
        |        row_number() OVER (PARTITION BY ia ORDER BY d2, ib) AS rn
        |      FROM p)
        |SELECT ia AS id, ib AS nn_id, CAST(d2 AS BIGINT) AS dist2
        |FROM r WHERE rn = 1""".stripMargin,
    "q278_seasonal_envelope" ->
      s"""WITH daily AS ($dailyCountsSql),
        |d2 AS (SELECT event_type AS g, ((day + 4) % 7) AS dow, cnt
        |       FROM daily),
        |c AS (SELECT g, dow, cnt AS v, count(*) AS n1 FROM d2
        |      GROUP BY 1,2,3),
        |cum AS (SELECT g, dow, v,
        |          sum(n1) OVER (PARTITION BY g, dow ORDER BY v) AS cum
        |        FROM c),
        |t AS (SELECT g, dow, sum(n1) AS n FROM c GROUP BY 1,2)
        |SELECT cum.g AS event_type, CAST(cum.dow AS BIGINT) AS dow,
        |  min(v) FILTER (WHERE cum >= (100*t.n+999)//1000) AS p10,
        |  min(v) FILTER (WHERE cum >= (500*t.n+999)//1000) AS p50,
        |  min(v) FILTER (WHERE cum >= (900*t.n+999)//1000) AS p90
        |FROM cum JOIN t ON t.g = cum.g AND t.dow = cum.dow
        |GROUP BY 1, 2""".stripMargin,
    "q279_top_movers" ->
      """WITH wk AS (SELECT event_type AS g, epoch_us(ts)//604800000000 AS w,
        |        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |lagd AS (SELECT g, w, cnt,
        |           lag(cnt) OVER (PARTITION BY g ORDER BY w) AS prev
        |         FROM wk),
        |d AS (SELECT g, w, cnt, prev,
        |        (1000000*(cnt - prev))//prev AS delta_ppm
        |      FROM lagd WHERE prev IS NOT NULL AND prev > 0)
        |SELECT g AS event_type, CAST(w AS BIGINT) AS week, cnt, prev,
        |  CAST(delta_ppm AS BIGINT) AS delta_ppm
        |FROM d ORDER BY abs(delta_ppm) DESC, g, w LIMIT 10""".stripMargin,
    "q277_subtree_rollup" ->
      """WITH RECURSIVE anc AS (
        |  SELECT doc_id AS node, doc_id // 2 AS ancestor
        |  FROM documents WHERE doc_id >= 1
        |  UNION ALL
        |  SELECT node, ancestor // 2 FROM anc WHERE ancestor >= 1),
        |pairs AS (SELECT node, ancestor FROM anc
        |          UNION ALL
        |          SELECT doc_id, doc_id FROM documents WHERE doc_id >= 1),
        |j AS (SELECT p.ancestor, d.n_chars FROM pairs p
        |      JOIN documents d ON d.doc_id = p.node)
        |SELECT CAST(ancestor AS BIGINT) AS ancestor,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(n_chars) AS BIGINT) AS subtree_chars
        |FROM j GROUP BY 1""".stripMargin,
    "q276_fd_check" -> {
      def pairSql(det: String, dep: String) =
        s"""SELECT '$det' AS det, '$dep' AS dep,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  CAST(coalesce(sum(CASE WHEN nv > 1 THEN 1 ELSE 0 END), 0)
           |       AS BIGINT) AS n_violating,
           |  CAST(coalesce(max(nv), 0) AS BIGINT) AS max_deps,
           |  CAST(CASE WHEN coalesce(sum(CASE WHEN nv > 1 THEN 1 ELSE 0
           |       END), 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
           |FROM (SELECT k, count(*) AS nv
           |      FROM (SELECT DISTINCT CAST($det AS VARCHAR) AS k,
           |              CAST($dep AS VARCHAR) AS v
           |            FROM orders WHERE $det IS NOT NULL)
           |      GROUP BY 1)""".stripMargin
      Seq(pairSql("o_orderkey", "o_orderdate"),
        pairSql("o_custkey", "o_orderpriority"),
        pairSql("o_orderdate", "o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "")
    },
    "q273_top_paths" ->
      """WITH e AS (SELECT user_id u, epoch_us(ts)//86400000000 AS day,
        |             event_type t,
        |             row_number() OVER (PARTITION BY user_id,
        |               epoch_us(ts)//86400000000
        |               ORDER BY epoch_us(ts), event_id) AS rn
        |           FROM events),
        |p AS (SELECT u, day, string_agg(t, '>' ORDER BY rn) AS path
        |      FROM e WHERE rn <= 3 GROUP BY 1,2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n FROM p
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q274_class_report" ->
      """WITH t AS (SELECT lang AS l,
        |             CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END AS p
        |           FROM documents WHERE lang IS NOT NULL),
        |c AS (SELECT l, p, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1,2),
        |bt AS (SELECT l AS clazz, sum(n) AS n_true,
        |         sum(CASE WHEN l = p THEN n ELSE 0 END) AS tp
        |       FROM c GROUP BY 1),
        |bp AS (SELECT p AS clazz, sum(n) AS n_pred FROM c GROUP BY 1)
        |SELECT coalesce(bt.clazz, bp.clazz) AS clazz,
        |  CAST(coalesce(n_true,0) AS BIGINT) AS n_true,
        |  CAST(coalesce(n_pred,0) AS BIGINT) AS n_pred,
        |  CAST(coalesce(tp,0) AS BIGINT) AS tp,
        |  CASE WHEN coalesce(n_pred,0)=0 THEN NULL
        |       ELSE CAST((1000000*coalesce(tp,0))//n_pred AS BIGINT)
        |  END AS precision_ppm,
        |  CASE WHEN coalesce(n_true,0)=0 THEN NULL
        |       ELSE CAST((1000000*coalesce(tp,0))//n_true AS BIGINT)
        |  END AS recall_ppm,
        |  CASE WHEN coalesce(n_true,0)+coalesce(n_pred,0)=0 THEN NULL
        |       ELSE CAST((2000000*coalesce(tp,0))
        |            //(coalesce(n_true,0)+coalesce(n_pred,0)) AS BIGINT)
        |  END AS f1_ppm
        |FROM bt FULL OUTER JOIN bp ON bp.clazz = bt.clazz""".stripMargin,
    "q275_gains" ->
      """WITH e AS (SELECT CAST(floor(value*100) AS BIGINT) AS s,
        |    CASE WHEN (CAST(floor(value*100) AS BIGINT) >= 3500)
        |              <> (event_id % 7 = 0) THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT s, CAST(count(*) AS BIGINT) AS w,
        |        CAST(sum(y) AS BIGINT) AS p FROM e GROUP BY 1),
        |c AS (SELECT s, w, p, sum(w) OVER (ORDER BY s DESC) AS cum FROM h),
        |t AS (SELECT sum(w) AS n, sum(p) AS pos FROM h),
        |b AS (SELECT (10*c.cum + t.n - 1)//t.n AS bin, sum(w) AS n,
        |        sum(p) AS n_pos, any_value(t.n) AS tn,
        |        any_value(t.pos) AS tpos
        |      FROM c CROSS JOIN t GROUP BY 1),
        |cb AS (SELECT a.bin, any_value(a.n) AS n, any_value(a.n_pos) AS n_pos,
        |         sum(b2.n) AS cum_n, sum(b2.n_pos) AS cum_pos,
        |         any_value(a.tn) AS tn, any_value(a.tpos) AS tpos
        |       FROM b a JOIN b b2 ON b2.bin <= a.bin GROUP BY 1)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
        |  CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(cum_n AS BIGINT) AS cum_n, CAST(cum_pos AS BIGINT) AS cum_pos,
        |  CASE WHEN tpos=0 THEN NULL
        |       ELSE CAST((1000000*cum_pos)//tpos AS BIGINT)
        |  END AS capture_ppm,
        |  CASE WHEN tpos=0 OR cum_n=0 THEN NULL
        |       ELSE CAST((1000000*CAST(cum_pos AS HUGEINT)*tn)
        |            //(CAST(tpos AS HUGEINT)*cum_n) AS BIGINT)
        |  END AS lift_ppm
        |FROM cb""".stripMargin,
    "q272_best_split" ->
      """WITH e AS (SELECT event_type AS g,
        |    CAST(floor(value*100) AS BIGINT)//100 AS v,
        |    CASE WHEN (CAST(floor(value*100) AS BIGINT) >= 3500)
        |              <> (event_id % 7 = 0) THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT g, v, CAST(count(*) AS HUGEINT) AS w,
        |        CAST(sum(y) AS HUGEINT) AS p FROM e GROUP BY 1,2),
        |c AS (SELECT g, v, w, p,
        |        sum(w) OVER (PARTITION BY g ORDER BY v) AS cw,
        |        sum(p) OVER (PARTITION BY g ORDER BY v) AS cp FROM h),
        |t AS (SELECT g, sum(w) AS n, sum(p) AS pos FROM h GROUP BY 1),
        |sc AS (SELECT c.g, c.v, c.cw, t.n,
        |    1000000 - (1000000*(t.pos*t.pos + (t.n-t.pos)*(t.n-t.pos)))
        |      //(t.n*t.n) AS parent,
        |    (1000000*(c.cp*c.cp + (c.cw-c.cp)*(c.cw-c.cp)))//c.cw AS lterm,
        |    (1000000*((t.pos-c.cp)*(t.pos-c.cp) +
        |       ((t.n-c.cw)-(t.pos-c.cp))*((t.n-c.cw)-(t.pos-c.cp))))
        |      //(t.n-c.cw) AS rterm
        |  FROM c JOIN t ON t.g = c.g WHERE c.cw < t.n),
        |g2 AS (SELECT g, v, cw, n, parent,
        |         parent - (1000000 - (lterm+rterm)//n) AS gain FROM sc),
        |best AS (SELECT *, row_number() OVER (PARTITION BY g
        |           ORDER BY gain DESC, v ASC) AS rn FROM g2)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(parent AS BIGINT) AS parent_ppm, v AS threshold,
        |  CAST(gain AS BIGINT) AS gain_ppm, CAST(cw AS BIGINT) AS left_n,
        |  CAST(n - cw AS BIGINT) AS right_n
        |FROM best WHERE rn = 1""".stripMargin,
    "q270_corr_matrix" ->
      s"""WITH daily AS ($dailyCountsSql),
        |l AS (SELECT day AS k, event_type AS a, CAST(cnt AS HUGEINT) AS x
        |      FROM daily),
        |j AS (SELECT la.a AS col_a, rb.a AS col_b, la.x AS x, rb.x AS y
        |      FROM l la JOIN l rb ON rb.k = la.k AND la.a < rb.a),
        |m AS (SELECT col_a, col_b, CAST(count(*) AS HUGEINT) AS n,
        |        sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
        |        sum(x*x) AS sxx, sum(y*y) AS syy
        |      FROM j GROUP BY 1, 2),
        |r AS (SELECT col_a, col_b, n,
        |        (1000000*(n*sxy - sx*sy)) // (n*n) AS cxy,
        |        (1000000*(n*sxx - sx*sx)) // (n*n) AS vx,
        |        (1000000*(n*syy - sy*sy)) // (n*n) AS vy FROM m)
        |SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN cxy > 0 THEN 1 WHEN cxy < 0 THEN -1 ELSE 0 END
        |       AS BIGINT) AS sign,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |       ELSE CAST((1000000*cxy*cxy) // (vx*vy) AS BIGINT)
        |  END AS r2_ppm
        |FROM r""".stripMargin,
    "q271_concurrency" ->
      """WITH iv AS (SELECT user_id AS u, epoch_us(ts)//86400000000 AS day,
        |        min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
        |      FROM events GROUP BY 1, 2),
        |d AS (SELECT day, s AS t, 1 AS dlt FROM iv
        |      UNION ALL SELECT day, e, -1 FROM iv),
        |c AS (SELECT day, t, dlt,
        |        sum(dlt) OVER (PARTITION BY day ORDER BY t, dlt DESC
        |          ROWS UNBOUNDED PRECEDING) AS c
        |      FROM d),
        |p AS (SELECT day, max(c) AS peak, count(*)//2 AS n_intervals
        |      FROM c GROUP BY 1)
        |SELECT c.day, CAST(p.n_intervals AS BIGINT) AS n_intervals,
        |  CAST(p.peak AS BIGINT) AS peak, min(c.t) AS peak_ts
        |FROM c JOIN p ON p.day = c.day AND c.c = p.peak
        |GROUP BY 1, 2, 3""".stripMargin,
    "q338_isotonic_bucketed" ->
      """WITH e AS (SELECT CAST(floor(value*100) AS BIGINT) AS s,
        |             CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y
        |           FROM events WHERE value IS NOT NULL),
        |bd AS (SELECT min(s) AS lo, max(s) AS hi FROM e),
        |b AS (SELECT ((e.s - bd.lo) * 50) // (bd.hi - bd.lo + 1) AS cell,
        |             e.s, e.y FROM e, bd),
        |h AS (SELECT cell, min(s) AS s, CAST(count(*) AS BIGINT) AS w,
        |        CAST(sum(y) AS BIGINT) AS sy FROM b GROUP BY 1),
        |c AS (SELECT s, w, sy, row_number() OVER (ORDER BY cell) AS k,
        |        sum(w) OVER (ORDER BY cell) AS cw,
        |        sum(sy) OVER (ORDER BY cell) AS cs FROM h),
        |t AS (SELECT a.k AS ka, b.k AS kb,
        |        CAST(b.cs - (a.cs - a.sy) AS DOUBLE) /
        |        CAST(b.cw - (a.cw - a.w) AS DOUBLE) AS avgv
        |      FROM c a JOIN c b ON a.k <= b.k),
        |inner_ AS (SELECT g.k AS k, t.ka AS ka, min(t.avgv) AS m
        |           FROM c g JOIN t ON t.ka <= g.k AND t.kb >= g.k
        |           GROUP BY 1, 2),
        |fit AS (SELECT k, max(m) AS rate FROM inner_ GROUP BY 1)
        |SELECT c.s AS score, c.w AS n, fit.rate AS rate
        |FROM c JOIN fit ON fit.k = c.k""".stripMargin,
    "q268_isotonic" ->
      """WITH e AS (SELECT CAST(floor(value*100) AS BIGINT)//100 AS s,
        |             CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y
        |           FROM events WHERE value IS NOT NULL),
        |h AS (SELECT s, CAST(count(*) AS BIGINT) AS w,
        |        CAST(sum(y) AS BIGINT) AS sy FROM e GROUP BY 1),
        |c AS (SELECT s, w, sy, row_number() OVER (ORDER BY s) AS k,
        |        sum(w) OVER (ORDER BY s) AS cw,
        |        sum(sy) OVER (ORDER BY s) AS cs FROM h),
        |t AS (SELECT a.k AS ka, b.k AS kb,
        |        CAST(b.cs - (a.cs - a.sy) AS DOUBLE) /
        |        CAST(b.cw - (a.cw - a.w) AS DOUBLE) AS avgv
        |      FROM c a JOIN c b ON a.k <= b.k),
        |inner_ AS (SELECT g.k AS k, t.ka AS ka, min(t.avgv) AS m
        |           FROM c g JOIN t ON t.ka <= g.k AND t.kb >= g.k
        |           GROUP BY 1, 2),
        |fit AS (SELECT k, max(m) AS rate FROM inner_ GROUP BY 1)
        |SELECT c.s AS score, c.w AS n, fit.rate AS rate
        |FROM c JOIN fit ON fit.k = c.k""".stripMargin,
    "q269_trimmed_mean" ->
      """WITH e AS (SELECT event_type g, CAST(floor(value*100) AS BIGINT) v
        |           FROM events WHERE value IS NOT NULL),
        |c AS (SELECT g, v, count(*) cnt FROM e GROUP BY 1,2),
        |cum AS (SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v) cum
        |        FROM c),
        |t AS (SELECT g, sum(cnt) n FROM c GROUP BY 1),
        |f AS (SELECT cum.g,
        |        min(v) FILTER (WHERE cum >= (50*t.n+999)//1000) lo,
        |        min(v) FILTER (WHERE cum >= (950*t.n+999)//1000) hi
        |      FROM cum JOIN t ON t.g=cum.g GROUP BY 1)
        |SELECT e.g AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE e.v BETWEEN f.lo AND f.hi) AS BIGINT)
        |    AS n_kept,
        |  CAST((1000*sum(CASE WHEN e.v BETWEEN f.lo AND f.hi
        |                      THEN CAST(e.v AS HUGEINT) ELSE 0 END))
        |       // count(*) FILTER (WHERE e.v BETWEEN f.lo AND f.hi)
        |       AS BIGINT) AS mean_milli
        |FROM e JOIN f ON f.g = e.g GROUP BY 1""".stripMargin,
    "q267_split_gain" ->
      """WITH d AS (SELECT lang, source AS src,
        |             CAST(n_chars//500 AS VARCHAR) AS band,
        |             CAST(doc_id % 5 AS VARCHAR) AS resid
        |           FROM documents WHERE lang IS NOT NULL),
        |m AS (SELECT lang, 'source' AS f, src AS v FROM d
        |      UNION ALL SELECT lang, 'band', band FROM d
        |      UNION ALL SELECT lang, 'resid', resid FROM d),
        |cells AS (SELECT f, v, lang, CAST(count(*) AS HUGEINT) AS c
        |          FROM m GROUP BY 1,2,3),
        |ch AS (SELECT f, v, sum(c) AS nv, sum(c*c) AS ss
        |       FROM cells GROUP BY 1,2),
        |agg AS (SELECT f, CAST(count(*) AS BIGINT) AS n_values,
        |          sum((1000000*ss)//nv) AS childsum, sum(nv) AS n
        |        FROM ch GROUP BY 1),
        |par AS (SELECT 1000000 - (1000000*sum(c*c))//(sum(c)*sum(c)) AS p
        |        FROM (SELECT CAST(count(*) AS HUGEINT) AS c
        |              FROM d GROUP BY lang))
        |SELECT f AS feature, CAST(n AS BIGINT) AS n, n_values,
        |  CAST(p AS BIGINT) AS parent_ppm,
        |  CAST(1000000 - childsum//n AS BIGINT) AS weighted_ppm,
        |  CAST(p - (1000000 - childsum//n) AS BIGINT) AS gain_ppm
        |FROM agg CROSS JOIN par""".stripMargin,
    "q265_ccf" ->
      """WITH d AS (SELECT epoch_us(ts)//86400000000 AS day,
        |  CAST(count(*) FILTER (WHERE event_type='view') AS HUGEINT) AS x,
        |  CAST(count(*) FILTER (WHERE event_type='purchase') AS HUGEINT) AS y
        |  FROM events GROUP BY 1),
        |p AS (SELECT l.lag, a.x, b.y
        |      FROM (SELECT unnest([0,1,2,3,4,5,6]) AS lag) l
        |      CROSS JOIN d a JOIN d b ON b.day = a.day + l.lag),
        |m AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
        |             sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx,
        |             sum(y*y) AS syy
        |      FROM p GROUP BY 1),
        |r AS (SELECT lag, n, (1000000*(n*sxy - sx*sy)) // (n*n) AS cxy,
        |             (1000000*(n*sxx - sx*sx)) // (n*n) AS vx,
        |             (1000000*(n*syy - sy*sy)) // (n*n) AS vy FROM m)
        |SELECT 'view->purchase' AS series, CAST(lag AS BIGINT) AS lag,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN cxy > 0 THEN 1 WHEN cxy < 0 THEN -1 ELSE 0 END
        |       AS BIGINT) AS sign,
        |  CASE WHEN n < 2 OR vx = 0 OR vy = 0 THEN NULL
        |       ELSE CAST((1000000*cxy*cxy) // (vx*vy) AS BIGINT)
        |  END AS r2_ppm
        |FROM r""".stripMargin,
    "q245_bootstrap_ci" -> {
      val u = md5Hash60Sql("CAST(b.id AS VARCHAR)||':'||CAST(r.r AS VARCHAR)")
      s"""WITH base AS (SELECT event_type g, event_id id,
        |        CAST(floor(value*100) AS BIGINT) v
        |      FROM events WHERE value IS NOT NULL),
        |pt AS (SELECT g, CAST(count(*) AS BIGINT) n,
        |        CAST((1000*sum(CAST(v AS HUGEINT))) // count(*) AS BIGINT)
        |          AS mean_milli
        |       FROM base GROUP BY 1),
        |reps AS (SELECT r FROM generate_series(0, 39) t(r)),
        |w AS (SELECT b.g, r.r, ${poissonCaseSql(u)} AS wt, b.v
        |      FROM base b CROSS JOIN reps r),
        |rm AS (SELECT g, r, CAST(sum(wt) AS BIGINT) cnt,
        |         sum(CAST(wt AS HUGEINT)*v) sv FROM w GROUP BY 1, 2),
        |means AS (SELECT g, CAST((1000*sv) // cnt AS BIGINT) m
        |          FROM rm WHERE cnt > 0),
        |h AS (SELECT g, m, CAST(count(*) AS BIGINT) c FROM means GROUP BY 1, 2),
        |cum AS (SELECT g, m, c, sum(c) OVER (PARTITION BY g ORDER BY m) cum
        |        FROM h),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) nr FROM h GROUP BY 1),
        |lo AS (SELECT cum.g, min(cum.m) q FROM cum JOIN tot ON tot.g = cum.g
        |       WHERE cum.cum >= (25*tot.nr + 999)//1000 GROUP BY 1),
        |hi AS (SELECT cum.g, min(cum.m) q FROM cum JOIN tot ON tot.g = cum.g
        |       WHERE cum.cum >= (975*tot.nr + 999)//1000 GROUP BY 1)
        |SELECT pt.g AS event_type, pt.n, pt.mean_milli, tot.nr AS n_reps,
        |       lo.q AS lo_milli, hi.q AS hi_milli
        |FROM pt JOIN tot ON tot.g = pt.g JOIN lo ON lo.g = pt.g
        |JOIN hi ON hi.g = pt.g""".stripMargin
    },
    "q246_perm_test" -> {
      val u = md5Hash60Sql("CAST(u.id AS VARCHAR)||':'||CAST(r.r AS VARCHAR)")
      s"""WITH units AS (SELECT user_id id, CAST(user_id % 2 AS BIGINT) var,
        |        CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) v
        |      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |obs AS (SELECT CAST(count(*) AS BIGINT) n,
        |         abs((1000*sum(CASE WHEN var <> 0 THEN CAST(v AS HUGEINT) ELSE 0 END))
        |               // nullif(sum(CASE WHEN var <> 0 THEN 1 ELSE 0 END), 0)
        |           - (1000*sum(CASE WHEN var = 0 THEN CAST(v AS HUGEINT) ELSE 0 END))
        |               // nullif(sum(CASE WHEN var = 0 THEN 1 ELSE 0 END), 0)) d
        |        FROM units),
        |reps AS (SELECT r FROM generate_series(1, 39) t(r)),
        |pv AS (SELECT r.r, $u % 2 pvar, u.v
        |       FROM units u CROSS JOIN reps r),
        |pd AS (SELECT r,
        |         abs((1000*sum(CASE WHEN pvar = 1 THEN CAST(v AS HUGEINT) ELSE 0 END))
        |               // nullif(sum(CASE WHEN pvar = 1 THEN 1 ELSE 0 END), 0)
        |           - (1000*sum(CASE WHEN pvar = 0 THEN CAST(v AS HUGEINT) ELSE 0 END))
        |               // nullif(sum(CASE WHEN pvar = 0 THEN 1 ELSE 0 END), 0)) d
        |       FROM pv GROUP BY 1),
        |cmp AS (SELECT count(*) np,
        |         sum(CASE WHEN pd.d >= obs.d THEN 1 ELSE 0 END) ge
        |        FROM pd, obs)
        |SELECT obs.n AS n_units, CAST(obs.d AS BIGINT) AS diff_milli,
        |  CAST(cmp.np AS BIGINT) AS n_perms,
        |  CAST((1000*(1 + cmp.ge)) // (cmp.np + 1) AS BIGINT) AS p_value_pm
        |FROM obs, cmp""".stripMargin
    },
    "q249_spearman" ->
      """WITH base AS (SELECT l_returnflag g, CAST(l_quantity AS BIGINT) x,
        |        CAST(floor(l_extendedprice) AS BIGINT) y FROM lineitem),
        |hx AS (SELECT g, x, count(*) c FROM base GROUP BY 1, 2),
        |rx AS (SELECT g, x,
        |        2*(sum(c) OVER (PARTITION BY g ORDER BY x) - c) + c + 1 AS mr
        |       FROM hx),
        |hy AS (SELECT g, y, count(*) c FROM base GROUP BY 1, 2),
        |ry AS (SELECT g, y,
        |        2*(sum(c) OVER (PARTITION BY g ORDER BY y) - c) + c + 1 AS mr
        |       FROM hy),
        |j AS (SELECT b.g, CAST(rx.mr AS HUGEINT) x, CAST(ry.mr AS HUGEINT) y
        |      FROM base b JOIN rx ON rx.g = b.g AND rx.x = b.x
        |      JOIN ry ON ry.g = b.g AND ry.y = b.y),
        |m AS (SELECT g, CAST(count(*) AS HUGEINT) n, sum(x) sx, sum(y) sy,
        |             sum(x*y) sxy, sum(x*x) sxx, sum(y*y) syy
        |      FROM j GROUP BY 1),
        |r AS (SELECT g, n, (1000000*(n*sxy - sx*sy)) // (n*n) cxy,
        |             (1000000*(n*sxx - sx*sx)) // (n*n) vx,
        |             (1000000*(n*syy - sy*sy)) // (n*n) vy FROM m)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN cxy > 0 THEN 1 WHEN cxy < 0 THEN -1 ELSE 0 END
        |       AS BIGINT) AS sign,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |       ELSE CAST((1000000*cxy*cxy) // (vx*vy) AS BIGINT) END AS r2_ppm
        |FROM r""".stripMargin,
    "q250_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id u,
        |        epoch_us(ts)//86400000000 AS day FROM events),
        |isl AS (SELECT u, day,
        |        day - row_number() OVER (PARTITION BY u ORDER BY day) AS k
        |        FROM d),
        |st AS (SELECT u, k, CAST(count(*) AS BIGINT) len, min(day) s
        |       FROM isl GROUP BY 1, 2)
        |SELECT u AS user_id, CAST(sum(len) AS BIGINT) AS active_periods,
        |  CAST(count(*) AS BIGINT) AS n_streaks,
        |  max(len) AS longest_len,
        |  first(s ORDER BY len DESC, s ASC) AS longest_start
        |FROM st GROUP BY 1""".stripMargin,
    "q251_dwell" ->
      """WITH e AS (SELECT user_id u, event_type t, epoch_us(ts) ts,
        |        event_id id FROM events),
        |nx AS (SELECT u, t,
        |        lead(ts) OVER (PARTITION BY u ORDER BY ts, id) - ts AS dw
        |       FROM e)
        |SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_dwells,
        |  CAST(sum(dw) AS BIGINT) AS total_us,
        |  CAST(sum(dw) // count(*) AS BIGINT) AS mean_us
        |FROM nx WHERE dw IS NOT NULL GROUP BY 1""".stripMargin,
    "q259_holt" -> {
      val w = graft.ops.Resample.holtCoefficientsPpm(
        alphaPm = 500, betaPm = 300, horizon = 6)
      val lags = (0 to 6).map(k =>
        if (k == 0) "cnt AS y0"
        else s"lag(cnt, $k) OVER w AS y$k").mkString(",\n|    ")
      val anyNull = (0 to 6).map(k => s"y$k IS NULL").mkString(" OR ")
      val num = (0 to 6).map(k =>
        s"${w(k)}*CAST(y$k AS HUGEINT)").mkString(" + ")
      s"""WITH daily AS ($dailyCountsSql),
        |lagged AS (SELECT event_type, day, cnt,
        |    $lags
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, day, cnt,
        |  CASE WHEN $anyNull THEN NULL
        |       ELSE CAST(($num) // 1000 AS BIGINT) END AS forecast_milli
        |FROM lagged""".stripMargin
    },
    "q260_abc" ->
      """WITH per AS (SELECT l_partkey,
        |        CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT))
        |             AS BIGINT) revenue
        |      FROM lineitem GROUP BY 1),
        |e AS (SELECT l_partkey, revenue FROM per WHERE revenue >= 0),
        |cum AS (SELECT l_partkey, revenue,
        |        sum(revenue) OVER (ORDER BY revenue DESC, l_partkey) cum
        |        FROM e),
        |tot AS (SELECT CAST(sum(revenue) AS HUGEINT) t FROM e)
        |SELECT cum.l_partkey, cum.revenue AS mass,
        |  CAST(cum.cum AS BIGINT) AS cum_mass,
        |  CASE WHEN 1000*CAST(cum.cum - cum.revenue AS HUGEINT) < 800*tot.t
        |       THEN 'A'
        |       WHEN 1000*CAST(cum.cum - cum.revenue AS HUGEINT) < 950*tot.t
        |       THEN 'B' ELSE 'C' END AS abc_class
        |FROM cum, tot""".stripMargin,
    "q257_lorenz" ->
      """WITH per AS (SELECT o_orderpriority g, o_custkey,
        |        CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT) x
        |      FROM orders GROUP BY 1, 2),
        |h AS (SELECT g, x v, CAST(count(*) AS BIGINT) c FROM per
        |      WHERE x >= 0 GROUP BY 1, 2),
        |cum AS (SELECT g, v, c, sum(c) OVER w cumc,
        |        sum(CAST(v AS HUGEINT)*c) OVER w cumm
        |        FROM h WINDOW w AS (PARTITION BY g ORDER BY v)),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) n,
        |        CAST(sum(CAST(v AS HUGEINT)*c) AS HUGEINT) m FROM h GROUP BY 1),
        |probe AS (SELECT d FROM generate_series(1, 10) t(d)),
        |pick AS (SELECT cum.g, probe.d, tot.n, tot.m,
        |    (probe.d*tot.n + 9)//10 AS r, cum.v, cum.cumc, cum.cumm, cum.c
        |  FROM cum JOIN tot ON tot.g = cum.g CROSS JOIN probe
        |  WHERE cum.cumc - cum.c < (probe.d*tot.n + 9)//10
        |    AND (probe.d*tot.n + 9)//10 <= cum.cumc)
        |SELECT g AS priority, CAST(d AS BIGINT) AS decile, n AS units,
        |  CASE WHEN m = 0 THEN NULL ELSE
        |    CAST((1000000*(CAST(cumm - CAST(v AS HUGEINT)*c AS HUGEINT)
        |      + (r - (cumc - c))*v)) // m AS BIGINT) END AS share_ppm
        |FROM pick""".stripMargin,
    "q258_dispersion" ->
      s"""WITH daily AS ($dailyCountsSql),
        |m AS (SELECT event_type g, CAST(count(*) AS HUGEINT) n,
        |        CAST(sum(cnt) AS HUGEINT) s,
        |        CAST(sum(CAST(cnt AS HUGEINT)*cnt) AS HUGEINT) ss
        |      FROM daily GROUP BY 1)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST((1000*s) // n AS BIGINT) AS mean_milli,
        |  CASE WHEN s = 0 THEN NULL
        |       ELSE CAST((1000*(n*ss - s*s)) // (n*s) AS BIGINT)
        |  END AS dispersion_milli
        |FROM m""".stripMargin,
    "q253_pps_sample" -> {
      val u = md5Hash60Sql("'sps:'||CAST(doc_id AS VARCHAR)")
      s"""WITH e AS (SELECT doc_id, lang, n_chars,
        |        $u // CAST(n_chars AS BIGINT) AS pr
        |      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |r AS (SELECT doc_id, lang, n_chars,
        |        row_number() OVER (PARTITION BY lang ORDER BY pr, doc_id) rn
        |      FROM e)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn <= 50""".stripMargin
    },
    "q254_seasonal" ->
      s"""WITH daily AS ($dailyCountsSql),
        |slots AS (SELECT event_type g, day % 7 AS s,
        |        CAST(count(*) AS BIGINT) n_periods,
        |        CAST(sum(cnt) AS BIGINT) sum_value
        |      FROM daily GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(n_periods) AS HUGEINT) nt,
        |               CAST(sum(sum_value) AS HUGEINT) st
        |        FROM slots GROUP BY 1)
        |SELECT slots.g AS event_type, slots.s AS season_slot,
        |  slots.n_periods, slots.sum_value,
        |  CASE WHEN tot.st = 0 THEN NULL
        |       ELSE CAST((1000000*CAST(slots.sum_value AS HUGEINT)*tot.nt)
        |                 // (CAST(slots.n_periods AS HUGEINT)*tot.st)
        |            AS BIGINT) END AS index_ppm
        |FROM slots JOIN tot ON tot.g = slots.g""".stripMargin,
    "q255_decay_attrib" ->
      """WITH e AS (SELECT user_id u, epoch_us(ts) ts, event_id id,
        |        event_type k FROM events),
        |t AS (SELECT * FROM e WHERE k IN ('view', 'click')),
        |c AS (SELECT u, ts cts, id cid FROM e WHERE k = 'purchase'),
        |a0 AS (SELECT t.u, t.ts, t.id, t.k, c.cts, c.cid,
        |        row_number() OVER (PARTITION BY t.u, t.ts, t.id
        |                           ORDER BY c.cts, c.cid) rn
        |       FROM t JOIN c ON c.u = t.u
        |        AND c.cts > t.ts AND c.cts <= t.ts + 604800000000),
        |wtd AS (SELECT u, k, cts, cid,
        |    greatest(1000000 // (1::BIGINT << CAST(least(
        |      (cts - ts) // 86400000000, 62) AS INT)), 1) w
        |  FROM a0 WHERE rn = 1),
        |nrm AS (SELECT k, w,
        |    sum(w) OVER (PARTITION BY u, cts, cid) wsum FROM wtd)
        |SELECT k AS touch_type, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum((1000000*CAST(w AS HUGEINT)) // wsum) AS BIGINT)
        |    AS decay_micro
        |FROM nrm GROUP BY 1""".stripMargin,
    "q252_cramers_v" ->
      """WITH t AS (SELECT o_orderpriority a, o_orderstatus b FROM orders),
        |cells AS (SELECT a, b, CAST(count(*) AS HUGEINT) o FROM t GROUP BY 1, 2),
        |ra AS (SELECT a, sum(o) r FROM cells GROUP BY 1),
        |cb AS (SELECT b, sum(o) c FROM cells GROUP BY 1),
        |nn AS (SELECT sum(o) n FROM cells),
        |grid AS (SELECT ra.a, cb.b, ra.r, cb.c, nn.n, coalesce(cells.o, 0) o
        |         FROM ra CROSS JOIN cb CROSS JOIN nn
        |         LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b),
        |chi AS (SELECT max(n) n, count(DISTINCT a) ka, count(DISTINCT b) kb,
        |          sum((1000*(o*n - r*c)*(o*n - r*c)) // (n*r*c)) chi2_milli
        |        FROM grid)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST((ka-1)*(kb-1) AS BIGINT) AS dof,
        |  CAST(chi2_milli AS BIGINT) AS chi2_milli,
        |  CASE WHEN least(ka, kb) <= 1 THEN NULL
        |       ELSE CAST((1000*chi2_milli) // (n*(least(ka, kb)-1)) AS BIGINT)
        |  END AS v2_ppm
        |FROM chi""".stripMargin,
    "q247_anova" ->
      """WITH base AS (SELECT event_type g, CAST(floor(value*100) AS HUGEINT) v
        |      FROM events WHERE value IS NOT NULL),
        |pg AS (SELECT g, CAST(count(*) AS HUGEINT) n, sum(v) s, sum(v*v) ss
        |       FROM base GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS HUGEINT) k, sum(n) nn, sum(s) st,
        |               sum(ss) sst, sum((1000*s*s) // n) a
        |        FROM pg)
        |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
        |  CAST(a - (1000*st*st) // nn AS BIGINT) AS ssb_milli,
        |  CAST(1000*sst - a AS BIGINT) AS ssw_milli,
        |  CASE WHEN k <= 1 OR nn <= k OR 1000*sst - a = 0 THEN NULL
        |       ELSE CAST((1000000*(a - (1000*st*st) // nn)*(nn - k))
        |                 // ((1000*sst - a)*(k - 1)) AS BIGINT) END AS f_micro
        |FROM agg""".stripMargin,
    "q248_kcore" -> kcoreOracleSql(k = 3, rounds = 12),
    "q241_pearson" ->
      """WITH hourly AS (SELECT event_type, epoch_us(ts)//3600000000 AS hour,
        |        CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |tot AS (SELECT epoch_us(ts)//3600000000 AS hour,
        |        CAST(count(*) AS BIGINT) AS total FROM events GROUP BY 1),
        |j AS (SELECT h.event_type AS g, CAST(h.cnt AS HUGEINT) AS x,
        |             CAST(t.total AS HUGEINT) AS y
        |      FROM hourly h JOIN tot t ON t.hour = h.hour),
        |m AS (SELECT g, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
        |             sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx,
        |             sum(y*y) AS syy
        |      FROM j GROUP BY 1),
        |r AS (SELECT g, n, (1000000*(n*sxy - sx*sy)) // (n*n) AS cxy,
        |             (1000000*(n*sxx - sx*sx)) // (n*n) AS vx,
        |             (1000000*(n*syy - sy*sy)) // (n*n) AS vy FROM m)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN cxy > 0 THEN 1 WHEN cxy < 0 THEN -1 ELSE 0 END
        |       AS BIGINT) AS sign,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |       ELSE CAST((1000000*cxy*cxy) // (vx*vy) AS BIGINT) END AS r2_ppm
        |FROM r""".stripMargin,
    "q242_mann_kendall" ->
      s"""WITH daily AS ($dailyCountsSql),
        |p AS (SELECT a.event_type AS g,
        |        CASE WHEN b.cnt > a.cnt THEN 1
        |             WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND a.day < b.day)
        |SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(sgn) AS BIGINT) AS s,
        |  CAST((1000000*CAST(sum(sgn) AS HUGEINT)) // count(*) AS BIGINT)
        |    AS tau_a_ppm
        |FROM p GROUP BY 1""".stripMargin,
    "q243_theil_sen" ->
      s"""WITH daily AS ($dailyCountsSql),
        |sl AS (SELECT a.event_type AS g,
        |         (1000000*(b.cnt - a.cnt)) // (b.day - a.day) AS v
        |       FROM daily a JOIN daily b
        |         ON a.event_type = b.event_type AND a.day < b.day),
        |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM sl GROUP BY 1, 2),
        |cum AS (SELECT g, v, c,
        |        sum(c) OVER (PARTITION BY g ORDER BY v) AS cum FROM h),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1)
        |SELECT cum.g AS event_type, tot.n AS n_pairs, min(cum.v) AS slope_ppm
        |FROM cum JOIN tot ON tot.g = cum.g
        |WHERE cum.cum >= (500*tot.n + 999)//1000
        |GROUP BY 1, 2""".stripMargin,
    "q244_tv_drift" ->
      """WITH a AS (SELECT lang AS k FROM documents WHERE doc_id % 2 = 0),
        |b AS (SELECT lang AS k FROM documents WHERE doc_id % 2 = 1),
        |ca AS (SELECT k, CAST(count(*) AS BIGINT) AS ca FROM a GROUP BY 1),
        |cb AS (SELECT k, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY 1),
        |m AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |      FROM ca FULL JOIN cb ON ca.k = cb.k),
        |t AS (SELECT CAST(sum(ca) AS HUGEINT) AS na,
        |             CAST(sum(cb) AS HUGEINT) AS nb FROM m)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CASE WHEN t.na = 0 OR t.nb = 0 THEN NULL
        |       ELSE CAST((1000000*sum(abs(CAST(m.ca AS HUGEINT)*t.nb
        |                 - CAST(m.cb AS HUGEINT)*t.na))) // (2*t.na*t.nb)
        |            AS BIGINT) END AS tv_ppm
        |FROM m, t GROUP BY t.na, t.nb""".stripMargin,
    "q240_gini" ->
      """WITH per AS (SELECT o_orderpriority AS g, o_custkey,
        |        CAST(sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS BIGINT) AS x
        |      FROM orders GROUP BY 1, 2),
        |h AS (SELECT g, x AS v, CAST(count(*) AS BIGINT) AS c FROM per
        |      WHERE x >= 0 GROUP BY 1, 2),
        |cum AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g ORDER BY v) AS cum FROM h),
        |agg AS (SELECT g, CAST(sum(c) AS HUGEINT) AS n,
        |         CAST(sum(CAST(v AS HUGEINT)*c) AS HUGEINT) AS s,
        |         CAST(sum(CAST(v AS HUGEINT)*c*(2*(cum-c) + c + 1)) AS HUGEINT) AS twice
        |        FROM cum GROUP BY 1)
        |SELECT g AS priority, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS total,
        |  CASE WHEN s = 0 THEN NULL
        |       ELSE CAST((1000000*(twice - (n+1)*s)) // (n*s) AS BIGINT) END AS gini_ppm
        |FROM agg""".stripMargin,
    "q239_ks_drift" ->
      """WITH a AS (SELECT CAST(floor(value*100) AS BIGINT) AS v FROM events
        |           WHERE event_type='purchase' AND value IS NOT NULL),
        |b AS (SELECT CAST(floor(value*100) AS BIGINT) AS v FROM events
        |      WHERE event_type='view' AND value IS NOT NULL),
        |ha AS (SELECT v, CAST(count(*) AS BIGINT) AS ca FROM a GROUP BY 1),
        |hb AS (SELECT v, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY 1),
        |m AS (SELECT coalesce(ha.v, hb.v) AS v, coalesce(ca,0) AS ca, coalesce(cb,0) AS cb
        |      FROM ha FULL JOIN hb ON ha.v = hb.v),
        |c AS (SELECT v, sum(ca) OVER w AS cumA, sum(cb) OVER w AS cumB
        |      FROM m WINDOW w AS (ORDER BY v)),
        |t AS (SELECT CAST(sum(ca) AS HUGEINT) AS na, CAST(sum(cb) AS HUGEINT) AS nb FROM m),
        |d AS (SELECT c.v, abs(t.nb*c.cumA - t.na*c.cumB) AS d, t.na, t.nb FROM c, t)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CASE WHEN na = 0 OR nb = 0 THEN NULL
        |       ELSE CAST((1000000*max(d)) // (na*nb) AS BIGINT) END AS ks_ppm,
        |  first(v ORDER BY d DESC, v ASC) AS at_value
        |FROM d GROUP BY na, nb""".stripMargin,
    "q238_equi_depth" ->
      """WITH base AS (SELECT event_type AS g, CAST(floor(value*100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1,2),
        |cum AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g ORDER BY v) AS cum FROM h),
        |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1)
        |SELECT cum.g AS event_type,
        |  CAST((8*cum.cum + tot.n - 1) // tot.n AS INT) AS bin,
        |  min(cum.v) AS lo, max(cum.v) AS hi, CAST(sum(cum.c) AS BIGINT) AS cnt
        |FROM cum JOIN tot ON tot.g = cum.g
        |GROUP BY 1, 2""".stripMargin,
    "q236_benford" ->
      """WITH base AS (SELECT l_returnflag AS g, CAST(floor(l_extendedprice*100) AS BIGINT) AS v
        |  FROM lineitem WHERE floor(l_extendedprice*100) >= 1),
        |d AS (SELECT g, CAST(substr(CAST(v AS VARCHAR),1,1) AS INT) AS digit FROM base),
        |c AS (SELECT g, digit, CAST(count(*) AS BIGINT) AS observed FROM d GROUP BY 1,2),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |bf AS (SELECT * FROM (VALUES (1,301030),(2,176091),(3,124939),(4,96910),(5,79181),
        |    (6,66947),(7,57992),(8,51153),(9,45757)) b(digit, benford_ppm)),
        |grid AS (SELECT n.g, n.n, bf.digit, bf.benford_ppm FROM n CROSS JOIN bf)
        |SELECT grid.g AS l_returnflag, grid.digit,
        |  coalesce(c.observed, 0) AS observed, grid.n,
        |  CAST((1000000*coalesce(c.observed,0)) // grid.n AS BIGINT) AS share_ppm,
        |  CAST(grid.benford_ppm AS BIGINT) AS benford_ppm,
        |  CAST(abs((1000000*coalesce(c.observed,0)) // grid.n - grid.benford_ppm) AS BIGINT) AS dev_ppm
        |FROM grid LEFT JOIN c ON c.g = grid.g AND c.digit = grid.digit""".stripMargin,
    "q237_cusum" ->
      s"""WITH daily AS ($dailyCountsSql),
        |pre AS (SELECT event_type AS g, day AS p, cnt AS v,
        |        row_number() OVER w AS t, sum(cnt) OVER w AS pre
        |        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |tot AS (SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
        |               sum(cnt) AS tot FROM daily GROUP BY 1),
        |s AS (SELECT pre.g, pre.p, pre.t, tot.n,
        |       abs(CAST(tot.n AS HUGEINT)*pre.pre - CAST(pre.t AS HUGEINT)*tot.tot) AS a
        |      FROM pre JOIN tot ON tot.g = pre.g WHERE pre.t < tot.n)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  first(p ORDER BY a DESC, t ASC) AS cp_period,
        |  CAST(max(a) AS BIGINT) AS s_abs
        |FROM s GROUP BY 1, 2""".stripMargin,
    "q229_approx_profile" ->
      """WITH src AS (SELECT o_orderkey, o_orderstatus,
        |       CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderpriority END AS prio
        |     FROM orders),
        |L AS (SELECT 'o_orderkey' AS "column", CAST(o_orderkey AS VARCHAR) AS val FROM src
        | UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM src
        | UNION ALL SELECT 'prio', prio FROM src),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM src),
        |nn AS (SELECT "column", CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |       FROM L GROUP BY 1),
        |mm AS (SELECT 'o_orderkey' AS "column", CAST(min(o_orderkey) AS VARCHAR) AS min_value,
        |         CAST(max(o_orderkey) AS VARCHAR) AS max_value FROM src
        |  UNION ALL SELECT 'o_orderstatus', min(o_orderstatus), max(o_orderstatus) FROM src
        |  UNION ALL SELECT 'prio', min(prio), max(prio) FROM src),
        |h AS (SELECT "column", ('0x'||substring(md5(val),1,15))::BIGINT AS h
        |      FROM L WHERE val IS NOT NULL),
        |b AS (SELECT "column", h % 64 AS bucket, h // 64 AS w FROM h),
        |r AS (SELECT "column", bucket,
        |        max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS r
        |      FROM b GROUP BY 1, 2),
        |sk AS (SELECT "column", CAST(count(*) AS INT) AS n_buckets,
        |   CAST(sum(1::HUGEINT << (55-r)) + (64-count(*)) * (1::HUGEINT << 55) AS BIGINT) AS denom_units
        | FROM r GROUP BY 1)
        |SELECT nn."column", tot.n, nn.n_null, mm.min_value, mm.max_value,
        |       sk.n_buckets, sk.denom_units
        |FROM nn JOIN mm ON mm."column" = nn."column"
        |LEFT JOIN sk ON sk."column" = nn."column", tot""".stripMargin,
    "q222_ewma" ->
      s"""WITH daily AS ($dailyCountsSql),
        |lagged AS (
        |  SELECT event_type, day, cnt,
        |    lag(cnt,1) OVER w c1, lag(cnt,2) OVER w c2, lag(cnt,3) OVER w c3,
        |    lag(cnt,4) OVER w c4, lag(cnt,5) OVER w c5, lag(cnt,6) OVER w c6,
        |    lag(cnt,7) OVER w c7
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, day, cnt,
        |  CAST((1000000 * (
        |      CAST(cnt AS HUGEINT) * 1000000000000000000000
        |    + COALESCE(CAST(c1 AS HUGEINT) *  700000000000000000000, 0)
        |    + COALESCE(CAST(c2 AS HUGEINT) *  490000000000000000000, 0)
        |    + COALESCE(CAST(c3 AS HUGEINT) *  343000000000000000000, 0)
        |    + COALESCE(CAST(c4 AS HUGEINT) *  240100000000000000000, 0)
        |    + COALESCE(CAST(c5 AS HUGEINT) *  168070000000000000000, 0)
        |    + COALESCE(CAST(c6 AS HUGEINT) *  117649000000000000000, 0)
        |    + COALESCE(CAST(c7 AS HUGEINT) *   82354300000000000000, 0)))
        |  // (  CAST(1000000000000000000000 AS HUGEINT)
        |    + CASE WHEN c1 IS NULL THEN 0 ELSE  700000000000000000000 END
        |    + CASE WHEN c2 IS NULL THEN 0 ELSE  490000000000000000000 END
        |    + CASE WHEN c3 IS NULL THEN 0 ELSE  343000000000000000000 END
        |    + CASE WHEN c4 IS NULL THEN 0 ELSE  240100000000000000000 END
        |    + CASE WHEN c5 IS NULL THEN 0 ELSE  168070000000000000000 END
        |    + CASE WHEN c6 IS NULL THEN 0 ELSE  117649000000000000000 END
        |    + CASE WHEN c7 IS NULL THEN 0 ELSE   82354300000000000000 END)
        |  AS BIGINT) AS ewma_ppm
        |FROM lagged""".stripMargin,
    "q223_hop_distance" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_orderkey o, l_partkey p FROM lineitem WHERE l_orderkey % 23 = 0),
        |und AS (
        |  SELECT DISTINCT least(a.p, b.p) AS a, greatest(a.p, b.p) AS b
        |  FROM li a JOIN li b ON a.o = b.o WHERE a.p < b.p),
        |adj AS (SELECT a AS s, b AS t FROM und UNION ALL SELECT b, a FROM und),
        |src AS (SELECT min(s) AS v FROM adj),
        |bfs AS (
        |  SELECT v, 0 AS hop FROM src
        |  UNION
        |  SELECT adj.t, bfs.hop + 1 FROM bfs JOIN adj ON adj.s = bfs.v
        |  WHERE bfs.hop < 12)
        |SELECT v AS node, CAST(min(hop) AS INT) AS hop FROM bfs GROUP BY 1""".stripMargin,
    "q224_concentration" ->
      """WITH per AS (
        |  SELECT o_orderpriority AS priority, o_custkey,
        |         CAST(count(*) AS BIGINT) AS n_i
        |  FROM orders GROUP BY 1, 2),
        |tot AS (
        |  SELECT priority, CAST(sum(n_i) AS HUGEINT) AS n,
        |         CAST(sum(n_i*n_i) AS HUGEINT) AS s2,
        |         CAST(count(*) AS BIGINT) AS n_cat
        |  FROM per GROUP BY 1)
        |SELECT priority, CAST(n AS BIGINT) AS n, n_cat,
        |  CAST((1000000 * s2) // (n*n) AS BIGINT) AS hhi_ppm,
        |  CAST((1000000 * (n*n - s2)) // (n*n) AS BIGINT) AS gini_ppm
        |FROM tot""".stripMargin,
    "q225_cuped" ->
      """WITH ux AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |    sum(CASE WHEN epoch_us(ts)//86400000000 < 19738
        |        THEN CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS x,
        |    sum(CASE WHEN epoch_us(ts)//86400000000 >= 19738
        |        THEN CAST(value AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS y
        |  FROM events GROUP BY 1, 2),
        |-- micro-unit HUGEINTs so every division is integral (// on
        |-- DECIMAL is fractional in DuckDB; 10^6-scaled ints are exact)
        |m AS (SELECT variant, CAST(round(x*1000000) AS HUGEINT) xm,
        |             CAST(round(y*1000000) AS HUGEINT) ym FROM ux),
        |g AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(xm) AS sx, sum(ym) AS sy,
        |         sum(xm*ym) AS sxy, sum(xm*xm) AS sxx
        |  FROM m),
        |th AS (
        |  SELECT n, sx,
        |    CASE WHEN n*sxx = sx*sx THEN NULL
        |    ELSE CAST((1000000 * (n*sxy - sx*sy)) // (n*sxx - sx*sx) AS BIGINT)
        |    END AS theta_ppm
        |  FROM g)
        |SELECT v.variant, CAST(v.nv AS BIGINT) AS n_units,
        |  CAST(v.syv // (1000 * v.nv) AS BIGINT) AS mean_post_milli,
        |  CAST(v.syv // (1000 * v.nv)
        |     - (th.theta_ppm * (v.sxv // (1000 * v.nv) - th.sx // (1000 * th.n)))
        |       // 1000000 AS BIGINT) AS adj_mean_milli
        |FROM (SELECT variant, CAST(count(*) AS HUGEINT) AS nv,
        |             sum(xm) AS sxv, sum(ym) AS syv
        |      FROM m GROUP BY 1) v CROSS JOIN th""".stripMargin,
    "q226_autocorr" ->
      s"""WITH daily AS ($dailyCountsSql),
        |pairs AS (
        |  SELECT event_type, cnt AS y,
        |    lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS x
        |  FROM daily),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) sx, CAST(sum(y) AS HUGEINT) sy,
        |    CAST(sum(x*y) AS HUGEINT) sxy,
        |    CAST(sum(x*x) AS HUGEINT) sxx, CAST(sum(y*y) AS HUGEINT) syy
        |  FROM pairs WHERE x IS NOT NULL GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
        |  CASE WHEN n < 2 OR n*sxx = sx*sx OR n*syy = sy*sy THEN NULL
        |  ELSE CAST((CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END) *
        |    ((1000000 * (n*sxy - sx*sy) * (n*sxy - sx*sy))
        |     // ((n*sxx - sx*sx) * (n*syy - sy*sy))) AS BIGINT)
        |  END AS r2_signed_ppm
        |FROM m""".stripMargin,
    "q227_hazard" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(epoch_us(ts)//86400000000) - min(epoch_us(ts)//86400000000) AS tenure
        |  FROM events GROUP BY 1),
        |dt AS (SELECT tenure, CAST(count(*) AS BIGINT) AS d_t FROM u GROUP BY 1),
        |risk AS (
        |  SELECT tenure, d_t,
        |    CAST(sum(d_t) OVER (ORDER BY tenure DESC) AS BIGINT) AS n_t
        |  FROM dt)
        |SELECT tenure, d_t, n_t,
        |  CAST((1000000*d_t) // n_t AS BIGINT) AS hazard_ppm
        |FROM risk""".stripMargin,
    "q228_wape" ->
      s"""WITH daily AS ($dailyCountsSql),
        |f AS (
        |  SELECT event_type, cnt,
        |    lag(cnt,7) OVER (PARTITION BY event_type ORDER BY day) AS fc
        |  FROM daily)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_periods,
        |  CAST(sum(abs(cnt - fc)) AS BIGINT) AS abs_err,
        |  CASE WHEN sum(cnt) = 0 THEN NULL
        |  ELSE CAST((1000000 * CAST(sum(abs(cnt-fc)) AS HUGEINT)) // sum(cnt) AS BIGINT)
        |  END AS wape_ppm
        |FROM f WHERE fc IS NOT NULL GROUP BY 1""".stripMargin)
}
