package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics — the corpus-distribution
  * diagnostics a training-data pipeline reads before choosing chunk
  * sizes, packing budgets, and quality cutoffs (doc-length p50/p99,
  * token-count histograms per language).
  *
  * Exactness contract: all three entry points implement one explicit,
  * engine-independent rule (type-1 / lower quantile: the smallest value
  * v whose cumulative count reaches ceil(pm·n/1000), with the fraction
  * given in PER-MILLE so the threshold is pure integer arithmetic —
  * float thresholds would hinge on whether an engine parses `0.9` as
  * an exact decimal or an IEEE double; histogram: integer bin width
  * ceil((max−min+1)/nBins)) so a SQL engine reproduces the result
  * bit-for-bit from the same rule — no dependence on any engine's
  * interpolation flavor. Values are integer-domain (lengths,
  * token counts, byte sizes); continuous inputs pre-scale to fixed
  * point upstream, the repo-wide decimal discipline. NULL values are
  * excluded up front (engines disagree on NULL sort placement, and a
  * NULL length is a missing measurement, not a rank).
  *
  * Scale shape (the 100 TB story): everything runs over the VALUE
  * HISTOGRAM (one map-side-partial groupBy on the value — distinct
  * values, not rows, cross the shuffle; doc-length-like domains
  * collapse 10¹¹ rows to ~10⁶ counts). The global cumulative count is
  * [[GlobalRank.globalRunningSum]]'s window-free distributed prefix
  * sum; the per-group variant's window partitions by the GROUP key —
  * bounded by one group's distinct values, never the corpus. Probe
  * sets (the quantile fractions) are caller-bounded literals and ride
  * a broadcast; the histogram's min/max row is a 1-row broadcast
  * cross join, not a driver collect. No global windows, no data-sized
  * collects, no sort of the raw corpus anywhere.
  */
object Stats {

  private def validateProbs(probs: Seq[(String, Int)]): Unit = {
    require(probs.nonEmpty, "need at least one quantile fraction")
    probs.foreach { case (label, pm) =>
      require(pm > 0 && pm <= 1000,
        s"per-mille fraction $label=$pm outside (0, 1000]")
    }
    require(probs.map(_._1).distinct.size == probs.size,
      "quantile labels must be distinct")
  }

  /** The (label, pm) probe frame — tiny, literal, broadcast. */
  private def probeFrame(df: DataFrame,
                         probs: Seq[(String, Int)]): DataFrame = {
    import df.sparkSession.implicits._
    probs.map { case (l, pm) => (l, pm.toLong) }.toDF("label", "pm")
  }

  /** ceil(pm·n/1000) as integer arithmetic — the rank a quantile probe
    * must reach. Always ≥ 1 for pm ≥ 1, so an all-NULL/empty frame
    * yields no rows rather than a phantom quantile. */
  private val threshold = expr("(pm * n + 999) div 1000")

  /** Exact global quantiles of integer-valued `valueCol`: for each
    * (label, pm) the smallest value v with |{rows ≤ v}| ≥
    * ceil(pm·n/1000) — the type-1 lower quantile, exact on ties and
    * duplicates. `probs` are per-mille: p50 = 500, p99 = 990.
    *
    * Output: (label, q) — one row per requested fraction.
    *
    * Plan: value-histogram groupBy → window-free global prefix sum
    * over value order ([[GlobalRank.globalRunningSum]]) → broadcast
    * non-equi join against the probe fractions → min(v) per label.
    * The join input is (distinct values × probes) at worst — probes
    * are a handful of literals, so this stays metadata-sized. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     probs: Seq[(String, Int)]): DataFrame = {
    validateProbs(probs)
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = GlobalRank.globalRunningSum(counts, Seq(col("v").asc), "cnt")
    val total = counts.agg(sum(col("cnt")).as("n"))
    cum.crossJoin(broadcast(total))
      .join(broadcast(probeFrame(df, probs)), col("cum") >= threshold)
      .groupBy(col("label"))
      .agg(min(col("v")).as("q"))
  }

  /** WEIGHTED exact quantiles: [[exactQuantiles]] where each row counts
    * `weightCol` units instead of 1 — the revenue-weighted median
    * ("half the SPEND sits at or below this quantity"), the
    * token-budget percentile ("the doc length below which 90% of
    * TOKENS live"). Weights must be non-negative integers (pre-scale
    * money to cents, floats to fixed-point); the type-1 rule applies to
    * the weighted cumulative: smallest v with Σ_{≤v} w ≥
    * ceil(pm·W/1000). Same plan as the unweighted form — value
    * histogram (one shuffle), bounded running sum, broadcast probes. */
  def exactWeightedQuantiles(df: DataFrame, valueCol: String,
                             weightCol: String,
                             probs: Seq[(String, Int)]): DataFrame = {
    validateProbs(probs)
    val counts = df.where(col(valueCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol).cast("long") > 0)
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(sum(col(weightCol).cast("long")).as("cnt"))
    val cum = GlobalRank.globalRunningSum(counts, Seq(col("v").asc), "cnt")
    val total = counts.agg(sum(col("cnt")).as("n"))
    cum.crossJoin(broadcast(total))
      .join(broadcast(probeFrame(df, probs)), col("cum") >= threshold)
      .groupBy(col("label"))
      .agg(min(col("v")).as("q"))
  }

  /** Per-group exact quantiles: [[exactQuantiles]]'s rule applied
    * independently within every `groupCol` value (per-language length
    * percentiles, per-source token budgets). NULL groups form their
    * own group, matching the repo-wide aggregation stance; NULL
    * values are excluded as in the global form.
    *
    * Output: (groupCol, label, q).
    *
    * Plan: one groupBy on (group, value), a running-sum window
    * PARTITIONED BY the group — bounded by one group's distinct
    * values, the legitimate (non-global) window shape — group totals
    * from a second metadata-sized groupBy, then the same broadcast
    * probe join. Two shuffles total, both on the group key. */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
                            valueCol: String,
                            probs: Seq[(String, Int)]): DataFrame = {
    validateProbs(probs)
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").asc)
    val cum = counts.withColumn("cum", sum(col("cnt")).over(w))
    val totals = counts.groupBy(col("g").as("g2"))
      .agg(sum(col("cnt")).as("n"))
    cum.join(totals, col("g") <=> col("g2"))
      .join(broadcast(probeFrame(df, probs)), col("cum") >= threshold)
      .groupBy(col("g").as(groupCol), col("label"))
      .agg(min(col("v")).as("q"))
  }

  /** Exact equi-width histogram of integer-valued `valueCol` over
    * `nBins` bins: integer width w = ceil((max−min+1)/nBins), bin i
    * covers [min+i·w, min+(i+1)·w−1], every value lands in exactly one
    * bin and only non-empty bins surface. Pure integer arithmetic —
    * any engine computing the same rule matches bit-for-bit (no float
    * bin edges to disagree on rounding). NULL values are excluded.
    *
    * Output: (bin, lo, hi, cnt) — bin 0-based, bounds inclusive.
    *
    * Plan: one 1-row min/max aggregate broadcast-cross-joined back
    * (lazy — no driver action), bin assignment map-side with integer
    * `div`, one map-side-partial groupBy on the bin id. One shuffle
    * of ≤ nBins rows. */
  /** Key-skew diagnostic: the `topK` heaviest key combinations with
    * exact counts and integer per-mille corpus share — what an
    * operator reads BEFORE choosing a partitioning (is `lang` safe to
    * shuffle on, or does one value own 40% of the corpus and need
    * salting / AQE skew handling?). NULL key values count as their own
    * group, which is exactly the degenerate-key case the report is
    * for.
    *
    * Determinism: rows are selected by (cnt DESC, keys ASC) — a total
    * order, so the cut at `topK` is engine-independent even on count
    * ties; share_pm is an integer floor division.
    *
    * Plan: one map-side-partial groupBy on the keys, a 1-row total
    * broadcast back (lazy), then orderBy+limit — Spark plans that as
    * TakeOrderedAndProject: each partition keeps its own top-K and the
    * driver merges K-lists, never a global sort. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String],
                    topK: Int): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_pm", expr("CAST(1000 * cnt DIV __total AS BIGINT)"))
      .drop("__total")
      .orderBy(col("cnt").desc +: keyCols.map(col(_).asc): _*)
      .limit(topK)
  }

  /** FIXED-BOUND equi-width histogram — the MERGEABLE sibling of
    * [[equiWidthHistogram]] and the quantile member of the sketch trio
    * (HLL = distinct counts, Count-Min = key frequencies, this =
    * value distribution): bins are defined by caller-fixed (lo, width,
    * nBins) instead of data min/max, so per-shard / per-day histograms
    * built with the same parameters combine by bin-wise SUM without
    * re-reading data. Out-of-range values CLAMP to the end bins (the
    * SQ8 frozen-stats stance: a shard must never silently change the
    * binning the fleet agreed on; end-bin mass says "widen the range"),
    * so bin 0 and bin nBins−1 are catch-alls. NULLs excluded. Output:
    * (bin, cnt), occupied bins only — ≤ nBins rows per shard, one
    * map-side-partial groupBy, nothing else. */
  def fixedWidthHistogram(df: DataFrame, valueCol: String,
                          lo: Long, width: Long, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    require(width >= 1, s"width must be >= 1, got $width")
    df.where(col(valueCol).isNotNull)
      .select(greatest(lit(0L), least(lit(nBins - 1L),
        expr(s"(CAST(${valueCol} AS BIGINT) - ${lo}L) div ${width}L")))
        .as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histograms built with the SAME (lo, width, nBins): bin-wise
    * sum. */
  def histogramMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Approximate quantiles FROM a fixed-bound histogram: for each
    * (label, pm) probe, the smallest bin whose cumulative count reaches
    * ceil(pm·n/1000) — the type-1 rule of [[exactQuantiles]] applied at
    * bin granularity, so the true quantile provably lies in the
    * returned [lo, hi] interval (exact when width = 1 and values are
    * in range). All integer; any engine computing the rule matches.
    * Output: (label, bin, lo, hi).
    *
    * Plan: the histogram is ≤ nBins rows of metadata — the running sum
    * is a window over that bounded domain (the nlist-centroid
    * argument), the probes a broadcast literal join. */
  def histogramQuantiles(hist: DataFrame, lo: Long, width: Long,
                         probs: Seq[(String, Int)]): DataFrame = {
    validateProbs(probs)
    require(width >= 1, s"width must be >= 1, got $width")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val total = hist.agg(sum(col("cnt")).as("n"))
    cum.crossJoin(broadcast(total))
      .join(broadcast(probeFrame(hist, probs)), col("cum") >= threshold)
      .groupBy(col("label"))
      .agg(min(col("bin")).as("bin"))
      .select(col("label"), col("bin"),
        (lit(lo) + col("bin") * width).as("lo"),
        (lit(lo) + (col("bin") + 1) * width - 1).as("hi"))
  }

  def equiWidthHistogram(df: DataFrame, valueCol: String,
                         nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val v = col(valueCol).cast("long")
    val stats = df.where(col(valueCol).isNotNull)
      .agg(min(v).as("mn"), max(v).as("mx"))
    df.where(col(valueCol).isNotNull)
      .select(v.as("__v"))
      .crossJoin(broadcast(stats))
      // ceil((mx−mn+1)/nBins) via integer div: (mx−mn+nBins) div nBins;
      // ≥ 1 whenever the frame is non-empty (mx ≥ mn)
      .withColumn("__w", expr(s"(mx - mn + $nBins) div $nBins"))
      .withColumn("bin", expr("(__v - mn) div __w"))
      .groupBy(col("bin"),
        (col("mn") + col("bin") * col("__w")).as("lo"),
        (col("mn") + (col("bin") + 1) * col("__w") - 1).as("hi"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-depth bucket boundaries of integer-valued `valueCol`: the
    * (i·1000/nBuckets)-per-mille exact quantiles for i = 1..nBuckets−1
    * — the feature-discretization / range-partition-boundary op (same
    * rule a sort-based range partitioner would derive, computed via the
    * [[exactQuantiles]] plan: no global sort, the value histogram +
    * bounded running sum). `nBuckets` must divide 1000 so the probe
    * fractions stay exact integers. Output: (idx ∈ [1, nBuckets),
    * boundary). */
  def equiDepthBoundaries(df: DataFrame, valueCol: String,
                          nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && 1000 % nBuckets == 0,
      s"nBuckets must be >= 2 and divide 1000, got $nBuckets")
    val probs = (1 until nBuckets).map(i => (i.toString, i * 1000 / nBuckets))
    exactQuantiles(df, valueCol, probs)
      .select(col("label").cast("int").as("idx"), col("q").as("boundary"))
  }

  /** Assign each row its equi-depth bucket: bucket = #{boundaries
    * strictly below the value} ∈ [0, nBuckets) — values EQUAL to a
    * boundary fall in the lower bucket, matching the type-1 quantile
    * rule, so bucket populations differ from n/nBuckets only by tie
    * mass. Map-only: the boundary table collapses to one broadcast
    * array row (≤ nBuckets−1 longs) and the count is a fused
    * higher-order filter — no join, no shuffle, NULL values get NULL. */
  def discretize(df: DataFrame, valueCol: String, boundaries: DataFrame,
                 outCol: String = "bucket"): DataFrame = {
    val arr = boundaries.agg(
      sort_array(collect_list(col("boundary"))).as("__bnd"))
    df.crossJoin(broadcast(arr))
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("int"))
          .otherwise(size(filter(col("__bnd"),
            b => b < col(valueCol).cast("long")))))
      .drop("__bnd")
  }

  /** Per-group least-squares TREND: the OLS slope of integer `yCol`
    * against integer `xCol`, computed entirely from the five sufficient
    * statistics (n, Σx, Σy, Σx², Σxy) as EXACT decimal arithmetic —
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), surfaced as the
    * integer `(num · outScale) div den` (truncate-toward-zero in both
    * engines). The drift/trend detector next to [[categoryDrift]]:
    * "is this metric moving, and how fast", with none of a float
    * regression's cross-engine rounding.
    *
    * `xCol` is REBASED per group (x − min(x)) before squaring — raw
    * epoch-µs squared overflows even decimal(38); callers should also
    * pre-scale x to coarse units (seconds, not µs) so n·Σx² stays far
    * inside 38 digits. Groups with zero x-variance yield a null slope.
    *
    * Plan: one groupBy for the per-group min (broadcast back), one
    * map-side-partial groupBy for the sufficient statistics — the
    * regression itself is arithmetic over group-count-bounded rows. */
  def groupTrend(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String, outScale: Long = 1L): DataFrame = {
    require(outScale >= 1, s"outScale must be >= 1, got $outScale")
    val d = "decimal(38,0)"
    val mins = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol)).agg(min(col(xCol).cast("long")).as("__mn"))
    val based = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .join(broadcast(mins), groupCol)
      .select(col(groupCol),
        (col(xCol).cast("long") - col("__mn")).cast(d).as("x"),
        col(yCol).cast("long").cast(d).as("y"))
    val s = based.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(d).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    s.withColumn("__num",
        (col("n") * col("sxy") - col("sx") * col("sy")) *
          lit(outScale).cast(d))
      .withColumn("__den", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        // `div` truncates toward zero in BOTH engines (verified against
        // DuckDB's `//` on negatives — both give −7/2 = −3)
        when(col("__den") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(__num div __den AS BIGINT)")).as("slope"))
  }

  /** Categorical-distribution drift between two snapshots (train mix
    * vs yesterday's, shard A vs shard B): per category, counts and
    * integer per-mille shares on both sides plus |Δshare| — the
    * monitoring report that catches "the en fraction moved 4 points"
    * before a model does. L1-style integer shares rather than
    * PSI/KL: no logarithm to round, exact cross-engine, and the
    * detection ordering is the same for distribution shifts that
    * matter. Categories absent on one side surface with count 0 (the
    * strongest drift signal, not a dropped row). Two count
    * aggregations + one full-outer join on the category key; totals
    * are 1-row broadcasts. */
  def categoryDrift(a: DataFrame, b: DataFrame,
                    keyCol: String): DataFrame = {
    def counted(df: DataFrame, as: String) =
      df.groupBy(col(keyCol)).agg(count(lit(1)).as(as))
    categoryDriftFromCounts(counted(a, "n_a"), counted(b, "n_b"), keyCol)
  }

  /** [[categoryDrift]] over PRE-AGGREGATED per-category counts —
    * `aCounts` carries (keyCol, n_a), `bCounts` (keyCol, n_b). The
    * monitoring entry point (round-11 verdict ask #1): a drift monitor
    * compares every arriving batch against a FROZEN baseline, and
    * [[categoryDrift]] re-aggregates both raw frames per call — fine
    * for a one-shot report, a full-corpus scan per micro-batch for a
    * monitor. Aggregate the baseline ONCE (≤ #categories rows — small
    * enough to collect to a local frame), then drift each batch
    * against the counts. Output and integer semantics are identical
    * to [[categoryDrift]] (it delegates here). */
  def categoryDriftFromCounts(aCounts: DataFrame, bCounts: DataFrame,
                              keyCol: String): DataFrame = {
    val joined = aCounts.join(bCounts,
        Seq(keyCol), "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
    val tot = joined.agg(sum(col("n_a")).as("__wa"),
      sum(col("n_b")).as("__wb"))
    joined.crossJoin(broadcast(tot))
      // an EMPTY snapshot (total 0) reads as all-shares-0, not a
      // divide-by-zero abort (ANSI `div` throws on 0)
      .withColumn("share_a_pm",
        when(col("__wa") > 0, expr("1000 * n_a div __wa")).otherwise(0L))
      .withColumn("share_b_pm",
        when(col("__wb") > 0, expr("1000 * n_b div __wb")).otherwise(0L))
      .withColumn("delta_pm", abs(col("share_a_pm") - col("share_b_pm")))
      .drop("__wa", "__wb")
  }

  /** Robust (median/IQR) outlier report per group: Tukey's fences at
    * k = 1.5·IQR computed in ×2-scaled integer arithmetic (2·q1−3·IQR
    * and 2·q3+3·IQR are exact longs — no 1.5 to round), outliers
    * counted against 2·value. The classic data-profiling screen that,
    * unlike z-scores, a few huge outliers cannot mask (median and
    * quartiles have 25% breakdown; mean/stddev have 0%).
    *
    * Output: (group, n, q1, med, q3, n_outliers).
    *
    * Plan: quartiles via [[exactQuantilesByGroup]] (two group-keyed
    * shuffles over the value histogram), then ONE more pass over the
    * data joined against the per-group stats — broadcast, since groups
    * are bounded — counting fence violations map-side. */
  def robustOutlierReport(df: DataFrame, groupCol: String,
                          valueCol: String): DataFrame = {
    val qs = exactQuantilesByGroup(df, groupCol, valueCol,
      Seq(("q1", 250), ("med", 500), ("q3", 750)))
    val stats = qs.groupBy(col(groupCol))
      .agg(max(when(col("label") === "q1", col("q"))).as("q1"),
        max(when(col("label") === "med", col("q"))).as("med"),
        max(when(col("label") === "q3", col("q"))).as("q3"))
    val v2 = col(valueCol).cast("long") * 2
    val iqr = col("q3") - col("q1")
    df.where(col(valueCol).isNotNull)
      .join(broadcast(stats), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("q1")).as("q1"), first(col("med")).as("med"),
        first(col("q3")).as("q3"),
        sum(when(v2 < col("q1") * 2 - iqr * 3, 1L)
          .when(v2 > col("q3") * 2 + iqr * 3, 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** AUC (area under the ROC curve) of an integer score against a
    * boolean label, by the Mann–Whitney rank identity — the
    * classifier-quality number a curation pipeline reads before
    * trusting a quality model's threshold. Exactly the probability a
    * random positive outranks a random negative (ties → ½), in integer
    * parts-per-million.
    *
    * Tie-exact without per-row ranking: group rows by score value;
    * for a score with `c` rows (`p` positive) and `cb` rows strictly
    * below, every positive there has DOUBLED midrank `2·cb + c + 1`,
    * so 2·Σrank⁺ = Σ p·(2·cb + c + 1) and
    * `auc_ppm = 10⁶·(2·Σrank⁺ − n⁺(n⁺+1)) div (2·n⁺·n⁻)` — every step
    * integer (DECIMAL(38,0) for the final products: 10⁶·2n² passes a
    * long at ~10⁶ rows). Output: one row (n_pos, n_neg, auc_ppm).
    *
    * Scale shape: one map-side-partial groupBy on the score VALUE
    * (distinct scores cross the shuffle, not rows — the Stats
    * histogram discipline), one [[GlobalRank.globalRunningSum]] prefix
    * sum over those values, one global aggregate. No per-row rank, no
    * global window, no collect. */
  def aucPpm(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = df.select(col(scoreCol).cast("long").as("__s"),
      col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val byScore = s.groupBy(col("__s")).agg(count(lit(1)).as("__c"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("__p"))
    val cum = GlobalRank.globalRunningSum(byScore, Seq(col("__s")), "__c", "__cum")
    cum.agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__c") - col("__p")).as("n_neg"),
        sum(col("__p").cast("decimal(38,0)") *
          (lit(2) * (col("__cum") - col("__c")) + col("__c") + 1)).as("__r2"))
      .select(col("n_pos"), col("n_neg"),
        // single-class input (n_pos or n_neg = 0, incl. NULL on empty
        // input): AUC is undefined and ANSI `div` would throw on the
        // zero denominator — surface NULL (the chiSquare2x2Milli
        // degenerate-margin pattern)
        expr("""CASE WHEN n_pos IS NULL OR n_neg IS NULL
                |         OR n_pos = 0 OR n_neg = 0 THEN NULL
                |ELSE CAST((1000000 * (__r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)))
                |div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("auc_ppm"))
  }

  /** CALIBRATION / RELIABILITY buckets: scores in parts-per-million
    * [0, 10⁶) bucket into `bins` equal-width bins; each bin reports how
    * often the label actually fired vs what the score promised — the
    * reliability-diagram table behind "is this quality model's 0.9
    * really a 0.9". Output per non-empty bin: (bucket, n, n_pos,
    * mean_score_ppm = Σscore div n, rate_ppm = 10⁶·n_pos div n), all
    * floor-division integers. One map-side-partial groupBy on the
    * bucket id; bins bound the result. */
  def reliabilityBuckets(df: DataFrame, scorePpmCol: String,
                         labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must divide 1000000, got $bins")
    val w = 1000000L / bins
    val s = df.select(col(scorePpmCol).cast("long").as("__s"),
      col(labelCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    s.where(col("__s") >= 0 && col("__s") < 1000000L)
      .groupBy(expr(s"__s div ${w}L").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s")).as("__ss"))
      .select(col("bucket"), col("n"), col("n_pos"),
        expr("__ss div n").as("mean_score_ppm"),
        expr("(1000000 * n_pos) div n").as("rate_ppm"))
  }

  /** PER-GROUP WINSORIZATION: clamp every value into its group's
    * [loPm, hiPm] per-mille fences (exact type-1 quantiles) — the
    * outlier-taming transform applied before means/regressions so one
    * wild sensor reading can't own the aggregate. Keeps every row
    * (unlike trimming); adds `clipped` (0/1) so downstream can count
    * what moved. Fences from [[exactQuantilesByGroup]] ride a
    * broadcast join (groups × 2 rows); the clamp itself is map-only
    * integer comparison. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                loPm: Int, hiPm: Int): DataFrame = {
    require(loPm >= 1 && hiPm <= 1000 && loPm < hiPm,
      s"need 1 <= loPm < hiPm <= 1000, got [$loPm, $hiPm]")
    val fences = exactQuantilesByGroup(df, groupCol, valueCol,
        Seq(("lo", loPm), ("hi", hiPm)))
      .groupBy(col(groupCol))
      .agg(max(when(col("label") === "lo", col("q"))).as("__lo"),
        max(when(col("label") === "hi", col("q"))).as("__hi"))
    val v = col(valueCol).cast("long")
    df.where(col(valueCol).isNotNull)
      .join(broadcast(fences), groupCol)
      .withColumn("winsorized",
        when(v < col("__lo"), col("__lo"))
          .when(v > col("__hi"), col("__hi")).otherwise(v))
      .withColumn("clipped",
        when(v < col("__lo") || v > col("__hi"), 1L).otherwise(0L))
      .drop("__lo", "__hi")
  }

  /** QUANTILE NORMALIZATION across groups — the feature-pipeline
    * transform that maps every group's value distribution onto the
    * GLOBAL one (each row keeps its within-group rank but takes the
    * global value at that rank), killing per-group scale/offset drift
    * while preserving order. Rule, all integer: within-group per-mille
    * position pm = ⌈1000·rank/n_g⌉ (rank by (value, id) — tie-free),
    * normalized = the global type-1 quantile at pm (smallest value
    * whose cumulative count reaches ⌈pm·N/1000⌉ — the exactQuantiles
    * rule evaluated at per-mille resolution).
    *
    * Output: (groupCol, idCol, valueCol, pm, normalized) per non-null
    * row.
    *
    * Scale shape: the quantile FUNCTION is materialized only at the
    * 1000 per-mille points — a ≤1000-row map built by probing the
    * global value histogram (distinct values, window-free prefix sum)
    * with a broadcast probe set, then broadcast-joined back to rows.
    * The rank window partitions by the GROUP — state bounded by one
    * group, the sessionize caveat: groups are languages/sources, not
    * one giant key. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        col(valueCol).cast("long").as("__v"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"), col("__id"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
    val ranked = base
      .withColumn("__rk", row_number().over(wg))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("pm", expr("(1000 * __rk + __n - 1) div __n"))
    val hist = base.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val cum = GlobalRank.globalRunningSum(hist, Seq(col("__v")), "__c", "__cum")
    val nTot = base.agg(count(lit(1)).as("__N"))
    val pms = spark.range(1, 1001).select(col("id").as("pm"))
      .crossJoin(broadcast(nTot))
      .withColumn("__need", expr("(pm * __N + 999) div 1000"))
    // the covering histogram bucket: cum − c < need ≤ cum — exactly one
    // row per pm; the probe set broadcasts, the histogram streams
    val qmap = cum.join(broadcast(pms),
        col("__cum") - col("__c") < col("__need") &&
          col("__need") <= col("__cum"))
      .select(col("pm"), col("__v").as("normalized"))
    ranked.join(broadcast(qmap), Seq("pm"))
      .select(col("__g").as(groupCol), col("__id").as(idCol),
        col("__v").as(valueCol), col("pm"), col("normalized"))
  }

  /** PEARSON χ² for a 2×2 design — the A/B-test significance statistic
    * (group × outcome), in exact integer MILLI-units via the closed
    * form χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)): pure integer
    * products in DECIMAL(38,0), floor division last, no expected-count
    * float anywhere. The numerator is 10³·N⁵-scale, so exactness holds
    * to N ≈ 10⁷ rows; past that, pre-aggregate the design (the cells,
    * not the rows, are the statistic's sufficient statistics — compute
    * them at any scale, then run the closed form on the 4 counts). Compare `chi2_milli` against 3841 (α=0.05, 1 df)
    * / 6635 (α=0.01). Degenerate margins (an empty row or column) →
    * NULL, the honest "test undefined". Output: one row
    * (n, a, b, c, d, chi2_milli) with the confusion cells surfaced so
    * the caller can audit the margins. One map-side-partial aggregate
    * over booleans — a single scan, metadata-sized result. */
  def chiSquare2x2Milli(df: DataFrame, groupCol: String,
                        labelCol: String): DataFrame = {
    val t = df.select(col(groupCol).cast("boolean").as("__g"),
      col(labelCol).cast("boolean").as("__y"))
      .where(col("__g").isNotNull && col("__y").isNotNull)
    def cell(g: Boolean, y: Boolean) =
      sum(when(col("__g") === g && col("__y") === y, 1L).otherwise(0L))
    t.agg(count(lit(1)).as("n"), cell(true, true).as("a"),
        cell(true, false).as("b"), cell(false, true).as("c"),
        cell(false, false).as("d"))
      .select(col("n"), col("a"), col("b"), col("c"), col("d"),
        expr("""CASE WHEN (a+b)*(c+d) = 0 OR (a+c)*(b+d) = 0 THEN NULL
                |ELSE CAST((1000 * n *
                |  (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c) *
                |  (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c))
                |div (CAST((a+b) AS DECIMAL(38,0))*(c+d)*(a+c)*(b+d)) AS BIGINT)
                |END""".stripMargin.replace("\n", " ")).as("chi2_milli"))
  }

  /** PEARSON χ² for a general k×m contingency (two categorical
    * columns) — independence testing beyond [[chiSquare2x2Milli]]'s
    * binary design. Per-cell closed form (o·N − r·c)²/(N·r·c) summed
    * over the COMPLETE r×c grid (absent combinations contribute their
    * full expected count — skipping them understates χ²), each term
    * floored to milli-units before the sum: a defined integer rule
    * both engines replay (ties to the textbook value within
    * cells·0.001). Output: one row (n, dof, chi2_milli).
    *
    * Scale shape: the cell groupBy is alphabet²-bounded; margins are
    * alphabet-bounded and broadcast; the full grid is a broadcast
    * cross of the two margin frames. */
  def chiSquareKxMMilli(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val t = df.select(col(aCol).cast("string").as("__a"),
      col(bCol).cast("string").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
    val cells = t.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__o"))
    val ra = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__r"))
    val cb = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__c"))
    val nF = cells.agg(sum(col("__o")).as("__n"))
    val grid = ra.crossJoin(broadcast(cb)).crossJoin(broadcast(nF))
      .join(cells, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    val d38 = "decimal(38,0)"
    grid.agg(
        max(col("__n")).as("n"),
        ((countDistinct(col("__a")) - 1) *
          (countDistinct(col("__b")) - 1)).as("dof"),
        sum(expr(
          s"""(1000 * (CAST(__o AS $d38) * __n - CAST(__r AS $d38) * __c) *
             |(CAST(__o AS $d38) * __n - CAST(__r AS $d38) * __c))
             |div (CAST(__n AS $d38) * __r * __c)"""
            .stripMargin.replace("\n", " ")).cast("long")).as("chi2_milli"))
  }

  /** COHEN'S KAPPA between two categorical labelings of the same rows —
    * chance-corrected inter-annotator agreement, the label-quality
    * number a data pipeline reads before trusting human (or model)
    * annotations. κ = (pₒ − pₑ)/(1 − pₑ) with pₑ the marginal-product
    * chance rate, computed entirely from the confusion counts in
    * integer arithmetic:
    * `kappa_ppm = 10⁶·(n·Σdiag − Σᵢ rowᵢ·colᵢ) div (n² − Σᵢ rowᵢ·colᵢ)`
    * (truncation toward zero — both engines' div on possibly-negative
    * κ). Degenerate pₑ = 1 (both annotators constant) → 0 by
    * definition here, documented. Output: one row (n, n_agree,
    * kappa_ppm).
    *
    * Scale shape: one groupBy on the (a, b) label pair — the shuffle
    * carries the confusion MATRIX, bounded by the label alphabet
    * squared, not the corpus; marginals join broadcast-small. */
  def cohenKappaPpm(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // the confusion aggregate feeds three readers (marginals ×2, po)
    // inside ONE final plan — identical exchange subtrees, so Spark's
    // ReuseExchange computes the shuffle once; no persist/checkpoint
    // needed (and the plan stays visible to the audit spec)
    val conf = df.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
    val rows = conf.groupBy(col("__a").as("__l")).agg(sum(col("__n")).as("__r"))
    val cols = conf.groupBy(col("__b").as("__l")).agg(sum(col("__n")).as("__c"))
    val pe = rows.join(cols, Seq("__l"))
      .agg(coalesce(sum(col("__r").cast("decimal(38,0)") * col("__c")),
        lit(0).cast("decimal(38,0)")).as("__rc"))
    val po = conf.agg(sum(col("__n")).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__n"))), lit(0L))
        .as("n_agree"))
    po.crossJoin(broadcast(pe))
      .select(col("n"), col("n_agree"),
        when(expr("CAST(n AS DECIMAL(38,0)) * n = __rc"), 0L)
          .otherwise(expr(
            """CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * n_agree - __rc))
              |div (CAST(n AS DECIMAL(38,0)) * n - __rc) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("kappa_ppm"))
  }

  /** MARKET-CONCENTRATION indices per group: Herfindahl–Hirschman in
    * ppm (`hhi_ppm = 10⁶·Σnᵢ² div n²`, the antitrust-screen statistic)
    * and its complement the Gini–Simpson impurity
    * (`gini_ppm = 10⁶·(n² − Σnᵢ²) div n²`, the decision-tree split
    * criterion / ecology diversity index) — "is this priority class
    * served by one customer or a thousand", "is this shard's language
    * mix degenerate". Both pure integer arithmetic over category
    * counts; an equal K-way split reads 10⁶/K, a monopoly 10⁶.
    *
    * Output per group: (group, n, n_cat, hhi_ppm, gini_ppm).
    *
    * Scale shape: two map-side-partial groupBys — (group, category)
    * counts then per-group moments; the second shuffle carries one row
    * per distinct category, never input rows. No windows, no collects. */
  def concentrationPpm(df: DataFrame, groupCol: String,
                       catCol: String): DataFrame = {
    val per = df.select(col(groupCol).as("__g"), col(catCol).as("__c"))
      .where(col("__g").isNotNull && col("__c").isNotNull)
      .groupBy(col("__g"), col("__c")).agg(count(lit(1)).as("__n"))
    per.groupBy(col("__g"))
      .agg(sum(col("__n")).as("n"), count(lit(1)).as("n_cat"),
        sum(col("__n").cast("decimal(38,0)") * col("__n")).as("__s2"))
      .select(col("__g").as(groupCol), col("n"), col("n_cat"),
        expr("CAST((1000000 * __s2) div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("hhi_ppm"),
        expr("""CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * n - __s2))
                |div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("gini_ppm"))
  }

  /** LAG-k AUTOCORRELATION per series, exact signed-r² surface:
    * `r2_signed_ppm = sign(cov)·10⁶·cov² div (varx·vary)` over the
    * (xₜ₋ₖ, xₜ) pairs of each group's order — Pearson r itself needs a
    * square root (irrational), so the engine surfaces the square with
    * the sign restored: the mean-reversion / momentum diagnostic
    * ("does yesterday's count predict today's") in a form both engines
    * compute bit-exactly. NULL when fewer than 2 pairs or either
    * variance is zero (constant series).
    *
    * Values must be integer-domain (counts, pre-scaled cents — the
    * Stats module contract).
    *
    * Scale shape: one group-partitioned lag window (state = one row),
    * one map-side-partial groupBy of 6 moments per group. Series
    * COUNT is unbounded; series LENGTH bounds nothing here (moments
    * stream). */
  def autocorrPpm(df: DataFrame, groupCol: String, orderCol: String,
                  valueCol: String, lagK: Int = 1): DataFrame = {
    require(lagK >= 1, s"lagK must be >= 1, got $lagK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__o"))
    val d = "decimal(38,0)"
    val pairs = df.select(col(groupCol).as("__g"), col(orderCol).as("__o"),
        col(valueCol).cast("long").as("__y"))
      .withColumn("__x", lag(col("__y"), lagK).over(w))
      .where(col("__x").isNotNull)
    pairs.groupBy(col("__g"))
      .agg(count(lit(1)).cast(d).as("__n"),
        sum(col("__x")).cast(d).as("__sx"), sum(col("__y")).cast(d).as("__sy"),
        sum(col("__x").cast(d) * col("__y")).as("__sxy"),
        sum(col("__x").cast(d) * col("__x")).as("__sxx"),
        sum(col("__y").cast(d) * col("__y")).as("__syy"))
      .select(col("__g").as(groupCol), col("__n").cast("long").as("n_pairs"),
        when(col("__n") < 2 ||
            col("__n") * col("__sxx") === col("__sx") * col("__sx") ||
            col("__n") * col("__syy") === col("__sy") * col("__sy"),
          lit(null).cast("long"))
          .otherwise(expr(
            // sign × positive quotient: keeps the division on positive
            // operands so truncation-direction conventions cannot drift
            """CAST((CASE WHEN __n * __sxy - __sx * __sy < 0 THEN -1 ELSE 1 END) *
              |((1000000 * (__n * __sxy - __sx * __sy) * (__n * __sxy - __sx * __sy))
              |div ((__n * __sxx - __sx * __sx) * (__n * __syy - __sy * __sy))) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("r2_signed_ppm"))
  }

  /** CUPED variance-reduced experiment readout (Deng et al., WSDM'13 —
    * the industry-standard pre-period adjustment): per experiment
    * variant, the raw post-period mean and the covariate-adjusted mean
    * `ȳᵥ − θ·(x̄ᵥ − x̄)` with θ = cov(x,y)/var(x) fitted GLOBALLY (the
    * pooled-θ convention), all in exact decimal arithmetic surfaced as
    * integer milli-units: `theta_ppm` truncated once, per-variant means
    * truncated once, no double ever enters. x and y are per-unit
    * pre/post metric values (already unit-aggregated — one row per
    * experimental unit, the caller's contract).
    *
    * Output per variant: (variant, n_units, mean_post_milli,
    * adj_mean_milli) — adj uses the SURFACED milli means and ppm θ, so
    * the arithmetic is reproducible from the output itself.
    *
    * Scale shape: one global 5-moment aggregate (broadcast, one row) +
    * one per-variant aggregate; shuffles carry variant cardinality.
    * NULL adjustment when var(x) = 0 (constant covariate). */
  def cupedAdjustMilli(units: DataFrame, variantCol: String,
                       xCol: String, yCol: String): DataFrame = {
    val d = "decimal(38,6)"
    val u = units.select(col(variantCol).as("__v"),
      col(xCol).cast(d).as("__x"), col(yCol).cast(d).as("__y"))
    val g = u.agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
      sum(col("__x")).as("__gsx"), sum(col("__y")).as("__gsy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("__n"), col("__gsx"),
        when(col("__n") * col("__sxx") === col("__gsx") * col("__gsx"),
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * (__n * __sxy - __gsx * __gsy))
              |div (__n * __sxx - __gsx * __gsx) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("theta_ppm"))
    u.groupBy(col("__v"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__nv"),
        sum(col("__x")).as("__sxv"), sum(col("__y")).as("__syv"))
      .crossJoin(broadcast(g))
      .select(col("__v").as(variantCol), col("__nv").cast("long").as("n_units"),
        expr("CAST((1000 * __syv) div __nv AS BIGINT)").as("mean_post_milli"),
        expr("""CAST((1000 * __syv) div __nv
                |- (theta_ppm * ((1000 * __sxv) div __nv - (1000 * __gsx) div __n))
                |div 1000000 AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("adj_mean_milli"))
  }

  /** BENFORD first-digit audit (Benford 1938; the fraud/IT-anomaly
    * screen): per group, the observed first-significant-digit
    * distribution of a POSITIVE INTEGER-DOMAIN value column against
    * the Benford expectation log10(1+1/d), with everything in exact
    * integer ppm. The Benford masses are pinned CONSTANTS of the
    * contract (rounded to ppm; they sum to exactly 10⁶), so both
    * engines compare against the identical expectation — no float log
    * anywhere. First digits extract TEXTUALLY (first char of the
    * decimal rendering) — exact for integers, engine-identical.
    *
    * Output: one row per (group, digit 1..9) — ABSENT digits emit
    * count 0 (their full expected mass is deviation, the strongest
    * signal): (group, digit, observed, share_ppm, benford_ppm,
    * dev_ppm = |share − benford|). Sum dev_ppm per group for the
    * total-variation headline; rows ≤ 9×|groups|.
    *
    * Contract: values < 1 are EXCLUDED (zero/negative have no Benford
    * digit; pre-scale continuous data to integers upstream). Groups
    * with no qualifying rows disappear.
    *
    * Scale shape: one (group, digit)-keyed partial groupBy (≤ 9 rows
    * per group after map-side combine) + a broadcast-size digit-grid
    * join — never row-bounded past the first aggregate. */
  def benfordDeviationPpm(df: DataFrame, groupCol: String,
                          valueCol: String): DataFrame = {
    val benfordPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L) // d=1..9, sums to exactly 10^6
    val base = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__v") >= 1)
      .select(col("__g"),
        substring(col("__v").cast("string"), 1, 1).cast("int").as("__d"))
    val counts = base.groupBy(col("__g"), col("__d"))
      .agg(count(lit(1)).as("observed"))
    val totals = base.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val grid = totals.select(col("__g"), col("__n"),
      explode(array((1 to 9).map { d =>
        struct(lit(d).as("__d"), lit(benfordPpm(d - 1)).as("benford_ppm"))
      }: _*)).as("__e"))
      .select(col("__g"), col("__n"), col("__e.__d").as("__d"),
        col("__e.benford_ppm").as("benford_ppm"))
    grid.join(counts, Seq("__g", "__d"), "left")
      .select(col("__g").as(groupCol), col("__d").as("digit"),
        coalesce(col("observed"), lit(0L)).as("observed"),
        col("__n").as("n"), col("benford_ppm"))
      .withColumn("share_ppm", expr("(1000000 * observed) div n"))
      .withColumn("dev_ppm", abs(col("share_ppm") - col("benford_ppm")))
      .select(col(groupCol), col("digit"), col("observed"), col("n"),
        col("share_ppm"), col("benford_ppm"), col("dev_ppm"))
  }

  /** CUSUM CHANGEPOINT estimate (Page 1954 / Pettitt-style argmax):
    * per group, the period where the cumulative deviation from the
    * group mean peaks — the single most likely level-shift point of
    * the series. Exactly integer: the classic S_t = Σ_{i≤t}(x_i − x̄)
    * is scaled by n (S'_t = n·prefix_t − t·total), which preserves the
    * argmax and keeps every term a product of longs — no division, no
    * floats. The changepoint is argmax_t |S'_t| over t ∈ [1, n−1]
    * (S'_n ≡ 0 by construction), ties → the EARLIEST period, a total
    * order both engines replay.
    *
    * Input contract: at most one row per (group, period), values
    * integer-domain. Groups need ≥ 2 periods (otherwise no candidate
    * t and the group is absent).
    *
    * Output per group: (group, n, cp_period — the last period of the
    * left segment, s_abs — |S'| at the peak as DECIMAL(38,0) cast
    * BIGINT; callers with n·Σ|v| beyond 2⁶³ keep the decimal form).
    *
    * Scale shape: one group-partitioned running-sum window (the
    * series-per-group model: group cardinality is the parallelism) +
    * one broadcast-joined per-group aggregate + one max_by partial
    * groupBy — shuffles carry series rows once. */
  def cusumChangepoint(obs: DataFrame, groupCol: String, periodCol: String,
                       valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__p"))
    val d = "decimal(38,0)"
    val base = obs.select(col(groupCol).as("__g"),
      col(periodCol).cast("long").as("__p"),
      col(valueCol).cast("long").as("__v"))
    val pre = base
      .withColumn("__t", row_number().over(w))
      .withColumn("__pre", sum(col("__v")).over(w))
    val tot = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__tot"))
    pre.join(broadcast(tot), Seq("__g"))
      .where(col("__t") < col("__n"))
      .withColumn("__s",
        (col("__n").cast(d) * col("__pre").cast(d)
          - col("__t").cast(d) * col("__tot").cast(d)))
      .groupBy(col("__g"))
      .agg(max(col("__n")).as("n"),
        max_by(col("__p"), struct(abs(col("__s")).as("a"),
          (-col("__t")).as("nt"))).as("cp_period"),
        max(abs(col("__s"))).as("__smax"))
      .select(col("__g").as(groupCol), col("n"),
        col("cp_period"), col("__smax").cast("long").as("s_abs"))
  }

  /** EQUI-DEPTH HISTOGRAM (the optimizer-statistics / data-catalog
    * bin form: equal COUNT per bin, not equal width): per group, bin
    * boundaries and counts such that bin b holds the rows whose rank
    * falls in ((b−1)·n/bins, b·n/bins]. Assignment is by VALUE — a
    * value's rows all land in the bin of their highest rank,
    * bin(v) = ⌈bins·cum(v)/n⌉ computed as the exact integer
    * (bins·cum + n − 1) div n — so ties never split across bins
    * (the histogram stays a function of the value distribution; with
    * heavy ties some bins end up larger and others absent, which is
    * the honest equi-depth answer, not an error).
    *
    * Output per (group, bin): (group, bin 1-based, lo, hi, cnt);
    * Σcnt = group size, bins with no resident values absent.
    *
    * Scale shape: the value HISTOGRAM shuffles (distinct values, not
    * rows, after the map-side partial), the running rank is one
    * group-partitioned window over those distinct-value rows, and the
    * per-group total broadcasts back — the Stats-wide
    * histogram-not-rows discipline. */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 100000,
      s"bins must be in [1, 100000], got $bins")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"))
    val hist = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val tot = hist.groupBy(col("__g")).agg(sum(col("__c")).as("__n"))
    hist.withColumn("__cum", sum(col("__c")).over(w))
      .join(broadcast(tot), Seq("__g"))
      .withColumn("bin",
        expr(s"($bins * __cum + __n - 1) div __n").cast("int"))
      .groupBy(col("__g"), col("bin"))
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
        sum(col("__c")).as("cnt"))
      .select(col("__g").as(groupCol), col("bin"), col("lo"), col("hi"),
        col("cnt"))
  }

  /** Two-sample KOLMOGOROV–SMIRNOV distance in exact integer ppm — the
    * numeric-distribution drift test (the continuous sibling of
    * [[categoryDrift]]): D = max_v |F_a(v) − F_b(v)|, computed as the
    * integer max of |n_b·cumA(v) − n_a·cumB(v)| over the union value
    * alphabet and surfaced as ks_ppm = 10⁶·max div (n_a·n_b), with
    * `at_value` the (earliest) value attaining the max — where the two
    * distributions pull apart hardest. No floats anywhere, so any
    * engine reproduces the statistic bit-for-bit; significance
    * thresholds (c(α)·√((n_a+n_b)/(n_a·n_b))) stay caller-side.
    *
    * Output: ONE row (n_a, n_b, ks_ppm, at_value); NULL ks when either
    * sample is empty (no distribution to compare).
    *
    * Scale shape: per-side value HISTOGRAMS (distinct values shuffle,
    * not rows), one full-outer value join, then
    * [[GlobalRank.globalRunningSum]]'s window-free distributed prefix
    * sum — twice, once per side's cumulative — and a 1-row aggregate.
    * Everything after the first groupBys is bounded by the value
    * alphabet. */
  def ksTwoSamplePpm(a: DataFrame, b: DataFrame,
                     valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    def hist(df: DataFrame, cnt: String) =
      df.select(col(valueCol).cast("long").as("__v"))
        .where(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as(cnt))
    val merged = hist(a, "__ca").join(hist(b, "__cb"), Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val cum = GlobalRank.globalRunningSum(
      GlobalRank.globalRunningSum(merged, Seq(col("__v")), "__ca", "__cumA"),
      Seq(col("__v")), "__cb", "__cumB")
    val tot = merged.agg(sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"))
    cum.crossJoin(broadcast(tot))
      .withColumn("__d",
        abs(col("__nb").cast(d38) * col("__cumA").cast(d38)
          - col("__na").cast(d38) * col("__cumB").cast(d38)))
      .groupBy(col("__na"), col("__nb"))
      .agg(max(col("__d")).as("__dmax"),
        max_by(col("__v"), struct(col("__d").as("d"),
          (-col("__v")).as("nv"))).as("at_value"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        when(col("__na") === 0 || col("__nb") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            "CAST((1000000 * __dmax) div (CAST(__na AS DECIMAL(38,0)) * __nb) AS BIGINT)"))
          .as("ks_ppm"),
        col("at_value"))
  }

  /** GINI COEFFICIENT in exact integer ppm — the inequality index over
    * a non-negative magnitude ("what share of token mass do the top
    * domains hold"), complementing [[concentrationPpm]]'s HHI (which
    * squares SHARES of categories; Gini ranks MAGNITUDES of units):
    * G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over the ascending sort.
    * Tie-safe histogram form: a value v with count c and
    * cumulative-before count C contributes x_v·(2·(c·C + c(c+1)/2))
    * to the rank-weighted sum regardless of intra-tie order — every
    * term an exact integer, G_ppm = 10⁶·(2T − (n+1)·S) div (n·S).
    *
    * Output per group: (group, n, total, gini_ppm) — 0 = perfectly
    * equal, →10⁶·(n−1)/n as one unit holds everything; NULL when the
    * group total is 0 (no mass to distribute). Negative values are
    * EXCLUDED (Gini over mixed-sign data is undefined); zeros count
    * (they widen inequality).
    *
    * Scale shape: value histogram (distinct magnitudes shuffle, not
    * rows) + one group-partitioned window over those histogram rows +
    * a per-group aggregate — the Stats-wide discipline. */
  def giniCoefficientPpm(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"))
    val hist = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__v") >= 0)
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__before", col("__cum") - col("__c"))
      // rank-weighted block term: x·2·(c·C + c(c+1)/2) = x·c·(2C + c + 1)
      .withColumn("__t", col("__v").cast(d38) * col("__c").cast(d38)
        * (lit(2).cast(d38) * col("__before") + col("__c") + 1))
      .groupBy(col("__g"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__v").cast(d38) * col("__c").cast(d38)).as("__s"),
        sum(col("__t")).as("__twice"))
      .select(col("__g").as(groupCol), col("__n").as("n"),
        col("__s").cast("long").as("total"),
        when(col("__s") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * (__twice - (__n + 1) * __s))
              |div (CAST(__n AS DECIMAL(38,0)) * __s) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("gini_ppm"))
  }

  /** PEARSON correlation strength per group, exact integer surface:
    * r² in ppm plus the sign of the covariance — together they carry
    * everything r does (r = sign·√(r²)) without either engine ever
    * touching a square root. The raw n-scaled moments (n·Σxy − ΣxΣy
    * etc.) grow as n²·x·y and overflow DECIMAL(38,0) around corpus
    * scale, so each second moment is first reduced to MICRO-units by
    * one floor division by n² — cxy = ⌊10⁶·cov⌋, vx = ⌊10⁶·var(x)⌋ —
    * bounding every later product by (10⁶·σxσy)², independent of n.
    * That floor makes r2_ppm a deterministic ~ppm-precision estimator
    * (exact-integer-defined, engine-independent), not the exact
    * rational, which is the repo-wide trade (cf. [[cupedAdjustMilli]]).
    *
    * Output: (group, n, sign, r2_ppm) — sign ∈ {−1,0,1} of the
    * covariance, r2_ppm NULL when either variance floors to 0
    * (constant column, or spread below the micro grid). NULL x or y
    * rows are excluded pairwise.
    *
    * Scale shape: ONE map-side-partial groupBy carrying six sums —
    * the single-pass parallel moment formula; nothing downstream
    * exceeds one row per group. */
  def pearsonR2Ppm(df: DataFrame, groupCol: String,
                   xCol: String, yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val mom = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(xCol).cast("long").cast(d38).as("__x"),
        col(yCol).cast("long").cast(d38).as("__y"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast(d38).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    mom
      .withColumn("__cxy",
        expr("(1000000 * (__n * __sxy - __sx * __sy)) div (__n * __n)"))
      .withColumn("__vx",
        expr("(1000000 * (__n * __sxx - __sx * __sx)) div (__n * __n)"))
      .withColumn("__vy",
        expr("(1000000 * (__n * __syy - __sy * __sy)) div (__n * __n)"))
      .select(col("__g").as(groupCol),
        col("__n").cast("long").as("n"),
        signum(col("__cxy")).cast("long").as("sign"),
        when(col("__vx") === 0 || col("__vy") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * CAST(__cxy AS DECIMAL(38,0)) * __cxy)
              |div (CAST(__vx AS DECIMAL(38,0)) * __vy) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("r2_ppm"))
  }

  /** MANN–KENDALL trend test per group: S = Σ_{i<j} sign(v_j − v_i)
    * over the series in `orderCol` order, plus Kendall's τ_a =
    * S / (n(n−1)/2) in ppm — the non-parametric "is this metric
    * drifting" screen (monotone-trend sensitive, distribution-free,
    * tie-tolerant: tied values contribute 0). Pure sign counting —
    * exact integers end to end.
    *
    * Input contract: ONE row per (group, order) — run the series
    * aggregation (daily counts, hourly sums) first; duplicate order
    * keys would silently double-count pairs.
    *
    * Output: (group, n_pairs, s, tau_a_ppm); groups with a single
    * period have no pairs and are absent.
    *
    * Scale shape: a group-keyed self-join producing the i<j pairs —
    * O(periods²) per group, bounded by the SERIES length (periods,
    * e.g. days), never the row count of the underlying data; the
    * repo's pair-frame precedent is the same bound in
    * [[cusumChangepoint]]'s prefix scan. One groupBy finishes. */
  def mannKendall(df: DataFrame, groupCol: String, orderCol: String,
                  valueCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("__g"),
      col(orderCol).cast("long").as("__o"),
      col(valueCol).cast("long").as("__v"))
    val b = a.select(col("__g").as("__g2"), col("__o").as("__o2"),
      col("__v").as("__v2"))
    a.join(b, col("__g") <=> col("__g2") && col("__o") < col("__o2"))
      .select(col("__g"),
        when(col("__v2") > col("__v"), 1L)
          .when(col("__v2") < col("__v"), -1L)
          .otherwise(0L).as("__sgn"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__sgn")).as("s"))
      .select(col("__g").as(groupCol), col("n_pairs"), col("s"),
        expr("1000000 * s div n_pairs").as("tau_a_ppm"))
  }

  /** THEIL–SEN trend estimator per group: the median of all pairwise
    * slopes (v_j − v_i)/(o_j − o_i), i<j — the robust (29.3%
    * breakdown) alternative to [[groupTrend]]'s least-squares slope,
    * immune to the outlier days OLS chases. Each slope is floored to
    * ppm units (10⁶·Δv div Δo — truncation toward zero in both
    * engines), then the median is the repo's exact type-1 lower
    * quantile over the slope histogram.
    *
    * Input contract: one row per (group, order), as [[mannKendall]].
    *
    * Output: (group, n_pairs, slope_ppm).
    *
    * Scale shape: the same bounded pair frame as [[mannKendall]]
    * (periods², not rows), then [[exactQuantilesByGroup]]'s histogram
    * discipline — distinct slopes shuffle, not pairs. */
  def theilSenSlopePpm(df: DataFrame, groupCol: String, orderCol: String,
                       valueCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("__g"),
      col(orderCol).cast("long").as("__o"),
      col(valueCol).cast("long").as("__v"))
    val b = a.select(col("__g").as("__g2"), col("__o").as("__o2"),
      col("__v").as("__v2"))
    val slopes = a
      .join(b, col("__g") <=> col("__g2") && col("__o") < col("__o2"))
      // the o==o guard is unreachable through the strict join condition,
      // but the quantile stage's isNotNull filter pushes down past it and
      // can evaluate this projection on equal-order pairs first — under
      // ANSI an unguarded div then throws DIVIDE_BY_ZERO
      .select(col("__g"),
        expr("""CASE WHEN __o2 = __o THEN NULL
               |ELSE (1000000 * (__v2 - __v)) div (__o2 - __o) END"""
          .stripMargin.replace("\n", " ")).as("__slope"))
    val med = exactQuantilesByGroup(slopes, "__g", "__slope",
      Seq(("med", 500)))
    val n = slopes.groupBy(col("__g").as("__gn"))
      .agg(count(lit(1)).as("n_pairs"))
    med.join(n, col("__g") <=> col("__gn"))
      .select(col("__g").as(groupCol), col("n_pairs"),
        col("q").as("slope_ppm"))
  }

  /** TOTAL-VARIATION distance between two categorical distributions,
    * exact integer ppm: TV = ½·Σ_k |p_k − q_k| — the single-number
    * drift scalar over a CATEGORICAL column ("how much did the lang
    * mix move"), completing the drift family next to
    * [[categoryDrift]]'s per-key share report (same inputs, per-key
    * rows) and [[ksTwoSamplePpm]] (numeric CDFs). Cross-multiplied to
    * the common denominator n_a·n_b so no share is ever rounded
    * before the final division: TV_ppm = 10⁶·Σ|c_a·n_b − c_b·n_a|
    * div (2·n_a·n_b).
    *
    * Output: one row (n_a, n_b, n_keys, tv_ppm) — 0 = identical
    * mixes, 10⁶ = disjoint supports; NULL if either side is empty.
    * NULL keys count as their own category (a NULL-rate shift IS
    * drift).
    *
    * Scale shape: two map-side-partial key counts, a key-sized
    * full-outer join, a broadcast 1-row total, one global aggregate —
    * rows never cross a shuffle. */
  def totalVariationPpm(a: DataFrame, b: DataFrame,
                        keyCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    def counted(df: DataFrame, as: String) =
      df.groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as(as))
    val merged = counted(a, "__ca").join(counted(b, "__cb"),
        Seq("__k"), "full_outer")
      .select(coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val tot = merged.agg(sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"))
    merged.crossJoin(broadcast(tot))
      .withColumn("__d",
        abs(col("__ca").cast(d38) * col("__nb")
          - col("__cb").cast(d38) * col("__na")))
      .groupBy(col("__na"), col("__nb"))
      .agg(count(lit(1)).as("n_keys"), sum(col("__d")).as("__sd"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("n_keys"),
        when(col("__na") === 0 || col("__nb") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * __sd) div
              |(2 * CAST(__na AS DECIMAL(38,0)) * __nb) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("tv_ppm"))
  }

  /** Poisson(1) inverse-CDF thresholds at 2⁶⁰ scale: a uniform 60-bit
    * hash u maps to the bootstrap weight k = |{t : u ≥ t}| — the
    * multinomial resample's standard Poissonization. Pinned integer
    * constants (⌊2⁶⁰·P(X≤k)⌋, k = 0..8; weights cap at 9, beyond which
    * P < 10⁻⁹), so both engines draw the identical "random" weight from
    * the identical md5 bits. */
  private[graft] val poissonThresholds: Seq[Long] = Seq(
    424136118829305329L, 848272237658610659L, 1060340297073263324L,
    1131029650211480879L, 1148701988496035267L, 1152236456152946145L,
    1152825534095764625L, 1152909688087595836L, 1152920207336574738L)

  /** 60-bit md5-derived uniform hash of `s` — the repo's cross-engine
    * determinism primitive (TextAnalysis.md5Hash60, inlined here to
    * keep ops free of the llm package). The GATE hash: DuckDB computes
    * the identical bits. */
  private[graft] def md5Hash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** 60-bit xxhash64-derived uniform hash — the PRODUCTION default for
    * the resampling operators (codegen'd, ~10× cheaper than md5 per
    * draw). 2⁶⁴ is an exact multiple of 2⁶⁰, so the pmod fold keeps
    * the draw uniform. */
  private[graft] def xx60(s: Column): Column =
    pmod(xxhash64(s), lit(1L << 60))

  /** POISSON-BOOTSTRAP confidence interval for per-group means, fully
    * deterministic and engine-exact: every (row, replicate) pair draws
    * a Poisson(1) weight from hashFn(id:rep) against pinned 2⁶⁰-scale
    * CDF thresholds (xxhash64-folded production default; pass
    * [[md5Hash60]] for oracle-checked gates) — the standard
    * large-scale bootstrap (per-row
    * independent weights ≈ multinomial resampling; Chamandy et al.'s
    * "Poisson bootstrap"), the only form that needs no global n before
    * sampling. Replicate means are exact milli-integers; the CI bounds
    * are the repo's type-1 lower quantiles over the `reps` replicate
    * means at `loPm`/`hiPm` per-mille.
    *
    * Output: (group, n, mean_milli, n_reps, lo_milli, hi_milli) —
    * mean_milli the point estimate on the real data; replicates that
    * draw total weight 0 are absent from the quantile pool (n_reps
    * reports the survivors).
    *
    * Scale shape: a map-side ×reps explode feeding ONE map-side-partial
    * groupBy on (group, rep) — the shuffle carries groups×reps rows,
    * never data rows; the quantile stage runs over groups×reps
    * replicate means. Cost is reps× the scan, the honest price of a
    * bootstrap; reps = 40 resolves 25‰/975‰ exactly. */
  def bootstrapMeanCiMilli(df: DataFrame, groupCol: String,
                           idCol: String, valueCol: String,
                           reps: Int = 40, loPm: Int = 25,
                           hiPm: Int = 975,
                           hashFn: Column => Column = xx60): DataFrame = {
    require(reps >= 4 && reps <= 1000, s"reps in [4,1000], got $reps")
    val d38 = "decimal(38,0)"
    // the reps-explode + per-row hash is the hot map loop — fan a
    // single-file scan out to all cores (no-op on real layouts)
    val base = graft.ops.ScanFanout(df).where(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(idCol).cast("string").as("__id"),
        col(valueCol).cast("long").as("__v"))
    val point = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        expr(s"CAST((1000 * sum(CAST(__v AS $d38))) div count(1) AS BIGINT)")
          .as("mean_milli"))
    val u = hashFn(concat(col("__id"), lit(":"),
      col("__r").cast("string")))
    val wt = poissonThresholds.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (t, k)) =>
        acc.when(col("__u") < t, k.toLong)
      }.otherwise(poissonThresholds.size.toLong)
    val means = base
      .withColumn("__r", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("__u", u)
      .withColumn("__w", wt)
      .groupBy(col("__g"), col("__r"))
      .agg(sum(col("__w")).as("__cnt"),
        sum(col("__w").cast(d38) * col("__v")).as("__sv"))
      .where(col("__cnt") > 0)
      .select(col("__g"),
        expr("CAST((1000 * __sv) div __cnt AS BIGINT)").as("__m"))
    val ci = exactQuantilesByGroup(means, "__g", "__m",
        Seq(("lo", loPm), ("hi", hiPm)))
      .groupBy(col("__g").as("__gq"))
      .agg(max(when(col("label") === "lo", col("q"))).as("lo_milli"),
        max(when(col("label") === "hi", col("q"))).as("hi_milli"))
    val nReps = means.groupBy(col("__g").as("__gn"))
      .agg(count(lit(1)).as("n_reps"))
    point.join(nReps, col("__g") <=> col("__gn"))
      .join(ci, col("__g") <=> col("__gq"))
      .select(col("__g").as(groupCol), col("n"), col("mean_milli"),
        col("n_reps"), col("lo_milli"), col("hi_milli"))
  }

  /** PERMUTATION TEST for a two-variant mean difference, deterministic
    * and engine-exact: the observed |Δmean| (milli-units, floors on
    * each side) against `perms` label reshuffles drawn from
    * hashFn(id:p) parity (xxhash64 fold by default, [[md5Hash60]] at
    * the gate) — Fisher's exact-logic significance test with zero
    * distributional assumptions, the A/B readout to trust when CUPED's
    * normality lean is suspect. p = (1 + #{perm ≥ observed}) /
    * (perms + 1), the add-one form that never reports an impossible 0.
    *
    * Input contract: one row per experimental UNIT (pre-aggregate
    * per-user metrics first — permuting raw events would break the
    * independence the test needs). `variantCol`: 0 = control, anything
    * else = treatment.
    *
    * Output: one row (n_units, diff_milli, n_perms, p_value_pm);
    * diff_milli NULL (and every permutation non-counting) if either
    * observed side is empty. A permutation that lands every unit on
    * one side yields a NULL replicate diff, which counts toward
    * n_perms but never toward the ≥ tally — both engines agree on the
    * NULL-comparison semantics by construction.
    *
    * Scale shape: ×perms map-side explode into ONE (rep, side) partial
    * groupBy — the shuffle carries 2·perms rows; the observed pass is
    * one more 1-row aggregate. Cost is perms× the unit scan. */
  def permutationTestMilli(df: DataFrame, variantCol: String,
                           idCol: String, valueCol: String,
                           perms: Int = 39,
                           hashFn: Column => Column = xx60): DataFrame = {
    require(perms >= 3 && perms <= 999, s"perms in [3,999], got $perms")
    val d38 = "decimal(38,0)"
    val base = df.where(col(valueCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        when(col(variantCol) === 0, 0L).otherwise(1L).as("__var"),
        col(valueCol).cast("long").as("__v"))
    def diffMilli(g: org.apache.spark.sql.RelationalGroupedDataset,
                  varCol: String): DataFrame = {
      val side = (v: Int, c: String) =>
        sum(when(col(varCol) === v, lit(1L)).otherwise(0L)).as(s"__c$c")
      val sv = (v: Int, c: String) =>
        sum(when(col(varCol) === v, col("__v").cast(d38))
          .otherwise(lit(0).cast(d38))).as(s"__s$c")
      g.agg(count(lit(1)).as("__n"), side(1, "t"), sv(1, "t"),
          side(0, "c"), sv(0, "c"))
        .withColumn("__d",
          when(col("__ct") === 0 || col("__cc") === 0,
            lit(null).cast("long"))
            .otherwise(abs(expr("(1000 * __st) div __ct")
              - expr("(1000 * __sc) div __cc"))))
    }
    val obs = diffMilli(base.groupBy(), "__var")
      .select(col("__n").as("__nu"), col("__d").as("__obs"))
    val permed = base
      .withColumn("__p", explode(sequence(lit(1), lit(perms))))
      .withColumn("__pvar", hashFn(concat(col("__id"), lit(":"),
        col("__p").cast("string"))) % 2)
    val permDiffs = diffMilli(permed.groupBy(col("__p")), "__pvar")
    permDiffs.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("__np"),
        sum(when(col("__d") >= col("__obs"), 1L).otherwise(0L)).as("__ge"),
        first(col("__nu")).as("n_units"),
        first(col("__obs")).as("diff_milli"))
      .select(col("n_units"), col("diff_milli"),
        col("__np").as("n_perms"),
        expr("(1000 * (1 + __ge)) div (__np + 1)").as("p_value_pm"))
  }

  /** LORENZ CURVE POINTS per group, exact integer ppm: for each of
    * `points` equal unit-quantiles (deciles by default), the share of
    * total mass held by the bottom ⌈d·n/points⌉ units — the curve the
    * [[giniCoefficientPpm]] scalar integrates, read directly ("the
    * bottom 80% of customers hold 31% of spend"). Tie-exact: a rank
    * cut inside a tie block takes the block's value pro-rata by unit
    * count, so intra-tie order never matters. Non-negative values
    * only, the Gini contract.
    *
    * Output: (group, decile ∈ [1, points], units, share_ppm) — the
    * last point is exactly 10⁶; NULL share when the group mass is 0.
    *
    * Scale shape: value histogram (distinct magnitudes shuffle, not
    * rows), one group window over histogram rows for the twin
    * count/mass running sums, then a broadcast join against the
    * `points`-row probe frame picking each rank's covering block. */
  def lorenzPoints(df: DataFrame, groupCol: String, valueCol: String,
                   points: Int = 10): DataFrame = {
    require(points >= 2 && points <= 1000,
      s"points must be in [2, 1000], got $points")
    import df.sparkSession.implicits._
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v"))
    val hist = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__v") >= 0)
      .groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val cum = hist
      .withColumn("__cumc", sum(col("__c")).over(w))
      .withColumn("__cumm",
        sum(col("__v").cast(d38) * col("__c")).over(w))
    val tot = hist.groupBy(col("__g").as("__gt"))
      .agg(sum(col("__c")).as("__n"),
        sum(col("__v").cast(d38) * col("__c")).as("__m"))
    val probe = broadcast((1 to points).map(_.toLong).toDF("decile"))
    val rank = expr(s"(decile * __n + ${points - 1}L) div ${points}L")
    cum.join(tot, col("__g") <=> col("__gt"))
      .join(probe,
        col("__cumc") - col("__c") < rank && rank <= col("__cumc"))
      .select(col("__g").as(groupCol), col("decile"),
        col("__n").as("units"),
        when(col("__m") === 0, lit(null).cast("long"))
          .otherwise(expr(
            s"""CAST((1000000 * (__cumm - CAST(__v AS $d38) * __c
               |+ ((decile * __n + ${points - 1}L) div ${points}L
               |- (__cumc - __c)) * __v)) div __m AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("share_ppm"))
  }

  /** ABC (Pareto) CLASSIFICATION: rank items by non-negative mass
    * descending and label the prefix holding the first `aPm`‰ of total
    * mass A, through `bPm`‰ B, the tail C — the inventory/attention
    * triage ("A-parts get daily counts, C-parts yearly"). The item
    * that CROSSES a threshold stays in the upper class (its
    * before-cumulative is compared, the standard convention).
    * (mass DESC, id ASC) is a total order, so ties classify
    * identically in both engines.
    *
    * Output: (id, mass, cum_mass, abc_class).
    *
    * Scale shape: the windowless [[GlobalRank.globalRunningSum]] prefix
    * sum over (−mass, id) order + a broadcast 1-row total — the item
    * list is already an aggregate (parts, domains), never raw rows. */
  def abcClasses(df: DataFrame, idCol: String, valueCol: String,
                 aPm: Int = 800, bPm: Int = 950): DataFrame = {
    require(aPm >= 1 && aPm < bPm && bPm < 1000,
      s"need 1 <= aPm < bPm < 1000, got ($aPm, $bPm)")
    val d38 = "decimal(38,0)"
    val items = df.select(col(idCol).as("__id"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__v") >= 0)
    val cum = GlobalRank.globalRunningSum(items,
      Seq(col("__v").desc, col("__id").asc), "__v", "__cum")
    val tot = items.agg(sum(col("__v").cast(d38)).as("__t"))
    cum.crossJoin(broadcast(tot))
      .select(col("__id").as(idCol), col("__v").as("mass"),
        col("__cum").as("cum_mass"),
        when(lit(1000).cast(d38) * (col("__cum") - col("__v"))
            < lit(aPm).cast(d38) * col("__t"), "A")
          .when(lit(1000).cast(d38) * (col("__cum") - col("__v"))
            < lit(bPm).cast(d38) * col("__t"), "B")
          .otherwise("C").as("abc_class"))
  }

  /** DISPERSION INDEX (variance-to-mean ratio) per group in exact
    * milli-units: D = var/mean = (n·Σv² − (Σv)²) div (n·Σv) ×1000 —
    * the Poisson-ness screen over count series (D ≈ 1000 ⇒ Poisson
    * arrivals; ≫ ⇒ bursty/overdispersed, the retry-storm signature;
    * ≪ ⇒ regularized/rate-limited). One pass, exact integers.
    *
    * Output: (group, n, mean_milli, dispersion_milli) — NULL when the
    * group mean is 0 (undefined ratio). Intended for COUNT series
    * (non-negative); negative values are excluded.
    *
    * Scale shape: one map-side-partial groupBy carrying (n, Σv, Σv²). */
  def dispersionIndexMilli(df: DataFrame, groupCol: String,
                           valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").cast(d38).as("__v"))
      .where(col("__v") >= 0)
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast(d38).as("__n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__ss"))
      .select(col("__g").as(groupCol), col("__n").cast("long").as("n"),
        expr("CAST((1000 * __s) div __n AS BIGINT)").as("mean_milli"),
        when(col("__s") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((1000 * (__n * __ss - __s * __s)) div (__n * __s) AS BIGINT)"))
          .as("dispersion_milli"))
  }

  /** SPEARMAN rank correlation strength per group — [[pearsonR2Ppm]]
    * applied to DOUBLED midranks (2·C + c + 1 for a value with count c
    * and before-count C: integer, tie-exact, intra-tie order
    * irrelevant — the [[aucPpm]] midrank identity), so monotone but
    * non-linear relationships score where Pearson's raw moments miss
    * them. Pairwise-complete: rows missing either side are dropped
    * BEFORE ranking (the standard convention).
    *
    * Output: (group, n, sign, r2_ppm) — ρ = sign·√(r²/10⁶), no sqrt
    * in either engine.
    *
    * Range: midranks grow with n, so the n-scaled rank moments pass
    * DECIMAL(38,0) to ~10⁹ rows per group — past that, pre-bucket the
    * values (ranks over a coarser histogram), the repo's documented
    * magnitude trade.
    *
    * Scale shape: two value histograms + group-partitioned running
    * sums over DISTINCT values, two value-keyed joins back to rows,
    * then the one-pass moment aggregate. */
  def spearmanR2Ppm(df: DataFrame, groupCol: String,
                    xCol: String, yCol: String): DataFrame = {
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol).as("__g"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    def midranks(vCol: String, out: String): DataFrame = {
      base.groupBy(col("__g").as("__gm"), col(vCol).as("__vm"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__gm")).orderBy(col("__vm"))))
        .select(col("__gm"), col("__vm"),
          (lit(2L) * (col("__cum") - col("__c")) + col("__c") + 1)
            .as(out))
    }
    val ranked = base
      .join(midranks("__x", "__mrx"),
        col("__g") <=> col("__gm") && col("__x") === col("__vm"))
      .drop("__gm", "__vm")
      .join(midranks("__y", "__mry"),
        col("__g") <=> col("__gm") && col("__y") === col("__vm"))
      .select(col("__g").as("g"), col("__mrx"), col("__mry"))
    pearsonR2Ppm(ranked, "g", "__mrx", "__mry")
      .withColumnRenamed("g", groupCol)
  }

  /** CRAMÉR'S V² in exact integer ppm — the k×m chi-square normalized
    * to [0, 1] effect size: V² = χ²/(N·(min(k,m)−1)), the
    * sample-size-free "how strongly are these two categoricals
    * associated" number ([[chiSquareKxMMilli]] answers "is there any
    * association"; this answers "how much"). Same exact-integer cell
    * arithmetic; one more division at the end.
    *
    * Output: one row (n, dof, chi2_milli, v2_ppm) — v2_ppm NULL when
    * either margin is constant (min(k,m) = 1: no association to
    * measure).
    *
    * Scale shape: identical to [[chiSquareKxMMilli]] — the shuffle
    * carries the contingency CELLS (alphabet², not rows); margins and
    * the 1-row total broadcast onto the grid. */
  def cramersV2Ppm(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val t = df.select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
    val cells = t.groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__o"))
    val ra = cells.groupBy(col("__a")).agg(sum(col("__o")).as("__r"))
    val cb = cells.groupBy(col("__b")).agg(sum(col("__o")).as("__c"))
    val nF = cells.agg(sum(col("__o")).as("__n"))
    val grid = ra.crossJoin(broadcast(cb)).crossJoin(broadcast(nF))
      .join(cells, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    grid.agg(
        max(col("__n")).as("__nn"),
        countDistinct(col("__a")).as("__ka"),
        countDistinct(col("__b")).as("__kb"),
        sum(expr(
          s"""(1000 * (CAST(__o AS $d38) * __n - CAST(__r AS $d38) * __c) *
             |(CAST(__o AS $d38) * __n - CAST(__r AS $d38) * __c))
             |div (CAST(__n AS $d38) * __r * __c)"""
            .stripMargin.replace("\n", " "))).as("__chi"))
      .select(col("__nn").as("n"),
        ((col("__ka") - 1) * (col("__kb") - 1)).as("dof"),
        col("__chi").cast("long").as("chi2_milli"),
        when(least(col("__ka"), col("__kb")) <= 1, lit(null).cast("long"))
          .otherwise(expr(
            """(1000 * __chi) div
              |(CAST(__nn AS DECIMAL(38,0)) * (least(__ka, __kb) - 1))"""
              .stripMargin.replace("\n", " "))).as("v2_ppm"))
  }

  /** ONE-WAY ANOVA F statistic in exact micro-units: does the group
    * factor explain any of the variance — F = (SSB/(k−1)) /
    * (SSW/(N−k)) over integer values, with both sums of squares first
    * reduced to MILLI-units by one floor division (Σ(1000·s_g²) div
    * n_g — the [[pearsonR2Ppm]] magnitude-bounding trade), then the
    * F ratio one exact integer division. The k-group generalization
    * of the 2×2 chi-square's "is there any effect at all" screen, on
    * means instead of proportions.
    *
    * Output: one row (k, n, ssb_milli, ssw_milli, f_micro) — f_micro
    * NULL when degenerate (single group, no residual df, or zero
    * within-variance).
    *
    * Range: the milli-SS terms are ~1000·n·value² and surface as
    * BIGINT — exact to ~10⁷ rows/group at cent-scale values; past
    * that pre-scale the metric (cents→dollars), the
    * [[chiSquare2x2Milli]] pre-aggregation precedent.
    *
    * Scale shape: ONE map-side-partial groupBy carrying (n, Σv, Σv²)
    * per group, then a k-row aggregate. Nothing else touches data. */
  def anovaFMicro(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val pg = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(valueCol).cast("long").cast(d38).as("__v"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast(d38).as("__n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__ss"))
    pg.agg(count(lit(1)).as("__k"), sum(col("__n")).as("__nn"),
        sum(col("__s")).as("__st"), sum(col("__ss")).as("__sst"),
        sum(expr("(1000 * __s * __s) div __n")).as("__a"))
      .select(col("__k").cast("long").as("k"),
        col("__nn").cast("long").as("n"),
        expr("CAST(__a - (1000 * __st * __st) div __nn AS BIGINT)")
          .as("ssb_milli"),
        expr("CAST(1000 * __sst - __a AS BIGINT)").as("ssw_milli"),
        when(col("__k") <= 1 || col("__nn") <= col("__k") ||
            expr("1000 * __sst - __a") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * (__a - (1000 * __st * __st) div __nn)
              |* (__nn - __k)) div ((1000 * __sst - __a) * (__k - 1))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("f_micro"))
  }

  /** MAD (median absolute deviation) outlier report per group: the
    * robust-scale sibling of [[robustOutlierReport]]'s IQR fences.
    * MAD has the maximum 50% breakdown point — half the data can be
    * corrupted before the estimate moves, where the IQR breaks at 25%.
    * A row is flagged when 1000·|v − med| > kMilli·mad (the classic
    * "3 MADs" screen at kMilli = 3000), cross-multiplied so no
    * division ever happens. All arithmetic exact integer via the
    * type-1 quantile rule.
    *
    * Degeneracy (documented, inherent to MAD): when over half a
    * group's values are identical, mad = 0 and EVERY deviating row
    * flags — the caller's signal that the group is essentially
    * constant, not an error.
    *
    * Output: (group, n, med, mad, n_outliers).
    *
    * Scale shape: two [[exactQuantilesByGroup]] passes (value
    * histograms — distinct values shuffle, not rows) + one final
    * group aggregate; the per-group (med, mad) tables are
    * group-bounded broadcasts. */
  def madReport(df: DataFrame, groupCol: String, valueCol: String,
                kMilli: Long = 3000): DataFrame = {
    require(kMilli > 0, s"kMilli must be positive, got $kMilli")
    val meds = exactQuantilesByGroup(df, groupCol, valueCol,
        Seq(("med", 500)))
      .select(col(groupCol), col("q").as("__med"))
    val withMed = df.where(col(valueCol).isNotNull)
      .join(broadcast(meds), groupCol)
      .withColumn("__dev", abs(col(valueCol).cast("long") - col("__med")))
    val mads = exactQuantilesByGroup(withMed, groupCol, "__dev",
        Seq(("mad", 500)))
      .select(col(groupCol), col("q").as("__mad"))
    withMed.join(broadcast(mads), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("__med")).as("med"),
        first(col("__mad")).as("mad"),
        sum(when(col("__dev") * 1000 > col("__mad") * kMilli, 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** CROSS-correlation function between two series of one group at
    * lags 0..maxLag: r²·sign of (x_t, y_{t+lag}) pairs in exact ppm —
    * "does x lead y, and by how much?" (marketing spend → purchases,
    * deploys → errors). Lag 0 is [[pearsonR2Ppm]] of the aligned
    * series; the argmax lag over the output is the estimated lead
    * time. Same micro-moment arithmetic as Pearson — each second
    * moment floor-reduced by n² before any product, so nothing grows
    * with series length.
    *
    * Input contract: ONE row per (group, time) carrying both series
    * values (run the period aggregation first); times must be
    * integers on the period grid (lag l pairs t with t+l exactly).
    *
    * Output: (group, lag, n, sign, r2_ppm) — n = pairs at that lag;
    * lags with < 2 pairs or a constant side yield NULL r2.
    *
    * Scale shape: the x side replicates maxLag+1 ways (explode of a
    * literal lag array — series rows, not raw data) and equi-joins
    * y on (group, shifted time): ONE join, one (group, lag) partial
    * groupBy. Bounded by periods·lags, never data rows. */
  def crossCorrPpm(df: DataFrame, groupCol: String, timeCol: String,
                   xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0 && maxLag <= 1000,
      s"maxLag must be in [0, 1000], got $maxLag")
    val d38 = "decimal(38,0)"
    val base = df.select(col(groupCol).as("__g"),
      col(timeCol).cast("long").as("__t"),
      col(xCol).cast("long").as("__xv"),
      col(yCol).cast("long").as("__yv"))
    val lags = array((0 to maxLag).map(l => lit(l.toLong)): _*)
    val xs = base.where(col("__xv").isNotNull)
      .select(col("__g"), col("__t"), col("__xv"),
        explode(lags).as("lag"))
      .select(col("__g"), (col("__t") + col("lag")).as("__t"),
        col("lag"), col("__xv"))
    val ys = base.where(col("__yv").isNotNull)
      .select(col("__g"), col("__t"), col("__yv"))
    val mom = xs.join(ys, Seq("__g", "__t"))
      .select(col("__g"), col("lag"),
        col("__xv").cast(d38).as("__x"), col("__yv").cast(d38).as("__y"))
      .groupBy(col("__g"), col("lag"))
      .agg(count(lit(1)).cast(d38).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    mom
      .withColumn("__cxy",
        expr("(1000000 * (__n * __sxy - __sx * __sy)) div (__n * __n)"))
      .withColumn("__vx",
        expr("(1000000 * (__n * __sxx - __sx * __sx)) div (__n * __n)"))
      .withColumn("__vy",
        expr("(1000000 * (__n * __syy - __sy * __sy)) div (__n * __n)"))
      .select(col("__g").as(groupCol), col("lag"),
        col("__n").cast("long").as("n"),
        signum(col("__cxy")).cast("long").as("sign"),
        when(col("__n") < 2 || col("__vx") === 0 || col("__vy") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * CAST(__cxy AS DECIMAL(38,0)) * __cxy)
              |div (CAST(__vx AS DECIMAL(38,0)) * __vy) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("r2_ppm"))
  }

  /** CORRELATION MATRIX over long-format metrics: for every unordered
    * metric pair (a < b), [[pearsonR2Ppm]]'s exact r²·sign over the
    * keys where BOTH metrics are present (pairwise-complete — the
    * standard matrix semantics) — the feature-redundancy screen run
    * before model training or metric pruning. Input is
    * (key, name, value) long format: one row per metric observation,
    * `keyCol` the alignment axis (day, user, doc).
    *
    * Output: (col_a, col_b, n, sign, r2_ppm) — one row per pair with
    * ≥ 1 aligned key; constant sides yield NULL r².
    *
    * Scale shape: ONE key-keyed self-join (name_a < name_b — series
    * rows, bounded by keys×metrics, never raw data) + one
    * (a, b) partial moment groupBy. The micro-moment reduction keeps
    * every product in DECIMAL(38,0) regardless of series length. */
  def correlationMatrixPpm(df: DataFrame, keyCol: String,
                           nameCol: String, valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df
      .where(col(nameCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(nameCol).cast("string").as("__n"),
        col(valueCol).cast("long").as("__v"))
    val left = base.select(col("__k"), col("__n").as("col_a"),
      col("__v").as("__xv"))
    val right = base.select(col("__k"), col("__n").as("col_b"),
      col("__v").as("__yv"))
    val mom = left.join(right, Seq("__k"))
      .where(col("col_a") < col("col_b"))
      .select(col("col_a"), col("col_b"),
        col("__xv").cast(d38).as("__x"), col("__yv").cast(d38).as("__y"))
      .groupBy(col("col_a"), col("col_b"))
      .agg(count(lit(1)).cast(d38).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    mom
      .withColumn("__cxy",
        expr("(1000000 * (__n * __sxy - __sx * __sy)) div (__n * __n)"))
      .withColumn("__vx",
        expr("(1000000 * (__n * __sxx - __sx * __sx)) div (__n * __n)"))
      .withColumn("__vy",
        expr("(1000000 * (__n * __syy - __sy * __sy)) div (__n * __n)"))
      .select(col("col_a"), col("col_b"),
        col("__n").cast("long").as("n"),
        signum(col("__cxy")).cast("long").as("sign"),
        when(col("__vx") === 0 || col("__vy") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * CAST(__cxy AS DECIMAL(38,0)) * __cxy)
              |div (CAST(__vx AS DECIMAL(38,0)) * __vy) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("r2_ppm"))
  }

  /** ISOTONIC REGRESSION (PAVA) of a binary label on an integer
    * score — the exact calibration map ("score s ⇒ observed rate r,
    * non-decreasing in s") that [[reliabilityBuckets]] only
    * approximates with fixed bins: pool-adjacent-violators over the
    * score histogram, all pooling decisions by exact cross-
    * multiplication (never a float compare), surfaced rate = the one
    * terminal double division s/w (correctly rounded IEEE — the
    * engine-stable operation; the pooled rational itself never
    * rounds). Equals the classic minimax characterization
    * fit(k) = max_{i≤k} min_{j≥k} avg(i..j) — the SQL-expressible
    * form the oracle replays.
    *
    * Output: (score, n, rate) — one row per distinct score, rate
    * non-decreasing.
    *
    * Scale shape: ONE (score, label) histogram groupBy — distinct
    * scores shuffle, never rows — then driver PAVA over ≤ maxScores
    * histogram rows (the guarded-driver-step precedent: union-find,
    * Jacobi; PAVA is O(m) and a calibration axis is ~10³ buckets by
    * construction). Loud failure past the guard: pre-bucket the
    * score, don't raise the cap. */
  def isotonicFit(df: DataFrame, scoreCol: String, labelCol: String,
                  maxScores: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).as("w"),
        sum(col(labelCol).cast("long")).as("sy"))
      .orderBy(col("s"))
      .as[(Long, Long, Long)].collect()
    require(hist.length <= maxScores,
      s"${hist.length} distinct scores exceeds maxScores=$maxScores — " +
        "pre-bucket the score axis (isotonicFitBucketed is the bounded" +
        "-by-construction 100 TB route)")
    pavaOnHistogram(spark, hist)
  }

  /** The driver PAVA core shared by [[isotonicFit]] and
    * [[isotonicFitBucketed]]: exact cross-multiplied pooling over a
    * pre-collected, score-ascending (score, w, sy) histogram. */
  private def pavaOnHistogram(spark: org.apache.spark.sql.SparkSession,
                              hist: Array[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    hist.foreach { case (s, _, sy) =>
      require(sy >= 0, s"negative label sum at score $s — labels must " +
        "be non-negative (binary 0/1 calibration)") }
    // PAVA: blocks of (firstIdx, w, sy); pool while the previous
    // block's average exceeds the next's (sy1·w2 > sy2·w1, exact)
    val stack = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long)]
    hist.zipWithIndex.foreach { case ((_, w, sy), i) =>
      var cur = (i, w, sy)
      while (stack.nonEmpty && {
        val (_, pw, psy) = stack.last
        // overflow-safe: label sums and weights are row counts
        BigInt(psy) * cur._2 > BigInt(cur._3) * pw
      }) {
        val (pi, pw, psy) = stack.remove(stack.length - 1)
        cur = (pi, pw + cur._2, psy + cur._3)
      }
      stack += cur
    }
    val rates = new Array[Double](hist.length)
    val blocks = stack.toArray
    blocks.zipWithIndex.foreach { case ((first, w, sy), bi) =>
      val end = if (bi + 1 < blocks.length) blocks(bi + 1)._1
                else hist.length
      val r = sy.toDouble / w.toDouble
      (first until end).foreach(rates(_) = r)
    }
    hist.zipWithIndex.map { case ((s, w, _), i) => (s, w, rates(i)) }
      .toSeq.toDF("score", "n", "rate")
  }

  /** BUCKETED isotonic calibration — the 100 TB route of
    * [[isotonicFit]]: the score axis is first reduced to ≤ `buckets`
    * equal-width cells over the OBSERVED [min, max] span by exact
    * integer arithmetic (decimal lane — a 2⁶³-wide score span must not
    * overflow the product), so the driver-side PAVA input is bounded
    * BY CONSTRUCTION — the maxScores contract of the exact form cannot
    * be hit no matter the score domain. Each surfaced row carries the
    * cell's MINIMUM observed score as its representative (exact,
    * deterministic, SQL-replayable — never a float midpoint), the cell
    * row count, and the pooled non-decreasing rate.
    *
    * Monotonicity over cells implies monotonicity over any coarser
    * view; the price vs exact PAVA is within-cell resolution — the
    * standard calibration-curve trade (reliabilityBuckets makes the
    * same one, without the pooling).
    *
    * Output: (score, n, rate) — one row per non-empty cell, rate
    * non-decreasing in score.
    *
    * Scale shape: one 1-row min/max aggregate (broadcast back), one
    * (cell) histogram groupBy — cells shuffle, never rows — then the
    * O(buckets) driver PAVA. */
  def isotonicFitBucketed(df: DataFrame, scoreCol: String,
                          labelCol: String,
                          buckets: Int = 1000): DataFrame = {
    require(buckets >= 2 && buckets <= 100000,
      s"buckets must be in [2, 100000], got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val clean = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("long").as("__s"),
        col(labelCol).cast("long").as("__y"))
    val bounds = clean.agg(min(col("__s")).as("__lo"),
      max(col("__s")).as("__hi"))
    val hist = clean.crossJoin(broadcast(bounds))
      .select(expr(
        s"""CAST((CAST(__s AS DECIMAL(38,0)) - __lo) * ${buckets}L
           |div (CAST(__hi AS DECIMAL(38,0)) - __lo + 1) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("__b"),
        col("__s"), col("__y"))
      .groupBy(col("__b"))
      .agg(min(col("__s")).as("s"), count(lit(1)).as("w"),
        sum(col("__y")).as("sy"))
      .orderBy(col("__b"))
      .select(col("s"), col("w"), col("sy"))
      .as[(Long, Long, Long)].collect()
    pavaOnHistogram(spark, hist)
  }

  /** TRIMMED mean per group: the mean AFTER dropping everything
    * outside the exact type-1 [loPm, hiPm] quantile fences — the
    * robust-location sibling of [[winsorize]] (which clamps instead
    * of dropping). mean_milli = (1000·Σv) div n_kept, exact integer.
    *
    * Output: (group, n, n_kept, mean_milli).
    *
    * Scale shape: one [[exactQuantilesByGroup]] pass (value
    * histograms), fences broadcast, one final group aggregate. */
  def trimmedMeanMilli(df: DataFrame, groupCol: String, valueCol: String,
                       loPm: Int = 50, hiPm: Int = 950): DataFrame = {
    require(loPm >= 1 && hiPm <= 1000 && loPm < hiPm,
      s"fences must satisfy 1 <= loPm < hiPm <= 1000, got [$loPm, $hiPm]")
    val d38 = "decimal(38,0)"
    val fences = exactQuantilesByGroup(df, groupCol, valueCol,
        Seq(("lo", loPm), ("hi", hiPm)))
      .groupBy(col(groupCol))
      .agg(max(when(col("label") === "lo", col("q"))).as("__lo"),
        max(when(col("label") === "hi", col("q"))).as("__hi"))
    df.where(col(valueCol).isNotNull)
      .join(broadcast(fences), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(valueCol).cast("long").between(col("__lo"), col("__hi")),
          1L).otherwise(0L)).as("n_kept"),
        sum(when(col(valueCol).cast("long").between(col("__lo"), col("__hi")),
          col(valueCol).cast("long").cast(d38)).otherwise(lit(0).cast(d38)))
          .as("__s"))
      .select(col(groupCol), col("n"), col("n_kept"),
        when(col("n_kept") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST((1000 * __s) div n_kept AS BIGINT)"))
          .as("mean_milli"))
  }

  /** TOP-K WITH OTHERS: the k heaviest keys by summed value plus ONE
    * residual row aggregating everything else — the pie-chart /
    * dashboard rollup that keeps totals reconcilable (Σ output =
    * Σ input exactly, unlike a bare LIMIT k). Ties at the cut break
    * (value DESC, key ASC); the OTHER row carries rank k+1 and the
    * count of keys it absorbed.
    *
    * Output: (key STRING, value, n_keys, rank).
    *
    * Scale shape: one key groupBy (map-side partials), a k-bounded
    * TakeOrderedAndProject for the head, and one 1-row aggregate +
    * broadcast anti-semi for the residual. Never a global sort. */
  def topKWithOthers(df: DataFrame, keyCol: String, valueCol: String,
                     k: Int, otherLabel: String = "OTHER"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val agg = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(sum(col(valueCol).cast("long")).as("value"))
    require(!agg.columns.contains(otherLabel),
      s"otherLabel collides with a column")
    val top = agg.orderBy(col("value").desc, col("key").asc).limit(k)
      .localCheckpoint() // consumed twice: output + residual anti join
    val topTotal = top.agg(
      coalesce(sum(col("value")), lit(0L)).as("__tv"),
      count(lit(1)).as("__tk"))
    val grand = agg.agg(coalesce(sum(col("value")), lit(0L)).as("__gv"),
      count(lit(1)).as("__gk"))
    val others = grand.crossJoin(broadcast(topTotal))
      .where(col("__gk") > col("__tk"))
      .select(lit(otherLabel).as("key"),
        (col("__gv") - col("__tv")).as("value"),
        (col("__gk") - col("__tk")).as("n_keys"),
        lit(k + 1).cast("long").as("rank"))
    val head = top
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("value").desc, col("key").asc)).cast("long"))
      .select(col("key"), col("value"), lit(1L).as("n_keys"), col("rank"))
    head.unionByName(others)
  }

  /** ROLLING CORRELATION: at every period, the exact Pearson r²·sign
    * ppm of the trailing `windowPeriods` (value-based RANGE frame, so
    * gaps in the series shrink n rather than silently reaching
    * further back — the tie-safe frame of the rolling-aggregate
    * family). The time-local complement of [[crossCorrPpm]]: CCF asks
    * "at what lag", this asks "when did the coupling change".
    *
    * Input contract: ONE row per (group, time), integer times.
    * Output: (group, time, n, sign, r2_ppm) — NULL r² while the
    * window holds < 2 points or a constant side.
    *
    * Scale shape: six moment sums share ONE group-partitioned RANGE
    * frame (a single window pass bounded by a group's series), then
    * the micro-moment arithmetic runs map-only per row. */
  def rollingCorrPpm(df: DataFrame, groupCol: String, timeCol: String,
                     xCol: String, yCol: String,
                     windowPeriods: Int): DataFrame = {
    require(windowPeriods >= 2 && windowPeriods <= 100000,
      s"windowPeriods in [2, 100000], got $windowPeriods")
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__t"))
      .rangeBetween(-(windowPeriods - 1).toLong, 0L)
    val base = df.select(col(groupCol).as("__g"),
        col(timeCol).cast("long").as("__t"),
        col(xCol).cast("long").cast(d38).as("__x"),
        col(yCol).cast("long").cast(d38).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    base
      // ONE select → one Window exec for all six moments (chained
      // withColumn inserts Projects that defeat CollapseWindow)
      .select(col("__g"), col("__t"),
        count(lit(1)).over(w).cast(d38).as("__n"),
        sum(col("__x")).over(w).as("__sx"),
        sum(col("__y")).over(w).as("__sy"),
        sum(col("__x") * col("__y")).over(w).as("__sxy"),
        sum(col("__x") * col("__x")).over(w).as("__sxx"),
        sum(col("__y") * col("__y")).over(w).as("__syy"))
      .withColumn("__cxy",
        expr("(1000000 * (__n * __sxy - __sx * __sy)) div (__n * __n)"))
      .withColumn("__vx",
        expr("(1000000 * (__n * __sxx - __sx * __sx)) div (__n * __n)"))
      .withColumn("__vy",
        expr("(1000000 * (__n * __syy - __sy * __sy)) div (__n * __n)"))
      .select(col("__g").as(groupCol), col("__t").as(timeCol),
        col("__n").cast("long").as("n"),
        signum(col("__cxy")).cast("long").as("sign"),
        when(col("__n") < 2 || col("__vx") === 0 || col("__vy") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * CAST(__cxy AS DECIMAL(38,0)) * __cxy)
              |div (CAST(__vx AS DECIMAL(38,0)) * __vy) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("r2_ppm"))
  }

  /** CUMULATIVE GAINS table: rank the population by score DESC, cut
    * into `bins` equal-count buckets, and report how much of the
    * positive class the top buckets capture — the model-targeting
    * readout ("the top decile catches 38% of converters") next to
    * [[aucPpm]] (rank quality) and [[reliabilityBuckets]]
    * (calibration). Exact integers: bucket = ⌈bins·cum/n⌉ over the
    * score-DESC prefix count, capture_ppm = 10⁶·cum_pos div total_pos,
    * lift_ppm = 10⁶·cum_pos·n div (total_pos·cum_n) (cross-multiplied
    * — capture relative to the share of population taken).
    *
    * Ties: equal scores land in the same bucket (value-level
    * assignment — a row-level decile would split ties
    * order-arbitrarily, the [[equiDepthHistogram]] stance).
    *
    * Output: (bin, n, n_pos, cum_n, cum_pos, capture_ppm, lift_ppm).
    *
    * Scale shape: one (score → count, positives) histogram groupBy,
    * the window-free global prefix sum over distinct scores, one bin
    * groupBy, then a bins²-bounded triangle join for the bin-level
    * cumulative (bins ≤ 1000 by contract — metadata, no global
    * window). */
  def gainsTable(df: DataFrame, scoreCol: String, labelCol: String,
                 bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins in [2,1000], got $bins")
    val hist = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("__s"))
      .agg(count(lit(1)).as("__w"),
        sum(col(labelCol).cast("long")).as("__p"))
    val cum = GlobalRank.globalRunningSum(hist, Seq(col("__s").desc), "__w")
    val totals = hist.agg(sum(col("__w")).as("__n"),
      sum(col("__p")).as("__pos"))
    val binned = cum.crossJoin(broadcast(totals))
      .withColumn("bin", expr(s"($bins * cum + __n - 1) div __n"))
      .groupBy(col("bin"))
      .agg(sum(col("__w")).as("n"), sum(col("__p")).as("n_pos"),
        first(col("__n")).as("__n"), first(col("__pos")).as("__pos"))
    val upto = binned.select(col("bin").as("__b2"), col("n").as("__w2"),
      col("n_pos").as("__p2"))
    binned.join(upto, col("__b2") <= col("bin"))
      .groupBy(col("bin"))
      .agg(first(col("n")).as("n"), first(col("n_pos")).as("n_pos"),
        sum(col("__w2")).as("cum_n"), sum(col("__p2")).as("cum_pos"),
        first(col("__n")).as("__n"), first(col("__pos")).as("__pos"))
      .select(col("bin"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        when(col("__pos") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000 * cum_pos) div __pos"))
          .as("capture_ppm"),
        when(col("__pos") === 0 || col("cum_n") === 0,
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * CAST(cum_pos AS DECIMAL(38,0)) * __n)
              |div (CAST(__pos AS DECIMAL(38,0)) * cum_n) AS BIGINT)"""
              .stripMargin.replace("\n", " "))).as("lift_ppm"))
  }

  /** QINI (UPLIFT) CURVE — the targeting readout for EXPERIMENTS:
    * [[gainsTable]] asks "does the score find the converters?",
    * Qini asks "does it find the people the TREATMENT actually
    * moved?" — the model-eval half of the A/B battery
    * ([[cupedAdjustMilli]], [[mdeProbeMicro]]) and the standard
    * uplift-model leaderboard curve. Rank by score DESC, cut into
    * `bins` equal-count buckets (value-level ties, the gainsTable
    * stance), and at each depth report the reweighted incremental
    * conversions:
    *   qini(k) = Y_t(k) − Y_c(k)·N_t(k)/N_c(k)
    *   qini_milli = sign(num) · (10³·|Y_t·N_c − Y_c·N_t|) div N_c
    *     [sign-magnitude — a harmful segment goes NEGATIVE]
    * NULL when a depth has no controls yet. A no-signal score (or a
    * null-effect experiment) wobbles around 0; the curve's terminal
    * point is the overall reweighted effect.
    *
    * Output: (bin, cum_nt, cum_nc, cum_pt, cum_pc, qini_milli),
    * ascending bin = descending score depth.
    *
    * Scale shape: one score-histogram groupBy (treated/control counts
    * ride the same cells), the window-free global prefix sum over
    * distinct scores, one bin groupBy, a bins²-bounded triangle join
    * — no global window, no subject-grain shuffle after the
    * histogram. */
  def qiniCurveMilli(df: DataFrame, treatedCol: String,
                     outcomeCol: String, scoreCol: String,
                     bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins in [2,1000], got $bins")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(treatedCol).cast("boolean").as("__t"),
        col(outcomeCol).cast("long").as("__y"),
        col(scoreCol).cast("long").as("__s"))
      .where(col("__t").isNotNull && col("__y").isNotNull &&
        col("__s").isNotNull)
    val hist = base.groupBy(col("__s"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__wt"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("__pt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__wc"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("__pc"))
      .withColumn("__w", col("__wt") + col("__wc"))
    val cum = GlobalRank.globalRunningSum(hist, Seq(col("__s").desc), "__w")
    val totals = hist.agg(sum(col("__w")).as("__n"))
    val binned = cum.crossJoin(broadcast(totals))
      .withColumn("bin", expr(s"($bins * cum + __n - 1) div __n"))
      .groupBy(col("bin"))
      .agg(sum(col("__wt")).as("__bwt"), sum(col("__pt")).as("__bpt"),
        sum(col("__wc")).as("__bwc"), sum(col("__pc")).as("__bpc"))
    val upto = binned.select(col("bin").as("__b2"),
      col("__bwt").as("__wt2"), col("__bpt").as("__pt2"),
      col("__bwc").as("__wc2"), col("__bpc").as("__pc2"))
    binned.join(upto, col("__b2") <= col("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("__wt2")).as("cum_nt"), sum(col("__wc2")).as("cum_nc"),
        sum(col("__pt2")).as("cum_pt"), sum(col("__pc2")).as("cum_pc"))
      .select(col("bin"), col("cum_nt"), col("cum_nc"), col("cum_pt"),
        col("cum_pc"),
        when(col("cum_nc") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(sign(CAST(cum_pt AS DECIMAL(38,0)) * cum_nc
              |          - CAST(cum_pc AS DECIMAL(38,0)) * cum_nt)
              |     AS DECIMAL(38,0)) *
              |(1000 * abs(CAST(cum_pt AS DECIMAL(38,0)) * cum_nc
              |            - CAST(cum_pc AS DECIMAL(38,0)) * cum_nt)
              | div CAST(cum_nc AS DECIMAL(38,0))) AS BIGINT)"""
              .stripMargin.replace("\n", " ")))
          .as("qini_milli"))
  }

  /** AUUC / QINI COEFFICIENT — the LEADERBOARD NUMBER over
    * [[qiniCurveMilli]]'s curve (round-11 verdict ask #6): the curve
    * is the diagnostic plot, its AREA against the random diagonal is
    * the single scalar uplift models rank by. Integer trapezoid over
    * the REALIZED curve points (origin (0,0) prepended; x = cumulative
    * subjects, y = the already-floored qini_milli — both engines build
    * from identical integers, so the area is exact):
    *   area2     = Σ_k (q_{k−1} + q_k)·(n_k − n_{k−1})   [doubled]
    *   random2   = q_B · N          [doubled area under the diagonal
    *                                 from (0,0) to (N, q_B)]
    *   auuc_milli      = sign(area2) · (|area2| div (2·N))
    *   qini_coef_milli = sign(area2 − random2) ·
    *                     (|area2 − random2| div (2·N))
    * Units: average qini_milli over the ranking — a model no better
    * than random scores a coefficient near 0, a harmful ranking goes
    * negative. NULL when any depth has no controls yet (its curve
    * point is undefined) or when N = 0.
    *
    * Output one row: (n, bins, q_final_milli, auuc_milli,
    * qini_coef_milli) — `bins` counts REALIZED curve points (value-
    * level ties can merge adjacent depths).
    *
    * Scale shape: everything in [[qiniCurveMilli]] (histogram +
    * window-free prefix + bins² triangle), then a ≤(bins+1)²
    * prev-point triangle and one final row — no subject-grain work
    * past the histogram. */
  def qiniAucMilli(df: DataFrame, treatedCol: String,
                   outcomeCol: String, scoreCol: String,
                   bins: Int = 10): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val curve = qiniCurveMilli(df, treatedCol, outcomeCol, scoreCol,
        bins)
      .select(col("bin"), (col("cum_nt") + col("cum_nc")).as("__cn"),
        col("qini_milli").as("__q"))
    val origin = curve.sparkSession.range(1)
      .select(lit(0L).as("bin"), lit(0L).as("__cn"),
        lit(0L).as("__q"))
    val pts = curve.unionByName(origin)
    val prev = pts.select(col("bin").as("__b2"), col("__cn").as("__cn2"),
      col("__q").as("__q2"))
    // each realized depth joins every EARLIER point (bins² bounded,
    // origin guarantees a match) and keeps the latest as its
    // predecessor — the window-free lag
    val seg = pts.where(col("bin") > 0)
      .join(prev, col("__b2") < col("bin"))
      .groupBy(col("bin"))
      .agg(first(col("__cn")).as("__cnk"), first(col("__q")).as("__qk"),
        max(struct(col("__b2"), col("__cn2"), col("__q2"))).as("__p"))
      .select(col("bin"), col("__cnk"), col("__qk"),
        col("__p.__cn2").as("__cnp"), col("__p.__q2").as("__qp"))
    seg.agg(count(lit(1)).as("__bins"),
        sum(when(col("__qk").isNull || col("__qp").isNull, 1L)
          .otherwise(0L)).as("__nullq"),
        sum((coalesce(col("__qp"), lit(0L)).cast(d38) +
            coalesce(col("__qk"), lit(0L))) *
          (col("__cnk") - col("__cnp"))).as("__area2"),
        max(struct(col("bin"), col("__cnk").as("n"),
          col("__qk").as("qf"))).as("__last"))
      .select(coalesce(col("__last.n"), lit(0L)).as("n"),
        coalesce(col("__bins"), lit(0L)).as("bins"),
        col("__last.qf").as("q_final_milli"),
        col("__nullq"), col("__area2"))
      .withColumn("__rand2",
        col("q_final_milli").cast(d38) * col("n"))
      .select(col("n"), col("bins"), col("q_final_milli"),
        when(col("__nullq") > 0 || col("n") === 0,
            lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(sign(__area2) AS DECIMAL(38,0)) *
              |(abs(__area2) div (2 * CAST(n AS DECIMAL(38,0))))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("auuc_milli"),
        when(col("__nullq") > 0 || col("n") === 0,
            lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(sign(__area2 - __rand2) AS DECIMAL(38,0)) *
              |(abs(__area2 - __rand2) div
              | (2 * CAST(n AS DECIMAL(38,0)))) AS BIGINT)"""
              .stripMargin.replace("\n", " ")))
          .as("qini_coef_milli"))
  }

  /** UPLIFT CALIBRATION TABLE — the DECISION-LAYER companion to
    * [[qiniCurveMilli]] (round-11 verdict ask #6): per predicted-
    * uplift bin, does the model's PREDICTED treatment effect match
    * the REALIZED effect? Rank by prediction DESC, cut into `bins`
    * equal-count buckets (value-level ties, the gainsTable stance —
    * the [[isotonicFitBucketed]] shape applied to treatment deltas);
    * per NON-cumulative bin report
    *   mean_pred_milli       = sign(Σp) · ((10³·|Σp|) div n)
    *   realized_uplift_milli = sign(pt·nc − pc·nt) ·
    *                           ((10³·|pt·nc − pc·nt|) div (nt·nc))
    * realized is NULL when a bin lacks either arm. A calibrated model
    * tracks the diagonal; systematic over-prediction in the top bins
    * is the classic uplift-model failure this table catches before a
    * rollout targets the wrong decile.
    *
    * Output: (bin, n, n_t, n_c, mean_pred_milli,
    * realized_uplift_milli), ascending bin = descending prediction.
    *
    * Scale shape: one prediction-histogram groupBy, the window-free
    * global prefix sum over distinct predictions, one bin groupBy —
    * no subject-grain shuffle after the histogram, no triangle at
    * all (bins are non-cumulative). */
  def upliftCalibrationMilli(df: DataFrame, treatedCol: String,
                             outcomeCol: String, predCol: String,
                             bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins in [2,1000], got $bins")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(treatedCol).cast("boolean").as("__t"),
        col(outcomeCol).cast("long").as("__y"),
        col(predCol).cast("long").as("__p"))
      .where(col("__t").isNotNull && col("__y").isNotNull &&
        col("__p").isNotNull)
    val hist = base.groupBy(col("__p"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__wt"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("__pt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__wc"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("__pc"))
      .withColumn("__w", col("__wt") + col("__wc"))
    val cum = GlobalRank.globalRunningSum(hist, Seq(col("__p").desc),
      "__w")
    val totals = hist.agg(sum(col("__w")).as("__n"))
    cum.crossJoin(broadcast(totals))
      .withColumn("bin", expr(s"($bins * cum + __n - 1) div __n"))
      .groupBy(col("bin"))
      .agg(sum(col("__wt")).as("n_t"), sum(col("__wc")).as("n_c"),
        sum(col("__pt")).as("__post"), sum(col("__pc")).as("__posc"),
        sum(col("__p").cast(d38) * col("__w")).as("__sp"))
      .select(col("bin"), (col("n_t") + col("n_c")).as("n"),
        col("n_t"), col("n_c"),
        expr("""CAST(CAST(sign(__sp) AS DECIMAL(38,0)) *
               |((1000 * abs(__sp)) div (n_t + n_c)) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("mean_pred_milli"),
        when(col("n_t") === 0 || col("n_c") === 0,
            lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(sign(CAST(__post AS DECIMAL(38,0)) * n_c
              |          - CAST(__posc AS DECIMAL(38,0)) * n_t)
              |     AS DECIMAL(38,0)) *
              |((1000 * abs(CAST(__post AS DECIMAL(38,0)) * n_c
              |             - CAST(__posc AS DECIMAL(38,0)) * n_t))
              | div (CAST(n_t AS DECIMAL(38,0)) * n_c)) AS BIGINT)"""
              .stripMargin.replace("\n", " ")))
          .as("realized_uplift_milli"))
  }

  /** BEST SPLIT THRESHOLD on a numeric feature — the distributed
    * decision-tree split finder (the histogram scan at the core of
    * XGBoost/LightGBM tree building): for every candidate threshold t
    * (each distinct feature value; split = v ≤ t vs v > t) the Gini
    * gain of a BINARY label, argmax per group, ties to the smallest
    * threshold. [[splitGainPpm]] ranks categorical features; this
    * finds WHERE to cut a numeric one. Exact integer ppm — binary
    * labels make Σc² = pos² + neg², child terms
    * (10⁶·(cpos² + (cw−cpos)²)) div cw, gain = parent − weighted, all
    * in DECIMAL(38,0).
    *
    * Output: (group, n, parent_ppm, threshold, gain_ppm, left_n,
    * right_n) — one row per group with ≥ 2 distinct values; the
    * max-value "threshold" (empty right child) is not a split and is
    * excluded.
    *
    * Scale shape: ONE (group, value) histogram groupBy carrying
    * (w, pos) — distinct values shuffle, never rows — a
    * group-partitioned prefix-sum window bounded by one group's
    * distinct values, broadcast group totals, and a min(struct)
    * argmax. The classic row-sorted split scan is a global sort; this
    * never sorts rows. */
  def bestSplitThreshold(df: DataFrame, groupCol: String,
                         featureCol: String, labelCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val hist = df.where(col(featureCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        col(featureCol).cast("long").as("__v"))
      .agg(count(lit(1)).cast(d38).as("__w"),
        sum(col(labelCol).cast("long")).cast(d38).as("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v").asc)
    val cum = hist
      .withColumn("__cw", sum(col("__w")).over(w))
      .withColumn("__cp", sum(col("__p")).over(w))
    val totals = hist.groupBy(col("__g").as("__g2"))
      .agg(sum(col("__w")).as("__n"), sum(col("__p")).as("__pos"))
    val scored = cum.join(broadcast(totals), col("__g") <=> col("__g2"))
      .where(col("__cw") < col("__n")) // max value is not a split
      .withColumn("__parent", expr(
        """1000000 - (1000000 * (__pos * __pos +
          |(__n - __pos) * (__n - __pos))) div (__n * __n)"""
          .stripMargin.replace("\n", " ")))
      .withColumn("__lterm", expr(
        """(1000000 * (__cp * __cp + (__cw - __cp) * (__cw - __cp)))
          |div __cw""".stripMargin.replace("\n", " ")))
      .withColumn("__rterm", expr(
        """(1000000 * ((__pos - __cp) * (__pos - __cp) +
          |((__n - __cw) - (__pos - __cp)) * ((__n - __cw) - (__pos - __cp))))
          |div (__n - __cw)""".stripMargin.replace("\n", " ")))
      .withColumn("__gain", (col("__parent") -
        expr("1000000 - (__lterm + __rterm) div __n")).cast("long"))
    scored.groupBy(col("__g"))
      .agg(min(struct((-col("__gain")).as("ng"), col("__v").as("v"),
          col("__cw").cast("long").as("ln"),
          (col("__n") - col("__cw")).cast("long").as("rn"),
          col("__n").cast("long").as("n"),
          col("__parent").cast("long").as("pp"))).as("__best"))
      .select(col("__g").as(groupCol),
        col("__best.n").as("n"),
        col("__best.pp").as("parent_ppm"),
        col("__best.v").as("threshold"),
        (-col("__best.ng")).as("gain_ppm"),
        col("__best.ln").as("left_n"),
        col("__best.rn").as("right_n"))
  }

  /** GINI-IMPURITY SPLIT GAIN per candidate feature — the
    * decision-tree split criterion as a feature-ranking screen:
    * "which metadata column best predicts the label?" (CART; the
    * supervised sibling of [[concentrationPpm]]'s unsupervised
    * Gini–Simpson). For each feature f,
    * gain = impurity(label) − Σ_v (n_v/n)·impurity(label | f = v),
    * all in exact integer ppm: parent_ppm = 10⁶ − (10⁶·Σ_l c_l²) div n²,
    * each child contributes (10⁶·Σ_l c_vl²) div n_v, and
    * weighted_ppm = 10⁶ − (Σ_v child_v) div n — every step a pinned
    * integer floor both engines replay (DECIMAL(38,0) internally:
    * 10⁶·n² needs it past ~3·10⁶ rows).
    *
    * NULL feature values form their own child (a real split branch);
    * NULL labels are excluded up front.
    *
    * Output: (feature, n, n_values, parent_ppm, weighted_ppm,
    * gain_ppm) — one row per feature, gain 0 for an independent
    * feature, parent_ppm for a perfectly predictive one. gain_ppm
    * can go mildly negative only through floor jitter (< |values|
    * ppm); the oracle replays the identical floors.
    *
    * Scale shape: features unpivot map-side (×|features| row blowup
    * of (feature, value, label) triples only), then ONE
    * (feature, value, label) partial groupBy — shuffle bounded by
    * alphabet sizes, never rows; the parent's label histogram is a
    * second label-bounded groupBy broadcast into the finish. */
  def splitGainPpm(df: DataFrame, featureCols: Seq[String],
                   labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(featureCols.distinct.size == featureCols.size,
      "duplicate feature columns")
    val d38 = "decimal(38,0)"
    val labeled = df.where(col(labelCol).isNotNull)
    val melted = labeled.select(col(labelCol).cast("string").as("__l"),
        explode(array(featureCols.map(f =>
          struct(lit(f).as("f"), col(f).cast("string").as("v"))): _*))
          .as("__fv"))
      .select(col("__l"), col("__fv.f").as("__f"), col("__fv.v").as("__v"))
    val cells = melted.groupBy(col("__f"), col("__v"), col("__l"))
      .agg(count(lit(1)).cast(d38).as("__c"))
    val children = cells.groupBy(col("__f"), col("__v"))
      .agg(sum(col("__c")).as("__nv"),
        sum(col("__c") * col("__c")).as("__ss"))
      .groupBy(col("__f"))
      .agg(count(lit(1)).as("n_values"),
        sum(expr("(1000000 * __ss) div __nv")).as("__childSum"),
        sum(col("__nv")).as("__n"))
    val parent = labeled.groupBy(col(labelCol).cast("string").as("__l"))
      .agg(count(lit(1)).cast(d38).as("__c"))
      .agg(sum(col("__c")).as("__pn"),
        sum(col("__c") * col("__c")).as("__pss"))
      .select(expr("1000000 - (1000000 * __pss) div (__pn * __pn)")
        .cast("long").as("__parent_ppm"))
    children.crossJoin(broadcast(parent))
      .select(col("__f").as("feature"),
        col("__n").cast("long").as("n"),
        col("n_values"),
        col("__parent_ppm").as("parent_ppm"),
        expr("CAST(1000000 - __childSum div __n AS BIGINT)")
          .as("weighted_ppm"),
        (col("__parent_ppm") -
          expr("CAST(1000000 - __childSum div __n AS BIGINT)"))
          .as("gain_ppm"))
  }

  /** BRIER SCORE with the Murphy decomposition — the one-row summary
    * of a probabilistic classifier's calibration story: the overall
    * mean squared error of the ppm forecast against the 0/1 outcome,
    * split into REL (how far each bin's promised rate sits from its
    * delivered rate — penalty), RES (how far delivered rates spread
    * from the base rate — reward), and UNC (the base rate's intrinsic
    * variance). Forecasts bin into `bins` equal-width buckets (the
    * [[reliabilityBuckets]] grid).
    *
    * Exactness contract (pinned-floor form): per-bin means are floor
    * divisions (f̄_k = Σp div n_k ppm, ō_k = 10⁶·pos_k div n_k ppm),
    * the global base rate likewise, and each decomposition term is
    * Σ n_k·(Δppm)² div (n·10⁶) — every step integer, so a SQL engine
    * replays it bit-for-bit. The floors mean REL − RES + UNC tracks
    * the overall Brier only approximately (the textbook identity holds
    * in the reals); the overall `brier_ppm` is computed directly from
    * Σ(p − 10⁶y)² and is exact on its own.
    *
    * Scale shape: one map-side-partial groupBy on the bucket id (bins
    * rows out), one 1-row broadcast of the global totals, one final
    * aggregate over ≤ bins rows. No windows, no collects. */
  def brierDecompositionPpm(df: DataFrame, scorePpmCol: String,
                            labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must divide 1000000, got $bins")
    val w = 1000000L / bins
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = df.select(col(scorePpmCol).cast("long").as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__p").isNotNull && col("__y").isNotNull &&
        col("__p") >= 0 && col("__p") <= 1000000L)
    // p = 10⁶ exactly (a forecast of certainty) clamps into the TOP
    // bin — the fixedWidthHistogram catch-all stance — instead of
    // silently vanishing from n and biasing the summary
    val byBin = s.groupBy(
        expr(s"least(__p div ${w}L, ${bins - 1}L)").as("__b"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"),
        sum(col("__p")).as("__sp"),
        // per-row squared error accumulates exactly at bin grain:
        // (p − 10⁶·y)² ≤ 10¹² per row needs the decimal lane
        sum(((col("__p") - when(col("__y"), 1000000L).otherwise(0L)) *
          (col("__p") - when(col("__y"), 1000000L).otherwise(0L)))
          .cast(d38)).as("__sq"))
    val tot = byBin.agg(sum(col("__n")).as("__tn"),
      sum(col("__pos")).as("__tpos"))
    byBin.crossJoin(broadcast(tot))
      .select(col("__n"), col("__sq"),
        // pinned floors: bin means and the base rate in ppm
        expr("__sp div __n").as("__f"),
        expr("(1000000 * __pos) div __n").as("__o"),
        expr("(1000000 * __tpos) div __tn").as("__obar"),
        col("__tn"), col("__tpos"))
      .agg(max(col("__tn")).as("__tn0"),
        max(col("__tpos")).as("__tpos0"),
        max(col("__obar")).as("__obar0"),
        sum(col("__sq")).as("__tsq"),
        // n_k·(Δppm)² can reach n_k·10¹² — decimal lane BEFORE the
        // product, not after (a long product overflows at n_k ~ 10⁷)
        sum(col("__n").cast(d38) * (col("__f") - col("__o")) *
          (col("__f") - col("__o"))).as("__rel"),
        sum(col("__n").cast(d38) * (col("__o") - col("__obar")) *
          (col("__o") - col("__obar"))).as("__res"))
      .select(col("__tn0").cast("long").as("n"),
        col("__tpos0").cast("long").as("n_pos"),
        expr("CAST(__tsq div (__tn0 * 1000000) AS BIGINT)").as("brier_ppm"),
        expr("CAST(__rel div (__tn0 * 1000000) AS BIGINT)")
          .as("reliability_ppm"),
        expr("CAST(__res div (__tn0 * 1000000) AS BIGINT)")
          .as("resolution_ppm"),
        // ō(1−ō) in ppm, both factors already pinned-floor ppm
        expr("CAST((__obar0 * (1000000 - __obar0)) div 1000000 AS BIGINT)")
          .as("uncertainty_ppm"))
  }

  /** McNEMAR'S TEST for paired classifiers — "is model A actually
    * better than model B on the SAME examples?", the question accuracy
    * deltas can't answer because they ignore pairing. Counts the
    * discordant cells (b = A right / B wrong, c = A wrong / B right)
    * and reports the χ²₁ statistic (b−c)²/(b+c) in milli, plus the
    * continuity-corrected (|b−c|−1)²/(b+c) variant (floored at 0).
    * Both NULL when b+c = 0 (identical error patterns — the statistic
    * is undefined, and ANSI `div` would throw on the zero denominator).
    *
    * Scale shape: one map-side-partial global aggregate — four
    * conditional counts cross the shuffle as one partial row per
    * partition. */
  def mcnemarMilli(df: DataFrame, labelCol: String,
                   predACol: String, predBCol: String): DataFrame = {
    val s = df.select(col(labelCol).cast("boolean").as("__y"),
        col(predACol).cast("boolean").as("__a"),
        col(predBCol).cast("boolean").as("__b"))
      .where(col("__y").isNotNull && col("__a").isNotNull &&
        col("__b").isNotNull)
    s.agg(count(lit(1)).as("n"),
        sum(when(col("__a") === col("__y") && col("__b") =!= col("__y"),
          1L).otherwise(0L)).as("b"),
        sum(when(col("__a") =!= col("__y") && col("__b") === col("__y"),
          1L).otherwise(0L)).as("c"))
      .select(col("n"), col("b"), col("c"),
        // decimal lane: (b−c)² overflows a long once |b−c| ~ 3·10⁹
        when(col("b") + col("c") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000 * CAST(b - c AS DECIMAL(38,0)) * (b - c))
              |div (b + c) AS BIGINT)"""
              .stripMargin.replace("\n", " ")))
          .as("mcnemar_milli"),
        when(col("b") + col("c") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000 * CAST(greatest(abs(b - c) - 1, 0) AS DECIMAL(38,0)) *
              |greatest(abs(b - c) - 1, 0)) div (b + c) AS BIGINT)"""
              .stripMargin.replace("\n", " ")))
          .as("mcnemar_cc_milli"))
  }

  /** FANO FACTOR (index of dispersion of COUNTS) per group — the
    * burstiness diagnostic: variance/mean of the per-period event
    * count over a shared period spine. 1 = Poisson arrivals; > 1 =
    * bursty (events clump); < 1 = regular. The spine is the GLOBAL
    * [min, max] period range across all groups, so periods with no
    * events count as genuine zeros (dropping them silently inflates
    * the mean and masks burstiness — the classic mistake this operator
    * exists to avoid).
    *
    * Exact form: with H spine periods, S = Σcount, Q = Σcount² (zero
    * periods add nothing to S or Q), population variance·H² = H·Q−S²,
    * so fano_ppm = 10⁶·(H·Q − S²) div (H·S) — every step integer.
    * NULL when S = 0 (no events: the ratio is undefined).
    *
    * Scale shape: one map-side-partial groupBy to (group, period)
    * counts, one groupBy to per-group moments (rows = groups), one
    * 1-row broadcast of the global span. No spine materialization —
    * the zeros enter through H, never as rows. */
  def fanoFactorPpm(df: DataFrame, groupCol: String,
                    periodCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = df.select(col(groupCol).as("__g"),
        col(periodCol).cast("long").as("__t"))
      .where(col("__g").isNotNull && col("__t").isNotNull)
    val counts = s.groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val span = counts.agg(min(col("__t")).as("__lo"),
      max(col("__t")).as("__hi"))
    counts.groupBy(col("__g"))
      // decimal lane from the start: S² overflows a long at S ~ 3·10⁹
      .agg(sum(col("__c")).cast(d38).as("__s"),
        sum((col("__c") * col("__c")).cast(d38)).as("__q"))
      .crossJoin(broadcast(span))
      .select(col("__g").as(groupCol),
        (col("__hi") - col("__lo") + 1).as("n_periods"),
        col("__s").cast("long").as("n_events"),
        expr("CAST((1000 * __s) div (__hi - __lo + 1) AS BIGINT)")
          .as("mean_milli"),
        when(col("__s") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * ((__hi - __lo + 1) * __q - __s * __s))
              |div ((__hi - __lo + 1) * __s) AS BIGINT)"""
              .stripMargin.replace("\n", " ")))
          .as("fano_ppm"))
  }

  /** ROLLING z-SCORE ANOMALY FLAGS — "which days broke from their own
    * recent history?": each observation compares against the trailing
    * `windowPeriods` periods STRICTLY BEFORE it (the self-exclusion
    * that keeps a genuine spike from masking itself by inflating its
    * own baseline). A point is anomalous when |x − mean| > k·σ of the
    * baseline, evaluated in the cross-multiplied exact-integer form
    * c²·(c·x − S)² > k²·c²·(c·Q − S²) ⇒ (c·x − S)² > k²·(c·Q − S²)
    * (c = baseline rows present, S/Q = baseline sum/sum-of-squares) —
    * no square roots, no floats, bit-replayable in SQL. Points with
    * fewer than `minPeriods` baseline rows emit flag NULL (not false:
    * "unknown", not "normal").
    *
    * Scale shape: one RANGE window per group over the period axis —
    * state bounded by one group's window span, never the corpus; the
    * three baseline moments share a single frame (the one-Window-exec
    * discipline: all frame functions in ONE select). */
  def rollingAnomalyFlags(df: DataFrame, groupCol: String,
                          periodCol: String, valueCol: String,
                          windowPeriods: Int, k: Int,
                          minPeriods: Int): DataFrame = {
    require(windowPeriods >= 2, s"windowPeriods must be >= 2, got $windowPeriods")
    require(k >= 1, s"k must be >= 1, got $k")
    require(minPeriods >= 2 && minPeriods <= windowPeriods,
      s"minPeriods must be in [2, windowPeriods], got $minPeriods")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = df.select(col(groupCol).as("__g"),
        col(periodCol).cast("long").as("__t"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__g").isNotNull && col("__t").isNotNull &&
        col("__x").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__t"))
      .rangeBetween(-windowPeriods.toLong, -1L)
    // all three moments in ONE select: chained withColumn would plan
    // one Window exec per moment (interleaved Projects defeat
    // CollapseWindow — the rollingCorrPpm lesson)
    s.select(col("__g"), col("__t"), col("__x"),
        count(col("__x")).over(w).as("__c"),
        sum(col("__x")).over(w).as("__s"),
        sum((col("__x") * col("__x")).cast(d38)).over(w).as("__q"))
      .select(col("__g").as(groupCol), col("__t").as(periodCol),
        col("__x").as(valueCol),
        col("__c").cast("long").as("n_baseline"),
        when(col("__c") < minPeriods, lit(null).cast("boolean"))
          .otherwise(
            (col("__c").cast(d38) * col("__x") - col("__s")) *
              (col("__c").cast(d38) * col("__x") - col("__s")) >
            lit(k.toLong * k) *
              (col("__c") * col("__q") - col("__s").cast(d38) * col("__s")))
          .as("is_anomaly"))
  }

  /** EXPECTED / MAX CALIBRATION ERROR — the one-row companions to
    * [[reliabilityBuckets]] and [[brierDecompositionPpm]]: how far, on
    * average and at worst, the forecast's promised rate sits from the
    * delivered rate, weighted by bin mass:
    *   ECE(ppm) = Σ_k n_k·|ō_k − f̄_k| div n,   MCE(ppm) = max_k |ō_k − f̄_k|
    * over `bins` equal-width buckets; per-bin means are the same
    * pinned floors as the Brier decomposition (f̄ = Σp div n_k,
    * ō = 10⁶·pos div n_k), so the three calibration reports never
    * disagree on a bin.
    *
    * Scale shape: one map-side-partial groupBy on the bucket id, one
    * ≤-bins-row final aggregate. */
  def calibrationErrorPpm(df: DataFrame, scorePpmCol: String,
                          labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must divide 1000000, got $bins")
    val w = 1000000L / bins
    val s = df.select(col(scorePpmCol).cast("long").as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__p").isNotNull && col("__y").isNotNull &&
        col("__p") >= 0 && col("__p") <= 1000000L)
    // p = 10⁶ clamps into the top bin (see brierDecompositionPpm)
    s.groupBy(expr(s"least(__p div ${w}L, ${bins - 1}L)").as("__b"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"),
        sum(col("__p")).as("__sp"))
      .select(col("__n"),
        abs(expr("(1000000 * __pos) div __n") - expr("__sp div __n"))
          .as("__gap"))
      .agg(sum(col("__n")).as("__tn"),
        sum(col("__n").cast("decimal(38,0)") * col("__gap")).as("__wg"),
        max(col("__gap")).as("__mce"))
      .select(col("__tn").cast("long").as("n"),
        expr("CAST(__wg div __tn AS BIGINT)").as("ece_ppm"),
        col("__mce").cast("long").as("mce_ppm"))
  }

  /** DURBIN–WATSON statistic per group — the residual-autocorrelation
    * screen for any per-period series: DW = Σ(x_t − x_{t−1})² / Σ(x −
    * x̄)² ∈ [0, 4]; ≈2 means no lag-1 serial correlation, →0 positive,
    * →4 negative. Complements [[autocorrLag1Ppm]]-style moments with
    * the regression-diagnostics convention every econometrics reader
    * expects. "Adjacent" means adjacent ROW in `tCol` order — a gap in
    * the period axis still pairs its neighbors (document the spine if
    * that matters; the gate feeds a dense daily series).
    *
    * Exact form: DW·10³ = (1000·n·Σd²) div (n·S₂ − S₁²) — the
    * denominator is the n-scaled central second moment, so no mean
    * division ever happens. NULL for constant series (denominator 0).
    *
    * Output per group: (group, n, dw_milli).
    *
    * Scale shape: one lag window PARTITIONED BY group (bounded by one
    * group's series), one map-side-partial groupBy. */
  def durbinWatsonMilli(df: DataFrame, groupCol: String, tCol: String,
                        valueCol: String): DataFrame = {
    val d38b = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = df.select(col(groupCol).as("__g"),
        col(tCol).cast("long").as("__t"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__g").isNotNull && col("__t").isNotNull &&
        col("__x").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__t"))
    s.withColumn("__prev", lag(col("__x"), 1).over(w))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast(d38b)).as("__s1"),
        sum((col("__x") * col("__x")).cast(d38b)).as("__s2"),
        sum(((col("__x") - col("__prev")) * (col("__x") - col("__prev")))
          .cast(d38b)).as("__d2")) // lag NULL on first row → term skipped
      .select(col("__g").as(groupCol), col("__n").cast("long").as("n"),
        when(col("__n").cast(d38b) * col("__s2") - col("__s1") * col("__s1")
            === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000 * __n * coalesce(__d2, 0))
              |div (CAST(__n AS DECIMAL(38,0)) * __s2 - __s1 * __s1)
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("dw_milli"))
  }

  /** EXACT SKEWNESS / KURTOSIS per group — the shape diagnostics
    * behind "is this metric's distribution normal enough for the
    * t-test, or do I need [[graft.ops.RankTests]]": third and fourth
    * standardized central moments from one pass of integer power sums,
    * square-root-free. With M2 = n·S2 − S1² (= n²·m2),
    * M3 = n²S3 − 3nS1S2 + 2S1³ (= n³·m3),
    * M4 = n³S4 − 4n²S1S3 + 6nS1²S2 − 3S1⁴ (= n⁴·m4), the n-powers
    * cancel exactly:
    *   g1² (ppm)    = 10⁶·M3² div M2³   (skew² — sign in skew_sign)
    *   excess (ppm) = 10⁶·M4 div M2² − 3·10⁶
    * Both NULL when M2 = 0 (constant series). The subtraction runs
    * AFTER the floor (identical in both engines; the quotient is
    * non-negative).
    *
    * Magnitude bound: M3² ≤ (n·V)⁶ for |x − μ| ≤ V, so the
    * DECIMAL(38,0) lane holds to n·V ≈ 2·10⁵ — this is a PERIOD-GRAIN
    * series diagnostic (365 days × values in the thousands), not a
    * row-grain one; pre-scale the value for wider inputs (the
    * spearmanR2Ppm magnitude trade).
    *
    * Scale shape: one map-side-partial groupBy carrying 5 power sums
    * per group — rows never shuffle. */
  def momentsByGroup(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val d38c = "decimal(38,0)"
    val s = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__g").isNotNull && col("__x").isNotNull)
    s.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__s1"),
        sum((col("__x") * col("__x")).cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__s2"),
        sum((col("__x").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__x") * col("__x")))
          .as("__s3"),
        sum((col("__x").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__x") *
          col("__x") * col("__x"))).as("__s4"))
      .select(col("__g"), col("__n"),
        (col("__n").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__s2") -
          col("__s1") * col("__s1")).as("__m2"),
        (col("__n").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__n") * col("__s3") -
          lit(3) * col("__n") * col("__s1") * col("__s2") +
          lit(2) * col("__s1") * col("__s1") * col("__s1")).as("__m3"),
        (col("__n").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__n") * col("__n") *
          col("__s4") -
          lit(4) * col("__n").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__n") *
            col("__s1") * col("__s3") +
          lit(6) * col("__n").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("__s1") *
            col("__s1") * col("__s2") -
          lit(3) * col("__s1") * col("__s1") * col("__s1") * col("__s1"))
          .as("__m4"))
      .select(col("__g").as(groupCol), col("__n").cast("long").as("n"),
        signum(col("__m3")).cast("long").as("skew_sign"),
        when(col("__m2") === 0, lit(null).cast("long"))
          .otherwise(expr(
            s"CAST((1000000 * __m3 * __m3) div (__m2 * __m2 * __m2) AS BIGINT)"))
          .as("skew2_ppm"),
        when(col("__m2") === 0, lit(null).cast("long"))
          .otherwise(
            expr(s"CAST((1000000 * __m4) div (__m2 * __m2) AS BIGINT)")
              - lit(3000000L))
          .as("ex_kurtosis_ppm"))
  }

  /** SPLIT-CONFORMAL RESIDUAL QUANTILE per group — the distribution-
    * free prediction-interval radius: given calibration rows carrying
    * an actual and a forecast, q̂ is the k-th smallest absolute
    * residual with k = ⌈(n+1)(1−α)⌉, and `forecast ± q̂` then covers
    * a fresh point with probability ≥ 1−α under exchangeability — no
    * normality, no variance model (Vovk et al.; the finite-sample
    * +1 is what distinguishes this from a plain quantile). When
    * k > n (tiny calibration sets can't certify the level) q̂ is
    * NULL — "not enough data", never a silently-too-narrow band.
    *
    * alphaPm is the miscoverage in per-mille (200 = 80% interval);
    * k = ((n+1)·(1000−alphaPm) + 999) div 1000 — pure integer, both
    * engines agree.
    *
    * Output per group: (group, n, q_hat).
    *
    * Scale shape: the [[exactQuantilesByGroup]] recipe on |residual| —
    * a (group, residual) histogram shuffle, a group-bounded cum
    * window, one aggregate. */
  def conformalResidualQuantile(df: DataFrame, groupCol: String,
                                actualCol: String, forecastCol: String,
                                alphaPm: Int): DataFrame = {
    require(alphaPm >= 1 && alphaPm <= 999,
      s"alphaPm must be in [1, 999], got $alphaPm")
    val res = df.where(col(actualCol).isNotNull &&
        col(forecastCol).isNotNull)
      .select(col(groupCol).as("__g"),
        abs(col(actualCol).cast("long") - col(forecastCol).cast("long"))
          .as("__r"))
    val counts = res.groupBy(col("__g"), col("__r"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__r").asc)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
    val totals = counts.groupBy(col("__g").as("__g2"))
      .agg(sum(col("__c")).as("__n"))
    val kExpr = s"((__n + 1) * ${1000 - alphaPm} + 999) div 1000"
    cum.join(totals, col("__g") <=> col("__g2"))
      .groupBy(col("__g").as(groupCol))
      .agg(first(col("__n")).cast("long").as("n"),
        min(when(col("__cum") >= expr(kExpr), col("__r")))
          .cast("long").as("q_hat"))
  }

  /** MANTEL–HAENSZEL pooled odds ratio — "is exposure associated with
    * the outcome AFTER controlling for the stratifying confounder?":
    * the stratified 2×2 estimator OR_MH = Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ),
    * immune to Simpson reversals a pooled [[chiSquare2x2Milli]] walks
    * into. Exact pinned-floor integer: each stratum contributes
    * f₁ = (10⁶·a·d) div n and f₂ = (10⁶·b·c) div n;
    * or_milli = (1000·Σf₁) div Σf₂ — all quantities non-negative.
    *
    * Output: one row (n, n_strata, or_milli) — NULL when Σf₂ = 0
    * (no discordant mass: the OR is undefined/infinite).
    *
    * Scale shape: ONE (stratum) groupBy of four conditional counts
    * (alphabet crosses the shuffle), then a 1-row finish. */
  def mantelHaenszelMilli(df: DataFrame, stratumCol: String,
                          exposedCol: String,
                          outcomeCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = df.select(col(stratumCol).as("__s"),
        col(exposedCol).cast("boolean").as("__e"),
        col(outcomeCol).cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__e").isNotNull &&
        col("__y").isNotNull)
    def cell(e: Boolean, y: Boolean) =
      sum(when(col("__e") === e && col("__y") === y, 1L).otherwise(0L))
        .cast(d38)
    b.groupBy(col("__s"))
      .agg(cell(true, true).as("__a"), cell(true, false).as("__b"),
        cell(false, true).as("__c"), cell(false, false).as("__d"),
        count(lit(1)).cast(d38).as("__n"))
      .agg(sum(col("__n")).as("__nt"), count(lit(1)).as("__k"),
        sum(expr("(1000000 * __a * __d) div __n")).as("__f1"),
        sum(expr("(1000000 * __b * __c) div __n")).as("__f2"))
      .select(col("__nt").cast("long").as("n"),
        col("__k").cast("long").as("n_strata"),
        when(col("__f2") === 0 || col("__f2").isNull,
          lit(null).cast("long"))
          .otherwise(expr("CAST((1000 * __f1) div __f2 AS BIGINT)"))
          .as("or_milli"))
  }

  /** COARSENED-EXACT-MATCHING ATT — the observational companion to
    * [[didMicro]]/[[cupedAdjustMilli]]: coarsen confounders into a
    * stratum key upstream, keep only strata containing BOTH arms, and
    * estimate the average treatment effect on the treated as the
    * treated-weighted mean of within-stratum arm differences (Iacus/
    * King/Porro's CEM with the standard ATT weights). Everything
    * outside a matched stratum is reported, not silently dropped.
    *
    * Exact integer: per matched stratum the arm means pin at micro
    * grain (non-negative division), their difference is signed
    * ADDITION, the n_t-weighted sum divides once by sign-magnitude
    * (att = sgn·(|Σ| div N_t^matched)).
    *
    * Output: one row (n, n_strata, n_strata_matched, n_treat_matched,
    * n_treat_unmatched, n_ctrl_unmatched, att_micro) — att NULL when
    * nothing matches.
    *
    * Scale shape: ONE (stratum, arm) groupBy (map-side partial),
    * stratum-grain algebra, 1-row finish. */
  def cemAttMicro(df: DataFrame, treatCol: String, stratumCol: String,
                  valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df.select(col(stratumCol).as("__s"),
        col(treatCol).cast("boolean").as("__t"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__s").isNotNull && col("__t").isNotNull &&
        col("__x").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).cast(d38).as("__nt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).cast(d38).as("__nc"),
        sum(when(col("__t"), col("__x")).otherwise(0L)).cast(d38)
          .as("__st"),
        sum(when(!col("__t"), col("__x")).otherwise(0L)).cast(d38)
          .as("__sc"))
    cells.agg(
        sum(col("__nt") + col("__nc")).as("__n"),
        count(lit(1)).as("__k"),
        sum(when(col("__nt") > 0 && col("__nc") > 0, 1L).otherwise(0L))
          .as("__km"),
        sum(when(col("__nt") > 0 && col("__nc") > 0, col("__nt"))
          .otherwise(lit(0).cast(d38))).as("__ntm"),
        sum(when(col("__nc") === 0, col("__nt")).otherwise(lit(0).cast(d38)))
          .as("__ntu"),
        sum(when(col("__nt") === 0, col("__nc")).otherwise(lit(0).cast(d38)))
          .as("__ncu"),
        sum(when(col("__nt") > 0 && col("__nc") > 0,
          col("__nt") * (expr("(1000000 * __st) div __nt") -
            expr("(1000000 * __sc) div __nc")))
          .otherwise(lit(0).cast(d38))).as("__acc"))
      .select(col("__n").cast("long").as("n"),
        col("__k").cast("long").as("n_strata"),
        col("__km").cast("long").as("n_strata_matched"),
        col("__ntm").cast("long").as("n_treat_matched"),
        col("__ntu").cast("long").as("n_treat_unmatched"),
        col("__ncu").cast("long").as("n_ctrl_unmatched"),
        when(col("__ntm") === 0, lit(null).cast("long"))
          .otherwise(signum(col("__acc")).cast("long") *
            expr("CAST(abs(__acc) div __ntm AS BIGINT)"))
          .as("att_micro"))
  }

  /** EMPIRICAL-BAYES RATE SHRINKAGE — the smoothed-CTR/conversion
    * estimator: a key with 1 hit in 2 trials should NOT rank above one
    * with 480 in 1000, so every key's rate pulls toward a Beta(α, β)
    * prior by its own evidence: shrunk = (x + α)/(n + α + β). Supply
    * the prior as integer pseudo-counts (α/(α+β) = the global rate you
    * shrink toward; α+β = how many observations the prior is worth —
    * fit upstream by moments or fix by policy). Exact one-division
    * integer per key.
    *
    * Output per key: (key, n, hits, raw_ppm, shrunk_ppm).
    *
    * Scale shape: ONE map-side-partial groupBy; the arithmetic is
    * map-only over the key grain. */
  def shrunkRatesPpm(df: DataFrame, keyCol: String, hitCol: String,
                     priorAlpha: Long, priorBeta: Long): DataFrame = {
    require(priorAlpha >= 0 && priorBeta >= 0 &&
      priorAlpha + priorBeta > 0,
      s"prior pseudo-counts must be non-negative and not both zero")
    df.select(col(keyCol).as("__k"),
        col(hitCol).cast("long").as("__h"))
      .where(col("__k").isNotNull && col("__h").isNotNull)
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"), sum(col("__h")).as("__x"))
      .select(col("__k").as(keyCol), col("__n").cast("long").as("n"),
        col("__x").cast("long").as("hits"),
        expr("(1000000 * __x) div __n").as("raw_ppm"),
        expr(s"""(1000000 * (__x + ${priorAlpha}L))
               |div (__n + ${priorAlpha + priorBeta}L)"""
          .stripMargin.replace("\n", " ")).as("shrunk_ppm"))
  }

  /** ONE-SAMPLE KS against the DISCRETE UNIFORM on [lo, hi] — the
    * hash/bucket-uniformity audit ([[ksTwoSamplePpm]] compares two
    * samples; this compares one sample to the theory a partitioner or
    * RNG claims): D = sup |F̂ − F| evaluated on BOTH sides of every
    * step (the empirical CDF jumps; checking only the top of each
    * step misses half the deviations). Exact cross-multiplied:
    *
    *   D_ppm = (10⁶ · max_v max(|cum·R − (v−lo+1)·n|,
    *                            |(cum−c)·R − (v−lo)·n|)) div (n·R)
    *
    * with R = hi − lo + 1. Values outside [lo, hi] are a contract
    * violation and fail loudly AT EVALUATION (raise_error rides the
    * plan — building the query runs no job; they make the reference
    * CDF meaningless).
    *
    * Output: one row (n, d_ppm).
    *
    * Scale shape: value histogram (distinct values shuffle, not rows),
    * the checkpoint-offset running sum, a 1-row max. */
  def ksUniformPpm(df: DataFrame, valueCol: String, lo: Long,
                   hi: Long): DataFrame = {
    require(lo <= hi, s"need lo <= hi, got [$lo, $hi]")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val r = hi - lo + 1
    val hist = df.select(col(valueCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    // loud contract check, LAZILY: an out-of-support value rides the
    // single evaluation as __badv and raises at runtime — building
    // the plan (explain, plan audits, queries maps) runs no job
    val cum = GlobalRank.globalRunningSum(hist, Seq(col("__v").asc),
      "__c", "__cum")
    val tot = hist.agg(sum(col("__c")).cast(d38).as("__n"),
      max(when(col("__v") < lo || col("__v") > hi, col("__v")))
        .as("__badv"))
    cum.crossJoin(broadcast(tot))
      .select(col("__n"), col("__badv"),
        greatest(
          abs(col("__cum").cast(d38) * r -
            (col("__v") - lo + 1).cast(d38) * col("__n")),
          abs((col("__cum") - col("__c")).cast(d38) * r -
            (col("__v") - lo).cast(d38) * col("__n"))).as("__dev"))
      .agg(first(col("__n")).as("__n"), max(col("__dev")).as("__d"),
        first(col("__badv")).as("__badv"))
      .select(
        when(col("__badv").isNotNull,
          raise_error(concat(lit("ksUniformPpm: value "),
            col("__badv"),
            lit(s" outside the declared support [$lo, $hi]")))
            .cast("long"))
          .otherwise(col("__n").cast("long")).as("n"),
        expr(s"CAST((1000000 * __d) div (__n * ${r}L) AS BIGINT)")
          .as("d_ppm"))
  }

  /** KISH DESIGN EFFECT — how much does unequal cluster size inflate
    * the variance of a cluster-randomized readout vs simple random
    * sampling? deff = 1 + cv² of the cluster sizes = k·Σn_c²/(Σn_c)²;
    * the factor the effective sample size divides by (n_eff = n/deff)
    * before any A/B power or CI claim on user-clustered data. Exactly
    * 1000 milli for equal clusters.
    *
    * Output: one row (n_rows, n_clusters, deff_milli, n_eff) —
    * n_eff = (1000·n) div deff_milli.
    *
    * Scale shape: one cluster-size groupBy (map-side partial), a
    * 1-row finish. */
  def designEffectMilli(df: DataFrame, clusterCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    df.where(col(clusterCol).isNotNull)
      .groupBy(col(clusterCol)).agg(count(lit(1)).cast(d38).as("__w"))
      .agg(sum(col("__w")).as("__n"), count(lit(1)).cast(d38).as("__k"),
        sum(col("__w") * col("__w")).as("__w2"))
      .select(col("__n").cast("long").as("n_rows"),
        col("__k").cast("long").as("n_clusters"),
        expr("CAST((1000 * __k * __w2) div (__n * __n) AS BIGINT)")
          .as("deff_milli"),
        expr("""CAST((1000 * __n)
              |div ((1000 * __k * __w2) div (__n * __n)) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("n_eff"))
  }

  /** CHAPMAN CAPTURE–RECAPTURE population estimate — "how big is the
    * whole population given two overlapping samples?": mark n₁, catch
    * n₂, observe m recaptures; N̂ = (n₁+1)(n₂+1)/(m+1) − 1 (Chapman's
    * bias-corrected Lincoln–Petersen, finite even at m = 0). The
    * dedup-world reading: two independent crawls overlapping this
    * little imply this many documents exist in total.
    *
    * Exact integer: n_hat = ((n₁+1)(n₂+1)) div (m+1) − 1; the
    * classic variance is surfaced ppm-scaled the same pinned way.
    *
    * Output: one row (n1, n2, m, n_hat, var_milli).
    *
    * Scale shape: two presence flags per id (one groupBy over the
    * union — ids shuffle once), then a 1-row count aggregate. */
  def captureRecapture(a: DataFrame, b: DataFrame,
                       idCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val flags = a.select(col(idCol).as("__id")).where(col("__id").isNotNull)
      .distinct().withColumn("__w", lit(1L))
      .unionByName(b.select(col(idCol).as("__id"))
        .where(col("__id").isNotNull).distinct().withColumn("__w", lit(2L)))
      .groupBy(col("__id")).agg(sum(col("__w")).as("__f"))
    flags.agg(
        sum(when(col("__f") === 1L || col("__f") === 3L, 1L)
          .otherwise(0L)).cast(d38).as("__n1"),
        sum(when(col("__f") >= 2L, 1L).otherwise(0L)).cast(d38).as("__n2"),
        sum(when(col("__f") === 3L, 1L).otherwise(0L)).cast(d38).as("__m"))
      .select(col("__n1").cast("long").as("n1"),
        col("__n2").cast("long").as("n2"),
        col("__m").cast("long").as("m"),
        expr("""CAST(((__n1 + 1) * (__n2 + 1)) div (__m + 1) - 1
              |AS BIGINT)""".stripMargin.replace("\n", " ")).as("n_hat"),
        expr("""CAST((1000 * (__n1 + 1) * (__n2 + 1) * (__n1 - __m)
              |* (__n2 - __m))
              |div ((__m + 1) * (__m + 1) * (__m + 2)) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("var_milli"))
  }

  /** DIFFERENCE-IN-DIFFERENCES, exact integer — the natural-experiment
    * estimator: how much more did the TREATED group's metric move
    * across the event than the CONTROL group's?
    * DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre).
    * Each cell mean is pinned-floored at MICRO grain and the estimate
    * is pure signed ADDITION of those four integers — no signed
    * division anywhere, so engines can't disagree on negative
    * rounding. Complements [[cupedAdjustMilli]] (randomized + pre-
    * period covariate) for the non-randomized before/after case.
    *
    * Output: one row (n, m_treat_pre_micro, m_treat_post_micro,
    * m_ctrl_pre_micro, m_ctrl_post_micro, did_micro) — all NULL-able:
    * any empty cell leaves the estimate (and that cell's mean) NULL.
    *
    * Scale shape: ONE map-side-partial groupBy over the four cells,
    * then a 1-row finish. */
  def didMicro(df: DataFrame, treatCol: String, postCol: String,
               valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = df.select(col(treatCol).cast("boolean").as("__t"),
        col(postCol).cast("boolean").as("__p"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__t").isNotNull && col("__p").isNotNull &&
        col("__x").isNotNull)
    def cell(t: Boolean, p: Boolean, out: String) =
      when(sum(when(col("__t") === t && col("__p") === p, 1L)) > 0,
        expr(s"""(1000000 * sum(CASE WHEN __t = $t AND __p = $p
                |  THEN CAST(__x AS DECIMAL(38,0)) END))
                |div sum(CASE WHEN __t = $t AND __p = $p THEN 1 END)"""
          .stripMargin.replace("\n", " ")))
        .otherwise(lit(null)).cast("long").as(out)
    b.agg(count(lit(1)).as("n"),
        cell(true, false, "m_treat_pre_micro"),
        cell(true, true, "m_treat_post_micro"),
        cell(false, false, "m_ctrl_pre_micro"),
        cell(false, true, "m_ctrl_post_micro"))
      .select(col("n"), col("m_treat_pre_micro"),
        col("m_treat_post_micro"), col("m_ctrl_pre_micro"),
        col("m_ctrl_post_micro"),
        (col("m_treat_post_micro") - col("m_treat_pre_micro") -
          (col("m_ctrl_post_micro") - col("m_ctrl_pre_micro")))
          .cast("long").as("did_micro"))
  }

  /** POST-STRATIFIED MEAN per variant — the composition-drift fix for
    * A/B readouts: re-weight each stratum's mean to a DECLARED target
    * mix (the population's, or the design's) so a variant that
    * accidentally over-sampled heavy strata isn't credited for it.
    * The estimator behind "adjusted" topline metrics, and the exact
    * companion to [[cupedAdjustMilli]] (CUPED removes pre-period
    * variance; this removes composition bias).
    *
    * Exact pinned-floor integer:
    *   post·10³ = ( Σ_s w_s · (10⁶·S_s div n_s) ) div 10⁶
    * (per-stratum mean floored at micro grain, then the per-mille
    * weighted average floored to milli — deterministic in any engine).
    *
    * A variant MISSING one of the target strata cannot be re-weighted
    * honestly — its post-stratified mean goes NULL and
    * `n_missing_strata` says why; strata present in the data but
    * absent from the target are excluded from the estimate and
    * counted in `n_unweighted_rows` (loud, never silent).
    *
    * Output per variant: (variant, n, n_missing_strata,
    * n_unweighted_rows, raw_mean_milli, post_mean_milli).
    *
    * Scale shape: one (variant, stratum) map-side-partial groupBy,
    * a broadcast join against the literal target mix, a per-variant
    * rollup. */
  def postStratifiedMeanMilli(df: DataFrame, variantCol: String,
                              stratumCol: String, valueCol: String,
                              targetPm: Seq[(String, Long)]): DataFrame = {
    require(targetPm.nonEmpty && targetPm.map(_._2).sum == 1000 &&
      targetPm.forall(_._2 > 0),
      "target per-mille weights must be positive and sum to 1000")
    require(targetPm.map(_._1).distinct.size == targetPm.size,
      "duplicate stratum in target mix")
    val spark = df.sparkSession
    import spark.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df.where(col(variantCol).isNotNull &&
        col(stratumCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(variantCol).as("__v"),
        col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).cast(d38).as("__n"),
        sum(col(valueCol).cast("long").cast(d38)).as("__sum"))
    val target = targetPm.toDF("__st", "__w")
    val k = targetPm.size
    cells.join(broadcast(target), col("__s") === col("__st"),
        "left")
      .groupBy(col("__v"))
      .agg(sum(col("__n")).as("__nt"),
        sum(when(col("__w").isNotNull, 1L).otherwise(0L)).as("__k"),
        sum(when(col("__w").isNull, col("__n")).otherwise(lit(0).cast(d38)))
          .as("__unw"),
        sum(col("__sum")).as("__st_all"),
        sum(expr("__w * ((1000000 * __sum) div __n)")).as("__acc"))
      .select(col("__v").as(variantCol),
        col("__nt").cast("long").as("n"),
        (lit(k.toLong) - col("__k")).cast("long").as("n_missing_strata"),
        col("__unw").cast("long").as("n_unweighted_rows"),
        expr("CAST((1000 * __st_all) div __nt AS BIGINT)")
          .as("raw_mean_milli"),
        when(col("__k") < k, lit(null).cast("long"))
          .otherwise(expr("CAST(__acc div 1000000 AS BIGINT)"))
          .as("post_mean_milli"))
  }

  /** TWO-COVARIATE OLS per group, exact integer — multiple linear
    * regression y = b₀ + b₁x₁ + b₂x₂ solved by Cramer's rule on the
    * 3×3 normal-equation moment matrix, every determinant an integer
    * polynomial of the nine power sums, so the coefficients are exact
    * rationals surfaced in truncated milli ([[groupTrend]] fits one
    * covariate; this is the "controlling for X" step — spend vs time
    * AND volume, quality vs length AND language).
    *
    * Determinant signs ride separately from the one magnitude division
    * (bᵢ = sgn(detᵢ·det)·(10³·|detᵢ| div |det|)) — truncate-toward-
    * zero in BOTH engines, never a signed floor mismatch.
    *
    * Output per group: (group, n, b0_milli, b1_milli, b2_milli) —
    * betas NULL when n < 3 or the moment matrix is singular
    * (collinear covariates, constant column).
    *
    * Overflow bound: determinants are degree-3 in the second moments
    * (≈ (n·x²)³) — exact in DECIMAL(38,0) while n·max(x)² ≲ 10¹¹;
    * center/rescale covariates first for wider inputs (the
    * [[chiSquare2x2Milli]] documentation stance).
    *
    * Scale shape: ONE map-side-partial groupBy computing nine sums;
    * all algebra on the k-row group frame. */
  def olsMilli(df: DataFrame, groupCol: String, yCol: String,
               x1Col: String, x2Col: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = df.select(col(groupCol).as("__g"),
        col(yCol).cast("long").as("__y"),
        col(x1Col).cast("long").as("__x1"),
        col(x2Col).cast("long").as("__x2"))
      .where(col("__g").isNotNull && col("__y").isNotNull &&
        col("__x1").isNotNull && col("__x2").isNotNull)
    val m = b.groupBy(col("__g"))
      .agg(count(lit(1)).cast(d38).as("__n"),
        sum(col("__x1").cast(d38)).as("__s1"),
        sum(col("__x2").cast(d38)).as("__s2"),
        sum((col("__x1") * col("__x1")).cast(d38)).as("__s11"),
        sum((col("__x1") * col("__x2")).cast(d38)).as("__s12"),
        sum((col("__x2") * col("__x2")).cast(d38)).as("__s22"),
        sum(col("__y").cast(d38)).as("__sy"),
        sum((col("__x1") * col("__y")).cast(d38)).as("__s1y"),
        sum((col("__x2") * col("__y")).cast(d38)).as("__s2y"))
    val det =
      """(__n*(__s11*__s22 - __s12*__s12)
        | - __s1*(__s1*__s22 - __s12*__s2)
        | + __s2*(__s1*__s12 - __s11*__s2))""".stripMargin
        .replace("\n", " ")
    val det0 =
      """(__sy*(__s11*__s22 - __s12*__s12)
        | - __s1*(__s1y*__s22 - __s12*__s2y)
        | + __s2*(__s1y*__s12 - __s11*__s2y))""".stripMargin
        .replace("\n", " ")
    val det1 =
      """(__n*(__s1y*__s22 - __s12*__s2y)
        | - __sy*(__s1*__s22 - __s12*__s2)
        | + __s2*(__s1*__s2y - __s1y*__s2))""".stripMargin
        .replace("\n", " ")
    val det2 =
      """(__n*(__s11*__s2y - __s1y*__s12)
        | - __s1*(__s1*__s2y - __s1y*__s2)
        | + __sy*(__s1*__s12 - __s11*__s2))""".stripMargin
        .replace("\n", " ")
    def beta(detI: String, out: String) =
      when(col("__n") < 3 || expr(det) === 0, lit(null).cast("long"))
        .otherwise(expr(
          s"""CAST(CAST(sign($detI) AS DECIMAL(2,0))
             | * CAST(sign($det) AS DECIMAL(2,0))
             | * ((1000 * abs($detI)) div abs($det)) AS BIGINT)"""
            .stripMargin.replace("\n", " "))).as(out)
    m.select(col("__g").as(groupCol), col("__n").cast("long").as("n"),
      beta(det0, "b0_milli"), beta(det1, "b1_milli"),
      beta(det2, "b2_milli"))
  }

  /** CHI-SQUARE GOODNESS-OF-FIT against DECLARED per-mille proportions
    * — the sample-ratio-mismatch (SRM) screen every A/B platform runs
    * before reading an experiment (a 50/50 split that lands 52/48 on
    * millions of units means the assignment is broken and every
    * downstream readout invalid), and the design-mix audit for a
    * corpus ("was this really sampled 200‰ per source?").
    * [[chiSquare2x2Milli]]/[[chiSquareKxMMilli]] test independence of
    * two observed columns; this tests ONE observed column against a
    * THEORY.
    *
    * Exact pinned-floor integer: with e_i = n·p_i/1000,
    *   χ²·10³ = Σ_i (1000·o_i − n·p_i)² div (n·p_i)
    * (each term floored, then summed — deterministic in any engine).
    * Expected categories with ZERO observed rows still contribute
    * (the full-outer join); observed categories with no declared
    * proportion make the statistic undefined — chi2 goes NULL and
    * `n_unexpected` says why, loudly.
    *
    * Output: one row (n, k_expected, n_unexpected, chi2_milli); dof =
    * k_expected − 1.
    *
    * Scale shape: one category groupBy (alphabet crosses the shuffle,
    * not rows), a broadcast join against the literal expectation
    * table, a 1-row finish. */
  def chiSquareGofMilli(df: DataFrame, catCol: String,
                        expectedPm: Seq[(String, Long)]): DataFrame = {
    require(expectedPm.nonEmpty && expectedPm.map(_._2).sum == 1000 &&
      expectedPm.forall(_._2 > 0),
      s"expected per-mille weights must be positive and sum to 1000")
    require(expectedPm.map(_._1).distinct.size == expectedPm.size,
      "duplicate category in expectation table")
    val spark = df.sparkSession
    import spark.implicits._
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val obs = df.where(col(catCol).isNotNull)
      .groupBy(col(catCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__o"))
    val exp = expectedPm.toDF("__ce", "__p")
    val j = obs.join(broadcast(exp), col("__c") === col("__ce"),
        "full_outer")
      .select(coalesce(col("__o"), lit(0L)).cast(d38).as("__o"),
        col("__p").cast(d38).as("__p"))
    val tot = j.agg(sum(col("__o")).as("__n"))
    j.crossJoin(broadcast(tot))
      .agg(first(col("__n")).as("__n"),
        sum(when(col("__p").isNotNull, 1L).otherwise(0L)).as("__k"),
        sum(when(col("__p").isNull && col("__o") > 0, 1L).otherwise(0L))
          .as("__u"),
        sum(expr("""((1000 * __o - __n * __p) * (1000 * __o - __n * __p))
                  | div (__n * __p)""".stripMargin.replace("\n", " ")))
          .as("__chi"))
      .select(col("__n").cast("long").as("n"),
        col("__k").cast("long").as("k_expected"),
        col("__u").cast("long").as("n_unexpected"),
        when(col("__u") > 0 || col("__n") === 0 || col("__n").isNull,
          lit(null).cast("long"))
          .otherwise(col("__chi").cast("long")).as("chi2_milli"))
  }

  /** ROC CURVE POINTS, exact integer — the threshold-sweep table
    * behind [[aucPpm]]'s single number: one row per distinct score
    * value t (classifier: score ≥ t ⇒ positive) carrying the
    * confusion prefix (tp, fp) and the three standard rates in ppm.
    * Feed a monitoring UI or pick an operating point; [[gainsTable]]
    * is the decile-grain cousin, this is the full-resolution curve.
    *
    * Output, one row per distinct score: (threshold, tp, fp,
    * tpr_ppm, fpr_ppm, precision_ppm) — tpr NULL when no positives,
    * fpr NULL when no negatives (precision's denominator tp+fp > 0 by
    * construction: the threshold row itself contributes).
    *
    * Scale shape: rows collapse to the SCORE HISTOGRAM first (distinct
    * scores shuffle, never rows); cumulative tp/fp via the
    * checkpoint-and-offset [[GlobalRank.globalRunningSum]] (no global
    * window); totals are a 1-row broadcast. Bucket continuous scores
    * first to bound the curve ([[discretize]]). */
  def rocCurvePoints(df: DataFrame, scoreCol: String,
                     labelCol: String): DataFrame = {
    val hist = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("__s"))
      .agg(count(lit(1)).as("__w"), sum(col(labelCol).cast("long"))
        .as("__p"))
    val cum = GlobalRank.globalRunningSum(
      GlobalRank.globalRunningSum(hist, Seq(col("__s").desc), "__w",
        "__cw"),
      Seq(col("__s").desc), "__p", "__cp")
    val totals = hist.agg(sum(col("__w")).as("__n"),
      sum(col("__p")).as("__pos"))
    cum.crossJoin(broadcast(totals))
      .select(col("__s").as("threshold"), col("__cp").as("tp"),
        (col("__cw") - col("__cp")).as("fp"),
        when(col("__pos") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000 * __cp) div __pos")).as("tpr_ppm"),
        when(col("__n") === col("__pos"), lit(null).cast("long"))
          .otherwise(expr(
            "(1000000 * (__cw - __cp)) div (__n - __pos)")).as("fpr_ppm"),
        expr("(1000000 * __cp) div __cw").as("precision_ppm"))
  }

  /** AVERAGE PRECISION (the step-function PR-AUC estimator) in exact
    * integer ppm: AP = Σ_t ΔR_t · P_t over thresholds descending —
    * and because tp is the running sum of per-score positives, ΔR at
    * threshold t is just p_t/P, so the whole area is ONE pass over the
    * score histogram:
    *
    *   ap_ppm = ( Σ_t p_t · (10⁶·tp_t div (tp_t+fp_t)) ) div P
    *
    * (inner precision pinned-floored per threshold, then the
    * positive-mass average — the documented estimator, deterministic
    * in any engine). The ROC cousin [[aucPpm]] is rank-based; AP is
    * the number to watch under class imbalance.
    *
    * Output: one row (n, n_pos, prevalence_ppm, ap_ppm) — ap NULL
    * when there are no positives.
    *
    * Scale shape: identical to [[rocCurvePoints]] — histogram,
    * checkpoint-offset running sums, 1-row final aggregate. */
  def averagePrecisionPpm(df: DataFrame, scoreCol: String,
                          labelCol: String): DataFrame = {
    val hist = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("__s"))
      .agg(count(lit(1)).as("__w"), sum(col(labelCol).cast("long"))
        .as("__p"))
    val cum = GlobalRank.globalRunningSum(
      GlobalRank.globalRunningSum(hist, Seq(col("__s").desc), "__w",
        "__cw"),
      Seq(col("__s").desc), "__p", "__cp")
    cum.agg(sum(col("__w")).as("__n"), sum(col("__p")).as("__pos"),
        sum(expr("__p * ((1000000 * __cp) div __cw)")).as("__a"))
      .select(col("__n").cast("long").as("n"),
        col("__pos").cast("long").as("n_pos"),
        expr("(1000000 * __pos) div __n").cast("long")
          .as("prevalence_ppm"),
        when(col("__pos") === 0, lit(null).cast("long"))
          .otherwise(expr("__a div __pos")).as("ap_ppm"))
  }

  /** WELCH'S t² per group — the unequal-variance two-sample test every
    * A/B readout should default to ([[anovaFMicro]] assumes pooled
    * variance; Welch does not): t² = (x̄₁−x̄₂)² / (s₁²/n₁ + s₂²/n₂),
    * reduced to ONE exact integer division by clearing denominators:
    *
    *   t²·10³ = 1000·(S₁₁n₂ − S₁₂n₁)²·(n₁−1)(n₂−1)
    *            div [ (n₁S₂₁−S₁₁²)·n₂²(n₂−1) + (n₂S₂₂−S₁₂²)·n₁²(n₁−1) ]
    *
    * The division is over non-negative quantities (numerator a square,
    * denominator a sum of n-scaled variances); the mean-difference
    * DIRECTION is surfaced separately as `sign` so no signed division
    * ever happens (the repo-wide div ↔ DuckDB `//` contract).
    *
    * Output per group: (group, n1, n2, sign, t2_milli) — t2_milli NULL
    * when either side has < 2 rows or both variances are 0.
    *
    * Overflow bound (the [[chiSquare2x2Milli]] precedent): the
    * numerator is 10³·(ΔS·n)²·n²-scale — exact in DECIMAL(38,0) while
    * n·max|x|·n ≲ 10¹⁷ (e.g. n ≤ 2·10⁵ with |x| ≤ 10³); pre-scale the
    * metric down for bigger inputs.
    *
    * Scale shape: ONE map-side-partial groupBy over the rows; all the
    * algebra happens on the k-row group frame. */
  def welchT2Milli(df: DataFrame, groupCol: String, flagCol: String,
                   valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = df.select(col(groupCol).as("__g"),
        col(flagCol).cast("boolean").as("__f"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__g").isNotNull && col("__f").isNotNull &&
        col("__x").isNotNull)
    def side(f: Boolean, c: Column): Column = sum(when(col("__f") === f, c))
    b.groupBy(col("__g"))
      .agg(side(true, lit(1L)).cast(d38).as("__n1"),
        side(false, lit(1L)).cast(d38).as("__n2"),
        side(true, col("__x").cast(d38)).as("__s11"),
        side(false, col("__x").cast(d38)).as("__s12"),
        side(true, (col("__x") * col("__x")).cast(d38)).as("__s21"),
        side(false, (col("__x") * col("__x")).cast(d38)).as("__s22"))
      .select(col("__g").as(groupCol),
        coalesce(col("__n1"), lit(0)).cast("long").as("n1"),
        coalesce(col("__n2"), lit(0)).cast("long").as("n2"),
        when(col("__n1").isNull || col("__n2").isNull, lit(null))
          .otherwise(signum(col("__s11") * col("__n2") -
            col("__s12") * col("__n1"))).cast("long").as("sign"),
        when(col("__n1").isNull || col("__n2").isNull ||
            col("__n1") < 2 || col("__n2") < 2 ||
            expr("""(__n1*__s21 - __s11*__s11) * __n2*__n2*(__n2-1)
                  | + (__n2*__s22 - __s12*__s12) * __n1*__n1*(__n1-1)"""
              .stripMargin.replace("\n", " ")) === 0,
            lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000 * (__s11*__n2 - __s12*__n1)
              |            * (__s11*__n2 - __s12*__n1)
              |            * (__n1-1) * (__n2-1))
              |div ((__n1*__s21 - __s11*__s11) * __n2*__n2*(__n2-1)
              |   + (__n2*__s22 - __s12*__s12) * __n1*__n1*(__n1-1))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("t2_milli"))
  }

  /** KENDALL τ-b² in exact integer ppm per group — the
    * concordance-based rank correlation completing the family
    * ([[pearsonR2Ppm]] linear, [[spearmanR2Ppm]] monotone-by-midrank):
    * τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)) with the standard tie corrections.
    * Surfaced squared-with-sign (the repo r² convention kills the
    * square root): with doubled pair counts N₀ = n(n−1),
    * N₁ = Σₓtₓ(tₓ−1), N₂ = Σᵧtᵧ(tᵧ−1),
    *
    *   tau2_ppm = 10⁶·4·(C−D)² div ((N₀−N₁)(N₀−N₂)),  sign = sgn(C−D)
    *
    * Output per group: (group, n, sign, tau2_ppm) — NULL when either
    * margin is all-ties (N₀ = N₁ or N₀ = N₂).
    *
    * Scale shape: rows collapse to VALUE CELLS (group, x, y, count)
    * first; C and D come from the within-group cell-PAIR join
    * (lexicographic struct(x,y) ordering counts each unordered pair
    * once) — O(cells²) per group, never O(rows²). The caller buckets
    * continuous inputs to bound the cell alphabet (the
    * [[equiDepthBoundaries]]/[[discretize]] path); tie corrections
    * come from the two marginal histograms, rows never pair. */
  def kendallTau2Ppm(df: DataFrame, groupCol: String,
                     xCol: String, yCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(groupCol).as("__g"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .where(col("__g").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
    val cells = base.groupBy(col("__g"), col("__x"), col("__y"))
      .agg(count(lit(1)).cast(d38).as("__c"))
    val a = cells.select(col("__g").as("__ga"), col("__x").as("__xa"),
      col("__y").as("__ya"), col("__c").as("__ca"))
    val bb = cells.select(col("__g").as("__gb"), col("__x").as("__xb"),
      col("__y").as("__yb"), col("__c").as("__cb"))
    // each unordered cell pair once: (xa,ya) < (xb,yb) lexicographic
    val pairs = a.join(bb, col("__ga") === col("__gb") &&
        (col("__xa") < col("__xb") ||
          (col("__xa") === col("__xb") && col("__ya") < col("__yb"))))
      .groupBy(col("__ga").as("__g"))
      .agg(
        sum(when(col("__xa") < col("__xb") && col("__ya") < col("__yb"),
          col("__ca") * col("__cb")).otherwise(lit(0).cast(d38)))
          .as("__cc"),
        sum(when(col("__xa") < col("__xb") && col("__ya") > col("__yb"),
          col("__ca") * col("__cb")).otherwise(lit(0).cast(d38)))
          .as("__dd"))
    def marg(vc: String, gm: String, out: String): DataFrame =
      base.groupBy(col("__g").as(gm), col(vc))
        .agg(count(lit(1)).cast(d38).as("__t"))
        .groupBy(col(gm))
        .agg(sum(col("__t") * (col("__t") - 1)).as(out),
          sum(col("__t")).cast(d38).as(out + "_n"))
    val mx = marg("__x", "__gm", "__nn1")
    val my = marg("__y", "__gm2", "__nn2").drop("__nn2_n")
    mx.join(my, col("__gm") === col("__gm2")).drop("__gm2")
      .join(pairs, col("__gm") === col("__g"), "left")
      .select(col("__gm").as(groupCol),
        col("__nn1_n").cast("long").as("n"),
        signum(coalesce(col("__cc"), lit(0).cast(d38)) -
          coalesce(col("__dd"), lit(0).cast(d38))).cast("long").as("sign"),
        when(expr("__nn1_n * (__nn1_n - 1)") === col("__nn1") ||
            expr("__nn1_n * (__nn1_n - 1)") === col("__nn2"),
            lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * 4 * (coalesce(__cc,0) - coalesce(__dd,0))
              |                  * (coalesce(__cc,0) - coalesce(__dd,0)))
              |div ((__nn1_n * (__nn1_n - 1) - __nn1)
              |   * (__nn1_n * (__nn1_n - 1) - __nn2))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("tau2_ppm"))
  }

  /** COHEN'S D (pooled) — the EFFECT SIZE next to [[welchT2Milli]]'s
    * significance: how many pooled standard deviations separate the
    * two group means. Like every sqrt-bearing statistic here
    * (pearsonR2Ppm, matthewsCorrPpm), the engine-stable quantities are
    * the SIGN and the SQUARE: d = sign·√(d²),
    *
    *   d² = (S₁n₂ − S₂n₁)²·(n₁+n₂−2)
    *        / ( n₁n₂ · ((Q₁n₁ − S₁²)·n₂ + (Q₂n₂ − S₂²)·n₁) )
    *
    * (S = Σx, Q = Σx² per group — one cross-multiplied rational, no
    * per-group floor at all). NULL when either group is empty,
    * n₁+n₂ < 3, or both groups are constant (pooled variance 0).
    * Magnitude: S²·n terms reach ~n³·x̄² — the DECIMAL(38,0) lane holds
    * to n ≈ 10⁷ rows at cent-scale values; winsorize or bucket first
    * past that (the spearmanR2Ppm magnitude trade).
    *
    * Output one row: (n_a, n_b, sign, d2_milli).
    *
    * Scale shape: one map-side-partial single-row aggregate — rows
    * never shuffle. */
  def cohensD2Milli(df: DataFrame, flagCol: String,
                    valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(flagCol).cast("boolean").as("__f"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__f").isNotNull && col("__v").isNotNull)
    def side(f: Boolean, c: Column) = sum(when(col("__f") === f, c))
    base.agg(
        side(true, lit(1L)).as("__na"), side(false, lit(1L)).as("__nb"),
        side(true, col("__v").cast(d38)).as("__sa"),
        side(false, col("__v").cast(d38)).as("__sb"),
        side(true, col("__v").cast(d38) * col("__v")).as("__qa"),
        side(false, col("__v").cast(d38) * col("__v")).as("__qb"))
      .select(coalesce(col("__na"), lit(0L)).cast("long").as("n_a"),
        coalesce(col("__nb"), lit(0L)).cast("long").as("n_b"),
        col("__sa"), col("__sb"), col("__qa"), col("__qb"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(0L))
          .otherwise(signum(col("__sa") * col("n_b") -
            col("__sb") * col("n_a")).cast("long")).as("sign"),
        when(col("n_a") === 0 || col("n_b") === 0 ||
            col("n_a") + col("n_b") < 3 ||
            (col("__qa") * col("n_a") - col("__sa") * col("__sa")) *
              col("n_b") +
              (col("__qb") * col("n_b") - col("__sb") * col("__sb")) *
              col("n_a") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000 * (__sa * n_b - __sb * n_a) * (__sa * n_b - __sb * n_a)
              |     * (n_a + n_b - 2))
              |div (CAST(n_a AS DECIMAL(38,0)) * n_b *
              |     ((__qa * n_a - __sa * __sa) * n_b
              |      + (__qb * n_b - __sb * __sb) * n_a))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("d2_milli"))
  }

  /** YOUDEN'S J optimal operating point — "which threshold should this
    * classifier actually ship with?": the point on [[rocCurvePoints]]
    * maximizing J = TPR − FPR (informedness), the standard
    * cost-agnostic threshold pick next to [[bestSplitThreshold]]'s
    * impurity-gain one. Ties break to the LOWEST threshold (a total
    * order — the cut is engine-independent), via one min(struct)
    * aggregate, never a window.
    *
    * Exact: J inherits the roc points' pinned floors
    * (tpr = (10⁶·tp) div P, fpr likewise), so j_ppm is determined by
    * the same integer schedule both engines replay. Degenerate inputs
    * (single-class labels) produce NULL tpr or fpr at every threshold
    * → one all-NULL row.
    *
    * Output one row: (threshold, tp, fp, tpr_ppm, fpr_ppm, j_ppm).
    *
    * Scale shape: [[rocCurvePoints]]'s histogram + running sums, then
    * ONE single-row min(struct) aggregate over the threshold
    * inventory. */
  def youdenOptimalPpm(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    val pts = rocCurvePoints(df, scoreCol, labelCol)
      .where(col("tpr_ppm").isNotNull && col("fpr_ppm").isNotNull)
      .withColumn("__j", col("tpr_ppm") - col("fpr_ppm"))
    pts.agg(min(struct((-col("__j")).as("nj"),
        col("threshold").as("t"), col("tp").as("tp"), col("fp").as("fp"),
        col("tpr_ppm").as("tpr"), col("fpr_ppm").as("fpr"))).as("m"))
      .select(col("m.t").as("threshold"), col("m.tp").as("tp"),
        col("m.fp").as("fp"), col("m.tpr").as("tpr_ppm"),
        col("m.fpr").as("fpr_ppm"), (-col("m.nj")).as("j_ppm"))
  }

  /** MATTHEWS CORRELATION (MCC) — the single-number binary-classifier
    * summary that stays honest under class imbalance, where accuracy
    * and even F1 (see the q274 class report) mislead: it only rewards
    * doing well on BOTH classes. Companion to [[aucPpm]] (threshold-
    * free) for a FIXED decision threshold.
    *
    * Exact sign-magnitude-squared form — MCC has a square root, so
    * like [[pearsonR2Ppm]] the engine-stable quantities are the sign
    * and the square: MCC = sign·√(mcc²),
    *   num      = TP·TN − FP·FN
    *   mcc2_ppm = (10⁶·num²) div ((TP+FP)(TP+FN)(TN+FP)(TN+FN))
    * NULL when any marginal is 0 (a degenerate confusion matrix —
    * all-positive predictions, no negative labels, …).
    *
    * Output one row: (tp, tn, fp, fn, sign, mcc2_ppm).
    *
    * Scale shape: one map-side-partial single-row aggregate — rows
    * never shuffle. */
  def matthewsCorrPpm(df: DataFrame, predCol: String,
                      labelCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(predCol).cast("boolean").as("__p"),
        col(labelCol).cast("boolean").as("__y"))
      .where(col("__p").isNotNull && col("__y").isNotNull)
    def cell(p: Boolean, y: Boolean) =
      sum(when(col("__p") === p && col("__y") === y, 1L).otherwise(0L))
    base.agg(cell(true, true).as("tp"), cell(false, false).as("tn"),
        cell(true, false).as("fp"), cell(false, true).as("fn"))
      .select(
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("tn"), lit(0L)).as("tn"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"))
      .select(col("tp"), col("tn"), col("fp"), col("fn"),
        signum(col("tp").cast(d38) * col("tn") -
          col("fp").cast(d38) * col("fn")).cast("long").as("sign"),
        when(col("tp") + col("fp") === 0 || col("tp") + col("fn") === 0 ||
            col("tn") + col("fp") === 0 || col("tn") + col("fn") === 0,
            lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * (CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn)
              |               * (CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn))
              |div ((CAST(tp AS DECIMAL(38,0)) + fp) * (CAST(tp AS DECIMAL(38,0)) + fn)
              |   * (CAST(tn AS DECIMAL(38,0)) + fp) * (CAST(tn AS DECIMAL(38,0)) + fn))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("mcc2_ppm"))
  }

  /** GROUP-SEQUENTIAL A/B boundaries — O'Brien–Fleming (round-11
    * verdict ask #7): the missing piece for sequential monitoring on
    * event streams next to the fixed-horizon battery (q316,
    * q328–q331). At each of `looks` interim analyses the cumulative
    * two-proportion z² is compared against the OBF boundary; OBF's
    * z-boundary is z_k = C·√(K/k), so the z² boundary is EXACTLY
    * z²_final·K/k — one pinned integer constant (`zFinal2Milli`,
    * default 4162 = 1000·2.04², the published O'Brien–Fleming
    * C_B(K=5, α=0.05 two-sided) critical constant; pass the table
    * value for other (K, α)) and a pure-integer div schedule both
    * engines replay, never a cross-engine normal quantile.
    * `schedule = "pocock"` applies the same critical z² FLAT at every
    * look (Pocock's design — cheaper early stopping, pricier final
    * look; pass e.g. 5823 = round(1000·2.413²), the published
    * C_P(5, 0.05) value).
    *
    * Pooled two-proportion z² in one exact integer ratio:
    *   z² = (x_a·n_b − x_b·n_a)²·n / (n_a·n_b·x·(n−x)),  x = x_a+x_b
    * (the algebraic collapse of (p̂_a−p̂_b)²/(p̂(1−p̂)(1/n_a+1/n_b))),
    * reported as z2_milli = (1000·num) div den in DECIMAL(38,0) lanes
    * — exact for per-look cumulative n up to ~6·10⁷ (num ≤ n⁵/16 must
    * fit 38 digits); beyond that pre-aggregate looks or accept the
    * double production path. NULL z² when a look has an empty arm or
    * a degenerate pooled rate (x = 0 or x = n) — reported, never
    * dropped.
    *
    * Input: one row per unit with a look index in [1, looks] (caller
    * buckets time), a boolean arm, and a 0/1 hit. Output: one row per
    * look — (look, na, nb, xa, xb, z2_milli, bound2_milli, crossed).
    * First crossing = min look with crossed = 1.
    *
    * Scale shape: one map-side-partial groupBy collapses the stream
    * to ≤ `looks` rows; the cumulative sums ride a triangular
    * self-join of that tiny frame (≤ looks² cells — bounded by the
    * `require`, never data-sized). */
  def groupSequentialObfMilli(df: DataFrame, lookCol: String,
                              armCol: String, hitCol: String,
                              looks: Int,
                              zFinal2Milli: Long = 4162L,
                              schedule: String = "obf"): DataFrame = {
    require(looks >= 1 && looks <= 50,
      s"looks must be in [1, 50], got $looks")
    require(zFinal2Milli > 0,
      s"zFinal2Milli must be positive, got $zFinal2Milli")
    require(schedule == "obf" || schedule == "pocock",
      s"schedule must be obf (z²·K/k) or pocock (flat), got $schedule")
    val base = df.select(col(lookCol).cast("long").as("__k"),
        col(armCol).cast("boolean").as("__a"),
        col(hitCol).cast("long").as("__h"))
      .where(col("__k").isNotNull && col("__a").isNotNull &&
        col("__h").isNotNull &&
        col("__k") >= 1L && col("__k") <= looks.toLong)
    val per = base.groupBy(col("__k"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("na_k"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("nb_k"),
        sum(when(col("__a"), col("__h")).otherwise(0L)).as("xa_k"),
        sum(when(!col("__a"), col("__h")).otherwise(0L)).as("xb_k"))
    val cum = per.as("a").join(per.as("b"),
        col("b.__k") <= col("a.__k"))
      .groupBy(col("a.__k").as("look"))
      .agg(sum(col("b.na_k")).as("na"), sum(col("b.nb_k")).as("nb"),
        sum(col("b.xa_k")).as("xa"), sum(col("b.xb_k")).as("xb"))
    val boundExpr =
      if (schedule == "obf")
        expr(s"CAST(($zFinal2Milli * ${looks}L) div look AS BIGINT)")
      else lit(zFinal2Milli) // Pocock: the same critical z² at every look
    cum.select(col("look"), col("na"), col("nb"), col("xa"), col("xb"),
        boundExpr.as("bound2_milli"),
        when(col("na") === 0 || col("nb") === 0 ||
            col("xa") + col("xb") === 0 ||
            col("xa") + col("xb") === col("na") + col("nb"),
          lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000 * (CAST(xa AS DECIMAL(38,0)) * nb - CAST(xb AS DECIMAL(38,0)) * na)
              |     * (CAST(xa AS DECIMAL(38,0)) * nb - CAST(xb AS DECIMAL(38,0)) * na)
              |     * (na + nb))
              |div (CAST(na AS DECIMAL(38,0)) * nb * (xa + xb)
              |     * (na + nb - xa - xb))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("z2_milli"))
      .withColumn("crossed",
        when(col("z2_milli").isNotNull &&
          col("z2_milli") >= col("bound2_milli"), lit(1L))
          .otherwise(lit(0L)))
  }

  /** MDE² POWER PROBE — "is this experiment big enough yet?": the
    * minimum detectable effect for a two-sample mean test at the
    * CURRENT sample sizes and variances, next to the observed effect.
    * The planning readout that belongs before [[welchT2Milli]]'s
    * significance and [[groupSequentialObfMilli]]'s stopping rule:
    * an insignificant result is only informative once the observed
    * |Δ| is read against what the experiment COULD have detected.
    *
    * No-sqrt stance (the pearsonR2Ppm / cohensD2Milli trade): the
    * surfaced quantity is MDE² in squared value units,
    *   MDE² = (z_{α/2}+z_β)² · (s_a²/n_a + s_b²/n_b)
    * with the z-sum squared PINNED as an integer constant — never a
    * cross-engine quantile: default `zSumSqMilli` = 7849 =
    * round(1000·(1.959964+0.841621)²), i.e. α = 5% two-sided at 80%
    * power (the OBF 4162-constant stance).
    *
    * Pinned floor schedule (documented, replayed by the oracle):
    *   term_g  = (10⁶·(n_g·Σx² − (Σx)²)) div (n_g²·(n_g−1))
    *             [per-SIDE floor — s_g²/n_g in micro units]
    *   mde2_micro = (zSumSqMilli·(term_a + term_b)) div 1000
    *   d_milli = (10³·|Σx_a·n_b − Σx_b·n_a|) div (n_a·n_b)
    *   diff2_micro = d_milli²     [the floored milli-diff squared —
    *             values ≤ ~10⁶ keep d_milli ≤ ~10⁹, square fits long]
    *   powered = 1 iff diff2_micro ≥ mde2_micro
    * All divided quantities non-negative — floor direction never
    * splits the engines. NULL lanes (and powered NULL) when either
    * side has n < 2.
    *
    * Output one row: (n_a, n_b, mde2_micro, diff2_micro, powered).
    *
    * Scale shape: ONE map-side-partial single-row aggregate — rows
    * never shuffle. */
  def mdeProbeMicro(df: DataFrame, flagCol: String, valueCol: String,
                    zSumSqMilli: Long = 7849L): DataFrame = {
    require(zSumSqMilli > 0, s"zSumSqMilli must be > 0, got $zSumSqMilli")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = df.select(col(flagCol).cast("boolean").as("__f"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__f").isNotNull && col("__x").isNotNull)
    def side(f: Boolean, c: Column): Column = sum(when(col("__f") === f, c))
    b.agg(side(true, lit(1L)).as("__na"),
        side(false, lit(1L)).as("__nb"),
        side(true, col("__x").cast(d38)).as("__sa"),
        side(false, col("__x").cast(d38)).as("__sb"),
        side(true, (col("__x").cast(d38) * col("__x"))).as("__qa"),
        side(false, (col("__x").cast(d38) * col("__x"))).as("__qb"))
      .select(coalesce(col("__na"), lit(0L)).cast("long").as("n_a"),
        coalesce(col("__nb"), lit(0L)).cast("long").as("n_b"),
        col("__sa"), col("__sb"), col("__qa"), col("__qb"))
      .withColumn("__mde2", when(col("n_a") < 2 || col("n_b") < 2,
          lit(null).cast("long"))
        .otherwise(expr(
          s"""CAST(($zSumSqMilli *
             | ((1000000 * (CAST(n_a AS DECIMAL(38,0)) * __qa - __sa * __sa))
             |    div (CAST(n_a AS DECIMAL(38,0)) * n_a * (n_a - 1))
             |  + (1000000 * (CAST(n_b AS DECIMAL(38,0)) * __qb - __sb * __sb))
             |    div (CAST(n_b AS DECIMAL(38,0)) * n_b * (n_b - 1))))
             |div 1000 AS BIGINT)""".stripMargin.replace("\n", " "))))
      .withColumn("__d", when(col("n_a") < 2 || col("n_b") < 2,
          lit(null).cast("long"))
        .otherwise(expr(
          """CAST((1000 * abs(__sa * n_b - __sb * n_a))
            |div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
            .stripMargin.replace("\n", " "))))
      .select(col("n_a"), col("n_b"),
        col("__mde2").as("mde2_micro"),
        (col("__d") * col("__d")).as("diff2_micro"),
        when(col("__mde2").isNull, lit(null).cast("long"))
          .otherwise(when(col("__d") * col("__d") >= col("__mde2"),
            lit(1L)).otherwise(lit(0L)))
          .as("powered"))
  }

  /** SAMPLE-RATIO MISMATCH (SRM) check — the A/B sanity gate that
    * runs BEFORE any effect readout: if the realized arm split is
    * improbably far from the design split, the assignment path is
    * broken (bot filtering, redirect loss, logging bias) and every
    * downstream statistic is invalid. One-df chi-square against the
    * expected A-share in per-mille, exact integer cross-multiplied:
    * with D = 1000·n_a − pm·n (the scaled deviation),
    *   chi2_milli = (1000·D²) div (n·pm·(1000−pm))
    * flagged against the pinned χ²₁ critical value — default
    * 3841 = round(1000·1.96²) (α = 0.05), the same
    * one-constant-no-quantile stance as [[groupSequentialObfMilli]].
    * Practitioners often gate SRM at α = 0.001 (10828); pass
    * `critMilli` accordingly. NULL chi2 when n = 0.
    *
    * Output one row: (n_a, n_b, expect_a_pm, chi2_milli, srm).
    *
    * Scale shape: ONE map-side-partial count aggregate — rows never
    * shuffle. */
  def srmCheckMilli(df: DataFrame, armCol: String,
                    expectAPm: Long = 500L,
                    critMilli: Long = 3841L): DataFrame = {
    require(expectAPm >= 1 && expectAPm <= 999,
      s"expectAPm must be in [1, 999], got $expectAPm")
    require(critMilli > 0, s"critMilli must be > 0, got $critMilli")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    df.select(col(armCol).cast("boolean").as("__a"))
      .where(col("__a").isNotNull)
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("__nb"))
      .select(coalesce(col("__na"), lit(0L)).cast("long").as("n_a"),
        coalesce(col("__nb"), lit(0L)).cast("long").as("n_b"))
      .withColumn("__chi", when(col("n_a") + col("n_b") === 0,
          lit(null).cast("long"))
        .otherwise(expr(
          s"""CAST((1000 * (1000 * CAST(n_a AS DECIMAL(38,0))
             |  - $expectAPm * (n_a + n_b))
             | * (1000 * CAST(n_a AS DECIMAL(38,0))
             |  - $expectAPm * (n_a + n_b)))
             |div (CAST(n_a + n_b AS DECIMAL(38,0))
             |     * $expectAPm * ${1000 - expectAPm}) AS BIGINT)"""
            .stripMargin.replace("\n", " "))))
      .select(col("n_a"), col("n_b"),
        lit(expectAPm).as("expect_a_pm"),
        col("__chi").as("chi2_milli"),
        when(col("__chi").isNull, lit(null).cast("long"))
          .otherwise(when(col("__chi") > critMilli, 1L).otherwise(0L))
          .as("srm"))
  }

  /** POST-STRATIFIED AVERAGE TREATMENT EFFECT — the Simpson's-paradox
    * guard and free variance reduction for experiments with a known
    * stratification (country, platform, signup cohort): the naive
    * pooled diff-in-means confounds arm imbalance ACROSS strata with
    * the effect WITHIN them; post-stratification weights each
    * stratum's own treated-vs-control delta by the stratum's share:
    *   Δ_s_milli = sign · (10³·|sa_s·nc_s − sc_s·na_s|)
    *                    div (na_s·nc_s)          [per-stratum floor]
    *   ate_milli = sign · |Σ_s n_s·Δ_s_milli| div n   [share weight]
    * Per-stratum pinned floors then one weighted division — both
    * engines replay the exact same integers (the Yuen/BH stance).
    * Strata missing an arm cannot contribute a delta; they are
    * EXCLUDED but never silently: n_excluded_strata / n_excluded_rows
    * report the drop (the tClosenessReport lesson). The pooled
    * `simple_ate_milli` over the SAME included strata is surfaced
    * next to it — when the two disagree materially, arm composition
    * differs across strata and the pooled number was lying.
    *
    * Output one row: (n, n_strata, n_excluded_strata, n_excluded_rows,
    * simple_ate_milli, post_strat_ate_milli). NULLs when no stratum
    * has both arms.
    *
    * Scale shape: one (stratum) groupBy carrying both arms' counts
    * and sums (map-side partial), then a 1-row rollup — the stratum
    * alphabet crosses the shuffle, rows never do twice. */
  def postStratifiedAteMilli(df: DataFrame, armCol: String,
                             valueCol: String,
                             strataCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(armCol).cast("boolean").as("__t"),
        col(valueCol).cast("long").as("__x"),
        col(strataCol).as("__s"))
      .where(col("__t").isNotNull && col("__x").isNotNull &&
        col("__s").isNotNull)
    val strata = base.groupBy(col("__s"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__na"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
        sum(when(col("__t"), col("__x").cast(d38))
          .otherwise(lit(0).cast(d38))).as("__sa"),
        sum(when(!col("__t"), col("__x").cast(d38))
          .otherwise(lit(0).cast(d38))).as("__sc"))
    val kept = strata.where(col("__na") > 0 && col("__nc") > 0)
      .withColumn("__num",
        col("__sa") * col("__nc") - col("__sc") * col("__na"))
      .withColumn("__delta", expr(
        """CAST(CAST(sign(__num) AS DECIMAL(38,0)) *
          |((1000 * abs(__num))
          | div (CAST(__na AS DECIMAL(38,0)) * __nc)) AS BIGINT)"""
          .stripMargin.replace("\n", " ")))
    val excl = strata.where(col("__na") === 0 || col("__nc") === 0)
      .agg(count(lit(1)).as("__xs"),
        coalesce(sum(col("__na") + col("__nc")), lit(0L)).as("__xr"))
    kept.agg(
        coalesce(sum(col("__na") + col("__nc")), lit(0L)).cast("long")
          .as("n"),
        count(lit(1)).cast("long").as("n_strata"),
        sum(col("__na")).as("__ta"), sum(col("__nc")).as("__tc"),
        sum(col("__sa")).as("__pa"), sum(col("__sc")).as("__pc"),
        sum((col("__na") + col("__nc")).cast(d38) * col("__delta"))
          .as("__wsum"))
      .crossJoin(broadcast(excl))
      .select(col("n"), col("n_strata"),
        coalesce(col("__xs"), lit(0L)).cast("long")
          .as("n_excluded_strata"),
        coalesce(col("__xr"), lit(0L)).cast("long")
          .as("n_excluded_rows"),
        when(col("n_strata") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(sign(__pa * __tc - __pc * __ta)
              |     AS DECIMAL(38,0)) *
              |((1000 * abs(__pa * __tc - __pc * __ta))
              | div (CAST(__ta AS DECIMAL(38,0)) * __tc)) AS BIGINT)"""
              .stripMargin.replace("\n", " ")))
          .as("simple_ate_milli"),
        when(col("n_strata") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(sign(__wsum) AS DECIMAL(38,0)) *
              |(abs(__wsum) div CAST(n AS DECIMAL(38,0)))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("post_strat_ate_milli"))
  }

  /** QUANTILE TREATMENT EFFECTS — the DISTRIBUTIONAL readout an average
    * treatment effect ([[postStratifiedAteMilli]], [[cupedAdjustMilli]])
    * flattens away: at each requested per-mille depth, the treated
    * arm's exact type-1 quantile minus the control arm's. A treatment
    * that moves only the tail (a latency fix helping the p90, a spend
    * nudge only on whales) reads ≈ 0 in the mean but lights up exactly
    * the affected quantiles here; a constant shift moves every depth
    * equally. Quantiles follow the [[exactQuantiles]] rule per arm —
    * smallest v with |{arm rows ≤ v}| ≥ ceil(pm·n_arm/1000) — so every
    * output cell is an exact integer in the metric's own units and
    *   qte = q_t − q_c
    * needs no quantization lane at all. Depths where either arm is
    * empty emit nothing (no phantom quantiles, the threshold ≥ 1
    * rule); an empty input yields an empty frame.
    *
    * Output: (pm, n_t, n_c, q_t, q_c, qte) — one row per requested
    * per-mille, ascending by construction of the probe frame.
    *
    * Scale shape: ONE value-histogram groupBy carrying both arms'
    * counts on the same cells (the qiniCurveMilli trick), then two
    * window-free global prefix sums over the distinct-value spine
    * (bounded metadata collects only), two broadcast probe joins, and
    * a per-mille-grain join of two ≤|probs| frames. Rows shuffle
    * once, at the value grain, never per subject again. */
  def quantileTreatmentEffect(df: DataFrame, armCol: String,
                              valueCol: String,
                              probs: Seq[(String, Int)]): DataFrame = {
    validateProbs(probs)
    val base = df.select(col(armCol).cast("boolean").as("__t"),
        col(valueCol).cast("long").as("__v"))
      .where(col("__t").isNotNull && col("__v").isNotNull)
    val hist = base.groupBy(col("__v").as("v"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__wt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__wc"))
    val cum = GlobalRank.globalRunningSum(
      GlobalRank.globalRunningSum(hist, Seq(col("v").asc), "__wt",
        outCol = "__cumt"),
      Seq(col("v").asc), "__wc", outCol = "__cumc")
    val totals = hist.agg(sum(col("__wt")).as("__nt"),
      sum(col("__wc")).as("__nc"))
    val probed = cum.crossJoin(broadcast(totals))
    def side(cumC: String, nC: String, q: String, n: String) = probed
      .select(col("v"), col(cumC).as("cum"), col(nC).as("n"))
      .where(col("n") > 0) // an empty arm emits no quantiles at all
      .join(broadcast(probeFrame(df, probs)), col("cum") >= threshold)
      .groupBy(col("pm")).agg(min(col("v")).as(q), max(col("n")).as(n))
    side("__cumt", "__nt", "q_t", "n_t")
      .join(side("__cumc", "__nc", "q_c", "n_c"), Seq("pm"))
      .select(col("pm"), col("n_t"), col("n_c"), col("q_t"), col("q_c"),
        (col("q_t") - col("q_c")).as("qte"))
  }

}
