package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics — funnel conversion and cohort retention,
  * the two queries every product-analytics engine (and ClickHouse's
  * `windowFunnel`/`retention` function family, the reference's home
  * ecosystem) answers over an event stream. Both are pure integer
  * arithmetic over epoch-microsecond timestamps (the CoreQueries `t()`
  * contract), so results are engine-exact.
  *
  * Scale shape: everything is keyed by the user — per-step joins and
  * groupBys shuffle (user, long) pairs, never event payloads; step
  * count and period count bound the metadata. No windows, no collects.
  */
object EventAnalytics {

  /** FIRST-TOUCH FUNNEL: for each user, the highest step of `steps`
    * reached in order within `windowUs` of the user's FIRST step-1
    * event. Step k counts when an event of type steps(k) exists at or
    * after the user's step-(k−1) time and within the window anchored at
    * t1 (the deterministic first-occurrence rule: t1 = min ts of
    * step 1, t_k = min ts of step k in [t_{k−1}, t1 + window]).
    * Output: (userCol, level ∈ [1, steps.size]) — one row per user who
    * reached step 1; `level` is monotone by construction.
    *
    * One filter+groupBy per step (map-side partial min), then a chain
    * of user-keyed left joins — steps.size bounded joins of
    * (user, long) frames. */
  def funnelLevels(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowUs: Long): DataFrame = {
    require(steps.size >= 2, s"need at least 2 funnel steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowUs >= 1, s"windowUs must be >= 1, got $windowUs")
    val e = events.select(col(userCol).as("__u"),
      col(tsCol).cast("long").as("__ts"), col(typeCol).as("__k"))
    val t1 = e.filter(col("__k") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("t1"))
    // fold: tk frame carries (u, t1, t_{k}) for users who reached step k
    val stepTimes = steps.tail.zipWithIndex.scanLeft(
      t1.withColumn("tprev", col("t1"))) { case (prev, (step, i)) =>
      e.filter(col("__k") === step)
        .join(prev.select(col("__u"), col("t1"), col("tprev")), "__u")
        .filter(col("__ts") >= col("tprev") &&
          col("__ts") <= col("t1") + windowUs)
        .groupBy(col("__u"), col("t1"))
        .agg(min(col("__ts")).as(s"t${i + 2}"))
        .withColumn("tprev", col(s"t${i + 2}"))
    }
    // left-join the reach sets back onto the step-1 population
    val levels = stepTimes.tail.zipWithIndex.foldLeft(
      t1.select(col("__u"), col("t1"))) { case (acc, (tk, i)) =>
      acc.join(tk.select(col("__u"), lit(1).as(s"__r${i + 2}")), Seq("__u"), "left")
    }
    // build the when-chain deepest-step-OUTERMOST: folding ascending
    // wraps each deeper step around the shallower chain, so a user with
    // __r2 and __r3 tests __r3 first and reads level 3
    val levelCol = steps.indices.tail.foldLeft(
      lit(1): Column) { (elseC, i) =>
      when(col(s"__r${i + 1}").isNotNull, i + 1).otherwise(elseC)
    }
    levels.select(col("__u").as(userCol), levelCol.cast("int").as("level"))
  }

  /** COHORT RETENTION: users cohort by the period of their FIRST event
    * (period = ts div periodUs); for every (cohort, period-offset) the
    * count of cohort users active in that period. Output:
    * (cohort, day_offset, n_users) — cohort and offset in period units.
    *
    * Two map-side-partial groupBys (first-seen, distinct activity) and
    * one user-keyed join; the result is bounded by periods², not by
    * events. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      periodUs: Long): DataFrame = {
    require(periodUs >= 1, s"periodUs must be >= 1, got $periodUs")
    // integer floor-div (Spark `div`), never `/` — long/long is DOUBLE
    // division in Spark and a 1.7e15-µs epoch is at the edge of a
    // double's mantissa
    val e = events.select(col(userCol).as("__u"),
      expr(s"CAST($tsCol AS BIGINT) div ${periodUs}L").as("__p"))
    val first = e.groupBy(col("__u")).agg(min(col("__p")).as("cohort"))
    val active = e.distinct()
    active.join(first, "__u")
      .groupBy(col("cohort"), (col("__p") - col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** MARKOV TRANSITION MATRIX: for every ordered pair of consecutive
    * events within a user's history, the count of (prev_type, next_type)
    * occurrences plus the per-prev transition probability in integer
    * per-mille (floor division — engine-exact). `idCol` breaks timestamp
    * ties so consecutive-ness is a total order both engines reproduce.
    *
    * The successor window partitions by user — state is bounded by one
    * user's history, never the corpus (the sessionize shape). Counts and
    * totals are two partial-agg groupBys over (type, type) pairs; the
    * totals side is bounded by the event-type alphabet, so the join
    * broadcasts. */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val e = events.select(col(userCol).as("__u"),
      col(tsCol).cast("long").as("__ts"), col(idCol).as("__id"),
      col(typeCol).as("__k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u")).orderBy(col("__ts"), col("__id"))
    val counts = e.withColumn("__next", lead(col("__k"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__k").as("prev_type"), col("__next").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("__total"))
    counts.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("CAST((1000 * n) div __total AS BIGINT)").as("p_permille"))
  }

  /** TOP USER PATHS: the `topN` most common journeys, where a journey is
    * the user's first `k` events joined by '>' in (ts, id) order — the
    * ClickHouse `sequence`-family / product-analytics "top paths" view.
    *
    * First-k selection is the k-bounded [[graft.functions.FirstKByTime]]
    * aggregator (map-side partial — a heavy user ships k rows into the
    * shuffle, not a window sort of their history); the final topN is
    * orderBy+limit = TakeOrderedAndProject (per-partition top-N merge at
    * the driver, never a global sort). */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String, k: Int,
               topN: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val agg = udaf(new graft.functions.FirstKByTime(k),
      org.apache.spark.sql.Encoders.product[(Long, Long, String)])
    events.select(col(userCol).as("__u"),
        col(tsCol).cast("long").as("__ts"), col(idCol).as("__id"),
        col(typeCol).as("__k"))
      .groupBy(col("__u"))
      .agg(agg(col("__ts"), col("__id"), col("__k")).as("__fk"))
      .select(concat_ws(">", col("__fk.items.tok")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path")).limit(topN)
  }

  /** GAP-CONSTRAINED SEQUENCE MATCH — the ClickHouse
    * `sequenceMatch('(?1)(?t<=g)(?2)...')` question: does the user's
    * event stream contain events of types `steps` in chronological
    * order with EVERY consecutive pair at most `maxGapUs` apart?
    * Returns one row per matching user with the earliest timestamp at
    * which the full pattern completes.
    *
    * This is NOT the funnel (q157): the funnel window anchors at the
    * user's first step-1 event, so greedy first-occurrence chaining is
    * exact. A per-gap constraint breaks greedy — the earliest step-k
    * match can strand a chain the pattern completes from a later one
    * (A@0 fails A@95→B@100 under gap 10) — so each level keeps ALL
    * reachable timestamps: level k = step-k events having ANY level-(k−1)
    * event within [ts − maxGap, ts]. Equal timestamps chain (>=) — the
    * simultaneous-burst convention, documented and shared with the
    * oracle.
    *
    * Scale shape: steps.size − 1 user-keyed SEMI joins of (user, long)
    * frames — the equi key keeps them sort-merge/shuffled-hash, never a
    * nested loop; each level is bounded by that step's event count and
    * carries no payload. The final min is one map-side-partial groupBy.
    */
  def sequenceMatchGaps(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, steps: Seq[String],
                        maxGapUs: Long): DataFrame = {
    require(steps.size >= 2, s"need at least 2 steps, got ${steps.size}")
    require(maxGapUs >= 1, s"maxGapUs must be >= 1, got $maxGapUs")
    val e = events.select(col(userCol).as("__u"),
      col(tsCol).cast("long").as("__ts"), col(typeCol).as("__k"))
    val level1 = e.filter(col("__k") === steps.head)
      .select(col("__u"), col("__ts"))
    val reach = steps.tail.foldLeft(level1) { (prev, step) =>
      e.filter(col("__k") === step).select(col("__u"), col("__ts"))
        .join(prev.select(col("__u").as("__pu"), col("__ts").as("__pts")),
          col("__u") === col("__pu") &&
            col("__pts") <= col("__ts") &&
            col("__pts") >= col("__ts") - maxGapUs,
          "left_semi")
    }
    reach.groupBy(col("__u"))
      .agg(min(col("__ts")).as("first_complete_ts"))
      .select(col("__u").as(userCol), col("first_complete_ts"))
  }

  /** NEGATED SEQUENCE MATCH — "A then B within the gap, with NO
    * `forbidden` event strictly between them" (the abandoned-cart /
    * clean-conversion CEP question; ClickHouse writes it
    * `sequenceMatch('(?1)(?t<=g)(?3)')` plus a NOT over the
    * interleaved pattern). One row per matching user with the earliest
    * clean completion.
    *
    * Exists-semantics with negation reduces to checking, per B event,
    * only its LATEST qualifying A (as-of logic): if any A works, the
    * latest A ≤ tB does — fewer events between, same gap feasibility.
    * So: as-of join B→A (backward, within gap), as-of join B→forbidden
    * (backward, strict), match iff the latest forbidden before B is
    * absent or at/before the chosen A. Two user-keyed joins; per-user
    * state bounded by the as-of machinery, never the corpus.
    */
  def sequenceMatchNoEvent(events: DataFrame, userCol: String,
                           tsCol: String, typeCol: String,
                           first: String, last: String, forbidden: String,
                           maxGapUs: Long): DataFrame = {
    require(maxGapUs >= 1, s"maxGapUs must be >= 1, got $maxGapUs")
    require(Seq(first, last, forbidden).distinct.size == 3,
      "first/last/forbidden must be distinct event types")
    val e = events.select(col(userCol).as("__u"),
      col(tsCol).cast("long").as("__ts"), col(typeCol).as("__k"))
    def times(k: String, as: String) =
      e.filter(col("__k") === k).select(col("__u"), col("__ts").as(as))
    // as-of backward on the equi user key: per B event, the LATEST A at
    // or before it within the gap (join + groupBy max of (user, long))
    val withA = times(last, "tb")
      .join(times(first, "ta"), Seq("__u"))
      .filter(col("ta") <= col("tb") && col("ta") >= col("tb") - maxGapUs)
      .groupBy(col("__u"), col("tb")).agg(max(col("ta")).as("ta"))
    // per B event, the latest forbidden strictly before it (NULL if none)
    val lastF = times(last, "tb")
      .join(times(forbidden, "tf"), Seq("__u"), "left")
      .groupBy(col("__u"), col("tb"))
      .agg(max(when(col("tf") < col("tb"), col("tf"))).as("tfl"))
    withA.join(lastF, Seq("__u", "tb"))
      .filter(col("tfl").isNull || col("tfl") <= col("ta"))
      .groupBy(col("__u"))
      .agg(min(col("tb")).as("first_clean_ts"))
      .select(col("__u").as(userCol), col("first_clean_ts"))
  }

  /** OHLC candle bars per (group, period): open/close = the first/last
    * observation by (ts, id) — min_by/max_by over a STRUCT ordering key,
    * which partial-aggregates map-side (each task keeps ONE candidate
    * per group; a window-rank formulation would sort every row of every
    * bar) — plus min/max/count. `valueCol` must be an integer level
    * (pre-scale floats); `idCol` breaks same-µs ties so first/last are a
    * total order both engines replay. One map-side-partial groupBy, one
    * shuffle of 5-value rows on (group, period). */
  def ohlcBars(events: DataFrame, groupCol: String, tsCol: String,
               valueCol: String, periodUs: Long, idCol: String): DataFrame = {
    require(periodUs >= 1, s"periodUs must be >= 1, got $periodUs")
    val ord = struct(col(tsCol).cast("long"), col(idCol))
    val v = col(valueCol).cast("long")
    events.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol),
        expr(s"CAST($tsCol AS BIGINT) div ${periodUs}L").as("period"))
      .agg(min_by(v, ord).as("open"), max(v).as("high"),
        min(v).as("low"), max_by(v, ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** MULTI-TOUCH ATTRIBUTION: credit each conversion back to the
    * marketing touches that preceded it — the first-touch / last-touch /
    * linear credit models every attribution engine reports side by side.
    *
    * Assignment rule (the industry-standard "next conversion" model):
    * a touch (an event whose type is in `touchTypes`) is attributed to
    * the user's NEXT conversion (`convType` event) STRICTLY after it and
    * within `lookbackUs`; touches with no such conversion earn nothing.
    * Within one conversion's touch set (ordered by (ts, id) — a total
    * order both engines replay), the earliest touch takes the
    * first-touch credit, the latest the last-touch credit, and linear
    * credit splits evenly. Linear credit is surfaced as exact integer
    * MICRO-credits (`1000000 div n` floor division) — never a repeating
    * decimal two engines could round apart.
    *
    * Output per touch type: (touch_type, n_touches, n_first, n_last,
    * linear_micro), attributed touches only.
    *
    * Scale shape: one user-keyed join touches⋈conversions (equi key
    * rides the shuffle; the range predicate filters inside the join),
    * a groupBy per touch picking its min-(ts,id) conversion (map-side
    * partial), then windows partitioned by (user, conversion) — state
    * bounded by ONE conversion's touch set, never a user's full history,
    * let alone the corpus. Final rollup is alphabet-bounded. */
  /** Shared attribution front end: every touch joined to its earliest
    * qualifying conversion (min over the (cts, cid) struct —
    * lexicographic, so same-µs conversions break ties on id
    * identically in both engines). Columns: (__u, __ts, __id, __k,
    * __conv{__cts, __cid}). */
  private def assignedTouches(events: DataFrame, userCol: String,
                              tsCol: String, idCol: String,
                              typeCol: String, convType: String,
                              touchTypes: Seq[String],
                              lookbackUs: Long): DataFrame = {
    require(lookbackUs >= 1, s"lookbackUs must be >= 1, got $lookbackUs")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      s"convType '$convType' cannot also be a touch type")
    val e = events.select(col(userCol).as("__u"),
      col(tsCol).cast("long").as("__ts"), col(idCol).as("__id"),
      col(typeCol).as("__k"))
    val touches = e.filter(col("__k").isin(touchTypes: _*))
    val convs = e.filter(col("__k") === convType)
      .select(col("__u"), col("__ts").as("__cts"), col("__id").as("__cid"))
    touches.join(convs, Seq("__u"))
      .filter(col("__cts") > col("__ts") &&
        col("__cts") <= col("__ts") + lookbackUs)
      .groupBy(col("__u"), col("__ts"), col("__id"), col("__k"))
      .agg(min(struct(col("__cts"), col("__cid"))).as("__conv"))
  }

  def attribution(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, convType: String,
                  touchTypes: Seq[String], lookbackUs: Long): DataFrame = {
    val assigned = assignedTouches(events, userCol, tsCol, idCol,
      typeCol, convType, touchTypes, lookbackUs)
    val wConv = Window.partitionBy(col("__u"), col("__conv"))
    val ord = struct(col("__ts"), col("__id"))
    assigned
      .withColumn("__n", count(lit(1)).over(wConv))
      .withColumn("__tfirst", min(ord).over(wConv))
      .withColumn("__tlast", max(ord).over(wConv))
      .groupBy(col("__k").as("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(ord === col("__tfirst"), 1L).otherwise(0L)).as("n_first"),
        sum(when(ord === col("__tlast"), 1L).otherwise(0L)).as("n_last"),
        sum(expr("1000000L div __n")).as("linear_micro"))
  }

  /** RFM SEGMENTATION — recency / frequency / monetary quintiles per
    * user, the classic customer-value grid: R = days since the user's
    * last conversion (anchored at the CORPUS max conversion day — a
    * data-determined constant, not wall clock), F = conversion count,
    * M = total conversion value in integer cents. Each metric maps to
    * a 1–5 quintile via its cume_dist: q = ⌈5·cume_ppm/10⁶⌉ (ties
    * share a quintile — the SQL-ntile alternative that needs no global
    * row order), with recency NEGATED first so recent = high score.
    * `segment = 100·r + 10·f + m` (the 111–555 code marketers read).
    *
    * Output per converting user: (userCol, r_days, f, m_cents, r_q,
    * f_q, m_q, segment).
    *
    * Scale shape: one user-keyed aggregate builds the metric frame;
    * each quintile is a [[GlobalRank.percentRanks]] pass (histogram
    * prefix sum + broadcast map — no global window); three user-keyed
    * joins reassemble. */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, convType: String,
                  valueCol: String): DataFrame = {
    val dayUs = 86400000000L
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"),
        expr(s"CAST($tsCol AS BIGINT) div ${dayUs}L").as("__day"),
        floor(col(valueCol) * 100).cast("long").as("__cents"))
    val anchor = conv.agg(max(col("__day")).as("__maxd"))
    // pinned: the per-user metric frame feeds SEVEN scans — each
    // quintile's histogram + its value-map join-back (3 × 2) plus the
    // final join spine — and each uncached scan re-runs the full events
    // scan + conversion groupBy (ProfileOne r13: 8 × in=100k jobs on
    // q216). Lazy persist: the first percentRanks metadata collect
    // materializes it; the bench harness releases pinned blocks between
    // queries (session-lifetime pin otherwise, the Dedup persist stance).
    val metrics = conv.groupBy(col("__u"))
      .agg(max(col("__day")).as("__lastd"), count(lit(1)).as("f"),
        sum(col("__cents")).as("m_cents"))
      .crossJoin(broadcast(anchor))
      .withColumn("r_days", col("__maxd") - col("__lastd"))
      .select(col("__u"), col("r_days"), col("f"), col("m_cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def quintile(vCol: String, negate: Boolean, out: String) = {
      // NOT "__v" — percentRanks uses that helper name internally and
      // the value-map join would self-collide
      val in = metrics.select(col("__u"),
        (if (negate) -col(vCol) else col(vCol)).as("__metric"))
      GlobalRank.percentRanks(in, "__metric")
        .select(col("__u"),
          expr("(5 * cume_ppm + 999999) div 1000000").as(out))
    }
    metrics
      .join(quintile("r_days", negate = true, "r_q"), "__u")
      .join(quintile("f", negate = false, "f_q"), "__u")
      .join(quintile("m_cents", negate = false, "m_q"), "__u")
      .select(col("__u").as(userCol), col("r_days"), col("f"),
        col("m_cents"), col("r_q"), col("f_q"), col("m_q"),
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("segment"))
  }

  /** Time-weighted average per (group, period) — the financial-bar /
    * metering aggregate: Σ value·Δt / ΣΔt with each observation held
    * until the next one (last carried to period end), which answers
    * "what was the average LEVEL" where plain avg() answers "what was
    * the average observation" — different whenever sampling is
    * irregular (a price quoted once at 9am and once at 9pm is not two
    * equal-weight samples of the day).
    *
    * `tsCol` is epoch-µs long; `valueCol` an INTEGER level (pre-scale
    * floats to cents/micros — one IEEE multiply + floor is
    * deterministic); `periodUs` the bar length. Output: (groupCol,
    * period, n, twap = num DIV den exact integer, den = covered µs).
    * Sums run in DECIMAL(38,0): a cent·day product is ~4·10¹⁵ and a
    * period of them can overflow a long.
    *
    * Scale shape: the lead window partitions by (group, period) —
    * state bounded by one bar's events — and the aggregate is one
    * map-side-partial groupBy on the same key. One shuffle total. */
  def timeWeightedAverage(events: DataFrame, groupCol: String,
                          tsCol: String, valueCol: String,
                          periodUs: Long, idCol: String): DataFrame = {
    require(periodUs >= 1, s"periodUs must be >= 1, got $periodUs")
    val ev = events.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(idCol), col(tsCol).cast("long").as("__ts"),
        expr(s"CAST($tsCol AS BIGINT) div ${periodUs}L").as("period"),
        col(valueCol).cast("long").as("__v"))
    val w = Window.partitionBy(col(groupCol), col("period"))
      .orderBy(col("__ts"), col(idCol))
    ev.withColumn("__next", lead(col("__ts"), 1).over(w))
      .withColumn("__dt",
        coalesce(col("__next"), (col("period") + 1) * periodUs) - col("__ts"))
      .groupBy(col(groupCol), col("period"))
      .agg(count(lit(1)).as("n"),
        sum(col("__v").cast("decimal(38,0)") * col("__dt")).as("__num"),
        sum(col("__dt")).as("den"))
      .select(col(groupCol), col("period"), col("n"),
        expr("CAST(__num div CAST(den AS DECIMAL(38,0)) AS BIGINT)")
          .as("twap"),
        col("den"))
  }

  /** DISCRETE-TIME SURVIVAL (churn) HAZARD by tenure: life-table rates
    * over per-user activity spans. A user's tenure is the number of
    * whole periods between their first and last event; at each tenure
    * value t the op reports d_t (users who "died" — were last seen — at
    * exactly t), n_t (users still at risk: tenure ≥ t), and the
    * Kaplan–Meier discrete hazard `hazard_ppm = 10⁶·d_t div n_t` — the
    * "when do users churn" curve, in exact integer arithmetic (the full
    * KM survival product is irrational; the hazard TABLE is the exact
    * sufficient statistic it is built from).
    *
    * Output: (tenure, d_t, n_t, hazard_ppm), one row per observed
    * tenure value; n_t at the smallest tenure = total users.
    *
    * Scale shape: one user-keyed min/max aggregate (map-side partial),
    * one groupBy on tenure (rows = distinct tenures), then a
    * windowless [[GlobalRank.globalRunningSum]] suffix sum over those
    * tenure rows (descending order) — no global window, no collect;
    * everything after the first aggregate is bounded by the tenure
    * ALPHABET, not the user count. */
  def hazardByTenure(events: DataFrame, userCol: String, tsCol: String,
                     periodUs: Long): DataFrame = {
    require(periodUs >= 1, s"periodUs must be >= 1, got $periodUs")
    val spans = events.select(col(userCol).as("__u"),
        expr(s"CAST($tsCol AS BIGINT) div ${periodUs}L").as("__p"))
      .groupBy(col("__u"))
      .agg((max(col("__p")) - min(col("__p"))).as("tenure"))
    val dt = spans.groupBy(col("tenure")).agg(count(lit(1)).as("d_t"))
    // suffix sum: running sum under DESCENDING tenure = Σ_{t' >= t} d_t'
    GlobalRank.globalRunningSum(dt, Seq(col("tenure").desc), "d_t", "n_t")
      .select(col("tenure"), col("d_t"), col("n_t"),
        expr("(1000000 * d_t) div n_t").as("hazard_ppm"))
  }

  /** KAPLAN–MEIER survival curve in EXACT integers: S_t =
    * (S_{t−1} · (n_t − d_t)) div n_t per tenure step, S start 10⁶ —
    * the float product Π(1 − d/n) replaced by a PINNED integer
    * recurrence (each step floors once, so the curve sits ≤ #steps
    * ppm below the real KM — documented, and both engines replay the
    * identical floors; a float cumulative product would depend on the
    * engine's window-product association order). Extends
    * [[hazardByTenure]]'s life table with the survival column.
    *
    * Output: (tenure, d_t, n_t, hazard_ppm, surv_ppm) — surv_ppm is
    * survival THROUGH that tenure, non-increasing, reaching 0 at the
    * last step (everyone eventually churns in a closed cohort).
    *
    * Scale shape: the life table is tenure-bounded (periods, not
    * rows); the sequential fold runs over ONE collected array of
    * ≤ periods rows (the guarded-driver-step family: PAVA, Jacobi) —
    * expressed as a higher-order `aggregate` so it stays inside the
    * plan; everything upstream is [[hazardByTenure]]'s distributed
    * shape. */
  def kmSurvivalPpm(events: DataFrame, userCol: String, tsCol: String,
                    periodUs: Long): DataFrame = {
    val lt = hazardByTenure(events, userCol, tsCol, periodUs)
      .localCheckpoint() // consumed twice: fold + final join
    val folded = lt
      .agg(sort_array(collect_list(struct(col("tenure"), col("d_t"),
        col("n_t")))).as("__arr"))
      .select(explode(expr(
        """slice(aggregate(__arr,
          |array(named_struct('tenure', CAST(-1 AS BIGINT),
          |                   's', CAST(1000000 AS BIGINT))),
          |(acc, x) -> array_append(acc, named_struct(
          |  'tenure', CAST(x.tenure AS BIGINT),
          |  's', (element_at(acc, -1).s * (x.n_t - x.d_t)) div x.n_t))),
          |2, 100000000)""".stripMargin.replace("\n", " ")))
        .as("__km"))
      .select(col("__km.tenure").as("__t"), col("__km.s").as("surv_ppm"))
    lt.join(folded, col("tenure") === col("__t"))
      .select(col("tenure"), col("d_t"), col("n_t"), col("hazard_ppm"),
        col("surv_ppm"))
  }

  /** NELSON–AALEN cumulative hazard — the model-free "total risk
    * accumulated by tenure t" curve next to [[kmSurvivalPpm]]'s
    * survival probability: Λ(t) = Σ_{s≤t} d_s/n_s. Where KM needs a
    * sequential PRODUCT (the pinned fold), the NA estimator is a pure
    * prefix SUM of the already-pinned per-step hazards — so it rides
    * [[GlobalRank.globalRunningSum]] with no fold at all, and its
    * floors are exactly the hazard floors (≤ #steps ppm below truth,
    * same bound family as KM's).
    *
    * Output: (tenure, d_t, n_t, hazard_ppm, cumhaz_ppm) ascending
    * tenure.
    *
    * Scale shape: the life table is bounded by distinct tenure steps
    * (the period GRAIN, not users); the running sum is the
    * checkpoint-and-offset form — no global window. */
  def nelsonAalenPpm(events: DataFrame, userCol: String, tsCol: String,
                     periodUs: Long): DataFrame =
    GlobalRank.globalRunningSum(
      hazardByTenure(events, userCol, tsCol, periodUs),
      Seq(col("tenure").asc), "hazard_ppm", "cumhaz_ppm")
      .select(col("tenure"), col("d_t"), col("n_t"), col("hazard_ppm"),
        col("cumhaz_ppm"))

  /** COHORT VALUE (LTV) CURVES — [[cohortRetention]] tracks who came
    * BACK; this tracks what each signup cohort has been WORTH by age:
    * per (cohort bucket, age bucket) the period value, the running
    * cumulative, and cumulative value per member in exact milli
    * (ltv_milli = 1000·cum div cohort_size). The payback-period /
    * LTV:CAC table every growth review reads.
    *
    * Cohort = the bucket of a user's FIRST event; age = bucket offset
    * from it. Buckets are `bucketPeriods` base periods wide (7 days =
    * weekly cohorts at a daily grain).
    *
    * Output per (cohort, age): (cohort, age, n_users, period_value,
    * cum_value, ltv_milli) — n_users is the cohort's size (constant
    * down the curve, deliberately: LTV divides by who STARTED).
    *
    * Scale shape: one user-grain aggregate for (first period, user
    * totals... no — first period only), a user-keyed join back, one
    * (cohort, age) groupBy, a cohort-partitioned running sum bounded
    * by the age axis, a broadcast of cohort sizes. */
  def cohortValue(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, periodUs: Long,
                  bucketPeriods: Long): DataFrame = {
    require(periodUs >= 1 && bucketPeriods >= 1,
      s"periodUs and bucketPeriods must be >= 1")
    val base = events.select(col(userCol).as("__u"),
        col(tsCol).cast("long").as("__ts"),
        col(valueCol).cast("long").as("__v"))
      .select(col("__u"), expr(s"__ts div ${periodUs}L").as("__p"),
        col("__v"))
      .where(col("__u").isNotNull && col("__v").isNotNull)
    val firsts = base.groupBy(col("__u"))
      .agg(min(expr(s"__p div ${bucketPeriods}L")).as("__cohort"))
    val sizes = firsts.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("__sz"))
    val cells = base.join(firsts, Seq("__u"))
      .select(col("__cohort"),
        (expr(s"__p div ${bucketPeriods}L") - col("__cohort")).as("age"),
        col("__v"))
      .groupBy(col("__cohort"), col("age"))
      .agg(sum(col("__v")).as("period_value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__cohort")).orderBy(col("age"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    cells.withColumn("cum_value", sum(col("period_value")).over(w))
      .join(broadcast(sizes), Seq("__cohort"))
      .select(col("__cohort").as("cohort"), col("age"),
        col("__sz").cast("long").as("n_users"), col("period_value"),
        col("cum_value"),
        expr("(1000 * cum_value) div __sz").as("ltv_milli"))
  }

  /** RESTRICTED MEAN SURVIVAL TIME — the single clinical/retention
    * number the KM curve integrates to: RMST(τ) = ∫₀^τ S(t)dt =
    * "average periods survived within the first τ", robust where
    * median survival is undefined (curves that never cross 0.5). Exact
    * over the step function: full survival before the first event
    * tenure, then each KM step s spans [tenure, next_tenure) clipped
    * to τ; rmst_milli = (10⁶·head + Σ s·span) div 1000.
    *
    * Output: one row (tau, n_steps, rmst_milli).
    *
    * Scale shape: the life table is bounded by distinct tenure steps,
    * so the next-step triangle join and the 1-row finish are
    * grain-bounded; the heavy lifting (the KM fold) is
    * [[kmSurvivalPpm]]'s. */
  def rmstMilli(events: DataFrame, userCol: String, tsCol: String,
                periodUs: Long, tauPeriods: Long): DataFrame = {
    require(tauPeriods >= 1, s"tauPeriods must be >= 1, got $tauPeriods")
    val km = kmSurvivalPpm(events, userCol, tsCol, periodUs)
      .select(col("tenure"), col("surv_ppm")).localCheckpoint()
    val nxt = km.as("a").join(km.as("b"),
        col("b.tenure") > col("a.tenure"), "left")
      .groupBy(col("a.tenure").as("__t"), col("a.surv_ppm").as("__s"))
      .agg(min(col("b.tenure")).as("__next"))
    val head = km.agg(min(col("tenure")).as("__t0"))
    nxt.crossJoin(broadcast(head))
      .agg(count(lit(1)).as("__k"), first(col("__t0")).as("__h"),
        sum(col("__s") *
          greatest(lit(0L),
            least(coalesce(col("__next"), lit(tauPeriods)),
              lit(tauPeriods)) -
              least(col("__t"), lit(tauPeriods)))).as("__area"))
      .select(lit(tauPeriods).as("tau"),
        col("__k").cast("long").as("n_steps"),
        expr(s"""CAST((1000000 * least(__h, ${tauPeriods}L)
               | + coalesce(__area, 0)) div 1000 AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("rmst_milli"))
  }

  /** ROLLING DISTINCT ACTIVES — the DAU/WAU/MAU family, EXACT:
    * for every period p present in the data, the count of distinct
    * ids active anywhere in [p − window + 1, p]. Distinct counts
    * don't decompose over sliding windows (yesterday's WAU can't be
    * updated, only recomputed), so the exact plan replicates each
    * (period, id) pair forward `window` times and de-duplicates —
    * shuffle cost = actives × window, the honest price of exactness.
    * At 100 TB prefer [[graft.ops.Sketches.hllSlidingMerge]] (the
    * approximate sibling: register-merge, no replication) and keep
    * this for the grains that must reconcile to finance.
    *
    * Output: (period, n_active) — one row per period OBSERVED in the
    * data (silent zero-activity periods don't appear; gap-fill with
    * [[graft.ops.Resample.gapFillLocf]] upstream if the spine must be
    * dense).
    *
    * Scale shape: distinct (period, id) first (everything after is
    * bounded by actives, not events); one literal-array explode
    * (×window), one semi join against the observed-period set, one
    * distinct + count groupBy. No windows, no self-joins over rows. */
  def rollingActive(df: DataFrame, periodCol: String, idCol: String,
                    window: Int): DataFrame = {
    require(window >= 1 && window <= 10000,
      s"window must be in [1, 10000], got $window")
    val d = df.select(col(periodCol).cast("long").as("__p"),
        col(idCol).as("__id"))
      .where(col("__p").isNotNull && col("__id").isNotNull)
      .distinct()
    val periods = d.select(col("__p").as("__po")).distinct()
    val offsets = array((0 until window).map(o => lit(o.toLong)): _*)
    d.select(explode(offsets).as("__o"), col("__p"), col("__id"))
      .select((col("__p") + col("__o")).as("__po"), col("__id"))
      .join(periods, Seq("__po"), "left_semi")
      .distinct()
      .groupBy(col("__po").as("period"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** TIME-DECAY ATTRIBUTION: credit each conversion's touches with
    * exponentially decaying weight — the "recent touches matter more"
    * model between last-touch (all credit to the newest) and linear
    * (equal credit). Engine-exact via power-of-two decay: a touch
    * `age` µs before its conversion weighs
    * w = max(10⁶ div 2^min(age div halfLifeUs, 62), 1) — halving per
    * half-life in pure integer shifts, no exp() for engines to
    * disagree on; the floor at 1 keeps a conversion whose every touch
    * is ancient (> ~20 half-lives) normalizable instead of 0/0.
    * Each conversion's credits are its touches' weights normalized to
    * 10⁶ micro-units (floored), then summed per touch type.
    *
    * Output: (touch_type, n_touches, decay_micro) — decay_micro sums
    * to ≤ 10⁶ per conversion (floor remainder discarded, as
    * [[attribution]]'s linear credits).
    *
    * Scale shape: [[assignedTouches]]'s user-keyed join + the same
    * (user, conversion)-partitioned window (bounded by one user's
    * touches), one final groupBy on the touch type. */
  def timeDecayAttribution(events: DataFrame, userCol: String,
                           tsCol: String, idCol: String, typeCol: String,
                           convType: String, touchTypes: Seq[String],
                           lookbackUs: Long, halfLifeUs: Long): DataFrame = {
    require(halfLifeUs >= 1, s"halfLifeUs must be >= 1, got $halfLifeUs")
    val assigned = assignedTouches(events, userCol, tsCol, idCol,
      typeCol, convType, touchTypes, lookbackUs)
    val wConv = Window.partitionBy(col("__u"), col("__conv"))
    assigned
      .withColumn("__w", expr(
        s"""greatest(1000000L div shiftleft(1L,
           |CAST(least((__conv.__cts - __ts) div ${halfLifeUs}L, 62L)
           |AS INT)), 1L)""".stripMargin.replace("\n", " ")))
      .withColumn("__wsum", sum(col("__w")).over(wConv))
      .groupBy(col("__k").as("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(expr("(1000000L * __w) div __wsum")).as("decay_micro"))
  }

  /** ACTIVITY STREAKS (gaps-and-islands): per group, the maximal runs
    * of CONSECUTIVE integer periods with any activity — "longest daily
    * streak" engagement metrics, data-arrival continuity audits. The
    * classic island key (period − rank-within-group) groups each run;
    * duplicate activity within a period collapses first.
    *
    * Output: (group, active_periods, n_streaks, longest_len,
    * longest_start) — longest ties break to the EARLIEST start, a
    * total order both engines agree on.
    *
    * Scale shape: distinct (group, period) first — everything after is
    * bounded by active periods, not events; one group-partitioned
    * window over a group's own periods (the legitimate bounded-window
    * shape), two map-side-partial groupBys. */
  def activityStreaks(df: DataFrame, groupCol: String,
                      periodCol: String): DataFrame = {
    val d = df.select(col(groupCol).as("__g"),
        col(periodCol).cast("long").as("__p"))
      .where(col("__p").isNotNull).distinct()
    val w = Window.partitionBy(col("__g")).orderBy(col("__p"))
    val streaks = d
      .withColumn("__k", col("__p") - row_number().over(w))
      .groupBy(col("__g"), col("__k"))
      .agg(count(lit(1)).as("__len"), min(col("__p")).as("__s"))
    streaks.groupBy(col("__g"))
      .agg(sum(col("__len")).as("active_periods"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_len"),
        max_by(col("__s"), struct(col("__len"), (-col("__s")).as("__ns")))
          .as("longest_start"))
      .withColumnRenamed("__g", groupCol)
  }

  /** DWELL TIME BY STATE: how long users sit in each event type before
    * their next event — each inter-event gap is attributed to the
    * PRECEDING event's type (the "current state" convention); a user's
    * final event has no successor and contributes nothing. Exact
    * epoch-µs integers; (ts, id) ordering makes simultaneous events
    * deterministic in both engines.
    *
    * Output: (state, n_dwells, total_us, mean_us).
    *
    * Scale shape: ONE user-partitioned lead window (bounded by a
    * user's own events) + one map-side-partial groupBy on the state. */
  def dwellByState(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__ts"), col("__id"))
    events.select(col(userCol).as("__u"), col(typeCol).as("state"),
        col(tsCol).cast("long").as("__ts"), col(idCol).as("__id"))
      .withColumn("__dw", lead(col("__ts"), 1).over(w) - col("__ts"))
      .where(col("__dw").isNotNull)
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_dwells"), sum(col("__dw")).as("total_us"),
        expr("sum(__dw) div count(1)").as("mean_us"))
  }

  /** TOP-k SESSION PATHS: the most common `steps`-prefix of event
    * types per session — the Sankey/user-journey table ("view > click
    * > purchase: 1200 sessions"). Sessions are whatever key columns
    * the caller passes (user, user×day, a sessionize() output id).
    * Path order is (ts, id) — the repo's total event order — and ties
    * in the final cut break (n DESC, path ASC).
    *
    * Output: (path, n) — top k.
    *
    * Scale shape: one session-partitioned window bounded by a
    * session's events, prefix assembly via sort_array over ≤ steps
    * elements (never a cross-session structure), one path groupBy,
    * TakeOrderedAndProject cut. */
  def topPaths(events: DataFrame, sessionCols: Seq[String], tsCol: String,
               idCol: String, typeCol: String, steps: Int,
               k: Int): DataFrame = {
    require(steps >= 1 && steps <= 32, s"steps in [1,32], got $steps")
    require(k >= 1, s"k must be >= 1, got $k")
    require(sessionCols.nonEmpty, "need at least one session key column")
    val sess = sessionCols.map(col)
    val w = Window.partitionBy(sess: _*)
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .select(sess :+ col(tsCol) :+ col(idCol) :+
        col(typeCol).cast("string").as("__t"): _*)
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= steps)
      .groupBy(sess: _*)
      .agg(array_join(expr("transform(array_sort(" +
        "collect_list(struct(__r, __t))), x -> x.__t)"), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** PER-CLASS classifier report: precision / recall / F1 in exact
    * integer ppm from the (label, pred) confusion cells — the
    * class-level complement of [[graft.ops.Stats.cohenKappaPpm]]'s
    * single agreement number. A class appearing only in labels (never
    * predicted) or only in predictions still gets a row — silent
    * class vanishing is the bug this report exists to catch.
    *
    * precision = 10⁶·tp div (tp+fp), recall = 10⁶·tp div (tp+fn),
    * f1 = 2·10⁶·tp div (2tp+fp+fn) — the harmonic mean without ever
    * forming a fraction; NULL where the denominator is 0.
    *
    * Output: (clazz, n_true, n_pred, tp, precision_ppm, recall_ppm,
    * f1_ppm).
    *
    * Scale shape: ONE (label, pred) cell groupBy — alphabet², never
    * rows — then two alphabet-bounded rollups full-outer-joined on
    * the class. */
  def classReport(df: DataFrame, labelCol: String,
                  predCol: String): DataFrame = {
    val cells = df
      .where(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).cast("string").as("__l"),
        col(predCol).cast("string").as("__p"))
      .agg(count(lit(1)).as("__c"))
    val byTrue = cells.groupBy(col("__l").as("clazz"))
      .agg(sum(col("__c")).as("n_true"),
        sum(when(col("__l") === col("__p"), col("__c")).otherwise(0L))
          .as("__tp1"))
    val byPred = cells.groupBy(col("__p").as("clazz"))
      .agg(sum(col("__c")).as("n_pred"))
    byTrue.join(byPred, Seq("clazz"), "full_outer")
      .select(col("clazz"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("__tp1"), lit(0L)).as("tp"))
      .select(col("clazz"), col("n_true"), col("n_pred"), col("tp"),
        when(col("n_pred") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000 * tp) div n_pred")).as("precision_ppm"),
        when(col("n_true") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000 * tp) div n_true")).as("recall_ppm"),
        when(col("n_true") + col("n_pred") === 0, lit(null).cast("long"))
          .otherwise(expr("(2000000 * tp) div (n_true + n_pred)"))
          .as("f1_ppm"))
  }

  /** L1 TRAJECTORY LENGTH per group: total Manhattan distance walked
    * through a point sequence in (ts, id) order — the mobility /
    * cursor-path / pointer-telemetry aggregate. L1 deliberately, not
    * Euclidean: exact integer end to end (a Σ√· is an order-sensitive
    * float sum, the repo's forbidden shape), and for grid-like
    * movement L1 IS the distance.
    *
    * Output: (group, n_points, n_moves, l1_total) — groups with one
    * point have 0 moves, 0 length.
    *
    * Scale shape: one group-partitioned lag window (bounded by a
    * group's own points) + one partial groupBy. */
  def pathLengthL1(points: DataFrame, groupCol: String, tsCol: String,
                   idCol: String, xCol: String, yCol: String): DataFrame = {
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__ts").asc, col("__id").asc)
    points.select(col(groupCol).as("__g"),
        col(tsCol).cast("long").as("__ts"), col(idCol).as("__id"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .withColumn("__dx", col("__x") - lag(col("__x"), 1).over(w))
      .withColumn("__dy", col("__y") - lag(col("__y"), 1).over(w))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("__dx").isNotNull, 1L).otherwise(0L)).as("n_moves"),
        coalesce(sum(abs(col("__dx")) + abs(col("__dy"))), lit(0L))
          .as("l1_total"))
      .withColumnRenamed("__g", groupCol)
  }

  /** MAX CONCURRENCY per group — the peak number of simultaneously
    * open intervals (sessions online at once, parallel jobs, open
    * connections), the capacity-planning number a raw count can't
    * give. Sweep-line over ±1 deltas: starts sort BEFORE ends at the
    * same instant, so touching closed intervals [a, t] and [t, b]
    * count as concurrent — the inclusive-overlap convention, pinned.
    *
    * Output: (group, n_intervals, peak, peak_ts) — peak_ts the
    * EARLIEST instant the peak is reached (a total order: the running
    * count is fixed given the pinned delta order).
    *
    * Scale shape: intervals emit exactly two (group, ts, ±1) rows; the
    * running count is a group-partitioned window over them (bounded by
    * a group's intervals — the per-group-series window shape of the
    * quantile family); one partial groupBy finishes. Null or inverted
    * intervals (end < start) are rejected loudly — they would silently
    * corrupt every later count in the sweep. */
  def maxConcurrency(intervals: DataFrame, groupCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val base = intervals.select(col(groupCol).as("__g"),
      col(startCol).cast("long").as("__s"),
      col(endCol).cast("long").as("__e"))
    val bad = base.where(col("__s").isNull || col("__e").isNull ||
      col("__e") < col("__s")).limit(1).count()
    require(bad == 0,
      "null or inverted intervals (end < start) in maxConcurrency input")
    val deltas = base.select(col("__g"), col("__s").as("__t"),
        lit(1L).as("__d"))
      .unionByName(base.select(col("__g"), col("__e").as("__t"),
        lit(-1L).as("__d")))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__t").asc, col("__d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = deltas.withColumn("__c", sum(col("__d")).over(w))
    val peaks = swept.groupBy(col("__g"))
      .agg(max(col("__c")).as("peak"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
    swept.join(peaks, "__g")
      .where(col("__c") === col("peak"))
      .groupBy(col("__g"))
      .agg(first(col("n_intervals")).as("n_intervals"),
        first(col("peak")).as("peak"),
        min(col("__t")).as("peak_ts"))
      .withColumnRenamed("__g", groupCol)
  }

  /** MAX DRAWDOWN per group — the risk number behind every cumulative
    * series (revenue run-rate, balance, cumulative conversions): the
    * deepest peak-to-trough fall, absolute and as exact ppm of the
    * peak it fell from. For each point, the running peak is the max
    * over all EARLIER-OR-EQUAL periods; drawdown = peak − value;
    * the report takes the worst point per group.
    *
    * dd_ppm = max over points of (10⁶·(peak_t − x_t)) div peak_t —
    * relative to the peak IN FORCE at that point (two different peaks
    * can host the absolute-worst and relative-worst falls; both are
    * reported). Points before the first positive peak (peak_t ≤ 0)
    * are skipped in the ppm lane (a drawdown from a non-positive peak
    * has no meaningful relative size; ANSI div would also reject 0).
    *
    * Output per group: (group, n_periods, final_value, peak,
    * max_dd, max_dd_ppm) — max_dd ≥ 0; 0 = the series never fell
    * below a prior peak. max_dd_ppm NULL when no point had a positive
    * prior peak.
    *
    * Scale shape: one running-max window PARTITIONED BY the group
    * (state bounded by one group's periods, never the corpus — the
    * per-group series discipline of [[kmSurvivalPpm]]'s life table),
    * one final groupBy. Contract: one row per (group, period) — pre-
    * aggregate first (the gate does). */
  def maxDrawdown(df: DataFrame, groupCol: String, periodCol: String,
                  valueCol: String): DataFrame = {
    val s = df.select(col(groupCol).as("__g"),
        col(periodCol).cast("long").as("__t"),
        col(valueCol).cast("long").as("__x"))
      .where(col("__g").isNotNull && col("__t").isNotNull &&
        col("__x").isNotNull)
    val w = Window.partitionBy(col("__g")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wLast = Window.partitionBy(col("__g")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // both frames in one select (the one-Window-exec discipline);
    // same partition key, so still a single shuffle
    s.select(col("__g"), col("__t"), col("__x"),
        max(col("__x")).over(w).as("__peak"),
        last(col("__x")).over(wLast).as("__final"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_periods"),
        max(col("__final")).as("final_value"),
        max(col("__peak")).as("peak"),
        max(col("__peak") - col("__x")).as("max_dd"),
        max(when(col("__peak") > 0,
          expr("(1000000 * (__peak - __x)) div __peak"))).as("max_dd_ppm"))
      .withColumnRenamed("__g", groupCol)
  }

  /** HARRELL'S C-INDEX (bucketed) — does the score actually RANK the
    * survival times? The predictive-validity number the life-table
    * battery ([[kmSurvivalPpm]], [[rmstMilli]], logRankMilli) has no
    * member for: over comparable pairs (subject i had the event, and
    * j outlived i), concordance = the fraction where the higher-risk
    * score belonged to i (ties in score count ½). 0.5 = coin flip,
    * 1 = perfect risk ranking. Risk convention: HIGHER score predicts
    * SHORTER time.
    *
    * Bucketed contract (the isotonicFitBucketed stance): both axes
    * are equal-width bucketed over their observed [min, max] via a
    * broadcast extrema frame, so the pair enumeration collapses to a
    * BOUNDED grid (≤ timeBuckets·scoreBuckets cells; the cell-pair
    * join is grid², never subjects²). Same-time-BUCKET pairs are not
    * comparable under bucketing — the granularity trade that buys the
    * bounded grid. Exact integers throughout:
    *   bucket(v)  = ((v − min)·B) div (max − min + 1)   [0 when flat;
    *                caller keeps (v−min)·B inside a long — days/cents
    *                scales are nowhere near the edge]
    *   c_ppm      = (10⁶·(2·concordant + tied)) div (2·comparable)
    * NULL when no comparable pairs (single time bucket, or no events).
    *
    * Output one row: (n, n_comparable, concordant, tied, c_ppm).
    *
    * Scale shape: one extrema aggregate, one (tb, sb) groupBy — cells
    * shuffle, subjects don't — then a broadcast nested-loop join over
    * the bounded grid and one final row. */
  def cIndexPpm(df: DataFrame, timeCol: String, eventCol: String,
                scoreCol: String, timeBuckets: Int = 32,
                scoreBuckets: Int = 32): DataFrame = {
    require(timeBuckets >= 2 && timeBuckets <= 1024,
      s"timeBuckets must be in [2, 1024], got $timeBuckets")
    require(scoreBuckets >= 2 && scoreBuckets <= 1024,
      s"scoreBuckets must be in [2, 1024], got $scoreBuckets")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = df.select(col(timeCol).cast("long").as("__t"),
        col(eventCol).cast("boolean").as("__e"),
        col(scoreCol).cast("long").as("__s"))
      .where(col("__t").isNotNull && col("__e").isNotNull &&
        col("__s").isNotNull)
    val mm = base.agg(min(col("__t")).as("__tmin"),
      max(col("__t")).as("__tmax"), min(col("__s")).as("__smin"),
      max(col("__s")).as("__smax"), count(lit(1)).as("__n"))
    val cells = base.crossJoin(broadcast(mm))
      .select(
        expr(s"""CASE WHEN __tmax = __tmin THEN 0L
                |ELSE ((__t - __tmin) * $timeBuckets)
                |     div (__tmax - __tmin + 1) END"""
          .stripMargin.replace("\n", " ")).as("__tb"),
        expr(s"""CASE WHEN __smax = __smin THEN 0L
                |ELSE ((__s - __smin) * $scoreBuckets)
                |     div (__smax - __smin + 1) END"""
          .stripMargin.replace("\n", " ")).as("__sb"),
        col("__e"))
      .groupBy(col("__tb"), col("__sb"))
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__ce"),
        count(lit(1)).as("__ca"))
      .localCheckpoint() // both sides of the bounded cell-pair join
    val lhs = cells.where(col("__ce") > 0)
      .select(col("__tb").as("__ti"), col("__sb").as("__si"),
        col("__ce").as("__cei"))
    val rhs = cells.select(col("__tb").as("__tj"),
      col("__sb").as("__sj"), col("__ca").as("__caj"))
    val pairs = lhs.join(broadcast(rhs), col("__tj") > col("__ti"))
      .agg(
        sum(when(col("__si") > col("__sj"),
          col("__cei").cast(d38) * col("__caj"))).as("__conc"),
        sum(when(col("__si") === col("__sj"),
          col("__cei").cast(d38) * col("__caj"))).as("__ties"),
        sum(col("__cei").cast(d38) * col("__caj")).as("__comp"))
    pairs.crossJoin(broadcast(mm.select(col("__n"))))
      .select(col("__n").cast("long").as("n"),
        coalesce(col("__comp"), lit(0)).cast("long").as("n_comparable"),
        coalesce(col("__conc"), lit(0)).cast("long").as("concordant"),
        coalesce(col("__ties"), lit(0)).cast("long").as("tied"))
      .select(col("n"), col("n_comparable"), col("concordant"),
        col("tied"),
        when(col("n_comparable") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST((1000000 * (2 * CAST(concordant AS DECIMAL(38,0))
              |                 + tied))
              |div (2 * CAST(n_comparable AS DECIMAL(38,0)))
              |AS BIGINT)""".stripMargin.replace("\n", " ")))
          .as("c_ppm"))
  }
}
