package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting — train/val/test
  * assignment as a PURE FUNCTION of each row's id, so the split is
  * stable under reruns, repartitioning, cluster resizing and incremental
  * appends (a row never migrates between splits when new data arrives).
  * `df.sample()`/`randomSplit()` guarantee none of that: they reseed per
  * partition and reshuffle membership whenever the partitioning changes —
  * unacceptable for the train/eval hygiene of a corpus pipeline. Gate
  * query q49; no reference analog.
  *
  * Map-only (no shuffle, no state): the key expression evaluates inside
  * whole-stage codegen and the assignment is a chain of comparisons.
  */
object Sampling {

  private val Mille = 1000L

  /** Production key: well-mixed 64-bit hash of the id (seeded). */
  def xxKey(id: Column, seed: Int = 42): Column =
    pmod(xxhash64(id, lit(seed)), lit(Mille))

  /** Engine-independent key (the gate form): multiplicative LCG mix in
    * plain integer arithmetic any engine evaluates identically. Weaker
    * mixing than xxhash64 but unbiased per-mille for id-like keys.
    *
    * `salt` decorrelates keys drawn from the same id for DIFFERENT
    * decisions — e.g. a stratified keep-sample and a train/val/test
    * split: on one key, every row a low keep-rate stratum retains would
    * also have key < 900 and land in "train". A salted key applies a
    * SECOND multiplicative round whose MULTIPLIER depends on the salt
    * (`a2 + salt`). Both parts are load-bearing:
    *   - merely ADDING the salt shifts the residue, and a shift
    *     survives `mod 1000` — the "salted" key would be the unsalted
    *     one rotated by a constant, perfectly correlated (the round-4
    *     trap);
    *   - a second round with a FIXED multiplier decorrelates a salted
    *     key from the unsalted one but NOT two salted keys from each
    *     other: their pre-mod difference is again a constant shift
    *     (found by this round's chi-square property spec). A
    *     salt-dependent multiplier makes any two salted keys relate by
    *     an affine map with multiplier (a2+s2)/(a2+s1) ≠ 1 mod p,
    *     which spreads across the mod-1000 residues.
    * salt = 0 keeps the legacy single-round gate formula (pinned by
    * the q49/q52 oracles); salted keys are pinned by q65/q66. */
  def lcgKey(id: Column, salt: Long = 0L): Column =
    pmod(lcgKeyRaw(id, salt), lit(Mille))

  /** Full-resolution deterministic key in [0, 1000000007): the LCG value
    * [[lcgKey]] reduces per-mille. Injective in the id for ids below the
    * prime modulus (a·x+b mod p is a bijection for prime p), so it also
    * serves as a TIE-FREE pseudo-random total order — the corpus-shuffle
    * key (q73). */
  def lcgKeyRaw(id: Column, salt: Long = 0L): Column = {
    val p = 1000000007L
    require(salt >= 0L && salt < p - 1664525L,
      s"salt must be in [0, ${p - 1664525L}) to keep the salted multiplier nonzero mod $p")
    val r1 = pmod((id + lit(salt)) * lit(1103515245L) + lit(12345L), lit(p))
    if (salt == 0L) r1
    else pmod(r1 * lit(1664525L + salt) + lit(1013904223L), lit(p))
  }

  /** Attach a split label from per-mille weights, e.g.
    * Seq("train" -> 900, "val" -> 50, "test" -> 50). `key` must be a
    * [0, 1000) column ([[xxKey]] / [[lcgKey]]). */
  def assignSplits(df: DataFrame, key: Column,
                   splits: Seq[(String, Int)],
                   outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "split weights must be positive")
    require(splits.map(_._2).sum == Mille,
      s"per-mille split weights must sum to $Mille")
    require(!df.columns.contains(outCol),
      s"input frame already carries output column $outCol")
    // cumulative upper bounds per split; cascade built back-to-front so
    // the first bound containing the key wins
    val cuts = splits.scanLeft(0L) { case (acc, (_, w)) => acc + w }.tail
    val cascade = splits.zip(cuts).init.reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (els, ((name, _), hi)) => when(key < hi, lit(name)).otherwise(els)
      }
    df.withColumn(outCol, cascade)
  }

  /** MULTI-EPOCH deterministic reshuffle: epoch e orders the corpus by
    * the salt-e LCG key (salted multipliers are pairwise independent —
    * the round-5 correlation fix), so every epoch is a DIFFERENT
    * reproducible permutation of the same rows — the "reshuffle between
    * epochs" contract of a training loop, with no RNG state to
    * checkpoint (resume = recompute the key). One window-free
    * [[GlobalRank.globalRowNumber]] ranked shuffle per epoch; epochs is
    * a training-plan constant (validated ≤ 128).
    * Output: input columns + `epoch` (1-based) + `outCol`. */
  def epochOrders(df: DataFrame, idCol: Column, epochs: Int,
                  outCol: String = "epoch_rank"): DataFrame = {
    require(epochs >= 1 && epochs <= 128,
      s"epochs must be in [1, 128], got $epochs")
    require(!df.columns.contains("epoch"),
      "input frame already carries the output column epoch")
    (1 to epochs).map { e =>
      GlobalRank.globalRowNumber(
        df.withColumn("epoch", lit(e)),
        Seq(lcgKeyRaw(idCol, e.toLong), idCol), outCol)
    }.reduce(_ unionByName _)
  }

  /** Keep a deterministic `keepPerMille`/1000 fraction of rows. */
  def sampleByHash(df: DataFrame, key: Column, keepPerMille: Int): DataFrame = {
    require(keepPerMille >= 0 && keepPerMille <= Mille, "fraction out of range")
    df.filter(key < keepPerMille)
  }

  /** STRATIFIED deterministic sampling: a per-stratum keep fraction —
    * the corpus-rebalancing primitive (e.g. downsample the dominant
    * language, keep all of a rare one) with the same stability contract
    * as [[sampleByHash]]: membership is a pure function of the row id,
    * so strata re-weights never reshuffle which individual rows survive.
    * Map-only; the rate lookup compiles to a comparison cascade inside
    * whole-stage codegen (no join against a rate table needed until the
    * stratum count is large). Gate query q52. */
  def stratifiedSampleByHash(df: DataFrame, key: Column, stratum: Column,
                             ratesPerMille: Seq[(String, Int)],
                             defaultPerMille: Int = 0): DataFrame = {
    require(ratesPerMille.forall { case (_, r) => r >= 0 && r <= Mille },
      "per-stratum rates must be in [0, 1000]")
    require(defaultPerMille >= 0 && defaultPerMille <= Mille,
      "default rate out of range")
    require(ratesPerMille.map(_._1).distinct.size == ratesPerMille.size,
      "duplicate stratum in rate list")
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille): Column) {
      case (els, (s, r)) => when(stratum === s, lit(r)).otherwise(els)
    }
    df.filter(key < rate)
  }

  /** Approximate per-group quota ("diversity cap"): keep ≈`maxPerGroup`
    * rows of every group (cap docs per domain / cluster / source — the
    * corpus-curation move against mega-domains drowning the mix).
    *
    * Membership is `key < rate_g` where `rate_g = min(1000,
    * maxPerGroup·1000 DIV count_g)` per-mille — a pure function of
    * (key, group count), so re-runs, retries and partitionings agree
    * row-for-row, and integer DIV keeps both engines bit-identical.
    * APPROXIMATE by design: the kept count is Binomial(count_g, rate_g)
    * — within a few percent of the quota for counts ≫ 1000/rate. The
    * EXACT form would be a per-group rank — i.e. one window task
    * swallowing the largest group, the straggler this operator exists
    * to avoid; at 100 TB approximate-but-map-only wins.
    *
    * Shape: one map-side-partial groupBy for the counts, joined back on
    * the group key (plan picks broadcast when the group dimension is
    * small — not forced, a 10^7-domain corpus must shuffle-join), then a
    * map-only filter.
    *
    * NULL groups: with the default `includeNulls = false`, rows whose
    * group value is NULL are dropped (the equi-join never matches
    * them) — documented, matching SQL inner-join intuition. Pass
    * `includeNulls = true` to treat all null-group rows as ONE sentinel
    * group capped like any other: the join switches to null-safe
    * equality (`<=>`), whose null group pairs with the null count row
    * `groupBy` already emits — no sentinel value is invented, so no
    * real group value can collide with it. */
  def capPerGroupApprox(df: DataFrame, key: Column, groupCol: Column,
                        maxPerGroup: Long,
                        includeNulls: Boolean = false): DataFrame = {
    require(maxPerGroup >= 0 && maxPerGroup <= Long.MaxValue / Mille,
      s"maxPerGroup must be in [0, ${Long.MaxValue / Mille}] " +
        s"(rate arithmetic is per-mille in long math), got $maxPerGroup")
    require(!df.columns.contains("__cap_cnt"),
      "input frame already carries the helper column __cap_cnt")
    val counts = df.groupBy(groupCol.as("__cap_g"))
      .agg(count(lit(1)).as("__cap_cnt"))
    val joinCond =
      if (includeNulls) groupCol <=> col("__cap_g")
      else groupCol === col("__cap_g")
    val rate = when(col("__cap_cnt") <= maxPerGroup, lit(Mille.toLong))
      .otherwise(expr(s"(${maxPerGroup}L * ${Mille}L) DIV __cap_cnt"))
    df.join(counts, joinCond)
      .filter(key < rate)
      .drop("__cap_g", "__cap_cnt")
  }

  /** EXACT per-group quota: keep exactly `min(n_g, maxPerGroup)` rows of
    * each group — the rows with the `maxPerGroup` smallest (orderKey,
    * id) pairs (largest when `ascending = false`). With an LCG/xxhash
    * orderKey this is exact deterministic per-group subsampling; with a
    * quality score it is per-group best-N retention.
    *
    * Shape: one map-side-partial groupBy whose buffer is the k-bounded
    * [[graft.functions.BottomKLong]] aggregator — every map task ships
    * at most `maxPerGroup` (key, id) pairs per group, so the exact
    * quota never plans the row_number window that would sort the
    * largest group in ONE task (the straggler shape
    * [[capPerGroupApprox]] exists to avoid). Survivor ids then
    * semi-join the input — ids only, no payload shuffle.
    *
    * Integer keys stay integers end to end (no Double round-trip —
    * distinct keys past 2^53 must not collide into ties). Ties break
    * ascending id in both directions. NULL groups form their own capped
    * group (groupBy semantics — unlike the join-based approx, nothing
    * is dropped). `idCol` must be a unique non-null row id; a NULL
    * orderKey row is dropped (documented: quotas need a total order).
    *
    * Memory: each partial buffer holds ≤ maxPerGroup pairs PER GROUP
    * seen by that task (16 B each) — sized for quotas up to ~10^6; for
    * larger caps use [[capPerGroupApprox]] (rate filter, O(1)/group). */
  def capPerGroupExact(df: DataFrame, orderKey: Column, groupCol: Column,
                       idCol: Column, maxPerGroup: Int,
                       ascending: Boolean = true): DataFrame = {
    require(maxPerGroup >= 1 && maxPerGroup <= (1 << 20),
      s"maxPerGroup must be in [1, ${1 << 20}] (k-bounded buffers); " +
        s"use capPerGroupApprox beyond, got $maxPerGroup")
    require(!df.columns.contains("__ce_id"),
      "input frame already carries the helper column __ce_id")
    val agg = udaf(new graft.functions.BottomKLong(maxPerGroup),
      org.apache.spark.sql.Encoders.product[(Long, Long)])
    val k0 = orderKey.cast("long")
    // DESC = bottom-k of the negated key; LCG/count keys are far from
    // Long.MinValue so the negation cannot overflow
    val k = if (ascending) k0 else -k0
    val winners = df
      .filter(k.isNotNull)
      .groupBy(groupCol.as("__ce_g"))
      .agg(agg(k, idCol.cast("long")).as("__ce_top"))
      .select(explode(col("__ce_top").getField("items")).as("__ce_it"))
      .select(col("__ce_it._2").as("__ce_id"))
    df.join(winners, idCol.cast("long") === col("__ce_id"), "left_semi")
  }

  /** WATER-FILLING row budget across groups: keep exactly `totalBudget`
    * rows overall, as evenly across groups as group sizes allow — small
    * groups keep everything, large groups are capped at a common water
    * level λ (the largest level whose total fits the budget), and the
    * integer remainder goes one row each to the first capped groups in
    * group-value order. The fair-share mixture step when no explicit
    * per-group shares exist ("give every domain an equal voice up to
    * the compute budget"). Fully deterministic integer math; membership
    * per group is the smallest (orderKey, id) pairs, as in
    * [[capPerGroupExact]].
    *
    * Scale shape: λ depends only on the MULTISET of group counts —
    * one map-side-partial groupBy collected as ≤|groups| longs (group
    * domains are mixture specs: languages, sources, clusters — the
    * sampleToTemperature precedent); the remainder ranking windows over
    * the ≤|groups|-row counts frame, never the corpus; selection is the
    * k-bounded BottomKLong aggregator with buffers ≤ λ+1, then an
    * ids-only semi join. NULL groups form their own group. Budgets
    * needing λ ≥ 2^20 are refused (buffer bound) — at that level use
    * rate-based mixture ops instead. */
  def waterFillBudget(df: DataFrame, orderKey: Column, groupCol: Column,
                      idCol: Column, totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    for (c <- Seq("__wf_g", "__wf_cnt", "__wf_cap", "__wf_id"))
      require(!df.columns.contains(c),
        s"input frame already carries the helper column $c")
    val counts = df.groupBy(groupCol.as("__wf_g"))
      .agg(count(lit(1)).as("__wf_cnt"))
    val cs = counts.select(col("__wf_cnt")).collect().map(_.getLong(0)).sorted
    val total = cs.sum
    if (totalBudget >= total) return df
    // closed-form level: walk groups ascending; once the per-remaining-
    // group share drops below the next count, that share IS the level
    val m = cs.length
    var prefix = 0L; var i = 0; var lambda = 0L
    var found = false
    while (!found) {
      val cand = (totalBudget - prefix) / (m - i)
      if (cand < cs(i)) { lambda = cand; found = true }
      else { prefix += cs(i); i += 1 }   // i < m: budget < total ensures stop
    }
    val spent = prefix + lambda * (m - i)
    val extra = totalBudget - spent      // 0 <= extra < m - i capped groups
    require(lambda + 1 <= (1 << 20),
      s"water level $lambda exceeds the exact-buffer bound (2^20); " +
        "use capPerGroupApprox/sampleToMixture rates at this scale")
    // per-group caps: min(cnt, λ) + 1 for the first `extra` capped
    // groups in group-value order — windows over ≤|groups| rows only
    val wOrd = org.apache.spark.sql.expressions.Window
      .orderBy(col("__wf_g").asc_nulls_last)
    val cappedG = counts.filter(col("__wf_cnt") > lambda)
      .withColumn("__wf_rk", row_number().over(wOrd))
      .withColumn("__wf_cap",
        lit(lambda) + when(col("__wf_rk") <= extra, 1L).otherwise(0L))
      .select(col("__wf_g"), col("__wf_cap"))
    val caps = counts.filter(col("__wf_cnt") <= lambda)
      .select(col("__wf_g"), col("__wf_cnt").as("__wf_cap"))
      .unionByName(cappedG)
    val agg = udaf(new graft.functions.BottomKLong((lambda + 1).toInt),
      org.apache.spark.sql.Encoders.product[(Long, Long)])
    val k0 = orderKey.cast("long")
    val winners = df.filter(k0.isNotNull)
      .groupBy(groupCol.as("__wf_g"))
      .agg(agg(k0, idCol.cast("long")).as("__wf_top"))
      .select(col("__wf_g"),
        posexplode(col("__wf_top").getField("items")).as(Seq("pos", "it")))
      // null-safe join: the NULL group's cap row must pair with the
      // NULL group's buffer (plain = would silently drop it)
      .join(caps.withColumnRenamed("__wf_g", "__wf_g2"),
        col("__wf_g") <=> col("__wf_g2"))
      .filter(col("pos") < col("__wf_cap"))
      .select(col("it._2").as("__wf_id"))
    df.join(winners, idCol.cast("long") === col("__wf_id"), "left_semi")
  }

  /** Downsample toward a TARGET MIXTURE: per-group target shares (in
    * per-mille of the final sample) plus a target total row count
    * derive each group's deterministic keep rate —
    * `rate_g = min(1000, (targetTotal·share_g DIV 1000)·1000 DIV n_g)`
    * — the Pile-style mixture-reweighting step (fix the composition of
    * the training set, not just per-group rates). All arithmetic is
    * integer long math (per-mille + DIV), so membership is a pure
    * function of (key, group count) both engines reproduce bit-for-bit
    * (gate q90). APPROXIMATE like [[capPerGroupApprox]]: kept counts
    * are Binomial(n_g, rate_g); a group whose target exceeds its
    * population keeps everything (rate clamps at 1000) and the realized
    * mixture shifts accordingly — under-populated groups cannot be
    * upsampled by a filter. Groups absent from `sharesPerMille` (and
    * NULL groups — the share cascade yields 0) are dropped.
    *
    * Shape: one map-side-partial groupBy for the counts, a join back on
    * the group key (broadcast when small), then a map-only filter —
    * no windows, no collects. */
  def sampleToMixture(df: DataFrame, key: Column, groupCol: Column,
                      sharesPerMille: Seq[(String, Int)],
                      targetTotal: Long): DataFrame = {
    require(sharesPerMille.nonEmpty && sharesPerMille.forall(_._2 >= 0),
      "mixture shares must be non-negative")
    require(sharesPerMille.map(_._2).sum == Mille,
      s"per-mille mixture shares must sum to $Mille")
    require(sharesPerMille.map(_._1).distinct.size == sharesPerMille.size,
      "duplicate group in share list")
    require(targetTotal >= 0 && targetTotal <= Long.MaxValue / Mille,
      s"targetTotal must be in [0, ${Long.MaxValue / Mille}] " +
        s"(share arithmetic is per-mille in long math), got $targetTotal")
    for (c <- Seq("__mix_g", "__mix_cnt", "__mix_share"))
      require(!df.columns.contains(c),
        s"input frame already carries the helper column $c")
    val share = sharesPerMille.foldLeft(lit(0L): Column) {
      case (els, (g, w)) => when(groupCol === g, lit(w.toLong)).otherwise(els)
    }
    val counts = df.groupBy(groupCol.as("__mix_g"))
      .agg(count(lit(1)).as("__mix_cnt"))
    val rate = when(col("__mix_share") === 0L, lit(0L)).otherwise(
      least(lit(Mille),
        expr(s"((${targetTotal}L * __mix_share) DIV ${Mille}L) " +
          s"* ${Mille}L DIV __mix_cnt")))
    df.withColumn("__mix_share", share)
      .join(counts, groupCol === col("__mix_g"))
      .filter(key < rate)
      .drop("__mix_g", "__mix_cnt", "__mix_share")
  }

  /** [[sampleToMixture]] with WEIGHTED group sizes — the form a
    * training-mixture spec actually uses: targets are TOKEN budgets,
    * not document counts (a group of few huge documents must
    * downsample harder than its row count suggests). `weight` is a
    * non-negative integer column (per-doc token count, byte size, …);
    * each group's keep rate derives from its weight SUM —
    * `rate_g = min(1000, (targetWeight·share_g DIV 1000)·1000 DIV w_g)`
    * — while membership stays the per-ROW `key` filter, so the kept
    * WEIGHT per group is rate_g·w_g/1000 in expectation. Same integer
    * long math (bit-reproducible cross-engine, gate q95), same
    * approximation stance as [[sampleToMixture]] (clamped rates
    * keep-all; under-populated groups cannot be upsampled), same
    * one-groupBy + join + map-only-filter shape. A group whose weight
    * sum is ≤ 0 is dropped (nothing to budget). */
  def sampleToMixtureWeighted(df: DataFrame, key: Column, groupCol: Column,
                              weight: Column,
                              sharesPerMille: Seq[(String, Int)],
                              targetWeight: Long): DataFrame = {
    require(sharesPerMille.nonEmpty && sharesPerMille.forall(_._2 >= 0),
      "mixture shares must be non-negative")
    require(sharesPerMille.map(_._2).sum == Mille,
      s"per-mille mixture shares must sum to $Mille")
    require(sharesPerMille.map(_._1).distinct.size == sharesPerMille.size,
      "duplicate group in share list")
    require(targetWeight >= 0 && targetWeight <= Long.MaxValue / Mille,
      s"targetWeight must be in [0, ${Long.MaxValue / Mille}] " +
        s"(share arithmetic is per-mille in long math), got $targetWeight")
    for (c <- Seq("__mix_g", "__mix_w", "__mix_share"))
      require(!df.columns.contains(c),
        s"input frame already carries the helper column $c")
    val share = sharesPerMille.foldLeft(lit(0L): Column) {
      case (els, (g, w)) => when(groupCol === g, lit(w.toLong)).otherwise(els)
    }
    val weights = df.groupBy(groupCol.as("__mix_g"))
      .agg(sum(weight.cast("long")).as("__mix_w"))
    val rate = when(col("__mix_share") === 0L || col("__mix_w") <= 0L, lit(0L))
      .otherwise(least(lit(Mille),
        expr(s"((${targetWeight}L * __mix_share) DIV ${Mille}L) " +
          s"* ${Mille}L DIV __mix_w")))
    df.withColumn("__mix_share", share)
      .join(weights, groupCol === col("__mix_g"))
      .filter(key < rate)
      .drop("__mix_g", "__mix_w", "__mix_share")
  }

  /** TEMPERATURE-flattened mixture sampling — the multilingual
    * rebalancing step of mC4 / XLM-R / BLOOM-style corpora: kept group
    * sizes proportional to n_g^alpha instead of n_g, so head languages
    * (or domains) flatten toward the tail without anyone upsampling.
    * Unlike [[sampleToMixture]] the target shares are not given — they
    * are DERIVED from the observed group counts:
    * `k_g = floor(targetTotal · n_g^α / Σ n^α)`, keep rate
    * `min(1000, k_g·1000 DIV n_g)` per-mille, membership the usual
    * pure per-row `key` filter (survivors never churn on re-runs).
    *
    * Determinism: each group's n^α is rounded ONCE to 6 decimal digits
    * via the shortest-double-string HALF_UP rule — exactly what both
    * Spark's `cast(double as decimal)` and DuckDB's double→decimal
    * conversion produce (the blessed q26-family parity) — so the
    * cross-group SUM is exact decimal, never an order-sensitive float
    * summation, and the final scale k_g is one IEEE-double
    * multiply+divide+floor on bit-identical inputs. At `alpha = 0.5`
    * n^α is `sqrt`, correctly rounded per IEEE-754 in every engine →
    * the whole derivation is cross-engine exact (gate q101). Other
    * alphas go through `pow`, which carries no correct-rounding
    * guarantee — production use only, spec-checked.
    *
    * Shape: the rates derive EAGERLY from one groupBy(group) count job
    * (map-side partial; the collect is ≤ |groups| rows — languages or
    * domains, hundreds at most — the sampleToMixture share list built
    * from data instead of handed in), then membership is a map-only
    * when-chain filter: no join, nothing pinned, scan-speed. Null- or
    * unseen-group rows drop, matching the mixture samplers. */
  def sampleToTemperature(df: DataFrame, key: Column, groupCol: Column,
                          alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1] (flattening), got $alpha")
    require(targetTotal >= 0 && targetTotal <= Long.MaxValue / Mille,
      s"targetTotal must be in [0, ${Long.MaxValue / Mille}], got $targetTotal")
    val cnts: Seq[(String, Long)] = df
      .groupBy(groupCol.cast("string").as("__tmp_g"))
      .agg(count(lit(1)).as("__tmp_cnt"))
      .collect().toSeq
      .collect { case r if !r.isNullAt(0) => (r.getString(0), r.getLong(1)) }
      .sortBy(_._1)
    if (cnts.isEmpty) return df.filter(lit(false))
    // n^alpha rounded once to 6 digits, the way both engines cast
    // double→decimal: shortest decimal string of the double, HALF_UP
    def pow6(n: Long): BigDecimal = {
      val p = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      BigDecimal(java.math.BigDecimal.valueOf(p))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val sq = cnts.map { case (g, n) => (g, n, pow6(n)) }
    val tot = sq.map(_._3).sum.doubleValue
    val rates = sq.map { case (g, n, s) =>
      val kg = math.floor(targetTotal.toDouble * s.doubleValue / tot).toLong
      (g, math.min(Mille, kg * Mille / n))
    }
    val rate = rates.foldLeft(lit(0L): Column) {
      case (els, (g, r)) => when(groupCol === g, lit(r)).otherwise(els)
    }
    df.filter(key < rate)
  }

  /** SYSTEMATIC PPS SAMPLING (probability proportional to size): walk
    * the corpus in `sortCols` order accumulating `weightCol` (token or
    * char counts), and take one sample at every weight position
    * `phase, phase+stride, phase+2·stride, …` — the classic systematic
    * πPS design. A row whose weight interval `(cum−w, cum]` straddles k
    * sample points appears with `copies = k` (a document heavier than
    * the stride is taken multiple times — exactly how a
    * token-proportional trainer would repeat it); expected copies are
    * w/stride with ZERO variance beyond the within-stride position, the
    * property that makes systematic PPS the budget sampler of choice
    * over Poisson sampling (which over/under-shoots the budget).
    *
    * Entirely integer arithmetic: with 1 ≤ phase ≤ stride the
    * points-at-or-below count is S(C) = (C − phase + stride) div stride
    * (non-negative for C ≥ 0, so floor = truncate in both engines) and
    * copies = S(cum) − S(cum − w). Deterministic given a tie-free
    * `sortCols` order; weights must be ≥ 0.
    *
    * Output: the input columns + `cum` (inclusive running weight) +
    * `copies ≥ 1` for sampled rows.
    *
    * Scale shape: one [[GlobalRank.globalRunningSum]] (range partition +
    * per-partition offsets — ≤ p rows of metadata at the driver, window
    * state bounded by one range partition) + a map-side filter. No
    * global window, no collect of data. */
  def systematicPps(df: DataFrame, sortCols: Seq[Column], weightCol: String,
                    stride: Long, phase: Long): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(phase >= 1 && phase <= stride,
      s"phase must be in [1, stride], got $phase")
    val cum = GlobalRank.globalRunningSum(df, sortCols, weightCol, "cum")
    // points at or below C: S(C) = (C − phase + stride) div stride
    val copiesC =
      expr(s"(cum - ${phase}L + ${stride}L) div ${stride}L") -
        expr(s"(cum - CAST($weightCol AS BIGINT) - ${phase}L + ${stride}L) div ${stride}L")
    cum.withColumn("copies", copiesC.cast("long"))
      .filter(col("copies") >= 1)
  }

  /** SEQUENTIAL POISSON SAMPLING (Ohlsson): a deterministic
    * fixed-size-k πps-WITHOUT-replacement sample per group — each row
    * draws priority = u div w (u a 60-bit hash of its id, w its
    * positive integer weight) and the k smallest priorities win, so
    * heavier rows systematically draw smaller priorities and inclusion
    * probability tracks weight share. The without-replacement
    * complement of [[systematicPps]] (which emits COPIES); the
    * standard survey-sampling estimator for "give me k docs per
    * language, length-weighted" selections.
    *
    * Ties (equal priority) break on the id inside the k-bounded
    * aggregator — a total order both engines reproduce. Rows with
    * NULL or non-positive weight never qualify.
    *
    * Output: the surviving input rows, unchanged.
    *
    * Scale shape: priority is map-only; selection is
    * [[capPerGroupExact]]'s k-bounded BottomKLong partial aggregation
    * (a group with a billion rows ships k-sized buffers into the
    * shuffle, never a window sort) + an ids-only semi join. */
  def sequentialPoissonSample(df: DataFrame, groupCol: Column,
                              idCol: Column, weightCol: String, k: Int,
                              hashFn: Column => Column = Stats.xx60)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = col(weightCol).cast("long")
    val eligible = df.filter(w.isNotNull && w > 0)
      .withColumn("__sps_u", hashFn(idCol.cast("string")))
      .withColumn("__sps_pri",
        expr(s"__sps_u div CAST($weightCol AS BIGINT)"))
    capPerGroupExact(eligible, col("__sps_pri"), groupCol, idCol, k)
      .drop("__sps_u", "__sps_pri")
  }
}
