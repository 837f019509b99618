package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the 100 TB cardinality
  * primitive. An exact `count(distinct key)` over a 10¹¹-row corpus
  * shuffles every distinct key; the HyperLogLog register table is a
  * fixed 2^b rows regardless of input size, merges with an
  * element-wise max (so per-partition / per-day / per-source sketches
  * combine without re-reading data), and answers "how many distinct
  * n-grams / URLs / doc hashes" within ~1.04/√(2^b) relative error.
  *
  * Determinism contract (the repo-wide cross-engine discipline): the
  * registers are pure INTEGER facts of the hash values — bucket = low
  * b bits, rho = leading-zero count of the remaining field + 1,
  * register = max rho — so any engine computing the same rule on the
  * same hash matches bit-for-bit. The gate runs the md5-derived
  * 60-bit hash ([[graft.llm.TextAnalysis.md5Hash60]]) that DuckDB can
  * reproduce with string math; production defaults to xxhash64 masked
  * to 63 bits. The float-valued ESTIMATE (harmonic mean + bias
  * constants + the small-range linear-counting log) is deliberately
  * NOT part of the gate surface — it is derived driver-free from the
  * integer registers and pinned in the spec against an independent
  * in-memory reference.
  *
  * Scale shape: one map-side-partial groupBy on (group, bucket) —
  * ≤ groups·2^b rows cross the shuffle, never the key stream; no
  * windows, no collects. Merge is a union + the same bounded groupBy.
  */
object Sketches {

  /** Standard HLL bias-correction constant α_m (Flajolet et al. 2007):
    * α_16=0.673, α_32=0.697, α_64=0.709, α_m=0.7213/(1+1.079/m) for
    * m ≥ 128. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  private def validate(b: Int, hashBits: Int): Unit = {
    require(b >= 4 && b <= 16, s"register-index bits b=$b outside [4,16]")
    require(hashBits > b && hashBits <= 63,
      s"hashBits=$hashBits must be in ($b, 63]")
  }

  /** HyperLogLog register table of `key` (NULL keys excluded — a NULL
    * is a missing observation, not a distinct value): one row per
    * OCCUPIED register, (groupCols..., bucket, r) with
    * bucket ∈ [0, 2^b) and r = max over hashes landing in the bucket
    * of (leading zeros of the (hashBits−b)-bit remainder + 1) ∈
    * [1, hashBits−b+1]. Absent buckets mean register value 0 —
    * consumers ([[hllEstimate]]) reconstruct them arithmetically
    * rather than materializing empty rows.
    *
    * `hashFn` is xxhash64 by default (production); gates pass
    * [[graft.llm.TextAnalysis.md5Hash60]] with hashBits = 60 so the
    * oracle reproduces the registers in SQL. The hash is masked to
    * `hashBits` bits up front, so the rule is identical either way:
    * bucket = h mod 2^b, w = h div 2^b, rho = (hashBits−b+1) −
    * bitlength(w) (w = 0 → hashBits−b+1), via `length(bin(w))` —
    * integer/string math both engines share, no float log anywhere.
    *
    * With optional `groupCols` the sketch is per-group (distinct
    * values per language / source / day) — the groupBy key grows by
    * the group columns, the row bound by ×|groups|. */
  def hllRegisters(df: DataFrame, key: Column, b: Int = 6,
                   hashFn: Column => Column = xxhash64(_),
                   hashBits: Int = 63,
                   groupCols: Seq[String] = Nil): DataFrame = {
    validate(b, hashBits)
    val m = 1 << b
    val rhoMax = hashBits - b + 1
    val mask = if (hashBits == 63) Long.MaxValue else (1L << hashBits) - 1
    val h = hashFn(key).bitwiseAND(lit(mask))
    val rows = df.where(key.isNotNull)
      .select(groupCols.map(col) :+ (h % m).as("bucket") :+
        (h / m).as("__w"): _*)
      .withColumn("r",
        when(col("__w") === 0, lit(rhoMax))
          .otherwise(lit(rhoMax) - length(bin(col("__w")))))
    rows.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).cast("int").as("r"))
  }

  /** Merge two register tables built with the SAME (b, hashBits,
    * hashFn): element-wise max per (group, bucket). This is the whole
    * point of the sketch — per-shard sketches union into a corpus
    * sketch without touching the data again. */
  def hllMerge(a: DataFrame, b: DataFrame,
               groupCols: Seq[String] = Nil): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).cast("int").as("r"))

  /** SLIDING-WINDOW register rollup: from per-period register tables
    * (groupCols…, `timeCol`, bucket, r), the register table of every
    * trailing window of `windowLen` periods — window w = periods
    * [w−windowLen+1, w]. This is the sketch-cube pattern: "distinct
    * users over any trailing 6 h" answered by merging ≤ windowLen·2^b
    * register rows per window, never re-reading events. Each period row
    * fans out to the windowLen windows it serves (explode of a literal
    * sequence, map-side), then element-wise max per (group, w, bucket) —
    * one shuffle over register rows only. */
  def hllSlidingMerge(registers: DataFrame, timeCol: String,
                      windowLen: Int,
                      groupCols: Seq[String] = Nil): DataFrame = {
    require(windowLen >= 1, s"windowLen must be >= 1, got $windowLen")
    registers
      .select(groupCols.map(col) :+
        explode(sequence(col(timeCol),
          col(timeCol) + (windowLen - 1))).as("w") :+
        col("bucket") :+ col("r"): _*)
      .groupBy((groupCols :+ "w" :+ "bucket").map(col): _*)
      .agg(max(col("r")).cast("int").as("r"))
  }

  /** SET-INTERSECTION estimate by inclusion–exclusion: |A∩B| ≈
    * est(A) + est(B) − est(A∪B), the union sketch being the element-wise
    * register max ([[hllMerge]]) — two corpus slices compare WITHOUT a
    * distinct-key join, from sketches that may have been built on
    * different days/shards. Output per group: est_a, est_b, est_union,
    * est_intersect (clamped ≥ 0 — inclusion–exclusion noise can go
    * negative when the true overlap is small relative to the sketch
    * error; the clamp is the standard reading "no evidence of
    * overlap"). Relative error grows as |A∪B|/|A∩B| — callers wanting
    * tight small-overlap bounds need a sampling pass, documented here
    * rather than hidden. Three ≤2^b-row-per-group aggregations and two
    * group-keyed joins of estimate rows — sketch-bounded, never
    * data-bounded. */
  def hllIntersectEstimate(a: DataFrame, b: DataFrame, bBits: Int,
                           hashBits: Int = 63,
                           groupCols: Seq[String] = Nil): DataFrame = {
    val keyed = groupCols.nonEmpty
    def prep(r: DataFrame) = if (keyed) r else r.withColumn("__g", lit(1))
    val keys = if (keyed) groupCols else Seq("__g")
    def est(r: DataFrame, as: String) =
      hllEstimate(prep(r), bBits, hashBits, keys)
        .select((keys.map(col) :+ col("estimate").as(as)): _*)
    val joined = est(a, "est_a")
      .join(est(b, "est_b"), keys)
      .join(est(hllMerge(prep(a), prep(b), keys), "est_union"), keys)
      .withColumn("est_intersect",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0.0)))
    if (keyed) joined else joined.drop("__g")
  }

  /** Cardinality estimate from a register table: per group, the
    * standard HLL estimator E = α_m·m²·2^S / Σ_j 2^(S−M[j]) (S =
    * hashBits−b+1 keeps the harmonic sum in exact integer units —
    * occupied registers contribute 2^(S−r), the (m−occupied) empty
    * ones 2^S each, summed as DECIMAL(38,0) so even b=16 at 63 hash
    * bits cannot overflow), with the small-range correction E' =
    * m·ln(m/V) when E ≤ 2.5·m and V = empty registers > 0
    * (Flajolet et al. 2007 §4). Output: (groupCols..., n_buckets,
    * denom_units, estimate) — `denom_units` is the exact integer
    * harmonic numerator, the auditable core; `estimate` is the
    * float convenience. Driver-free: one ≤2^b-row-per-group groupBy. */
  def hllEstimate(registers: DataFrame, b: Int, hashBits: Int = 63,
                  groupCols: Seq[String] = Nil): DataFrame = {
    validate(b, hashBits)
    val m = 1 << b
    val s = hashBits - b + 1
    val alpha = hllAlpha(m)
    val unit = lit(BigDecimal(BigInt(1) << s)).cast("decimal(38,0)")
    val agg = registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("int").as("n_buckets"),
        sum(expr(s"cast(shiftleft(1L, $s - r) as decimal(38,0))"))
          .as("__occ"))
      .withColumn("denom_units",
        (col("__occ") + (lit(m) - col("n_buckets")).cast("decimal(38,0)")
          * unit).cast("decimal(38,0)"))
    val raw = lit(alpha * m.toDouble * m.toDouble) *
      unit.cast("double") / col("denom_units").cast("double")
    val zeros = lit(m) - col("n_buckets")
    agg.withColumn("estimate",
        when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
          .otherwise(raw))
      .drop("__occ")
  }

  // ---------------------------------------------------------------------
  // Count-Min sketch — the mergeable per-key FREQUENCY sibling of the
  // HLL cardinality sketch. "How often does this token / URL / doc hash
  // occur?" answered from a fixed d·2^b-cell integer table instead of a
  // full key-frequency shuffle; per-shard sketches merge by element-wise
  // SUM, and a point query reads d cells and takes their min (Cormode &
  // Muthukrishnan 2005: estimate ≥ truth always, ≤ truth + εN with
  // probability 1−δ for d = ln(1/δ), 2^b = e/ε).
  //
  // Determinism: registers are pure integer facts of the d salted
  // hashes — row i hashes `i + ":" + key`. Production salts xxhash64;
  // gates pass [[graft.llm.TextAnalysis.md5Hash60]]-style md5 hashing so
  // DuckDB rebuilds the identical table with string math. All d hashes
  // are computed in ONE scan stage (posexplode of a d-element literal
  // array), never d passes over the input.

  private def cmValidate(d: Int, b: Int): Unit = {
    require(d >= 1 && d <= 8, s"depth d=$d outside [1,8]")
    require(b >= 4 && b <= 20, s"bucket bits b=$b outside [4,20]")
  }

  /** The salted-hash family shared by build and query: row i's hash of
    * `key` is `hashFn(concat(i, ":", key))` masked to 63 bits. The salt
    * rides the VALUE (not a second hash argument) so any single-column
    * string hash — xxhash64 production, md5-based for gates —
    * instantiates the family. */
  private def cmBucket(key: Column, row: Int, b: Int,
                       hashFn: Column => Column): Column =
    pmod(hashFn(concat(lit(s"$row:"), key)).bitwiseAND(lit(Long.MaxValue)),
      lit(1L << b))

  /** Count-Min register table of `key` occurrences (NULL keys excluded),
    * weighted by `weight` (default 1 per row): one row per OCCUPIED cell,
    * (groupCols..., row ∈ [0,d), bucket ∈ [0,2^b), cnt). Absent cells
    * mean 0 — [[cmQuery]] reconstructs them with a left join + coalesce.
    *
    * Scale shape: the d per-row buckets are computed inside the scan
    * stage and posexploded — one pass, then one map-side-partial groupBy
    * bounded by |groups|·d·2^b rows. The key stream never shuffles. */
  def cmRegisters(df: DataFrame, key: Column, d: Int = 4, b: Int = 10,
                  weight: Column = lit(1L),
                  hashFn: Column => Column = xxhash64(_),
                  groupCols: Seq[String] = Nil): DataFrame = {
    cmValidate(d, b)
    val cells = array((0 until d).map(i =>
      struct(lit(i).as("row"), cmBucket(key, i, b, hashFn).as("bucket"))): _*)
    df.where(key.isNotNull)
      .select(groupCols.map(col) :+ explode(cells).as("__cell") :+
        weight.cast("long").as("__w"): _*)
      .groupBy(groupCols.map(col) :+ col("__cell.row").as("row") :+
        col("__cell.bucket").as("bucket"): _*)
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Merge register tables built with the SAME (d, b, hashFn):
    * element-wise sum per (group, row, bucket) — per-shard / per-day
    * sketches combine without re-reading data. */
  def cmMerge(a: DataFrame, b: DataFrame,
              groupCols: Seq[String] = Nil): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "row" :+ "bucket").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query the sketch: for each row of `keys` (a frame with a
    * `key` column and, when the sketch is grouped, the same groupCols),
    * estimate = min over the d rows of the addressed cell (absent cell →
    * 0 → estimate 0). Output: keys' columns + `estimate`. The estimate
    * never undercounts; collisions only inflate it.
    *
    * Scale shape: the keys frame is the SMALL side (a probe list);
    * its d cells explode map-side and join the register table on
    * (group, row, bucket) — a broadcast-size register table (≤ d·2^b
    * rows per group) makes this a map-only probe. */
  def cmQuery(registers: DataFrame, keys: DataFrame, keyCol: String,
              d: Int, b: Int,
              hashFn: Column => Column = xxhash64(_),
              groupCols: Seq[String] = Nil): DataFrame = {
    cmValidate(d, b)
    val cells = array((0 until d).map(i =>
      struct(lit(i).as("row"),
        cmBucket(col(keyCol), i, b, hashFn).as("bucket"))): _*)
    val joinKeys = groupCols ++ Seq("row", "bucket")
    keys.withColumn("__cell", explode(cells))
      .select(keys.columns.map(col) :+ col("__cell.row").as("row") :+
        col("__cell.bucket").as("bucket"): _*)
      .join(registers, joinKeys, "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
  }

  /** JOIN-SIZE ESTIMATION from two Count-Min register tables built with
    * the same (d, b, hashFn): |R ⋈ S on key| = Σ_k fR(k)·fS(k), and the
    * CM estimate of that inner product is min over the d hash rows of
    * the cell-wise dot product (Cormode & Muthukrishnan's inner-product
    * bound — never undercounts, collisions only inflate). This is the
    * cardinality-estimation primitive a planner consults BEFORE running
    * a join: two one-pass sketches answer "how big would it be" without
    * shuffling either table.
    *
    * Output: (group…, row, dot, est) — one row per hash row with its
    * dot product, `est` = the min repeated (the gate-checkable integer
    * cores). Plan: the join touches only register tables (≤ d·2^b rows
    * per group each); absent cells are zero and drop out of the inner
    * join. */
  def cmJoinSizeEstimate(a: DataFrame, b: DataFrame,
                         groupCols: Seq[String] = Nil): DataFrame = {
    val keys = groupCols ++ Seq("row", "bucket")
    // localCheckpoint: `dots` (≤ |groups|·d rows) feeds BOTH the min and
    // the output join — unpinned, the two branches would each recompute
    // the full register builds (the sketch scans, i.e. the whole cost)
    val dots = a.withColumnRenamed("cnt", "__ca")
      .join(b.withColumnRenamed("cnt", "__cb"), keys.toSeq)
      .groupBy((groupCols :+ "row").map(col): _*)
      .agg(sum(col("__ca") * col("__cb")).as("dot"))
      .localCheckpoint()
    val est = dots.groupBy(groupCols.map(col): _*)
      .agg(min(col("dot")).as("est"))
    if (groupCols.isEmpty) dots.crossJoin(broadcast(est))
    else dots.join(broadcast(est), groupCols.toSeq)
  }

  // -------------------------------------------------------------------
  // Stride-sampled QUANTILE sketch — the rank/order-statistics member of
  // the mergeable-sketch family (HLL = distinct, CM = frequency, Stats.
  // fixedWidthHistogram = bounded-domain distribution). Unlike the
  // histogram it needs NO value bounds: each hash shard sorts its rows
  // once and keeps the MIDPOINT element of every stride-sized rank
  // block, weighted by the block size (Munro-Paterson-style
  // deterministic rank sampling; the midpoint, not the block min —
  // block-min attribution piles each block's weight at its smallest
  // value and biases every quantile low, measured ~13% at stride≈
  // shard/8). Register table ≤ ⌈n/stride⌉ rows, merge is a plain
  // union, and an estimate's rank error is ≤ nShards·stride/2 + the
  // in-block half-widths (each shard's samples sit within stride/2
  // ranks of their block mass).
  //
  // Determinism: shard = hashFn(id) mod nShards and the in-shard order
  // is (value, id) — a total order both engines replay exactly, so the
  // register TABLE (not just the estimate) is gate-checkable.
  //
  // Scale shape: one shuffle on the shard key; each shard sorts
  // independently (the per-partition sort ANY distributed quantile
  // method pays), samples map out, and everything downstream touches
  // only the n/stride-bounded register table. Pick nShards ≥ cluster
  // parallelism and stride so n/(nShards·stride) rows fit a task.
  // -------------------------------------------------------------------

  /** Build stride-sample quantile registers: (shard, rn, v, w) — the
    * in-shard MIDPOINT value of each stride-sized rank block (ceil
    * median position of the block, partial last block included),
    * weighted by the block size. `id` must be unique (the deterministic
    * tiebreak). */
  def strideRegisters(df: DataFrame, value: Column, id: Column,
                      nShards: Int = 64, stride: Int = 100,
                      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(value.as("v"), id.as("id"))
      .withColumn("shard",
        pmod(hashFn(col("id").cast("string")), lit(nShards.toLong)))
    // both windows partition by shard — state bounded by one shard
    val rankW = Window.partitionBy(col("shard")).orderBy(col("v"), col("id"))
    val cntW = Window.partitionBy(col("shard"))
    base.withColumn("rn", row_number().over(rankW).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(cntW))
      // block b = (rn-1) div stride covers ranks b·stride+1 ..
      // b·stride+sz; keep its ceil-median rank (integer math only)
      .withColumn("__b", expr(s"(rn - 1) div ${stride}L"))
      .withColumn("__sz",
        least(lit(stride.toLong), col("__cnt") - col("__b") * stride))
      .filter(col("rn") - col("__b") * stride ===
        expr(s"(__sz + 1) div 2L"))
      .select(col("shard"), col("rn"), col("v"), col("__sz").as("w"))
  }

  /** Merge register tables built with the SAME (nShards, stride,
    * hashFn) over DISJOINT row sets: plain union — each sample keeps
    * standing for `w` rows of its own build; rank errors add. */
  def strideMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)

  /** Estimate quantiles from the registers: for each q in `qsPermille`
    * the smallest sampled value whose cumulative weight reaches
    * q/1000 of the total. Output (q, est). The cumulative window is
    * GLOBAL but runs over the register table only (≤ n/stride rows by
    * construction — the bounded-input exception, as GlobalRank's
    * metadata pass); the total-weight side is a 1-row broadcast. */
  def strideQuantiles(registers: DataFrame,
                      qsPermille: Seq[Int]): DataFrame = {
    require(qsPermille.nonEmpty && qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be in [1, 1000] per-mille, got $qsPermille")
    import org.apache.spark.sql.expressions.Window
    val spark = registers.sparkSession
    import spark.implicits._
    val ordW = Window.orderBy(col("v"), col("shard"), col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = registers.agg(sum(col("w")).as("__W"))
    val qs = qsPermille.toDF("q").select(col("q").cast("int").as("q"))
    registers.withColumn("__cumw", sum(col("w")).over(ordW))
      .crossJoin(broadcast(tot))
      .join(broadcast(qs), col("__cumw") * 1000 >= col("q") * col("__W"))
      .groupBy(col("q")).agg(min(col("v")).as("est"))
  }

  // -------------------------------------------------------------------
  // KMV (k-minimum-values) distinct sketch — the third member of the
  // mergeable-sketch family next to HLL (distinct count) and CM
  // (frequency): keep the k SMALLEST distinct hash values of a set.
  // What HLL cannot give and KMV can: a SET-RESEMBLANCE estimator —
  // the union's bottom-k is a uniform distinct-value sample of A∪B, so
  // the fraction of it present in both sides estimates Jaccard(A, B)
  // directly (Beyer et al., SIGMOD'07), with additive error O(1/√k)
  // independent of set sizes. HLL intersection (q173) goes through
  // inclusion–exclusion and its error scales with the UNION size —
  // useless for small overlaps of big corpora, exactly the
  // contamination-screening case.
  //
  // Determinism: registers are the k smallest distinct values of a
  // deterministic hash — a pure set function of the input, so the
  // register TABLE is gate-checkable, like the HLL/CM register gates.
  //
  // Scale shape: one distinct-style shuffle on (group, hash) — partial
  // aggregation collapses map-side duplicates — then a group-by whose
  // shuffle carries k-bounded [[graft.functions.BottomKLong]] buffers,
  // never the distinct-hash stream. Merge and resemblance touch only
  // k-row-per-group register tables.
  // -------------------------------------------------------------------

  /** Build KMV registers: one row per kept hash, `(group…, pos, h)`
    * with `pos` = 1-based ascending rank among the k smallest distinct
    * hashes. `hashFn` must map a string to a NON-NEGATIVE long (the
    * md5Hash60 house recipe; xxhash64 needs masking). */
  def kmvRegisters(df: DataFrame, key: Column, k: Int = 256,
                   hashFn: Column => Column,
                   groupCols: Seq[String] = Nil): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val gcols = groupCols.map(col)
    val hashed = df.select(gcols :+ hashFn(key).as("h"): _*)
      .filter(col("h").isNotNull)
      .distinct()                        // (group, h) — shuffle 1
    bottomK(hashed, k, groupCols)
  }

  /** Bottom-k of pre-distinct `(group…, h)` rows via the k-bounded
    * aggregator; emits `(group…, pos, h)`. */
  private def bottomK(distinctHashes: DataFrame, k: Int,
                      groupCols: Seq[String]): DataFrame = {
    val agg = udaf(new graft.functions.BottomKLong(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    val gcols = groupCols.map(col)
    val grouped =
      if (groupCols.isEmpty)
        distinctHashes.groupBy(lit(1).as("__g"))
          .agg(agg(col("h"), col("h")).as("__bk"))
      else distinctHashes.groupBy(gcols: _*)
        .agg(agg(col("h"), col("h")).as("__bk"))
    grouped.select(gcols :+ posexplode(col("__bk.items")): _*)
      .select(gcols :+ (col("pos") + 1).as("pos") :+
        col("col._1").as("h"): _*)
  }

  /** Merge two register tables built with the same (k, hashFn):
    * union → distinct → re-bottom-k. Result = the registers the
    * combined input would have produced (KMV merge is lossless up
    * to k). */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int,
               groupCols: Seq[String] = Nil): DataFrame = {
    val gcols = groupCols.map(col)
    val u = a.select(gcols :+ col("h"): _*)
      .unionByName(b.select(gcols :+ col("h"): _*))
      .distinct()
    bottomK(u, k, groupCols)
  }

  /** Distinct-count estimate per group: `(group…, k_used, kth,
    * est_distinct)`. `k_used`/`kth` are the exact integer cores (the
    * gate-checkable part); `est_distinct` = (k_used−1)·2^hashBits/kth
    * is IEEE float (spec-pinned, like the HLL float estimate). A
    * sketch with fewer than k values is exact: est = k_used. */
  def kmvEstimate(registers: DataFrame, k: Int, hashBits: Int = 60,
                  groupCols: Seq[String] = Nil): DataFrame = {
    val gcols = groupCols.map(col)
    val per = registers.groupBy(gcols: _*)
      .agg(count(lit(1)).cast("int").as("k_used"), max(col("h")).as("kth"))
    per.withColumn("est_distinct",
      when(col("k_used") < k, col("k_used").cast("double"))
        .otherwise((col("k_used") - 1).cast("double") *
          lit(math.pow(2.0, hashBits)) / col("kth").cast("double")))
  }

  /** Jaccard resemblance cores from two register tables (same k,
    * same hashFn, same groups): per group `(k_used, n_common,
    * jacc_permille)` where the union's bottom-k serves as the sample,
    * `n_common` counts sample hashes present in BOTH sketches, and
    * `jacc_permille` = 1000·n_common div k_used (exact integer —
    * DuckDB replays it). */
  def kmvJaccard(a: DataFrame, b: DataFrame, k: Int,
                 groupCols: Seq[String] = Nil): DataFrame = {
    val gcols = groupCols.map(col)
    // flag-union: one row per (group, h) with side-membership bits,
    // then bottom-k over (h, flags) — the payload long carries the bits
    val tagged = a.select(gcols :+ col("h") :+ lit(1L).as("__f"): _*)
      .unionByName(b.select(gcols :+ col("h") :+ lit(2L).as("__f"): _*))
      .groupBy(gcols :+ col("h"): _*)
      .agg(sum(col("__f")).as("__flags"))  // distinct h per side → 1|2|3
    val agg = udaf(new graft.functions.BottomKLong(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    val grouped =
      if (groupCols.isEmpty)
        tagged.groupBy(lit(1).as("__g"))
          .agg(agg(col("h"), col("__flags")).as("__bk"))
      else tagged.groupBy(gcols: _*)
        .agg(agg(col("h"), col("__flags")).as("__bk"))
    grouped.select(gcols :+
      size(col("__bk.items")).as("k_used") :+
      aggregate(col("__bk.items"), lit(0L),
        (acc, it) => acc + when(it.getField("_2") === 3L, 1L)
          .otherwise(0L)).as("n_common"): _*)
      .withColumn("jacc_permille",
        expr("(1000 * n_common) div k_used"))
  }
}
