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
}
