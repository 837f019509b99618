package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins — the manual fallback when AQE's
  * runtime skew handling can't apply (the skewed side feeds more than
  * a join, the key histogram is known up front from
  * [[Stats.keySkewReport]], or the join sits under operators AQE won't
  * split). One hot key that owns 40% of a 10¹¹-row corpus turns a
  * hash-partitioned join into one straggler task; salting splits that
  * key across `saltFactor` synthetic sub-keys and replicates only the
  * SMALL side to match.
  *
  * Semantics contract: the salted join returns EXACTLY the plain
  * equi-join's multiset of rows (spec-pinned, duplicate keys on both
  * sides included) for `inner` and `left` joins. Right/full joins are
  * rejected: an unmatched small-side row would surface once per
  * replica.
  *
  * Scale shape: the big side never replicates — it gains a map-only
  * deterministic salt column (hash of the row's key + payload, so the
  * hot key's rows spread uniformly without any RNG state); the small
  * side explodes ×saltFactor (bounded: saltFactor × |small|). The join
  * keys become (keys…, salt), so each hot key occupies saltFactor
  * shuffle partitions instead of one.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `keys` with the big side salted across
    * `saltFactor` sub-keys. Column layout matches
    * `big.join(small, keys, joinType)`. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
                     keys: Seq[String], saltFactor: Int,
                     joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedEquiJoin supports inner/left joins, got $joinType " +
        "(an unmatched small-side row would emit once per replica)")
    // deterministic per-row salt: hash every big-side column so even a
    // single hot key's (otherwise identical-key) rows spread; no RNG,
    // so the join is reproducible and partition-independent
    val saltExpr = pmod(
      xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
    val b = big.withColumn("__salt", saltExpr)
    val s = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
