package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) already
  * splits skewed SHUFFLE partitions at runtime; these helpers cover the
  * two places AQE can't help:
  *
  *  - [[saltedAgg]]: a single hot group key (e.g. the empty-string
  *    document, a null-ish default) concentrates one reducer. Two-phase
  *    aggregation over a salted key keeps every reducer bounded — valid
  *    for any algebraic aggregate (sum/count/min/max).
  *  - [[saltedJoin]]: a hot key on the big side of a non-broadcast join;
  *    the big side salts, the small side explodes ×S replicas.
  */
object Skew {

  /** Two-phase (salt → partial → final) aggregation.
    *
    * @param aggs (partialExpr, finalExpr-from-partial, name): e.g.
    *   `(sum($"x"), fs => sum(fs), "sum_x")`. */
  def saltedAgg(df: DataFrame, groupCols: Seq[String], salt: Int,
                aggs: Seq[(Column, Column => Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val partial = salted
      .groupBy((groupCols :+ "__salt").map(col): _*)
      .agg(aggs.head._1.as(s"__p_${aggs.head._3}"),
           aggs.tail.map(a => a._1.as(s"__p_${a._3}")): _*)
    partial
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head._2(col(s"__p_${aggs.head._3}")).as(aggs.head._3),
           aggs.tail.map(a => a._2(col(s"__p_${a._3}")).as(a._3)): _*)
  }

  /** Salted equi-join: big side gets a random salt 0..S-1, small side is
    * exploded ×S so every (key, salt) pair matches. Join type inner/left
    * from the big side's perspective. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Key-frequency probe: top-k heaviest group keys with counts — the
    * diagnostic that decides whether salting is warranted. */
  def topKeys(df: DataFrame, keys: Seq[String], k: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc)
      .limit(k)
}
