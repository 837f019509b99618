package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — support / confidence / lift over
  * (basket, item) co-occurrence, the classic retail-analytics question
  * ("users who bought X also bought Y") and, in a corpus pipeline, the
  * source-affinity question ("documents tagged X also tag Y"). The
  * frequent-pair core of Apriori, flattened to one self-join because
  * pair rules (the overwhelmingly common ask) need no lattice walk.
  *
  * Determinism contract: set semantics on (basket, item); every metric
  * an exact integer floor —
  *   support_pm    = 1000·|X∧Y| div |baskets|
  *   confidence_pm = 1000·|X∧Y| div |X|
  *   lift_ppm      = 10⁶·|X∧Y|·|baskets| div (|X|·|Y|)
  * (lift products in DECIMAL(38,0) — count⁴-free but count³-scale, a
  * 10⁹-basket corpus would overflow a long). Both rule directions emit
  * (confidence is asymmetric; support/lift repeat, the standard table
  * shape).
  *
  * Scale shape: distinct + two groupBys are map-side-partial shuffles
  * on basket/item keys; the pair join is the inverted-index shape keyed
  * by basket, so a basket of k items contributes C(k,2) rows —
  * `maxBasketSize` drops MEGA-baskets (a crawler session with 10⁵
  * items would contribute 5·10⁹ pairs; the cap is the same hot-key
  * guard as Dedup's maxDf, applied to whole baskets and documented as
  * a semantic knob, not a silent truncation). The item-count join at
  * the end is alphabet-bounded → broadcast. */
object Association {

  def associationRules(baskets: DataFrame, basketCol: String, itemCol: String,
                       minSupportPm: Int,
                       maxBasketSize: Int = 10000): DataFrame = {
    require(minSupportPm >= 1 && minSupportPm <= 1000,
      s"minSupportPm must be in [1, 1000] per-mille, got $minSupportPm")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val it0 = baskets.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val sizes = it0.groupBy(col("__bk")).agg(count(lit(1)).as("__sz"))
    val it = it0.join(sizes.filter(col("__sz") <= maxBasketSize)
      .select(col("__bk")), Seq("__bk")).persist()
    // the three corpus-grain aggregates over `it` are each consumed by
    // MORE THAN ONE downstream branch (nB by the support filter AND the
    // final metric select; itemCounts by both rule-direction joins; the
    // pair aggregate by both union branches) — ProfileOne (r13, q201)
    // measured the basket self-join shuffle running 3× and the nB /
    // itemCounts passes 2× each under AQE, because union/join branches
    // materialize their own copies of an un-pinned subtree. Each frame
    // is alphabet- (≤ items², 1-row for nB) bounded — checkpointing
    // them truncates the plan so every corpus pass runs exactly once
    // (guide §3.3 "materialising an intermediate truncates the plan").
    val nB = it.agg(countDistinct(col("__bk")).as("__n")).localCheckpoint()
    val itemCounts = it.groupBy(col("__it").as("__item"))
      .agg(count(lit(1)).as("__cnt")).localCheckpoint()
    // support threshold RELATIVE to the basket count (the Apriori
    // parameterization — an absolute count would drift with corpus
    // scale): 1000·n_pair ≥ pm·|baskets|, exact cross-multiplication
    // against the 1-row broadcast count
    val pairs = it.as("a")
      .join(it.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__it") < col("b.__it"))
      .groupBy(col("a.__it").as("__x"), col("b.__it").as("__y"))
      .agg(count(lit(1)).as("n_pair"))
      .crossJoin(broadcast(nB))
      .filter(lit(1000L) * col("n_pair") >= lit(minSupportPm.toLong) * col("__n"))
      .drop("__n")
      .localCheckpoint()
    val rules = pairs.select(col("__x").as("ante"), col("__y").as("cons"),
        col("n_pair"))
      .unionByName(pairs.select(col("__y").as("ante"), col("__x").as("cons"),
        col("n_pair")))
    val out = rules
      .join(broadcast(itemCounts.withColumnRenamed("__item", "ante")
        .withColumnRenamed("__cnt", "__ca")), "ante")
      .join(broadcast(itemCounts.withColumnRenamed("__item", "cons")
        .withColumnRenamed("__cnt", "__cc")), "cons")
      .crossJoin(broadcast(nB))
      .select(col("ante"), col("cons"), col("n_pair"),
        expr("(1000 * n_pair) div __n").as("support_pm"),
        expr("(1000 * n_pair) div __ca").as("confidence_pm"),
        expr("""CAST((1000000 * CAST(n_pair AS DECIMAL(38,0)) * __n)
                |div (CAST(__ca AS DECIMAL(38,0)) * __cc) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("lift_ppm"))
      .localCheckpoint()
    it.unpersist()
    out
  }

  /** ITEM-ITEM SIMILARITY (co-occurrence cosine) — the "customers who
    * bought X also bought Y" recommender primitive: for every item its
    * `k` most similar items by co-occurrence cosine, scored as the
    * exact integer `cos2_ppm = 10⁶·co² div (nᵢ·nⱼ)` (cosine SQUARED —
    * monotone in cosine, so the ranking is cosine's, with no
    * cross-engine sqrt). Ties break toward the smaller candidate id.
    *
    * Scale shape: the same basket-keyed pair join as
    * [[associationRules]] (set semantics, `maxBasketSize` hot-key
    * guard, `minCo` support floor prunes the long tail before
    * scoring); the top-k window partitions by the ITEM — state bounded
    * by one item's co-occurring alphabet, never the corpus. */
  def itemSimilarity(baskets: DataFrame, basketCol: String, itemCol: String,
                     k: Int, minCo: Long,
                     maxBasketSize: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCo >= 1, s"minCo must be >= 1, got $minCo")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val it0 = baskets.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val sizes = it0.groupBy(col("__bk")).agg(count(lit(1)).as("__sz"))
    val it = it0.join(sizes.filter(col("__sz") <= maxBasketSize)
      .select(col("__bk")), Seq("__bk")).persist()
    // same multi-consumer checkpoint discipline as [[associationRules]]
    // (itemCounts feeds both broadcast joins, the pair aggregate both
    // union directions — alphabet-bounded frames, corpus passes run once)
    val itemCounts = it.groupBy(col("__it").as("__item"))
      .agg(count(lit(1)).as("__cnt")).localCheckpoint()
    val pairs = it.as("a")
      .join(it.as("b"),
        col("a.__bk") === col("b.__bk") && col("a.__it") < col("b.__it"))
      .groupBy(col("a.__it").as("__x"), col("b.__it").as("__y"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
      .localCheckpoint()
    val directed = pairs.select(col("__x").as("item"), col("__y").as("cand"),
        col("co"))
      .unionByName(pairs.select(col("__y").as("item"), col("__x").as("cand"),
        col("co")))
    val scored = directed
      .join(broadcast(itemCounts.withColumnRenamed("__item", "item")
        .withColumnRenamed("__cnt", "__ni")), "item")
      .join(broadcast(itemCounts.withColumnRenamed("__item", "cand")
        .withColumnRenamed("__cnt", "__nc")), "cand")
      .withColumn("cos2_ppm", expr(
        """CAST((1000000 * CAST(co AS DECIMAL(38,0)) * co)
          |div (CAST(__ni AS DECIMAL(38,0)) * __nc) AS BIGINT)"""
          .stripMargin.replace("\n", " ")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("cos2_ppm").desc, col("cand").asc)
    val out = scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("item"), col("cand"), col("co"), col("cos2_ppm"),
        col("rnk"))
      .localCheckpoint()
    it.unpersist()
    out
  }
}
