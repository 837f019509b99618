package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record-linkage scoring — the STRUCTURED-record sibling of the
  * text near-dup family (`llm/Dedup` compares documents; this compares
  * typed entity rows: customers, suppliers, account records). The shape
  * is the classic Fellegi–Sunter pipeline the public dedupe/Splink
  * lineage standardized:
  *
  *   1. BLOCK: candidate pairs only within equal blocking-key values —
  *      never all-pairs (the SNM/LSH stance: the join key does the
  *      pruning).
  *   2. COMPARE: per-field agreement predicates over each candidate
  *      pair.
  *   3. SCORE: sum integer log-odds-style weights — agreement adds the
  *      field's match weight, disagreement subtracts its non-match
  *      weight. Integer weights keep the score exact and
  *      cross-engine comparable (the house determinism stance: order
  *      by a rational → scale it to an integer first).
  *   4. CLASSIFY: two thresholds → match / possible (clerical review
  *      band) / non_match.
  *
  * Scale shape: one shuffle on the blocking key; pair count is
  * Σ_b |block_b|² — bounded by the blocking design, not the table. A
  * hot block (the skew case) is visible in [[blockProfile]] BEFORE the
  * join; re-block or salt then. Pairs are emitted once (`idL < idR`).
  */
object EntityResolution {

  /** One field comparison: `label` for the explain columns, `agree` a
    * pair-level predicate over `l(c)`/`r(c)` columns, integer
    * agreement/disagreement weights. A null on either side scores 0
    * (the Fellegi–Sunter "missing ≠ evidence" convention). */
  final case class FieldRule(label: String, agree: Column,
                             wAgree: Long, wDisagree: Long,
                             nullSafe: Column)

  /** Rule helper: exact equality on column `c`. */
  def exactField(c: String, wAgree: Long, wDisagree: Long): FieldRule =
    FieldRule(c, col(s"l_$c") === col(s"r_$c"), wAgree, wDisagree,
      col(s"l_$c").isNotNull && col(s"r_$c").isNotNull)

  /** Rule helper: string-prefix agreement (cheap fuzzy name match —
    * deterministic, SQL-replayable; edit-distance verify can follow
    * for the review band, as MinHash pairs feed editDistanceVerify). */
  def prefixField(c: String, prefixLen: Int, wAgree: Long,
                  wDisagree: Long): FieldRule =
    FieldRule(s"${c}_pfx$prefixLen",
      substring(col(s"l_$c"), 1, prefixLen) ===
        substring(col(s"r_$c"), 1, prefixLen),
      wAgree, wDisagree,
      col(s"l_$c").isNotNull && col(s"r_$c").isNotNull)

  /** Rule helper: numeric agreement within ±tol (inclusive). */
  def toleranceField(c: String, tol: Double, wAgree: Long,
                     wDisagree: Long): FieldRule =
    FieldRule(s"${c}_tol",
      abs(col(s"l_$c").cast("double") - col(s"r_$c").cast("double")) <= tol,
      wAgree, wDisagree,
      col(s"l_$c").isNotNull && col(s"r_$c").isNotNull)

  /** Score all within-block pairs. `df` needs a unique long `idCol`;
    * `blockCols` build the candidate key; `compareCols` are the columns
    * the rules read (only these are carried through the join). Output:
    * `(id_l, id_r, score, verdict)` + one `agree_<label>` tri-state
    * (1/0/null) per rule — the explainability surface. Pairs with
    * `id_l < id_r` only. */
  def scorePairs(df: DataFrame, idCol: String, blockCols: Seq[String],
                 compareCols: Seq[String], rules: Seq[FieldRule],
                 matchThreshold: Long, possibleThreshold: Long): DataFrame = {
    require(rules.nonEmpty, "need at least one field rule")
    require(possibleThreshold <= matchThreshold,
      "possibleThreshold must be <= matchThreshold")
    val keep = (idCol +: (blockCols ++ compareCols)).distinct
    def side(p: String) = df.select(keep.map(c => col(c).as(s"${p}_$c")): _*)
    val joinCond = blockCols.map(c => col(s"l_$c") === col(s"r_$c"))
      .reduce(_ && _) && col(s"l_$idCol") < col(s"r_$idCol")
    val pairs = side("l").join(side("r"), joinCond)
    val scored = rules.foldLeft(pairs) { (d, rl) =>
      d.withColumn(s"agree_${rl.label}",
        when(!rl.nullSafe, lit(null).cast("int"))
          .otherwise(when(rl.agree, 1).otherwise(0)))
    }
    val score = rules.map { rl =>
      when(col(s"agree_${rl.label}").isNull, 0L)
        .otherwise(when(col(s"agree_${rl.label}") === 1, lit(rl.wAgree))
          .otherwise(lit(-rl.wDisagree)))
    }.reduce(_ + _)
    scored.withColumn("score", score)
      .withColumn("verdict",
        when(col("score") >= matchThreshold, "match")
          .when(col("score") >= possibleThreshold, "possible")
          .otherwise("non_match"))
      .select(col(s"l_$idCol").as("id_l") +: col(s"r_$idCol").as("id_r") +:
        rules.map(rl => col(s"agree_${rl.label}")) :+
        col("score") :+ col("verdict"): _*)
  }

  /** Golden-record survivorship — the step AFTER linkage/clustering in
    * the MDM pipeline: one row per entity, each field taken from the
    * highest-priority source that has it (smaller `rankCol` wins,
    * `idCol` breaks rank ties so the pick is a total order). Field
    * independence is the point: the golden name and the golden balance
    * may come from DIFFERENT source rows — a whole-row "best source"
    * rule loses fields the winner is missing.
    *
    * Plan: ONE groupBy on the entity key; each field is a
    * `min_by(field, ordering-when-non-null)` aggregate (null fields
    * yield a null ordering, which min_by ignores), so partial
    * aggregation keeps one candidate per field per map task — no
    * window, no per-entity sort. */
  def goldenRecord(df: DataFrame, entityCol: String, rankCol: String,
                   idCol: String, fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "need at least one field to merge")
    val ord = struct(col(rankCol), col(idCol))
    val aggs = fields.map(f =>
      min_by(col(f), when(col(f).isNotNull, ord)).as(f))
    df.groupBy(col(entityCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Blocking-design diagnostic: per blocking key, row count and the
    * pair count it will generate (n·(n−1)/2) — run BEFORE scorePairs;
    * the Σ over this frame is the join's output size. One shuffle. */
  def blockProfile(df: DataFrame, blockCols: Seq[String]): DataFrame =
    df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("n_pairs", expr("n_rows * (n_rows - 1) div 2"))

  /** Resolve scored matches into entity clusters: connected components
    * over the `match` pairs (the same contract the near-dup family
    * uses), emitting `(id, entity_id)` with entity_id = min member id.
    * Delegates to the engine's bounded-iteration component machinery. */
  def resolveEntities(scored: DataFrame, allIds: DataFrame,
                      idCol: String): DataFrame = {
    val edges = scored.filter(col("verdict") === "match")
      .select(col("id_l").as("id_a"), col("id_r").as("id_b"))
    val comp = graft.llm.Dedup.connectedComponents(edges)
    // singletons (no match edge) are their own entity
    allIds.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("comp"), col(idCol)).as("entity_id"))
  }
}
