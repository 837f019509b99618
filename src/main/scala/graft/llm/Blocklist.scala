package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.AcFunctions.acMatches

/** Blocklist screening over a text corpus — the multi-pattern
  * [[graft.functions.AcMatches Aho–Corasick]] expression lifted to the
  * three shapes a curation pipeline actually uses: per-document match
  * stats (score/threshold), the exploded per-pattern hit table (audit
  * "which terms fired where"), and the clean-subset filter (drop any
  * document containing any blocked term).
  *
  * All three are ONE scan of the corpus with the automaton evaluated
  * once per document inside whole-stage codegen — no per-pattern pass,
  * no regex alternation, no join against a pattern table. The pattern
  * list is bound into the plan (driver-built automaton, executors
  * rebuild from the serialized pattern array), so it must be a
  * driver-side Seq — the right shape for blocklists (10²–10⁵ terms),
  * not for pattern sets that are themselves data.
  *
  * Matching is raw case-sensitive substring occurrence (overlaps and
  * nested patterns all count — see AcOps). Case-insensitive screening:
  * lower() the text column and supply lowercase patterns. */
object Blocklist {

  /** The sparse match array, shared by the three surfaces. */
  private def matches(textCol: String, patterns: Seq[String]): Column =
    acMatches(col(textCol), patterns)

  /** Per-row match stats appended as (n_patterns_hit int,
    * n_occurrences bigint): how many distinct blocked terms appear,
    * and the total occurrence count across all of them. */
  def matchStats(df: DataFrame, textCol: String,
                 patterns: Seq[String]): DataFrame =
    df.withColumn("__m", matches(textCol, patterns))
      .withColumn("n_patterns_hit", size(col("__m")))
      .withColumn("n_occurrences",
        aggregate(col("__m"), lit(0L), (acc, x) => acc + x.getField("occ")))
      .drop("__m")

  /** Exploded hit table: one row per (document, blocked term with ≥ 1
    * occurrence) — (idCols..., pid, pattern, occ). The audit surface:
    * which terms fire, how hard, in which documents. */
  def hits(df: DataFrame, idCols: Seq[String], textCol: String,
           patterns: Seq[String]): DataFrame = {
    val pats = array(patterns.map(lit): _*)
    df.select(idCols.map(col) :+
        explode(matches(textCol, patterns)).as("__h"): _*)
      .select(idCols.map(col) :+
        col("__h.pid").as("pid") :+
        element_at(pats, col("__h.pid") + 1).as("pattern") :+
        col("__h.occ").as("occ"): _*)
  }

  /** Rows whose text contains NO blocked term — the curation filter.
    * NULL text is kept (no text, nothing blocked); screen nulls
    * upstream if the policy differs. */
  def filterClean(df: DataFrame, textCol: String,
                  patterns: Seq[String]): DataFrame =
    df.where(col(textCol).isNull ||
      size(matches(textCol, patterns)) === 0)
}
