package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-relevance scoring over a document corpus — BM25, the ranking
  * function behind practically every retrieval stage of a training-data
  * pipeline (dedup-aware sampling, quality-weighted selection, nearest
  * queries over text). No reference analog; gate query q48.
  *
  * Execution shape: tokenize once (map-only), one groupBy(doc) producing
  * doc length plus one conditional-sum column per query term (the full
  * vocabulary is never aggregated), melt to (doc, term) rows, df via a
  * window over the term-matching rows, 1-row corpus stats broadcast.
  * Linear lineage — nothing consumed twice, nothing cached, fully lazy.
  * Scales with |matching tokens|, not |vocabulary|.
  *
  * Two variants:
  *   - [[bm25]]: the real thing — Lucene-shaped idf `ln(1 + (N-df+.5)/
  *     (df+.5))`, double math, codegen'd. Use this in production.
  *   - [[bm25Deterministic]]: the gate form. ln() and double division
  *     round differently across engines in the last ulp, so this variant
  *     keeps every factor RATIONAL: idf_r = (N-df+0.5)/(df+0.5) =
  *     (2N-2df+1)/(2df+1) and tf-norm = tf·S/(tf·S + k1(1-b)S + k1·b·dl·N)
  *     = 10·tf·S/(10·tf·S + 3S + 9·dl·N) for (k1=1.2, b=0.75) — pure
  *     integer numerators/denominators, ONE decimal division each,
  *     rounded to DECIMAL(18,6) identically in Spark and DuckDB, then an
  *     exact decimal sum. Same per-term monotonicity as BM25 (rational
  *     idf is the pre-log Robertson form); not the same totals.
  */
object Relevance {

  /** Per-document term rows + 1-row corpus stats, shared plumbing.
    * Returns (tf rows carrying (doc_id, dl, w, tf, df), stats (S, N)).
    *
    * ONE corpus tokenize: doc length and the per-term counts come out of
    * a single groupBy(doc_id) with one conditional-sum column per query
    * term (the term list is small and static), then the term columns
    * melt back to (doc_id, dl, w, tf) rows — dl rides the unpivot ids,
    * so no join back for it. df attaches as a window count over the
    * term-matching rows only (a shuffle of |matching doc-term pairs|,
    * not the vocabulary). The whole lineage is linear: nothing is
    * consumed twice, so nothing needs caching — the operator is fully
    * lazy and holds no session state.
    *
    * S (total tokens) and N (docs with ≥1 token) are global corpus
    * aggregates; deriving them from the same groupBy would consume that
    * subtree twice (→ a persist that some caller must release). Instead
    * they come from a separate MAP-ONLY pass (`size(words)`, no explode,
    * no shuffle, 1-row result) — or, at very large corpora, from the
    * caller via `corpusStats`, making the operator strictly one-pass. */
  private def plumbing(docs: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String],
                       corpusStats: Option[(Long, Long)])
      : (DataFrame, DataFrame) = {
    require(terms.nonEmpty, "query terms must be non-empty")
    require(terms.distinct.size == terms.size, "query terms must be distinct")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextShingles.words(col(textCol))).as("w"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("w") === t, 1L).otherwise(0L)).as(s"__tf_$i")
    }
    val perDoc = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val termOf = terms.zipWithIndex
      .foldLeft(lit(null).cast("string")) { case (els, (t, i)) =>
        when(col("metric") === s"__tf_$i", lit(t)).otherwise(els)
      }
    val tf = perDoc
      .unpivot(Array(col("doc_id"), col("dl")),
        terms.indices.map(i => col(s"__tf_$i")).toArray, "metric", "tf")
      .filter(col("tf") > 0)
      .select(col("doc_id"), col("dl"), termOf.as("w"), col("tf"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w"))))
    val stats = corpusStats match {
      case Some((s, n)) =>
        docs.sparkSession.range(1).select(lit(s).as("S"), lit(n).as("N"))
      case None =>
        val sz = size(TextShingles.words(col(textCol)))
        docs.agg(coalesce(sum(sz.cast("long")), lit(0L)).as("S"),
                 count(when(sz > 0, 1)).as("N"))
    }
    (tf, stats)
  }

  /** Production BM25 (k1, b tunable): (doc_id, score) for documents
    * matching ≥1 query term, higher = more relevant.
    * @param corpusStats precomputed (total tokens S, doc count N) — pass
    *        at very large corpora to skip the map-only stats pass. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           corpusStats: Option[(Long, Long)] = None): DataFrame = {
    val (tf, stats) = plumbing(docs, idCol, textCol, terms, corpusStats)
    val idf = log(lit(1.0) +
      (col("N") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = col("tf") /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") * col("N") / col("S")))
    tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * tfn).as("s"))
      .groupBy(col("doc_id")).agg(sum(col("s")).as("score"))
  }

  /** TF-IDF top-k terms per document over the FULL vocabulary — the
    * keyword-extraction / topic-signature primitive (BM25 above scores
    * docs against a fixed query; this characterizes each doc by its own
    * most distinctive terms). Execution shape: tokenize (map-only), one
    * groupBy(doc, term) for tf, df as a window count over the term
    * partition, the 1-row N broadcast, then a PER-DOC row_number window
    * (the partition key is the doc id — millions of small partitions,
    * never a global sort). Production form; `ln` keeps it off the gate. */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    val scored = tfIdfScored(docs, idCol, textCol)
      .withColumn("score",
        col("tf") * log(col("N").cast("double") / col("df")))
    rankPerDoc(scored, k)
  }

  /** Gate form of [[tfIdfTopK]] (query q62): the PRE-LOG rational score
    * tf·N/df — one decimal division rounded to DECIMAL(18,6) identically
    * in both engines. Per-term it is a strictly monotone transform of
    * tf·ln(N/df) only when tf is fixed, so the top-k SETS can differ
    * from the log form; the gate pins the rational ranking itself. */
  def tfIdfDeterministicTopK(docs: DataFrame, idCol: String,
                             textCol: String, k: Int = 3): DataFrame = {
    val d274 = "decimal(27,4)"
    val scored = tfIdfScored(docs, idCol, textCol)
      .withColumn("score6",
        ((col("tf") * col("N")).cast(d274) / col("df").cast(d274))
          .cast("decimal(18,6)"))
      .withColumn("score", col("score6").cast("double"))
    rankPerDoc(scored, k, orderCol = "score6")
  }

  private def tfIdfScored(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextShingles.words(col(textCol))).as("w"))
    val tf = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    // df = docs containing w = tf rows per w, attached as a window count
    // over the term partition: one reshuffle of the (doc, term) rows, but
    // a LINEAR lineage — the self-join-on-own-aggregate alternative
    // consumes tf twice, which either tokenizes the corpus twice or pins
    // a corpus-sized cache nobody can release. N is a column-pruned
    // count-only scan of docs (no tokenize).
    val withDf = tf.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("w"))))
    val n = docs.agg(count(lit(1)).as("N"))
    withDf.crossJoin(broadcast(n))
  }

  private def rankPerDoc(scored: DataFrame, k: Int,
                         orderCol: String = "score"): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col(orderCol).desc, col("w").asc)
    scored.withColumn("rnk", row_number().over(byDoc))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("w").as("term"), col("rnk"), col("score"))
  }

  /** Gate variant: rational idf, decimal arithmetic, cross-engine
    * bit-stable (see class doc). k1=1.2, b=0.75 fixed (they make the
    * tf-norm coefficients the exact integers 10/3/9). */
  def bm25Deterministic(docs: DataFrame, idCol: String, textCol: String,
                        terms: Seq[String],
                        corpusStats: Option[(Long, Long)] = None): DataFrame = {
    val (tf, stats) = plumbing(docs, idCol, textCol, terms, corpusStats)
    val d4 = "decimal(18,4)"; val d274 = "decimal(27,4)"
    val idf6 = ((lit(2) * col("N") - lit(2) * col("df") + lit(1)).cast(d4) /
      (lit(2) * col("df") + lit(1)).cast(d4)).cast("decimal(18,6)")
    val num = lit(10) * col("tf") * col("S")
    val den = num + lit(3) * col("S") + lit(9) * col("dl") * col("N")
    val tfn6 = (num.cast(d274) / den.cast(d274)).cast("decimal(18,6)")
    tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf6 * tfn6).as("s"))   // exact (37,12)
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).cast("decimal(38,12)").cast("double").as("score"))
  }
}
