package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 gates — inter-rater/inter-ranker agreement, ordinal effect
  * sizes, variance-equality, link prediction, and embedding-space
  * decontamination (q342+). The round-9 EvalGates split carried
  * forward: one domain file per batch, `SparkEntry` unions the maps.
  *
  * Shared conventions (the CoreQueries contract): exact integer /
  * decimal arithmetic with `div` ↔ DuckDB HUGEINT `//` (both truncate
  * toward zero on non-negative quantities; anything signed goes
  * sign-magnitude), cents = `floor(value*100)` on both engines,
  * surfaced aggregates BIGINT.
  */
object AgreementGates {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    CoreQueries.tRead(s, dir, name)

  /** The three deterministic "raters" shared by q344/q351 (and, with
    * drop rules, q345): a value-bucket rule, an id-parity rule, and a
    * user-mix rule — three rules that genuinely disagree, so the
    * chance-corrected statistics have something to correct. */
  private def eventRatings(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    e.select(col("event_id").as("item"),
        least(expr("greatest(cents, 0L) div 3500"), lit(2L)).as("cat"))
      .unionByName(e.select(col("event_id").as("item"),
        (col("event_id") % 3).as("cat")))
      .unionByName(e.where(col("event_id") % 13 =!= 0)
        .select(col("event_id").as("item"),
          ((col("user_id") + col("event_id")) % 3).as("cat")))
  }

  // SEMANTIC DECONTAMINATION (llm/Dedup.semanticDecontam): flag corpus
  // vectors within cosine 0.25 of a FIXED absolute-id test set
  // (vec_id < 32 — the make_sf1 rehearsal convention: query sets stay
  // constant, the corpus side grows, so the broadcast map-only scan is
  // provably linear). Exact decimal kernel for the oracle; production
  // uses the fused double cosine.
  def q342_semantic_decontam(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.llm.Dedup.semanticDecontam(
      corpus = emb, test = emb.where(col("vec_id") < 32),
      idCol = "vec_id", vecCol = "embedding",
      minCosine = 0.25, deterministic = true)
  }

  // LINK PREDICTION (ops/GraphOps.linkPredictionPpm): candidate
  // missing edges of the q134 document graph scored by common
  // neighbors, set Jaccard, and the resource-allocation index — the
  // exact (no-ln) member of the Adamic–Adar family.
  def q343_link_prediction(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nFrame = docs.agg(count(lit(1)).as("__n"))
    val e = docs.select(col("doc_id").as("src"),
        expr("doc_id div 2").as("dst"))
      .unionByName(docs.crossJoin(broadcast(nFrame))
        .select(col("doc_id").as("src"),
          expr("(doc_id * doc_id + 1) % __n").as("dst")))
    graft.ops.GraphOps.linkPredictionPpm(e, "src", "dst")
  }

  // FLEISS' KAPPA (ops/Agreement.fleissKappaPpm): three deterministic
  // raters per event; events with event_id % 13 = 0 lose rater 3 and
  // exercise the incomplete-assignment drop path (n_dropped > 0).
  def q344_fleiss_kappa(s: SparkSession, dir: String): DataFrame =
    graft.ops.Agreement.fleissKappaPpm(eventRatings(s, dir),
      "item", "cat", raters = 3)

  // KRIPPENDORFF'S ALPHA (ops/Agreement.krippendorffAlphaPpm): the
  // UNEQUAL-raters case Fleiss can't express — rater 2 skips
  // event_id % 11 = 0, rater 3 skips event_id % 5 = 0, so items carry
  // 1–3 ratings and the single-rating unpairable path is exercised
  // (% 55 items).
  def q345_krippendorff(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").where(col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    val ratings = e.select(col("event_id").as("item"),
        least(expr("greatest(cents, 0L) div 3500"), lit(2L)).as("cat"))
      .unionByName(e.where(col("event_id") % 11 =!= 0)
        .select(col("event_id").as("item"),
          (col("event_id") % 3).as("cat")))
      .unionByName(e.where(col("event_id") % 5 =!= 0)
        .select(col("event_id").as("item"),
          ((col("user_id") + col("event_id")) % 3).as("cat")))
    graft.ops.Agreement.krippendorffAlphaPpm(ratings, "item", "cat")
  }

  // CLIFF'S DELTA (ops/RankTests.cliffsDeltaPpm): how often a purchase
  // event's value-cents beats a non-purchase event's — the effect size
  // next to q291's Mann–Whitney significance on the same comparison.
  def q346_cliffs_delta(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.cliffsDeltaPpm(
      t(s, dir, "events").where(col("value").isNotNull).select(
        (col("event_type") === "purchase").as("flag"),
        floor(col("value") * 100).cast("long").as("cents")),
      "flag", "cents")

  // KENDALL'S W (ops/Agreement.kendallsWPpm): concordance of three
  // complete document rankings — by length, by a hash scramble, and by
  // REVERSE length — built as strict total orders via the window-free
  // global row number (ties broken by doc_id on both engines).
  def q347_kendalls_w(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    def ranked(name: String, sort: Seq[Column]): DataFrame =
      graft.ops.GlobalRank.globalRowNumber(d, sort, "rank")
        .select(lit(name).as("ranker"), col("doc_id"), col("rank"))
    val u = ranked("len", Seq(col("n_chars").asc, col("doc_id").asc))
      .unionByName(ranked("hash",
        Seq(expr("(doc_id * 2654435761L) % 1000003L").asc,
          col("doc_id").asc)))
      .unionByName(ranked("rev", Seq(col("n_chars").desc,
        col("doc_id").asc)))
    graft.ops.Agreement.kendallsWPpm(u, "ranker", "doc_id", "rank")
  }

  // MATTHEWS CORRELATION (ops/Stats.matthewsCorrPpm): the q288 rule-A
  // classifier (cents ≥ 3500) against the purchase label — the
  // imbalance-honest single number next to q274's per-class report.
  def q348_mcc(s: SparkSession, dir: String): DataFrame =
    graft.ops.Stats.matthewsCorrPpm(
      t(s, dir, "events")
        .where(col("value").isNotNull && col("event_type").isNotNull)
        .select(
          (floor(col("value") * 100).cast("long") >= 3500L).as("pred"),
          (col("event_type") === "purchase").as("label")),
      "pred", "label")

  // BROWN–FORSYTHE (ops/RankTests.brownForsytheMilli): do the five
  // event types have the same value-cents SPREAD? The robust
  // variance-equality check that belongs before q247's ANOVA read.
  def q349_brown_forsythe(s: SparkSession, dir: String): DataFrame =
    graft.ops.RankTests.brownForsytheMilli(
      t(s, dir, "events")
        .where(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("cents")),
      "event_type", "cents")

  // COCHRAN'S Q (ops/Agreement.cochranQMilli): three deterministic
  // binary rules on the same events — the k-classifier McNemar
  // extension next to q288's pairwise form.
  def q350_cochran_q(s: SparkSession, dir: String): DataFrame =
    graft.ops.Agreement.cochranQMilli(
      t(s, dir, "events").where(col("value").isNotNull &&
          col("event_id").isNotNull && col("user_id").isNotNull)
        .select(
          (floor(col("value") * 100).cast("long") >= 3500L).as("pred_a"),
          (col("event_id") % 3 === 0).as("pred_b"),
          ((col("user_id") + col("event_id")) % 2 === 0).as("pred_c")),
      Seq("pred_a", "pred_b", "pred_c"))

  // GWET'S AC1 (ops/Agreement.gwetAc1Ppm): the prevalence-robust twin
  // of q344 on the identical rating frame — same raters, same drops,
  // different chance model; the pair quantifies the kappa paradox on
  // real marginals.
  def q351_gwet_ac1(s: SparkSession, dir: String): DataFrame =
    graft.ops.Agreement.gwetAc1Ppm(eventRatings(s, dir),
      "item", "cat", raters = 3)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q342_semantic_decontam" -> q342_semantic_decontam _,
    "q343_link_prediction"   -> q343_link_prediction _,
    "q344_fleiss_kappa"      -> q344_fleiss_kappa _,
    "q345_krippendorff"      -> q345_krippendorff _,
    "q346_cliffs_delta"      -> q346_cliffs_delta _,
    "q347_kendalls_w"        -> q347_kendalls_w _,
    "q348_mcc"               -> q348_mcc _,
    "q349_brown_forsythe"    -> q349_brown_forsythe _,
    "q350_cochran_q"         -> q350_cochran_q _,
    "q351_gwet_ac1"          -> q351_gwet_ac1 _,
  )

  /** DuckDB oracles — independent SQL recomputations (HUGEINT lanes,
    * `//` floors mirroring the documented pinned-floor schedules). */
  val oracleSql: Map[String, String] = Map(
    "q342_semantic_decontam" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, vv,
        |    list_sum(list_transform(vv,
        |      x -> CAST(x*x AS DECIMAL(38,15)))) AS vn
        |  FROM v),
        |q AS (SELECT vv AS tv, vn AS tn FROM n WHERE vec_id < 32),
        |hits AS (
        |  SELECT c.vec_id, count(*) AS m
        |  FROM n c, q
        |  WHERE CAST(list_sum(list_transform(list_zip(c.vv, q.tv),
        |      p -> CAST(p[1]*p[2] AS DECIMAL(38,15)))) AS DOUBLE)
        |    / sqrt(CAST(c.vn AS DOUBLE) * CAST(q.tn AS DOUBLE)) >= 0.25
        |  GROUP BY 1)
        |SELECT n.vec_id,
        |  CAST(COALESCE(hits.m, 0) AS BIGINT) AS n_matches,
        |  CAST(CASE WHEN hits.m IS NOT NULL THEN 1 ELSE 0 END AS INT)
        |    AS contaminated
        |FROM n LEFT JOIN hits USING (vec_id)""".stripMargin,
    "q343_link_prediction" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e0 AS (SELECT doc_id AS s, doc_id // 2 AS d FROM documents
        |       UNION ALL
        |       SELECT doc_id, (doc_id*doc_id + 1) % nn.n
        |       FROM documents, nn),
        |und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        |        FROM e0 WHERE s <> d),
        |deg AS (SELECT node, count(*) AS degree FROM
        |          (SELECT a AS node FROM und
        |           UNION ALL SELECT b FROM und)
        |        GROUP BY 1),
        |adj AS (SELECT j.hub, j.nb, deg.degree AS dh
        |        FROM (SELECT a AS hub, b AS nb FROM und
        |              UNION ALL SELECT b, a FROM und) j
        |        JOIN deg ON deg.node = j.hub
        |        WHERE deg.degree <= 10000),
        |p AS (SELECT x.nb AS u, y.nb AS v, count(*) AS cn,
        |             sum(1000000 // x.dh) AS ra
        |      FROM adj x JOIN adj y ON x.hub = y.hub AND x.nb < y.nb
        |      GROUP BY 1, 2),
        |sc AS (SELECT u, v, cn,
        |         (1000000 * cn) // (du.degree + dv.degree - cn) AS j, ra
        |       FROM p
        |       JOIN deg du ON du.node = p.u
        |       JOIN deg dv ON dv.node = p.v)
        |SELECT CAST(u AS BIGINT) AS node_a, CAST(v AS BIGINT) AS node_b,
        |       CAST(cn AS BIGINT) AS common_neighbors,
        |       CAST(j AS BIGINT) AS jaccard_ppm,
        |       CAST(ra AS BIGINT) AS ra_micro
        |FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM und
        |                  WHERE und.a = sc.u AND und.b = sc.v)"""
        .stripMargin,
    "q344_fleiss_kappa" ->
      """WITH e AS (SELECT event_id, user_id,
        |             CAST(floor(value*100) AS BIGINT) AS cents
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_id AS i,
        |        least(greatest(cents, 0) // 3500, 2) AS c FROM e
        |      UNION ALL SELECT event_id, event_id % 3 FROM e
        |      UNION ALL SELECT event_id, (user_id + event_id) % 3
        |        FROM e WHERE event_id % 13 <> 0),
        |nic AS (SELECT i, c, count(*) AS nic FROM r GROUP BY 1, 2),
        |ni AS (SELECT i, sum(nic) AS ni FROM nic GROUP BY 1),
        |drp AS (SELECT count(*) AS nd FROM ni WHERE ni <> 3),
        |kept AS (SELECT nic.i, nic.c, nic.nic
        |         FROM nic JOIN ni USING (i) WHERE ni.ni = 3),
        |cat AS (SELECT c, CAST(sum(nic) AS HUGEINT) AS cc,
        |               CAST(sum(CAST(nic AS HUGEINT)*nic) AS HUGEINT) AS a
        |        FROM kept GROUP BY 1),
        |agg AS (SELECT sum(cc) // 3 AS n, sum(a) AS aa,
        |               sum(cc*cc) AS b FROM cat)
        |SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n_items,
        |  CAST(nd AS BIGINT) AS n_dropped,
        |  CAST(3 AS BIGINT) AS raters,
        |  CAST(CASE WHEN COALESCE(n, 0) = 0
        |              OR n*n*9*2 - b*2 = 0 THEN NULL
        |       ELSE CAST(sign((aa - n*3)*n*3 - b*2) AS HUGEINT)
        |            * ((1000000 * abs((aa - n*3)*n*3 - b*2))
        |               // (n*n*9*2 - b*2))
        |       END AS BIGINT) AS kappa_ppm
        |FROM agg, drp""".stripMargin,
    "q345_krippendorff" ->
      """WITH e AS (SELECT event_id, user_id,
        |             CAST(floor(value*100) AS BIGINT) AS cents
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_id AS i,
        |        least(greatest(cents, 0) // 3500, 2) AS c FROM e
        |      UNION ALL SELECT event_id, event_id % 3
        |        FROM e WHERE event_id % 11 <> 0
        |      UNION ALL SELECT event_id, (user_id + event_id) % 3
        |        FROM e WHERE event_id % 5 <> 0),
        |nic AS (SELECT i, c, count(*) AS nic FROM r GROUP BY 1, 2),
        |ni AS (SELECT i, sum(nic) AS ni FROM nic GROUP BY 1),
        |unp AS (SELECT count(*) AS nu FROM ni WHERE ni < 2),
        |kept AS (SELECT nic.i, nic.c, nic.nic, ni.ni
        |         FROM nic JOIN ni USING (i) WHERE ni.ni >= 2),
        |item AS (SELECT i, ni,
        |           sum(CAST(nic AS HUGEINT) * (ni - nic)) AS dis
        |         FROM kept GROUP BY 1, 2),
        |do_ AS (SELECT sum(ni) AS n,
        |               sum((1000000 * dis) // (ni - 1)) AS dom
        |        FROM item),
        |cat AS (SELECT sum(CAST(cc AS HUGEINT) * cc) AS b FROM
        |          (SELECT c, sum(nic) AS cc FROM kept GROUP BY 1))
        |SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n_values,
        |  CAST(nu AS BIGINT) AS n_unpairable,
        |  CAST(CASE WHEN COALESCE(n, 0) = 0
        |              OR CAST(n AS HUGEINT)*n = b THEN NULL
        |       ELSE 1000000 - (dom * (n - 1)) // (CAST(n AS HUGEINT)*n - b)
        |       END AS BIGINT) AS alpha_ppm
        |FROM do_, cat, unp""".stripMargin,
    "q346_cliffs_delta" ->
      """WITH e AS (SELECT event_type = 'purchase' AS f,
        |             CAST(floor(value*100) AS BIGINT) AS v
        |           FROM events WHERE value IS NOT NULL),
        |h AS (SELECT v, count(*) AS t,
        |             sum(CASE WHEN f THEN 1 ELSE 0 END) AS a
        |      FROM e WHERE f IS NOT NULL GROUP BY 1),
        |r AS (SELECT v, t, a, sum(t) OVER (ORDER BY v) AS cum FROM h),
        |agg AS (SELECT sum(a) AS na, sum(t - a) AS nb,
        |          sum(CAST(a AS HUGEINT) * (2*(cum - t) + t + 1)) AS ra2
        |        FROM r)
        |SELECT CAST(COALESCE(na, 0) AS BIGINT) AS n_a,
        |  CAST(COALESCE(nb, 0) AS BIGINT) AS n_b,
        |  CAST(CASE WHEN COALESCE(na, 0) = 0 OR COALESCE(nb, 0) = 0
        |            THEN NULL
        |       ELSE CAST(sign(ra2 - na*(CAST(na AS HUGEINT) + 1)
        |                      - CAST(na AS HUGEINT)*nb) AS HUGEINT)
        |            * ((1000000 * abs(ra2 - na*(CAST(na AS HUGEINT) + 1)
        |                              - CAST(na AS HUGEINT)*nb))
        |               // (CAST(na AS HUGEINT) * nb))
        |       END AS BIGINT) AS delta_ppm
        |FROM agg""".stripMargin,
    "q347_kendalls_w" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
        |r1 AS (SELECT doc_id, row_number()
        |         OVER (ORDER BY n_chars, doc_id) AS rnk FROM d),
        |r2 AS (SELECT doc_id, row_number()
        |         OVER (ORDER BY (doc_id*2654435761) % 1000003, doc_id)
        |         AS rnk FROM d),
        |r3 AS (SELECT doc_id, row_number()
        |         OVER (ORDER BY n_chars DESC, doc_id) AS rnk FROM d),
        |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |      UNION ALL SELECT * FROM r3),
        |pi AS (SELECT doc_id, count(*) AS m, sum(rnk) AS ri
        |       FROM u GROUP BY 1),
        |agg AS (SELECT count(*) AS n, max(m) AS m,
        |          sum(CAST(ri AS HUGEINT) * ri) AS sq,
        |          sum(CAST(ri AS HUGEINT)) AS lin
        |        FROM pi)
        |SELECT CAST(n AS BIGINT) AS n_items,
        |  CAST(m AS BIGINT) AS m_rankers,
        |  CAST(CASE WHEN n < 2 THEN NULL
        |       ELSE (3000000 * (4*sq
        |               - 4*CAST(m AS HUGEINT)*(n + 1)*lin
        |               + CAST(n AS HUGEINT)*m*m*(n + 1)*(n + 1)))
        |            // (CAST(m AS HUGEINT)*m
        |               * (CAST(n AS HUGEINT)*n*n - n))
        |       END AS BIGINT) AS w_ppm
        |FROM agg""".stripMargin,
    "q348_mcc" ->
      """WITH e AS (SELECT CAST(floor(value*100) AS BIGINT) >= 3500 AS p,
        |             event_type = 'purchase' AS y
        |           FROM events
        |           WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |a AS (SELECT
        |  sum(CASE WHEN p AND y THEN 1 ELSE 0 END) AS tp,
        |  sum(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS tn,
        |  sum(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS fp,
        |  sum(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS fn FROM e)
        |SELECT CAST(COALESCE(tp,0) AS BIGINT) AS tp,
        |  CAST(COALESCE(tn,0) AS BIGINT) AS tn,
        |  CAST(COALESCE(fp,0) AS BIGINT) AS fp,
        |  CAST(COALESCE(fn,0) AS BIGINT) AS fn,
        |  CAST(sign(CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn)
        |    AS BIGINT) AS sign,
        |  CAST(CASE WHEN tp+fp = 0 OR tp+fn = 0 OR tn+fp = 0
        |              OR tn+fn = 0 THEN NULL
        |       ELSE (1000000
        |             * (CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn)
        |             * (CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn))
        |            // ((CAST(tp AS HUGEINT)+fp) * (CAST(tp AS HUGEINT)+fn)
        |                * (CAST(tn AS HUGEINT)+fp) * (CAST(tn AS HUGEINT)+fn))
        |       END AS BIGINT) AS mcc2_ppm
        |FROM a""".stripMargin,
    "q349_brown_forsythe" ->
      """WITH e AS (SELECT event_type AS g,
        |             CAST(floor(value*100) AS BIGINT) AS v
        |           FROM events
        |           WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |gv AS (SELECT g, v, count(*) AS c FROM e GROUP BY 1, 2),
        |tot AS (SELECT g, sum(c) AS n FROM gv GROUP BY 1),
        |cums AS (SELECT g, v, c,
        |           sum(c) OVER (PARTITION BY g ORDER BY v) AS cum
        |         FROM gv),
        |med AS (SELECT cums.g, min(v) AS med
        |        FROM cums JOIN tot USING (g)
        |        WHERE 2*cum >= n GROUP BY 1),
        |z AS (SELECT gv.g, gv.c, abs(gv.v - med.med) AS z
        |      FROM gv JOIN med USING (g)),
        |pg AS (SELECT g, sum(c) AS ng,
        |         sum(CAST(c AS HUGEINT)*z) AS s,
        |         sum(CAST(c AS HUGEINT)*z*z) AS ss
        |       FROM z GROUP BY 1),
        |agg AS (SELECT sum(ng) AS n, count(*) AS k, sum(s) AS t,
        |          sum((s*s) // CAST(ng AS HUGEINT)) AS gq,
        |          sum(ss) AS w2
        |        FROM pg)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CAST(CASE WHEN k < 2 OR (w2 - gq) <= 0 THEN NULL
        |       ELSE (1000 * (n - k)
        |             * greatest(gq - (t*t) // CAST(n AS HUGEINT), 0))
        |            // ((k - 1) * (w2 - gq))
        |       END AS BIGINT) AS w_milli
        |FROM agg""".stripMargin,
    "q350_cochran_q" ->
      """WITH e AS (SELECT
        |    CAST(floor(value*100) AS BIGINT) >= 3500 AS a,
        |    event_id % 3 = 0 AS b,
        |    (user_id + event_id) % 2 = 0 AS c
        |  FROM events WHERE value IS NOT NULL
        |    AND event_id IS NOT NULL AND user_id IS NOT NULL),
        |r AS (SELECT (CASE WHEN a THEN 1 ELSE 0 END
        |            + CASE WHEN b THEN 1 ELSE 0 END
        |            + CASE WHEN c THEN 1 ELSE 0 END) AS ri, a, b, c
        |      FROM e),
        |agg AS (SELECT count(*) AS n, sum(ri) AS t,
        |          sum(CAST(ri AS HUGEINT)*ri) AS r2,
        |          sum(CASE WHEN a THEN 1 ELSE 0 END) AS c0,
        |          sum(CASE WHEN b THEN 1 ELSE 0 END) AS c1,
        |          sum(CASE WHEN c THEN 1 ELSE 0 END) AS c2
        |        FROM r)
        |SELECT CAST(n AS BIGINT) AS n_items, CAST(3 AS BIGINT) AS k,
        |  CAST(CASE WHEN 3*CAST(t AS HUGEINT) - r2 = 0 THEN NULL
        |       ELSE (1000 * 2 * (3*(CAST(c0 AS HUGEINT)*c0
        |               + CAST(c1 AS HUGEINT)*c1 + CAST(c2 AS HUGEINT)*c2)
        |             - CAST(t AS HUGEINT)*t))
        |            // (3*CAST(t AS HUGEINT) - r2)
        |       END AS BIGINT) AS q_milli
        |FROM agg""".stripMargin,
    "q351_gwet_ac1" ->
      """WITH e AS (SELECT event_id, user_id,
        |             CAST(floor(value*100) AS BIGINT) AS cents
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_id AS i,
        |        least(greatest(cents, 0) // 3500, 2) AS c FROM e
        |      UNION ALL SELECT event_id, event_id % 3 FROM e
        |      UNION ALL SELECT event_id, (user_id + event_id) % 3
        |        FROM e WHERE event_id % 13 <> 0),
        |nic AS (SELECT i, c, count(*) AS nic FROM r GROUP BY 1, 2),
        |ni AS (SELECT i, sum(nic) AS ni FROM nic GROUP BY 1),
        |kept AS (SELECT nic.i, nic.c, nic.nic
        |         FROM nic JOIN ni USING (i) WHERE ni.ni = 3),
        |cat AS (SELECT c, CAST(sum(nic) AS HUGEINT) AS cc,
        |               CAST(sum(CAST(nic AS HUGEINT)*nic) AS HUGEINT) AS a
        |        FROM kept GROUP BY 1),
        |agg AS (SELECT sum(cc) // 3 AS n, count(*) AS kk,
        |               sum(a) AS aa, sum(cc*cc) AS b FROM cat)
        |SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n_items,
        |  CAST(3 AS BIGINT) AS raters,
        |  CAST(COALESCE(kk, 0) AS BIGINT) AS k_categories,
        |  CAST(CASE WHEN COALESCE(n, 0) = 0 OR kk < 2 THEN NULL
        |       ELSE CAST(sign((aa - n*3)*(kk - 1)*n*3
        |                      - (n*3*n*3 - b)*2) AS HUGEINT)
        |            * ((1000000 * abs((aa - n*3)*(kk - 1)*n*3
        |                              - (n*3*n*3 - b)*2))
        |               // ((kk - 1)*n*n*9*2 - (n*3*n*3 - b)*2))
        |       END AS BIGINT) AS ac1_ppm
        |FROM agg""".stripMargin,
  )
}
