package graft

import graft.ops.EntityResolution
import graft.ops.EntityResolution._
import org.apache.spark.sql.functions._

/** ops/EntityResolution — blocked Fellegi–Sunter scoring: weights,
  * null tri-state, blocking prunes the pair space (plan-audited: no
  * cartesian), block profile arithmetic, and entity resolution over
  * transitive matches. */
class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  // (id, block, name, bal)
  private def people = Seq(
    (1L, "B1", Option("alice smith"), Option(100.0)),
    (2L, "B1", Option("alice smithe"), Option(100.4)), // near-dup of 1
    (3L, "B1", Option("bob jones"), Option(500.0)),
    (4L, "B2", Option("alice smith"), Option(100.0)),  // same name, other block
    (5L, "B1", Option.empty[String], Option(100.2))    // null name
  ).toDF("id", "block", "name", "bal")

  private val rules = Seq(
    prefixField("name", 8, wAgree = 30, wDisagree = 10),
    exactField("name", wAgree = 20, wDisagree = 5),
    toleranceField("bal", 1.0, wAgree = 15, wDisagree = 15))

  private def scored = scorePairs(people, "id",
    blockCols = Seq("block"), compareCols = Seq("name", "bal"),
    rules = rules, matchThreshold = 35, possibleThreshold = 0)

  test("weights, thresholds and the null tri-state") {
    val got = scored.select("id_l", "id_r", "score", "verdict")
      .as[(Long, Long, Long, String)].collect().toSet
    // (1,2): prefix "alice sm" agrees (+30), exact differs (−5),
    //        bal within 1.0 (+15) → 40 = match
    // (1,3)/(2,3): all disagree → −30 non_match
    // (1,5)/(2,5): name null → 0 twice, bal agrees → +15 possible
    // (3,5): name null → 0, bal differs → −15 non_match
    assert(got == Set(
      (1L, 2L, 40L, "match"),
      (1L, 3L, -30L, "non_match"), (2L, 3L, -30L, "non_match"),
      (1L, 5L, 15L, "possible"), (2L, 5L, 15L, "possible"),
      (3L, 5L, -15L, "non_match")))
    // cross-block pair (1,4) must not exist even though fields all agree
    assert(!scored.select("id_l", "id_r").as[(Long, Long)].collect()
      .exists { case (l, r) => Set(l, r) == Set(1L, 4L) })
    // null agreement columns surface as null, not 0
    val nullRow = scored.filter(col("id_l") === 1 && col("id_r") === 5)
      .select("agree_name_pfx8", "agree_name", "agree_bal_tol")
      .as[(Option[Int], Option[Int], Option[Int])].head()
    assert(nullRow == ((None, None, Some(1))))
  }

  test("blocking rides the join: plan has an equi-join, no cartesian") {
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocked self-join must be an equi hash/merge join:\n$plan")
  }

  test("blockProfile: pair counts n·(n−1)/2 per block") {
    val prof = blockProfile(people, Seq("block"))
      .select("block", "n_rows", "n_pairs")
      .as[(String, Long, Long)].collect().toSet
    assert(prof == Set(("B1", 4L, 6L), ("B2", 1L, 0L)))
  }

  test("goldenRecord: per-field source priority, nulls fall through, rank ties broken by id") {
    val src = Seq(
      // entity 1: name from rank 2 (rank 1 null), bal from rank 1
      (1L, 1, 10L, Option.empty[String], Option(5.0)),
      (1L, 2, 11L, Option("alice"), Option(9.0)),
      (1L, 3, 12L, Option("al"), Option.empty[Double]),
      // entity 2: all null name survives as null; rank tie on bal → id wins
      (2L, 1, 20L, Option.empty[String], Option(1.0)),
      (2L, 1, 21L, Option.empty[String], Option(2.0))
    ).toDF("e", "rnk", "id", "name", "bal")
    val got = EntityResolution.goldenRecord(src, "e", "rnk", "id",
        Seq("name", "bal"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(got == Set(
      (1L, Some("alice"), Some(5.0)),
      (2L, None, Some(1.0))))      // tie: id 20 < 21
    // partition independence (min_by partials merge associatively)
    val again = EntityResolution.goldenRecord(src.repartition(7), "e",
        "rnk", "id", Seq("name", "bal"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(again == got)
    intercept[IllegalArgumentException] {
      EntityResolution.goldenRecord(src, "e", "rnk", "id", Nil)
    }
  }

  test("resolveEntities: transitive matches cluster, singletons stand alone") {
    // chain 1–2 and 2–6 as matches → {1,2,6} one entity
    val extra = Seq((6L, "B1", Option("alice smitt"), Option(100.3)))
      .toDF("id", "block", "name", "bal")
    val all = people.unionByName(extra)
    val s = scorePairs(all, "id", Seq("block"), Seq("name", "bal"),
      rules, matchThreshold = 35, possibleThreshold = 0)
    val ents = resolveEntities(s, all, "id")
      .as[(Long, Long)].collect().toMap
    assert(ents(1L) == ents(2L) && ents(2L) == ents(6L))
    assert(ents(3L) == 3L && ents(4L) == 4L && ents(5L) == 5L)
    assert(ents.size == 6)
  }
}
