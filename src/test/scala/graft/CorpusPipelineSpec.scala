package graft

import graft.llm.CorpusPipeline
import org.apache.spark.sql.SparkSession

class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("pipeline drops low-quality, exact-dup and near-dup docs with reasons") {
    val good1 = (1 to 40).map(i => s"alpha$i beta$i").mkString(" ")
    val near1 = good1.replace("alpha40", "alphaX")       // near-dup of good1
    val good2 = (100 to 140).map(i => s"gamma$i").mkString(" ")
    val docs = Seq(
      (1L, good1), (2L, good1),          // 2 = exact dup of 1
      (3L, near1),                       // near dup of 1
      (4L, good2),
      (5L, "!!! ...")                    // low quality
    ).toDF("doc_id", "text")
    val (clean, rejects) = CorpusPipeline.clean(docs, "doc_id", "text",
      CorpusPipeline.Config(nearDupThreshold = 0.5))
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    val reasons = rejects.select("doc_id", "drop_reason")
      .as[(Long, String)].collect().toMap
    assert(reasons == Map(2L -> "exact_dup", 3L -> "near_dup", 5L -> "quality"))
    // profile columns survive on the clean side
    assert(clean.columns.contains("lang_pred") && clean.columns.contains("n_tokens"))
  }

  // GraftExtensions needs a fresh JVM-first session (getOrCreate in the
  // shared test JVM would reuse the existing one and skip extensions) —
  // covered by `runMain graft.ExtDemo` instead; see .claude verify skill.
}
