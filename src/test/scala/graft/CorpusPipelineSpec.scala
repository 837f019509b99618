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

  test("exactVerifyJaccard keeps only candidate pairs clearing the exact threshold") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base.split(" ").drop(1).mkString(" ")    // J ≈ 58/59
    val mid  = (1 to 30).map(i => s"tok$i").mkString(" ") + " " +
               (200 to 229).map(i => s"zz$i").mkString(" ")  // J ≈ 0.5 vs base
    val docs = Seq((1L, base), (2L, near), (3L, mid)).toDF("doc_id", "text")
    // loose signature threshold lets (1,3) through as a CANDIDATE; the
    // exact-verify stage must kill it while keeping the true near-dup
    val (clean, rejects) = CorpusPipeline.clean(docs, "doc_id", "text",
      CorpusPipeline.Config(nearDupThreshold = 0.2,
        exactVerifyJaccard = Some(0.8)))
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    val reasons = rejects.select("doc_id", "drop_reason")
      .as[(Long, String)].collect().toMap
    assert(reasons == Map(2L -> "near_dup"))
  }

  test("curateLeakSafe: stage boundaries compose (quality, dedup, split, batch)") {
    import graft.llm.CorpusPipeline
    // distinct tokens: a repetitive doc winnows to ~1 DISTINCT
    // fingerprint and can never share minShared=2 of them
    val good = (1 to 40).map(i => s"word$i")
      .mkString(" ") + " the have"                    // passes gopher defaults
    val docs = Seq(
      (1L, good),
      (2L, good),                                     // exact dup → dropped
      (3L, "the quick fox"),                          // < 30 words → dropped
      (4L, good + " extra near dup run over shared winnow fingerprints"),
      (5L, (1 to 45).map(i => s"tok$i").mkString(" ") + " the have"))
      .toDF("doc_id", "text")
    val got = CorpusPipeline.curateLeakSafe(docs, "doc_id", "text",
        splits = Seq("train" -> 500, "val" -> 250, "test" -> 250),
        batchSize = 2, minWords = 30, minStopwords = 1,
        winnowMaxDf = 50, minShared = 2)
      .select($"doc_id", $"n_tokens", $"rep", $"split", $"batch_id")
      .as[(Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    // survivors: 1 (min-id copy), 4, 5; dropped: 2 (dup), 3 (quality)
    assert(got.keySet == Set(1L, 4L, 5L))
    // 1 and 4 share >= 2 winnow fingerprints (4 extends 1) → same
    // cluster rep (1) → same split side; 5 is a singleton
    assert(got(1L)._3 == 1L && got(4L)._3 == 1L && got(5L)._3 == 5L)
    assert(got(1L)._4 == got(4L)._4, "near-dup pair must not straddle splits")
    // train rows batch 0-based; non-train batch = -1
    got.values.foreach { case (_, _, _, sp, b) =>
      if (sp == "train") assert(b >= 0L) else assert(b == -1L)
    }
  }

  test("corpusReport: hand-checkable data card, one scan with no joins") {
    import spark.implicits._
    // lang A: 3 docs, one exact dup pair, all quality-passing (40 words
    // incl. stopword 'the'); lang B: 2 docs, no dups, both quality-fail
    // (too short)
    val good = ("the " + (1 to 39).map(i => s"word$i").mkString(" "))
    val docs = Seq(
      (1L, "A", good), (2L, "A", good), (3L, "A", good + " extraone"),
      (4L, "B", "tiny one"), (5L, "B", "tiny two")
    ).toDF("doc_id", "lang", "text")
    val rep = graft.llm.CorpusPipeline.corpusReport(docs, "text",
      Seq("lang"), minWords = 30, minStopwords = 1)
    val got = rep.collect().map(r => r.getString(0) -> r).toMap
    val a = got("A")
    assert(a.getLong(1) == 3L && a.getLong(2) == 2L)       // n_docs, n_distinct
    assert(a.getLong(7) == 3L)                             // n_quality
    assert(a.getLong(8) == 333L && a.getLong(9) == 1000L)  // dup_pm, quality_pm
    val b = got("B")
    assert(b.getLong(1) == 2L && b.getLong(2) == 2L)
    assert(b.getLong(7) == 0L && b.getLong(8) == 0L && b.getLong(9) == 0L)
    assert(a.getLong(4) == 3L * 40 + 1)                    // total_tokens
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"data card must not join:\n$plan")
    // partition independence
    val again = graft.llm.CorpusPipeline.corpusReport(docs.repartition(7),
        "text", Seq("lang"), minWords = 30, minStopwords = 1)
      .collect().map(_.toString).sorted.toSeq
    assert(again == rep.collect().map(_.toString).sorted.toSeq)
    intercept[IllegalArgumentException] {
      graft.llm.CorpusPipeline.corpusReport(docs, "text", Seq.empty)
    }
  }

  // GraftExtensions needs a fresh JVM-first session (getOrCreate in the
  // shared test JVM would reuse the existing one and skip extensions) —
  // covered by `runMain graft.ExtDemo` instead; see .claude verify skill.
}
