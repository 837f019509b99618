package graft

import graft.functions.AcFunctions
import graft.functions.AcOps.AcAutomaton
import graft.llm.Blocklist
import org.apache.spark.sql.functions._

/** functions/AhoCorasick + llm/Blocklist — multi-pattern substring
  * screening. The contract under test: every occurrence counts,
  * including overlapping self-matches and patterns nested inside other
  * patterns' matches, case-sensitive, one scan. */
class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  private val pats = Seq("aa", "tab", "table", "b")

  /** Driver-side brute-force reference: count all start positions. */
  private def bruteCount(text: String, pat: String): Long =
    (0 to text.length - pat.length)
      .count(i => text.regionMatches(i, pat, 0, pat.length)).toLong

  test("acMatches: overlaps, nesting, case sensitivity, hand counts") {
    val df = Seq(
      (1L, "aaa"),            // "aa" overlaps itself: 2
      (2L, "a table, a tab"), // tab nested in table: tab 2, table 1
      (3L, "TABLE"),          // case-sensitive: nothing
      (4L, "bbb aa")          // b 3, aa 1
    ).toDF("id", "text")
    val got = df.select($"id",
        AcFunctions.acMatches($"text", pats).as("m"))
      .as[(Long, Seq[(Int, Long)])].collect().toMap
    assert(got(1L) == Seq((0, 2L)))
    assert(got(2L) == Seq((1, 2L), (2, 1L), (3, 2L)))
    assert(got(3L) == Seq.empty)
    assert(got(4L) == Seq((0, 1L), (3, 3L)))
  }

  test("acMatches equals brute force on random soup, repartitioned") {
    val rnd = new scala.util.Random(42)
    val texts = (0 until 200).map { i =>
      i.toLong -> (0 until 50).map(_ => "atbl "(rnd.nextInt(5))).mkString
    }
    val expected = texts.map { case (id, t) =>
      id -> pats.zipWithIndex
        .map { case (p, pid) => (pid, bruteCount(t, p)) }
        .filter(_._2 > 0)
    }.toMap
    val got = texts.toDF("id", "text").repartition(7)
      .select($"id", AcFunctions.acMatches($"text", pats).as("m"))
      .as[(Long, Seq[(Int, Long)])].collect().toMap
    assert(got == expected)
  }

  test("matchStats / hits / filterClean are consistent one-scan views") {
    val df = Seq((1L, "aaa tab"), (2L, "clean text"), (3L, "table"))
      .toDF("doc_id", "text")
    val stats = Blocklist.matchStats(df, "text", pats)
      .select($"doc_id", $"n_patterns_hit", $"n_occurrences")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(stats(1L) == ((3, 4L)))   // aa×2, tab×1, b×1 (inside "tab")
    assert(stats(2L) == ((0, 0L)))
    assert(stats(3L) == ((3, 3L)))   // tab, table, b — each once
    val hits = Blocklist.hits(df, Seq("doc_id"), "text", pats)
      .as[(Long, Int, String, Long)].collect().toSet
    assert(hits == Set(
      (1L, 0, "aa", 2L), (1L, 1, "tab", 1L), (1L, 3, "b", 1L),
      (3L, 1, "tab", 1L), (3L, 2, "table", 1L), (3L, 3, "b", 1L)))
    val clean = Blocklist.filterClean(df, "text", pats)
      .select($"doc_id").as[Long].collect().toSeq
    assert(clean == Seq(2L))
    // null text: stats null out, filterClean keeps the row
    val withNull = Seq((4L, Option.empty[String])).toDF("doc_id", "text")
    assert(Blocklist.filterClean(withNull, "text", pats).count() == 1)
  }

  test("automaton validation fails loud") {
    intercept[IllegalArgumentException] { new AcAutomaton(Array.empty) }
    intercept[IllegalArgumentException] { new AcAutomaton(Array("a", "")) }
    intercept[IllegalArgumentException] { new AcAutomaton(Array("x", "x")) }
  }
}
