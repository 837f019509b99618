package graft

import graft.llm.WordPiece
import org.apache.spark.sql.functions._

/** llm/WordPiece — likelihood-scored merge training against an
  * independent in-memory reference, and greedy longest-match encoding
  * semantics. */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  // ---- independent reference trainer (driver-side, BigInt-exact) ----
  private def refTrain(wordCounts: Map[String, Long],
                       numMerges: Int,
                       minPairCount: Long): Seq[String] = {
    var vocab: Map[Seq[String], Long] = wordCounts.map { case (w, c) =>
      WordPiece.initialPieces(w) -> c
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done && out.size < numMerges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc = scala.collection.mutable.Map.empty[String, Long]
      for ((syms, c) <- vocab) {
        syms.foreach(s => sc(s) = sc.getOrElse(s, 0L) + c)
        syms.zip(syms.drop(1)).foreach(p =>
          pc(p) = pc.getOrElse(p, 0L) + c)
      }
      // candidate filter BEFORE the argmax (mirrors learnMerges: rare
      // pairs are not candidates, not a stop signal)
      val cands = pc.toSeq.filter(_._2 >= minPairCount)
        .map { case ((l, r), c) => (l, r, c, sc(l), sc(r)) }
      val best = cands.sortWith { (x, y) =>
        val sx = BigInt(x._3) * y._4 * y._5
        val sy = BigInt(y._3) * x._4 * x._5
        if (sx != sy) sx > sy
        else if (x._1 != y._1) x._1 < y._1
        else x._2 < y._2
      }.headOption
      best match {
        case None => done = true
        case Some((l, r, _, _, _)) =>
          out += WordPiece.join2(l, r)
          vocab = vocab.toSeq.map { case (syms, c) =>
            (WordPiece.mergeOnce(syms, l, r), c)
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  private def corpusDf(words: Seq[String]) =
    Seq(words.mkString(" ")).toDF("text")

  test("learnMerges matches the in-memory reference (likelihood score, not raw count)") {
    // 'ab' pair count 4 with common symbols; 'xy' pair count 3 but both
    // symbols rare → likelihood prefers xy: 3/(3·3) > 4/(9·4)
    val words = Seq.fill(4)("abc") ++ Seq.fill(3)("xy") ++
      Seq.fill(5)("a") ++ Seq("cab", "bca")
    val wf = WordPiece.wordFrequencies(corpusDf(words), "text")
    val got = WordPiece.learnMerges(wf, numMerges = 4, minPairCount = 2)
    val ref = refTrain(
      words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong },
      numMerges = 4, minPairCount = 2)
    assert(got == ref)
    assert(got.head == "xy")
    // partition independence
    val again = WordPiece.learnMerges(
      WordPiece.wordFrequencies(corpusDf(words).repartition(5), "text"),
      numMerges = 4, minPairCount = 2)
    assert(again == got)
  }

  test("learnMerges on a larger random corpus equals the reference merge-for-merge") {
    val rnd = new scala.util.Random(42)
    val words = Seq.fill(300)(
      (0 until (2 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString)
    val wf = WordPiece.wordFrequencies(corpusDf(words), "text")
    val got = WordPiece.learnMerges(wf, numMerges = 12, minPairCount = 2)
    val ref = refTrain(
      words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong },
      numMerges = 12, minPairCount = 2)
    assert(got == ref)
  }

  test("encodeWord: longest match, continuation marking, whole-word UNK") {
    val vocab = Set("a", "b", "ab", "##b", "##c", "##bc")
    assert(WordPiece.encodeWord("abc", vocab) == Seq("ab", "##c"))
    assert(WordPiece.encodeWord("abbc", vocab) == Seq("ab", "##bc"))
    assert(WordPiece.encodeWord("ab", vocab) == Seq("ab"))
    // 'b' then ##a missing → whole word UNK, not partial output
    assert(WordPiece.encodeWord("ba", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("q", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("", vocab) == Nil)
    // a continuation piece never matches at word start
    assert(WordPiece.encodeWord("c", vocab + "##c") == Seq(WordPiece.Unk))
  }

  test("learnVocab encodes its own training corpus with zero UNK; detok round-trips") {
    val words = Seq.fill(6)("abab") ++ Seq.fill(4)("baba") ++
      Seq.fill(3)("cab") ++ Seq("abc")
    val vocab = WordPiece.learnVocab(corpusDf(words), "text",
      numMerges = 6, minPairCount = 2)
    val vset = vocab.toSet
    for (w <- words.distinct) {
      val toks = WordPiece.encodeWord(w, vset)
      assert(!toks.contains(WordPiece.Unk), s"$w -> $toks")
      // detokenize: strip ## and concatenate
      assert(toks.map(_.stripPrefix(WordPiece.ContPrefix)).mkString == w)
    }
  }

  test("encodeDocs reassembles in word order and counts subwords") {
    val vocab = Seq("a", "b", "ab", "##b", "##c")
    val docs = Seq((1L, "ab abc zz"), (2L, ""), (3L, "b")).toDF("id", "text")
    val got = WordPiece.encodeDocs(docs, "id", "text", vocab)
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set(
      (1L, "ab ab ##c [UNK]", 4),
      (3L, "b", 1)))
  }
}
