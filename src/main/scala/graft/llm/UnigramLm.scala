package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (the SentencePiece family,
  * Kudo 2018) — the OTHER mainstream tokenizer next to [[Bpe]]: instead
  * of growing merges bottom-up, it seeds an over-complete piece
  * inventory and lets EM + pruning keep the pieces that explain the
  * corpus best; encoding is per-word Viterbi segmentation under the
  * learned piece scores.
  *
  * This is the deterministic HARD-EM variant: the E-step charges each
  * word's count to the pieces of its single best segmentation, the
  * M-step re-scores pieces as `count + 1` (add-one smoothing keeps
  * single characters usable at count 0), and pruning keeps single
  * characters unconditionally plus the top multi-character pieces by
  * (count DESC, piece ASC) up to `vocabSize`. Every decision is exact
  * integer arithmetic — Viterbi compares `prod(scores) / total^k`
  * candidates by BigInt cross-multiplication (`prodA·T^kB` vs
  * `prodB·T^kA`), never a float log-sum — so the learned vocabulary is
  * a pure function of the corpus: re-runs, retries, and partitionings
  * agree bit-for-bit. Iterative EM has no single-statement SQL form, so
  * like [[Bpe]]/MMR/classifier-training this is spec-pinned against an
  * independent in-memory reference, not oracle-gated.
  *
  * Scale shape (what matters at 100 TB): the corpus is touched once —
  * one tokenize + groupBy gives the VOCABULARY-sized word-frequency
  * table ([[wordCounts]]). Each EM round is one flatMap over that table
  * (Viterbi per distinct word, piece scores in the closure — the
  * broadcast-dictionary contract, inventories are 10^4..10^5) plus one
  * map-side-partial count aggregation whose ≤-inventory-sized result
  * returns to the driver. No windows, no joins, no per-token shuffles.
  */
object UnigramLm {

  /** Word-frequency table as (word, cnt) — the one corpus pass. */
  def wordCounts(docs: DataFrame, textCol: String): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(TextShingles.words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
  }

  /** Seed inventory: the corpus's substrings of length ≤ `maxPieceLen`
    * weighted by word count — top `seedSize` by (count DESC, piece ASC)
    * via TakeOrderedAndProject — plus every single character
    * unconditionally (the segmentability floor). */
  def seedPieces(wordFreq: Dataset[(String, Long)], maxPieceLen: Int,
                 seedSize: Int): Seq[(String, Long)] = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    // ONE substring-count aggregation serves both the top-seedSize cut
    // and the char floor (pinned so the two actions don't recompute the
    // corpus-table flatMap; released once both are collected)
    val counts = wordFreq
      .flatMap { case (w, c) =>
        (for {
          i <- 0 until w.length
          l <- 1 to math.min(maxPieceLen, w.length - i)
        } yield w.substring(i, i + l)).map(_ -> c)
      }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = counts
      .orderBy(col("_2").desc, col("_1").asc)
      .limit(seedSize).collect().toSeq
    val chars = counts.filter(_._1.length == 1).collect().toSeq
    counts.unpersist(false)
    val topKeys = top.map(_._1).toSet
    (top ++ chars.filterNot(ch => topKeys(ch._1)))
      .sortBy { case (p, c) => (-c, p) }
  }

  /** Best segmentation of `word` under integer piece `scores` with
    * score total `total`: maximizes Π score(pᵢ) / total^k (= the
    * unigram likelihood), compared EXACTLY by BigInt
    * cross-multiplication; ties prefer fewer pieces, then the
    * lexicographically smaller piece sequence. None iff some character
    * is absent from `scores` (excluded by the char floor). */
  private[graft] def viterbi(word: String, scores: collection.Map[String, Long],
                             total: Long,
                             maxPieceLen: Int): Option[List[String]] = {
    final case class Cand(rev: List[String], prod: BigInt, k: Int)
    val T = BigInt(total)
    val seqOrd = math.Ordering.Implicits.seqOrdering[List, String]
    def better(a: Cand, b: Cand): Boolean = {
      val cmp = (a.prod * T.pow(b.k)).compare(b.prod * T.pow(a.k))
      if (cmp != 0) cmp > 0
      else if (a.k != b.k) a.k < b.k
      else seqOrd.lt(a.rev.reverse, b.rev.reverse)
    }
    val n = word.length
    val best = new Array[Cand](n + 1)
    best(0) = Cand(Nil, BigInt(1), 0)
    var i = 1
    while (i <= n) {
      var chosen: Cand = null
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        val prev = best(i - l)
        if (prev != null) {
          val piece = word.substring(i - l, i)
          scores.get(piece).foreach { s =>
            val c = Cand(piece :: prev.rev, prev.prod * s, prev.k + 1)
            if (chosen == null || better(c, chosen)) chosen = c
          }
        }
        l += 1
      }
      best(i) = chosen
      i += 1
    }
    Option(best(n)).map(_.rev.reverse)
  }

  /** Train a unigram-LM piece inventory: seed → `iters` hard-EM rounds
    * of (distributed Viterbi E-step, count M-step, top-`vocabSize`
    * prune). Returns (piece, score) in (score DESC, piece ASC) order;
    * scores are smoothed counts (`count + 1`), the exact integers
    * [[encodeWords]] segments with. */
  def train(wordFreq: Dataset[(String, Long)], vocabSize: Int,
            iters: Int = 4, maxPieceLen: Int = 8,
            seedFactor: Int = 4): Seq[(String, Long)] = {
    require(vocabSize >= 1 && iters >= 1 && maxPieceLen >= 1 && seedFactor >= 1,
      s"bad params: vocabSize=$vocabSize iters=$iters " +
        s"maxPieceLen=$maxPieceLen seedFactor=$seedFactor")
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val words = wordFreq.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count()
    var pieces: Seq[(String, Long)] =
      seedPieces(words, maxPieceLen, vocabSize * seedFactor)
        .map { case (p, c) => (p, c + 1) }   // smoothed scores
    var it = 0
    while (it < iters) {
      val scores = pieces.toMap
      val total = scores.values.sum
      val L = maxPieceLen
      // E-step: one pass over the vocab-sized word table; ≤-inventory
      // rows come back
      val counts = words.flatMap { case (w, c) =>
          viterbi(w, scores, total, L).toList.flatten.map(_ -> c)
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case (p, c) => (p, c) }.collect().toMap
      // M + prune: single chars always survive (count 0 ⇒ smoothed
      // score 1); multi-char pieces compete for the remaining slots
      val (single, multi) = pieces.map(_._1).distinct.partition(_.length == 1)
      val keptMulti = multi
        .map(p => (p, counts.getOrElse(p, 0L)))
        .filter(_._2 > 0L)
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - single.size))
      pieces = (single.map(p => (p, counts.getOrElse(p, 0L))) ++ keptMulti)
        .map { case (p, c) => (p, c + 1) }
        .sortBy { case (p, s) => (-s, p) }
      it += 1
    }
    words.unpersist(false)
    pieces
  }

  /** [[Bpe.encodeWords]]' sibling: (word, pieces) for every distinct
    * corpus word, segmented by Viterbi under the trained scores (the
    * piece table ships in the closure). Words with characters outside
    * the inventory surface an empty piece list (fail-closed, visible). */
  def encodeWords(docs: DataFrame, textCol: String,
                  pieces: Seq[(String, Long)],
                  maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scores = pieces.toMap
    val total = scores.values.sum
    docs.select(explode(TextShingles.words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .distinct()
      .as[String]
      .map(w => (w, viterbi(w, scores, total, maxPieceLen)
        .map(_.toSeq).getOrElse(Seq.empty[String])))
      .toDF("word", "pieces")
  }

  /** [[Bpe.encodeDocs]]' sibling: (doc_id, pieces, n_subwords) with each
    * document's pieces in original word order. Viterbi runs once per
    * DISTINCT word ([[encodeWords]] — vocab-sized work regardless of
    * corpus size); documents pick encodings up by a word join, and
    * per-doc reassembly is an array_sort bounded by one document. */
  def encodeDocs(docs: DataFrame, idCol: String, textCol: String,
                 pieces: Seq[(String, Long)],
                 maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scores = pieces.toMap
    val total = scores.values.sum
    val words = docs.select(col(idCol).as("doc_id"),
        posexplode(TextShingles.words(col(textCol))).as(Seq("pos", "w")))
      .where(length(col("w")) > 0)
    // dictionary from the words frame already built — going back to
    // `docs` would tokenize the whole corpus a second time
    val dict = words.select(col("w")).distinct().as[String]
      .map(w => (w, viterbi(w, scores, total, maxPieceLen)
        .map(_.toSeq).getOrElse(Seq.empty[String])))
      .toDF("word", "pieces")
    val perDoc = words
      .join(dict, col("w") === col("word"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("pieces"))))
        .as("ps"))
      .select(col("doc_id"),
        flatten(transform(col("ps"), p => p.getField("pieces")))
          .as("pieces"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pieces"), array().cast("array<string>")).as("pieces"))
      .withColumn("n_subwords", size(col("pieces")).cast("long"))
  }
}
