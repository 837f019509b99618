package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** k-bounded (score, payload) list — buffer AND result of the top-k
  * aggregator (a case class so `Encoders.product` applies). */
final case class TopKBuf(items: Seq[(Double, Long)])

/** Bounded exact top-k as a typed [[Aggregator]] — the scale-correct
  * alternative to `row_number() OVER (PARTITION BY g ORDER BY s)` +
  * `rnk <= k`: the window form shuffles and sorts EVERY row of every
  * group; this keeps a k-bounded buffer per group that partial
  * aggregation collapses map-side, so the shuffle carries at most k
  * (score, payload) pairs per group — the difference between sorting
  * the whole table and merging k-element lists at corpus scale.
  *
  * Ordering: score DESC, payload ASC (deterministic tiebreak) — i.e.
  * row_number semantics, not rank (no tie expansion). Exact, not a
  * sketch: top-k is mergeable, so partial aggregation loses nothing.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {
  require(k >= 1, "k must be >= 1")

  /** Total order even for NaN (Double.compare ranks NaN above +Inf,
    * matching Spark's DESC window ordering — a raw `>` would make NaN
    * unordered and the sort comparator non-transitive). */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    if (c != 0) c > 0 else a._2 < b._2
  }

  private def trim(s: Seq[(Double, Long)]): TopKBuf =
    TopKBuf(s.sortWith(better).take(k))

  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(buf: TopKBuf, x: (Double, Long)): TopKBuf =
    // common case at scale: a full buffer rejects a non-improving row
    // with ONE comparison against the current k-th element (trim keeps
    // the buffer sorted, so .last is the cutoff) — no append, no re-sort
    if (buf.items.size >= k && !better(x, buf.items.last)) buf
    else trim(buf.items :+ x)
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    trim(a.items ++ b.items)
  override def finish(buf: TopKBuf): TopKBuf = buf
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** k-bounded (key, id) list — buffer and result of [[BottomKLong]]. */
final case class BottomKBuf(items: Seq[(Long, Long)])

/** Exact bottom-k over INTEGER keys as a typed [[Aggregator]]: keeps the
  * k smallest (key, id) pairs ordered (key ASC, id ASC). The Long-score
  * sibling of [[TopKByScore]] — integer keys (LCG shuffle keys, token
  * counts, per-mille rates) must not round-trip through Double, which
  * loses exactness past 2^53 and turns distinct keys into ties.
  *
  * Same scale story: partial aggregation collapses every map task to a
  * k-bounded buffer per group before the shuffle, so an exact per-group
  * quota never becomes one task sorting the largest group (the
  * row_number-window shape this replaces). */
class BottomKLong(k: Int)
    extends Aggregator[(Long, Long), BottomKBuf, BottomKBuf] {
  require(k >= 1, "k must be >= 1")

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    if (a._1 != b._1) a._1 < b._1 else a._2 < b._2

  private def trim(s: Seq[(Long, Long)]): BottomKBuf =
    BottomKBuf(s.sortWith(better).take(k))

  override def zero: BottomKBuf = BottomKBuf(Nil)
  override def reduce(buf: BottomKBuf, x: (Long, Long)): BottomKBuf =
    // full buffer rejects a non-improving row with one comparison
    // against the current k-th element (trim keeps the buffer sorted)
    if (buf.items.size >= k && !better(x, buf.items.last)) buf
    else trim(buf.items :+ x)
  override def merge(a: BottomKBuf, b: BottomKBuf): BottomKBuf =
    trim(a.items ++ b.items)
  override def finish(buf: BottomKBuf): BottomKBuf = buf
  override def bufferEncoder: Encoder[BottomKBuf] =
    Encoders.product[BottomKBuf]
  override def outputEncoder: Encoder[BottomKBuf] =
    Encoders.product[BottomKBuf]
}

/** One event kept by [[FirstKByTime]] — named fields so gate code can
  * extract `items.tok` as an array column. */
final case class EvItem(ts: Long, id: Long, tok: String)

/** k-bounded (ts, id, tok) list ordered ascending by (ts, id). */
final case class FirstKBuf(items: Seq[EvItem])

/** Exact FIRST-k per group by event time as a typed [[Aggregator]]: the
  * per-user "first k events" selection behind path analysis. Keeps the k
  * earliest (ts, id, payload) rows — id breaks timestamp ties so the kept
  * prefix is a total order both engines reproduce. Same scale story as
  * [[TopKByScore]]/[[BottomKLong]]: partial aggregation collapses each map
  * task to a k-bounded buffer, so a user with a million events ships k
  * rows into the shuffle, not a window sort of their whole history. */
class FirstKByTime(k: Int)
    extends Aggregator[(Long, Long, String), FirstKBuf, FirstKBuf] {
  require(k >= 1, "k must be >= 1")

  private def better(a: EvItem, b: EvItem): Boolean =
    if (a.ts != b.ts) a.ts < b.ts else a.id < b.id

  private def trim(s: Seq[EvItem]): FirstKBuf =
    FirstKBuf(s.sortWith(better).take(k))

  override def zero: FirstKBuf = FirstKBuf(Nil)
  override def reduce(buf: FirstKBuf, x: (Long, Long, String)): FirstKBuf = {
    val it = EvItem(x._1, x._2, x._3)
    // full buffer rejects a non-improving row with one comparison
    // against the current k-th element (trim keeps the buffer sorted)
    if (buf.items.size >= k && !better(it, buf.items.last)) buf
    else trim(buf.items :+ it)
  }
  override def merge(a: FirstKBuf, b: FirstKBuf): FirstKBuf =
    trim(a.items ++ b.items)
  override def finish(buf: FirstKBuf): FirstKBuf = buf
  override def bufferEncoder: Encoder[FirstKBuf] =
    Encoders.product[FirstKBuf]
  override def outputEncoder: Encoder[FirstKBuf] =
    Encoders.product[FirstKBuf]
}
