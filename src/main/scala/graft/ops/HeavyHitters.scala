package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Bounded-memory heavy hitters: all items occurring ≥ `minCount` times,
  * found WITHOUT aggregating the full key universe — the 100 TB answer
  * to "which vocabulary items / urls / user-agents dominate this corpus"
  * when a plain groupBy would shuffle billions of distinct keys. Gate
  * query q51; no reference analog.
  *
  * Shape: each partition builds a SpaceSaving summary of k counters
  * (classic Metwally et al. stream-summary — O(k) memory regardless of
  * partition size). The candidate set is the UNION of all per-partition
  * sketch items, re-counted exactly via a broadcast semi-join, then
  * filtered by `minCount`.
  *
  * RECALL IS TOTAL, by averaging: an item with overall count ≥ minCount
  * > n/k (n = total items) must have count_p > n_p/k in at least one
  * partition p, and SpaceSaving guarantees every item with partition
  * count > n_p/k is IN that partition's summary — so every true heavy
  * hitter reaches the exact recount. PRECISION is exact by construction
  * (the recount). `k = 0` derives k from one count() of the input so the
  * n/k < minCount premise holds at any scale (with a 4× safety factor);
  * an explicit k is the caller's promise that minCount > n/k.
  *
  * Memory bounds: k is capped at [[MaxK]] (2^27) — the per-partition
  * sketch is O(k) heap, and int arithmetic on the compaction threshold
  * must not overflow. A derived k hitting the cap means minCount is
  * below ~4n/2^27; at that point the recall premise needs a partition
  * count check, not a bigger sketch. The candidate set (≤ partitions×k
  * distinct items) is broadcast for the recount only while its measured
  * size is ≤ `broadcastLimit`; past that it falls back to a plain
  * (shuffle-planned) join rather than forcing gigabytes onto the driver.
  */
object HeavyHitters {

  /** Hard cap on the per-partition sketch size (2^27 counters). */
  private[graft] val MaxK: Int = 1 << 27

  private[graft] def deriveK(n: Long, minCount: Long): Int =
    math.max(1024L, math.min(MaxK.toLong, 4L * n / minCount)).toInt

  /** All (item, cnt) with cnt ≥ minCount. The returned frame is LAZY and
    * holds no cached state — repeated calls in a long-lived session
    * accumulate nothing.
    * @param broadcastLimit max candidate-set size (items) that may be
    *        pulled to the driver and broadcast for the exact recount —
    *        this bounds driver memory exactly as the broadcast itself
    *        would. Above it the candidate semi-join is left to Spark's
    *        planner, and (the price of staying cache-free) the sketch
    *        pass re-runs lazily inside that join when the result is
    *        consumed. Candidate sets differ run to run (equal-minimum
    *        eviction is arbitrary) but every true heavy hitter is in
    *        EVERY pass's candidates and the recount is exact, so the
    *        final result is deterministic regardless. */
  def heavyHitters(items: Dataset[String], minCount: Long,
                   k: Int = 0, broadcastLimit: Long = 4L * 1000 * 1000): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(k >= 0 && k <= MaxK, s"k must be in [0, $MaxK]: the sketch is O(k) heap per partition")
    val spark = items.sparkSession
    import spark.implicits._
    val kN = if (k > 0) k else deriveK(items.count(), minCount)
    val cands = items.mapPartitions(it => sketchItems(it, kN).iterator)
      .toDF("item").distinct().persist()
    val recount = try {
      if (cands.count() <= broadcastLimit) {
        // bounded by broadcastLimit — the same rows a broadcast would
        // ship to the driver anyway; embedding them as a local relation
        // keeps the returned plan free of the (now-released) cache
        val local = cands.as[String].collect().toSeq.toDF("item")
        items.toDF("item").join(broadcast(local), "item")
      } else items.toDF("item").join(cands, "item")
    } finally cands.unpersist()
    recount.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** SpaceSaving summary of one partition: the ≤ k tracked items.
    * HashMap of counts + a lazy-deletion min-heap; stale heap entries
    * (count changed since enqueue) are skipped on poll, and the heap is
    * compacted from the live counts whenever it exceeds 4k entries —
    * amortized O(log k) per item, O(k) memory. Which of several
    * EQUAL-minimum counters gets evicted is arbitrary; that only
    * perturbs the candidate set, never the final result (recall is
    * guaranteed for every true heavy hitter and the exact recount
    * restores precision). */
  private[graft] def sketchItems(it: Iterator[String], k: Int): Seq[String] = {
    // initial capacities are cosmetic (both structures grow); keep them
    // modest so a large k doesn't pre-allocate gigabytes
    val counts = new java.util.HashMap[String, java.lang.Long](
      math.min(k, 1 << 16) * 2)
    val heap = new java.util.PriorityQueue[(Long, String)](
      math.min(k + 1, 1 << 16),
      java.util.Comparator.comparingLong((p: (Long, String)) => p._1))
    def push(c: Long, w: String): Unit = {
      heap.add((c, w))
      if (heap.size.toLong > 4L * k) {     // compact: drop stale entries
        heap.clear()
        counts.forEach((kw, kc) => heap.add((kc.longValue(), kw)))
      }
    }
    while (it.hasNext) {
      val w = it.next()
      val cur = counts.get(w)
      if (cur != null) {
        counts.put(w, cur + 1L)
        push(cur + 1L, w)                  // old heap entry goes stale
      } else if (counts.size < k) {
        counts.put(w, 1L)
        push(1L, w)
      } else {
        // evict the current minimum (skipping stale entries), inherit
        // its count + 1 (the SpaceSaving overestimate)
        var evicted = false
        while (!evicted) {
          val (c, cand) = heap.poll()
          val live = counts.get(cand)
          if (live != null && live.longValue() == c) {
            counts.remove(cand)
            counts.put(w, c + 1L)
            push(c + 1L, w)
            evicted = true
          }
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().asScala.toSeq
  }
}
