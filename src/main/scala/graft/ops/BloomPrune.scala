package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: filter a huge fact side down to rows whose
  * key MIGHT exist on the (much smaller, but not broadcast-small) build
  * side before paying the exact join's shuffle. Gate query q53; no
  * reference analog.
  *
  * The 100 TB shape: when the build-side key set is millions of rows, a
  * broadcast hash join is off the table and the fact side pays a full
  * shuffle of every row — most of which the join will discard. A Bloom
  * filter of the keys is `numBits/8` bytes REGARDLESS of key count
  * (1 MiB default), cheap to build distributed (partial sketches merge
  * associatively map-side) and cheap to ship to every task; applying it
  * at the scan cuts the shuffled volume to matching-plus-false-positive
  * rows. The exact join then restores precision. Spark's own runtime
  * row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`)
  * makes the same move but only when its heuristics fire; this operator
  * is the explicit, tunable form.
  *
  * Built on Catalyst's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` (both codegen-capable; the probe inlines
  * into whole-stage codegen). The finished sketch is collected to the
  * driver and embedded as a binary literal — a legitimate bounded
  * collect (like the IVF centroid model): its size is the configured
  * `numBits/8`, never a function of the data volume.
  */
object BloomPrune {

  /** Distributed-build a Bloom filter of xxhash64(keyCol). */
  def bloomBytes(keys: DataFrame, keyCol: String,
                 expectedItems: Long, numBits: Long): Array[Byte] = {
    require(expectedItems > 0 && numBits > 0, "sketch sizing must be positive")
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(keyCol))),
      ColumnBridge.expression(lit(expectedItems)),
      ColumnBridge.expression(lit(numBits)), 0, 0)
    keys.filter(col(keyCol).isNotNull)
      .agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Probe predicate: key might be in the sketch (false positives
    * possible, false negatives impossible). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Exact semi join of `big` to `small`'s keys, Bloom-pre-pruned: the
    * sketch drops non-matching big rows before the exact join's shuffle;
    * the exact join drops the sketch's false positives. Result is
    * identical to a plain semi join (the oracle form).
    *
    * Mismatched key types are WIDENED to their common type before
    * hashing on both sides — xxhash64 is type-sensitive (an int 5 and a
    * long 5 hash differently), so hashing the raw columns would turn
    * every cross-type match into a bloom false NEGATIVE the exact join
    * can never recover. Keys with no lossless common type (e.g. string
    * vs numeric, whose join coercion is value-lossy) are rejected with a
    * clear error rather than silently dropping matches. */
  def semiJoinPruned(big: DataFrame, small: DataFrame,
                     bigKey: String, smallKey: String,
                     expectedItems: Long = 1L << 22,
                     numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.TypeCoercion
    import org.apache.spark.sql.types.StringType
    val (bt, st) = (big.schema(bigKey).dataType, small.schema(smallKey).dataType)
    val common =
      if (bt == st) bt
      else TypeCoercion.findWiderTypeForTwo(bt, st) match {
        case Some(t) if !(t == StringType && (bt != StringType || st != StringType)) => t
        case _ => throw new IllegalArgumentException(
          s"bloom prune requires keys with a lossless common type; got $bt vs $st")
      }
    val keys = small.select(col(smallKey).cast(common).as(smallKey))
      .filter(col(smallKey).isNotNull)
    val bf = bloomBytes(keys, smallKey, expectedItems, numBits)
    // left_semi emits each big row at most once even with duplicate build
    // keys — no distinct needed on the build side
    big.filter(mightContain(bf, col(bigKey).cast(common)))
      .join(keys.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
