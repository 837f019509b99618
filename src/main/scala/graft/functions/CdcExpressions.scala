package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) kernel — the dedup-stable document
  * splitter (Rabin-fingerprint family: LBFS/rsync lineage, FastCDC's
  * simplification). Fixed-size chunking shifts EVERY downstream chunk
  * identity when one byte is inserted upstream; content-defined
  * boundaries ("cut where the rolling hash of the last `w` bytes masks
  * to zero") realign within one chunk of the edit, so chunk-level
  * dedup/delta between corpus snapshots keeps matching after edits.
  *
  * Boundary rule (shared bit-for-bit with the DuckDB gate oracle):
  * over bytes b_0..b_{n−1}, the hash at position i (i ≥ w−1) is
  * h_i = Σ_{j=i−w+1..i} b_j · B^{i−j} mod P with B=257, P=1000003; a
  * cut lands AFTER byte i when h_i mod 2^maskBits == 0, i is not the
  * last byte, and the open chunk has reached `minLen`; a cut is FORCED
  * when the open chunk reaches `maxLen` (the FastCDC normalization
  * bounds — degenerate inputs cannot produce unbounded or empty
  * chunks). One allocation-free O(n) pass per document (the rolling
  * update h ← (h·B + in − out·B^w) mod P), map-only — no shuffle at
  * any scale; chunk rows only exist downstream if the caller explodes
  * them.
  */
object CdcOps {
  private val P = 1000003L
  private val B = 257L

  /** All chunks of `text` under the boundary rule, in order. Empty
    * input → empty array; any non-empty input concatenates back to the
    * original (no bytes lost — spec-pinned). */
  def chunks(text: UTF8String, w: Int, maskBits: Int,
             minLen: Int, maxLen: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var bw = 1L
    var k = 0
    while (k < w) { bw = bw * B % P; k += 1 }
    val mask = (1L << maskBits) - 1L
    val out = new java.util.ArrayList[Any]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = (h * B + (bytes(i) & 0xff)) % P
      if (i >= w) h = (h - (bytes(i - w) & 0xff) * bw % P + P) % P
      val len = i - start + 1
      val atBoundary = i >= w - 1 && (h & mask) == 0L
      if (i < n - 1 && ((atBoundary && len >= minLen) || len >= maxLen)) {
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i + 1)))
        start = i + 1
      }
      i += 1
    }
    out.add(UTF8String.fromBytes(
      java.util.Arrays.copyOfRange(bytes, start, n)))
    new GenericArrayData(out.toArray)
  }
}

/** Native CDC expression: array<string> of content-defined chunks.
  * Codegen emits one static call — the kernel stays inside the
  * whole-stage pipeline like [[WinnowMins]]/[[WordNgrams]]. */
case class CdcChunks(child: Expression, window: Int, maskBits: Int,
                     minLen: Int, maxLen: Int) extends UnaryExpression {
  require(window >= 2, s"window=$window must be >= 2")
  require(maskBits >= 1 && maskBits <= 20,
    s"maskBits=$maskBits outside [1,20]")
  require(minLen >= 1, s"minLen=$minLen must be >= 1")
  require(maxLen >= minLen, s"maxLen=$maxLen must be >= minLen=$minLen")

  override def prettyName: String = "cdc_chunks"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    CdcOps.chunks(a.asInstanceOf[UTF8String], window, maskBits, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.CdcOps.chunks($x, $window, $maskBits, $minLen, $maxLen);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object CdcFunctions {
  /** Content-defined chunks of `text`; expected chunk size ≈ 2^maskBits
    * bytes past `minLen`. Defaults give ~32-byte chunks for the gate
    * corpus; production corpora want maskBits 10–12 (1–4 KiB chunks),
    * minLen ≈ chunk/4, maxLen ≈ 4×chunk per the FastCDC guidance. */
  def cdcChunks(text: Column, window: Int = 16, maskBits: Int = 5,
                minLen: Int = 1, maxLen: Int = Int.MaxValue): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text),
      window, maskBits, minLen, maxLen))
}
