package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of up to 8 dimension values — the sort
  * key behind multi-column data clustering: rows close in EVERY keyed
  * dimension land close on the Z-curve, so range-partitioning by the
  * code gives files whose per-column min/max spans are all narrow and
  * parquet row-group skipping works for predicates on ANY of the keyed
  * columns (a single-column sort only prunes its own column).
  *
  * Bit layout: output bit (i * ndims + d) = bit i of child d. Children
  * must already be normalized to [0, 2^bitsPerDim) longs (see
  * graft.ops.Layout for min/max scaling); values are clamped to the
  * range, NULL contributes 0. ndims * bitsPerDim must fit in 63 bits.
  * Proper codegen — this runs over every row of a table being laid out.
  */
case class ZOrderCode(children: Seq[Expression], bitsPerDim: Int)
    extends Expression {
  require(children.nonEmpty && children.size <= 8,
    s"zorder takes 1..8 dimensions, got ${children.size}")
  require(bitsPerDim >= 1 && children.size * bitsPerDim <= 63,
    s"ndims*bitsPerDim = ${children.size * bitsPerDim} must be <= 63")

  override def prettyName: String = "zorder_code"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects BIGINT dims, got " +
          children.map(_.dataType.simpleString).mkString(", "))

  private def maxVal: Long = (1L << bitsPerDim) - 1

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    var code = 0L
    var d = 0
    while (d < n) {
      val raw = children(d).eval(input)
      val v0 = if (raw == null) 0L else raw.asInstanceOf[Long]
      val v = math.min(math.max(v0, 0L), maxVal)
      var i = 0
      while (i < bitsPerDim) {
        code |= ((v >>> i) & 1L) << (i * n + d)
        i += 1
      }
      d += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val n = children.size
    val zcode = ctx.freshName("zcode")
    val evals = children.zipWithIndex.map { case (c, d) =>
      val e = c.genCode(ctx)
      val v = ctx.freshName("zv")
      val i = ctx.freshName("zi")
      s"""
         |${e.code}
         |long $v = ${e.isNull} ? 0L : (long) ${e.value};
         |$v = java.lang.Math.min(java.lang.Math.max($v, 0L), ${maxVal}L);
         |for (int $i = 0; $i < $bitsPerDim; $i++) {
         |  $zcode |= (($v >>> $i) & 1L) << ($i * $n + $d);
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code =
        code"""
           |long $zcode = 0L;
           |$evals
           |long ${ev.value} = $zcode;
         """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderFunctions {
  /** Column API: `zorderCode(Seq(cx, cy), 16)` — children must be
    * BIGINT already scaled to [0, 2^bits). */
  def zorderCode(dims: Seq[Column], bitsPerDim: Int): Column =
    ColumnBridge.column(
      ZOrderCode(dims.map(ColumnBridge.expression), bitsPerDim))
}
