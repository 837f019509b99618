package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by [[WordNgrams]]'s eval and codegen — the
  * eval/codegen-parity-by-construction pattern of DecimalVecOps. */
object TextOps {
  /** Word n-grams of a single-space-tokenized string, joined by single
    * spaces. Tokenization parity with `split(text, " ")` (java regex,
    * limit -1): consecutive spaces yield empty tokens, leading/trailing
    * empties kept. Strings with fewer than n tokens → empty array. */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // literal-space split == regex " " with limit -1
    var nTok = 1
    var i = 0
    while (i < str.length) { if (str.charAt(i) == ' ') nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    var start = 0; var t = 0
    i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') { toks(t) = str.substring(start, i); t += 1; start = i + 1 }
      i += 1
    }
    toks(t) = str.substring(start)
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    val sb = new java.lang.StringBuilder
    var g = 0
    while (g <= nTok - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(g + k))
        k += 1
      }
      out(g) = UTF8String.fromString(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }
}

/** Native word-n-gram expression — the corpus-wide hot loop of every
  * shingling stage (MinHash/SimHash dedup, n-gram Jaccard, bigram LM).
  *
  * The combinator form (`transform(sequence(...), i => concat_ws(" ",
  * element_at(split(text), ...)))`) is a higher-order lambda —
  * CodegenFallback — and, worse, the interpreter re-evaluates the
  * `split(text)` subtree for EVERY emitted gram element: tokenizing one
  * document costs O(tokens²) characters (found while profiling q66 —
  * the bigram model over a 270k-token corpus spent seconds splitting).
  * This expression tokenizes once per row and emits all grams in one
  * fused pass; output is element-for-element identical to the lambda
  * form (spec-pinned), which is retained as
  * `TextShingles.wordNgramsReference` for the parity spec.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n=$n must be >= 1")

  override def prettyName: String = "word_ngrams"
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
    TextOps.wordNgrams(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.TextOps.wordNgrams($x, $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object TextFunctions {
  def wordNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))
}
