package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity (Winkler 1990) as a native codegen
  * expression — the record-linkage comparator for SHORT identity
  * fields (names, addresses) where edit distance over-penalizes
  * transpositions and prefix typos: "MARTHA"/"MARHTA" scores 0.961
  * where levenshtein says 2 edits. The natural companion to
  * `ops/EntityResolution`'s exact/prefix agreement fields — use it as
  * a graded comparator inside blocks the same way
  * `Dedup.editDistanceVerify` grades candidate pairs.
  *
  * EXACT INTEGER contract: the entire score is one rational —
  * doubled-transposition form
  * `jaro = (2m²(|a|+|b|) + (2m−k)·|a||b|) / (6·|a||b|·m)` (k = out-of-
  * order matched positions, so t = k/2 never materializes as a
  * fraction), Winkler boost folded in as
  * `jw = (N·(10−l) + l·D) / (10·D)` with l = common prefix ≤ 4 —
  * surfaced as `floor(10⁶·num/den)` parts-per-million. No float ever
  * appears, so the score is bit-identical on every platform (the
  * reason this is NOT delegated to a library double: two engines'
  * float JW disagree in the last ulp and flip threshold comparisons).
  *
  * Semantics pinned: UTF-16 code-unit equality, case-sensitive
  * (normalize upstream); match window ⌊max/2⌋−1 (min 0); unconditional
  * Winkler boost (no 0.7 boost-threshold variant), p = 0.1, prefix
  * capped at 4; both-empty → 10⁶, one-empty → 0. Strings past 4000
  * code units fail LOUD (the 10⁶-scaled numerator would overflow a
  * long; identity fields that long are corrupt input, not a use case).
  */
object JwOps {
  val MaxLen = 4000

  def ppm(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length; val lb = b.length
    require(la <= MaxLen && lb <= MaxLen,
      s"jaro_winkler_ppm input exceeds $MaxLen chars ($la, $lb)")
    if (la == 0 && lb == 0) return 1000000L
    if (la == 0 || lb == 0) return 0L
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // k = matched positions whose characters disagree in match order
    var k = 0
    var bi = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(bi)) bi += 1
        if (a.charAt(i) != b.charAt(bi)) k += 1
        bi += 1
      }
      i += 1
    }
    var l = 0
    while (l < 4 && l < la && l < lb && a.charAt(l) == b.charAt(l)) l += 1
    val mm = m.toLong
    val num = 2L * mm * mm * (la + lb) + (2L * mm - k) * la * lb
    val den = 6L * la * lb * mm
    (1000000L * (num * (10L - l) + l * den)) / (10L * den)
  }
}

/** `jaro_winkler_ppm(a, b)` — exact integer Jaro–Winkler, see [[JwOps]]. */
case class JaroWinklerPpm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler_ppm"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JwOps.ppm(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |${ev.value} = graft.functions.JwOps.ppm($x, $y);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

object StringSimilarityFunctions {
  def jaroWinklerPpm(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerPpm(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
