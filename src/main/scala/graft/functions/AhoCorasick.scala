package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975) — the
  * standard pretraining blocklist / dirty-word / PII-keyword filter:
  * ONE left-to-right scan of each document finds every occurrence of
  * every pattern, however many thousands of patterns the list holds,
  * where a per-pattern `contains` loop would rescan the document |P|
  * times and a `LIKE ANY` regex alternation backtracks.
  *
  * The automaton is built once on the DRIVER from the pattern list
  * (goto trie + BFS failure links with output-set accumulation) and
  * ships to executors inside the expression via Java serialization of
  * the PATTERNS ONLY — the trie arrays are `@transient lazy`, rebuilt
  * per executor JVM on first use. Build is O(Σ|p|) time/space; a
  * 100k-entry blocklist is a few MB, far under broadcast scale.
  *
  * Matching semantics (the gate-pinned contract):
  *   - raw case-sensitive UTF-16 char equality (callers wanting
  *     case-insensitive or NFC-robust matching lower()/nfc-normalize
  *     BOTH sides upstream — composition, not hidden flags);
  *   - ALL occurrences count, including overlapping ones and patterns
  *     nested inside other patterns' matches ("aa" occurs twice in
  *     "aaa"; "a" and "ab" both hit in "ab") — each pattern occurrence
  *     is an event at its end position, the textbook output function;
  *   - empty patterns are rejected at construction (they would "match"
  *     at every position), duplicates rejected (ambiguous ids).
  */
object AcOps {

  /** Immutable, serializable automaton. Only `patterns` crosses the
    * wire; the trie is rebuilt lazily per JVM. */
  final class AcAutomaton(val patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")
    require(patterns.distinct.length == patterns.length,
      s"duplicate patterns in blocklist")

    // trie: per-node char→child; fail: failure links; outs: pattern ids
    // ending at the node (own + accumulated from the failure chain)
    @transient private lazy val built: (Array[java.util.HashMap[Character, Integer]],
        Array[Int], Array[Array[Int]]) = {
      val next = scala.collection.mutable.ArrayBuffer(
        new java.util.HashMap[Character, Integer]())
      val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      var pid = 0
      while (pid < patterns.length) {
        val p = patterns(pid)
        var v = 0
        var i = 0
        while (i < p.length) {
          val c = Character.valueOf(p.charAt(i))
          val nxt = next(v).get(c)
          if (nxt == null) {
            next += new java.util.HashMap[Character, Integer]()
            ends += Nil
            next(v).put(c, next.length - 1)
            v = next.length - 1
          } else v = nxt.intValue()
          i += 1
        }
        ends(v) = pid :: ends(v)
        pid += 1
      }
      val n = next.length
      val fail = new Array[Int](n)
      val outs = new Array[Array[Int]](n)
      outs(0) = ends(0).toArray
      // BFS: children of the root fail to the root; deeper nodes fail
      // to fail-parent's transition, and inherit its output set
      val q = new java.util.ArrayDeque[Integer]()
      next(0).forEach { (_, u) => fail(u) = 0; q.add(u) }
      while (!q.isEmpty) {
        val v = q.poll().intValue()
        outs(v) = (ends(v) ++ outs(fail(v))).toArray
        next(v).forEach { (c, u) =>
          var f = fail(v)
          while (f != 0 && next(f).get(c) == null) f = fail(f)
          val t = next(f).get(c)
          fail(u.intValue()) =
            if (t == null || t.intValue() == u.intValue()) 0 else t.intValue()
          q.add(u)
        }
      }
      (next.toArray, fail, outs)
    }

    /** Per-pattern occurrence counts over `text` — one scan. */
    def countAll(text: String): Array[Long] = {
      val (next, fail, outs) = built
      val counts = new Array[Long](patterns.length)
      var v = 0
      var i = 0
      while (i < text.length) {
        val c = Character.valueOf(text.charAt(i))
        while (v != 0 && next(v).get(c) == null) v = fail(v)
        val t = next(v).get(c)
        v = if (t == null) 0 else t.intValue()
        val out = outs(v)
        var k = 0
        while (k < out.length) { counts(out(k)) += 1; k += 1 }
        i += 1
      }
      counts
    }

    /** Sparse match summary as Catalyst data:
      * array<struct<pid int, occ bigint>> ascending by pid, only
      * patterns with occ > 0. Shared by eval and codegen. */
    def matchesSparse(text: UTF8String): ArrayData = {
      val counts = countAll(text.toString)
      var nHit = 0
      var i = 0
      while (i < counts.length) { if (counts(i) > 0) nHit += 1; i += 1 }
      val out = new Array[Any](nHit)
      var j = 0
      i = 0
      while (i < counts.length) {
        if (counts(i) > 0) {
          out(j) = new GenericInternalRow(Array[Any](i, counts(i)))
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  val matchStructType: StructType = StructType(Seq(
    StructField("pid", IntegerType, nullable = false),
    StructField("occ", LongType, nullable = false)))
}

/** `ac_matches(text)`: sparse per-pattern occurrence counts of the
  * constructor-bound blocklist — array<struct<pid, occ>>, ascending
  * pid, hit patterns only. Stays inside whole-stage codegen (the
  * generated code calls the same kernel as eval through a referenced
  * automaton object). */
case class AcMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  @transient private lazy val automaton =
    new AcOps.AcAutomaton(patterns.toArray)

  override def prettyName: String = "ac_matches"
  override def dataType: DataType =
    ArrayType(AcOps.matchStructType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    automaton.matchesSparse(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcOps.AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = $autoRef.matchesSparse($x);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object AcFunctions {
  def acMatches(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AcMatches(ColumnBridge.expression(text), patterns))
}
