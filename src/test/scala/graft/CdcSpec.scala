package graft

import graft.functions.{CdcFunctions, CdcOps}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** functions/CdcExpressions — content-defined chunking kernel:
  * driver-reference parity, lossless reassembly, min/max bound
  * enforcement, and the property the operator exists for —
  * edit-locality of chunk identities. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private val P = 1000003L
  private val B = 257L

  /** Independent driver reference of the documented boundary rule. */
  private def ref(text: String, w: Int, maskBits: Int,
                  minLen: Int = 1, maxLen: Int = Int.MaxValue): Seq[String] = {
    val bs = text.getBytes("UTF-8")
    val n = bs.length
    if (n == 0) return Seq.empty
    val bw = (1 to w).foldLeft(1L)((a, _) => a * B % P)
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var h = 0L; var start = 0
    for (i <- 0 until n) {
      h = (h * B + (bs(i) & 0xff)) % P
      if (i >= w) h = (h - (bs(i - w) & 0xff) * bw % P + P) % P
      val len = i - start + 1
      val boundary = i >= w - 1 && (h & mask) == 0L
      if (i < n - 1 && ((boundary && len >= minLen) || len >= maxLen)) {
        out += new String(bs, start, i + 1 - start, "UTF-8"); start = i + 1
      }
    }
    out += new String(bs, start, n - start, "UTF-8")
    out.toSeq
  }

  private def run(texts: Seq[String], w: Int = 16, maskBits: Int = 5,
                  minLen: Int = 1, maxLen: Int = Int.MaxValue) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        CdcFunctions.cdcChunks(col("text"), w, maskBits, minLen, maxLen)
          .as("chunks"))
      .as[(Long, Seq[String])].collect().sortBy(_._1).map(_._2)

  test("expression equals the driver reference on random ASCII strings") {
    val rnd = new scala.util.Random(7)
    val texts = Seq.tabulate(60)(i =>
      (0 until rnd.nextInt(400)).map(_ => (32 + rnd.nextInt(95)).toChar)
        .mkString)
    val got = run(texts)
    texts.zip(got).foreach { case (t, chunks) =>
      assert(chunks == ref(t, 16, 5), s"mismatch on <$t>")
      assert(chunks.mkString == t, "reassembly must be lossless")
    }
  }

  test("short and empty inputs: no boundary fits, one chunk (or none)") {
    assert(run(Seq("")).toSeq == Seq(Seq.empty))
    val direct = CdcOps.chunks(UTF8String.fromString(""), 16, 5, 1, Int.MaxValue)
    assert(direct.numElements() == 0)
    assert(run(Seq("tiny")).toSeq == Seq(Seq("tiny")))
    assert(run(Seq("a" * 15)).toSeq == Seq(Seq("a" * 15)))
  }

  test("maxLen forces cuts; minLen suppresses early boundaries") {
    val rnd = new scala.util.Random(11)
    val t = (0 until 500).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val bounded = run(Seq(t), maskBits = 4, minLen = 24, maxLen = 48).head
    assert(bounded == ref(t, 16, 4, 24, 48))
    assert(bounded.mkString == t)
    assert(bounded.dropRight(1).forall(c => c.length >= 24 && c.length <= 48))
    assert(bounded.last.length <= 48)
    // degenerate constant input never masks to zero? still bounded by maxLen
    val const = run(Seq("x" * 300), maskBits = 20, minLen = 1, maxLen = 64).head
    assert(const.mkString == "x" * 300)
    assert(const.dropRight(1).forall(_.length == 64))
  }

  test("edit locality: a prefix insertion leaves distant chunks intact") {
    val rnd = new scala.util.Random(23)
    val base = (0 until 2000).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    val edited = "INSERTED PREFIX >>> " + base
    val Array(a, b) = run(Seq(base, edited), maskBits = 5)
    // content-defined: the chunk multisets re-align after the edit — the
    // overwhelming majority of base chunks survive identically
    val shared = a.toSet.intersect(b.toSet)
    assert(a.size >= 30, s"fixture too small: ${a.size} chunks")
    assert(shared.size >= a.size - 3,
      s"only ${shared.size}/${a.size} chunks survived a prefix edit")
    // fixed-size chunking would shift EVERYTHING: demonstrate the contrast
    val fixedA = base.grouped(32).toSet
    val fixedB = edited.grouped(32).toSet
    assert(fixedA.intersect(fixedB).size < shared.size / 2,
      "fixed-size grouping should lose alignment where CDC keeps it")
  }

  test("null propagates; guards fail loud") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("hello world here")))
      .toDF("id", "text")
      .select(col("id"), CdcFunctions.cdcChunks(col("text")).as("c"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[String](1).mkString == "hello world here")
    def ex = org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit("x"))
    intercept[IllegalArgumentException] {
      graft.functions.CdcChunks(ex, window = 1, maskBits = 5,
        minLen = 1, maxLen = 2)
    }
    intercept[IllegalArgumentException] {
      graft.functions.CdcChunks(ex, window = 16, maskBits = 0,
        minLen = 1, maxLen = 2)
    }
    intercept[IllegalArgumentException] {
      graft.functions.CdcChunks(ex, window = 16, maskBits = 5,
        minLen = 4, maxLen = 2)
    }
  }
}
