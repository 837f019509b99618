package graft

import graft.ops.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ops/Sketches KMV — bottom-k registers are the exact k smallest
  * distinct hashes, merge is lossless up to k, the distinct estimate
  * lands in its O(1/√k) band, and the union-sample Jaccard tracks the
  * true resemblance. */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private val hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    graft.llm.TextAnalysis.md5Hash60

  private def items(n: Int, salt: String = ""): DataFrame =
    spark.range(n.toLong).select(concat(lit(s"it$salt"), col("id"))
      .as("s"))

  test("registers = exact bottom-k distinct hashes, duplicates ignored") {
    val df = items(500).union(items(500)) // every value twice
    val regs = Sketches.kmvRegisters(df, col("s"), k = 32, hashFn)
    val got = regs.orderBy("pos").select("h").as[Long].collect().toSeq
    val want = items(500).select(hashFn(col("s")).as("h"))
      .distinct().orderBy("h").limit(32).as[Long].collect().toSeq
    assert(got == want && got.size == 32)
    assert(got == got.sorted && got.distinct == got)
  }

  test("merge of disjoint shards = sketch of the union") {
    val a = Sketches.kmvRegisters(items(400), col("s"), 64, hashFn)
    val b = Sketches.kmvRegisters(items(400, "x"), col("s"), 64, hashFn)
    val merged = Sketches.kmvMerge(a, b, 64)
    val direct = Sketches.kmvRegisters(
      items(400).union(items(400, "x")), col("s"), 64, hashFn)
    assert(merged.orderBy("pos").select("h").as[Long].collect().toSeq ==
      direct.orderBy("pos").select("h").as[Long].collect().toSeq)
  }

  test("distinct estimate within 3/√k of truth; small sets exact") {
    val n = 20000
    val k = 256
    val regs = Sketches.kmvRegisters(items(n), col("s"), k, hashFn)
    val est = Sketches.kmvEstimate(regs, k)
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - n) / n < 3.0 / math.sqrt(k),
      s"est $est vs true $n")
    val small = Sketches.kmvRegisters(items(100), col("s"), k, hashFn)
    assert(Sketches.kmvEstimate(small, k)
      .select("est_distinct").as[Double].head() == 100.0)
  }

  test("union-sample Jaccard tracks the true resemblance") {
    // A = [0, 3000), B = [1500, 4500) → |A∩B| = 1500, |A∪B| = 4500,
    // true J = 1/3
    val a = spark.range(0, 3000).select(concat(lit("j"), col("id")).as("s"))
    val b = spark.range(1500, 4500).select(concat(lit("j"), col("id")).as("s"))
    val k = 256
    val ra = Sketches.kmvRegisters(a, col("s"), k, hashFn)
    val rb = Sketches.kmvRegisters(b, col("s"), k, hashFn)
    val row = Sketches.kmvJaccard(ra, rb, k)
      .select("k_used", "n_common", "jacc_permille")
      .as[(Int, Long, Long)].head()
    assert(row._1 == k)
    val est = row._3 / 1000.0
    assert(math.abs(est - 1.0 / 3) < 3.0 / math.sqrt(k),
      s"jaccard est $est vs 1/3")
    // identical sketches → resemblance 1
    val self = Sketches.kmvJaccard(ra, ra, k)
      .select("jacc_permille").as[Long].head()
    assert(self == 1000L)
  }

  test("grouped sketches keep group isolation") {
    val df = spark.range(2000).select(
      concat(lit("g"), col("id")).as("s"),
      (col("id") % 2).cast("string").as("g"))
    val regs = Sketches.kmvRegisters(df, col("s"), 16, hashFn, Seq("g"))
    val perGroup = regs.groupBy("g").agg(count(lit(1)).as("n"),
      max("pos").as("maxpos"))
      .as[(String, Long, Long)].collect().toSet
    assert(perGroup == Set(("0", 16L, 16L), ("1", 16L, 16L)))
    // a group's registers must equal a standalone sketch of that group
    val only0 = Sketches.kmvRegisters(df.filter(col("g") === "0"),
      col("s"), 16, hashFn)
    assert(regs.filter(col("g") === "0").orderBy("pos").select("h")
      .as[Long].collect().toSeq ==
      only0.orderBy("pos").select("h").as[Long].collect().toSeq)
  }
}
