package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Measurement protocol (round-2 verdict: a single pass is too noisy to
  * adjudicate — unchanged queries swung 5–10× run-to-run on a busy VM;
  * round-4 verdict: back-to-back reps of ONE query share any sustained
  * noise window, so the per-query min doesn't protect — q27 recorded
  * 16.74 s while a clean re-run measured 2.44 s):
  * reps are INTERLEAVED — the full sorted query list runs as pass 1,
  * then pass 2, ... pass N (default 3), and each query reports the
  * MINIMUM across passes. A sustained noisy window now inflates one
  * pass of many queries instead of every rep of one query, and the min
  * across passes recovers the clean number. The first pass absorbs plan
  * compilation + codegen; a global warm-up action absorbs session init.
  *
  * Output: the bare JSON line is the LAST stdout line (build.sbt sets
  * `run / outputStrategy := StdoutOutput` so sbt's forked-run logger
  * cannot prefix it with [info]), and the same line is persisted to
  * SPARK_GRAFT_BENCH_OUT (default ./bench_out.json, cwd-relative).
  *
  * Line-size budget (round-5 verdict: the driver's tail window is 2000
  * bytes and the 81-query 3-decimal line was 2022 — `parsed: null` for
  * the third round running): per-query values are integer DECISECONDS
  * (`"qunit":"ds"` — round 7 moved ms→cs at 137 queries and cs→ds at
  * 157, each time a digit per entry; 0.1 s resolution stays inside
  * run-to-run noise for every query the verdicts scrutinize, and the
  * per-query MINIMUM across reps is what's recorded anyway),
  * per-query keys are the unique numeric
  * prefix of the SparkEntry.queries name (`"27":157` for
  * q27_minhash_pairs — the digits are how every round's verdict refers
  * to queries, and full 15-char-average names put the worst-case line
  * back over the window), and `sf` is the directory basename. BenchSpec
  * asserts the worst-case serialized line stays under 1980 bytes so
  * query growth cannot silently regress this again. A failed query
  * reports -1, never a fake timing.
  */
object Bench {

  /** Numeric prefix used as the compact per-query JSON key: `q174_kmv`
    * → `"174"`. The digits alone are unique by construction (BenchSpec
    * asserts it); the `q` was dropped at 178 queries — one byte per
    * entry was the cheapest capacity step left that keeps deciseconds
    * resolution (the ds→s step would cost a digit of precision on
    * every sub-10 s query, which is most of them). */
  def shortKey(name: String): String = name.takeWhile(_ != '_').drop(1)

  /** The one JSON line the driver parses. `results` carries integer
    * centiseconds per full query name (-1 = failure); `totalSec` is
    * seconds. Shared with BenchSpec so the size guard tests the real
    * serializer, not a re-implementation.
    *
    * `reps` records the interleaved-pass count behind each per-query
    * minimum (round-6 verdict: min-across-runs must be the RECORDED
    * artifact, not a protocol footnote). `nfail`/`failed` make a partial
    * run self-describing: a total computed with failed queries excluded
    * is NOT comparable to a green round's total, and cross-referencing
    * -1 sentinels shouldn't be required to notice (round-6 advice).
    * `failed` lists short keys, capped at 4 so a catastrophic run
    * cannot blow the driver's 2000-byte tail window. Per-query values
    * CLAMP at 999 ds (99.9 s): the artifact must be fixed-size by
    * construction, and a single query past 100 s at sf0.1 is a
    * catastrophic regression where the exact digit carries no
    * information — the clamped 999 reads as "investigate". */
  def serialize(results: Seq[(String, Long)], totalSec: Double, sfDir: String,
                reps: Int = 1): String = {
    // per-query values as ONE csv string in NUMERIC-ascending short-key
    // order (`"qorder":"numeric-asc"`), keys implicit — the structural
    // capacity step 197 queries forced: the per-entry `"193":` key
    // syntax (~7 B × queries) pushed the worst-case object form to
    // 1994 B. Decode rule (one line, also in NOTES.md): align the csv
    // with SparkEntry.queries short keys sorted as integers. Worst case
    // now ~4 B/query → headroom to ~400 queries at the 999-ds clamp.
    val qs = results
      .sortBy { case (k, _) => shortKey(k).toInt }
      .map { case (_, v) => math.min(v, 999L).toString }
      .mkString(",")
    val failed = results.filter(_._2 < 0).map(_._1)
    val failedJson = failed.take(4).map("\"" + shortKey(_) + "\"")
      .mkString("[", ",", "]")
    val sf = new java.io.File(sfDir).getName
    s"""{"metric":"total","value":$totalSec,"unit":"sec","qunit":"ds","reps":$reps,""" +
      s""""nfail":${failed.size},"failed":$failedJson,"qorder":"numeric-asc",""" +
      s""""qds":"$qs","sf":"$sf"}"""
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = GraftSession.builder(cpus.toInt, "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: session init, codegen compiler, parquet footer reads
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // pass-major order: every query once per pass, min across passes
    val timesByQuery = scala.collection.mutable.LinkedHashMap(
      names.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    for (_ <- 1 to reps; (name, fn) <- names) {
      // each rep must pay the full query: operators that persist() their
      // result would otherwise be cache-substituted in reps 2+ (identical
      // canonicalized plans) and the reported minimum would time a cache
      // scan, not the query
      spark.catalog.clearCache()
      // clearCache() only drops CATALOG-cached Datasets; blocks pinned by
      // operator-internal persist()/localCheckpoint() (iterative graph
      // ops, index builds) outlive their query and accumulated across the
      // 200+-query run until the block manager ran hot — BENCH_r07
      // recorded q100 at 7.9 s where an isolated BenchOne min is 1.5 s.
      // Dropping every persistent RDD between queries (blocking, so the
      // release is not racing the next timed region) restores per-query
      // isolation without a session restart.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      // a failed query reports -1.0, never a fake timing — a regression
      // must read as breakage, not as a faster run
      val t =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0 }
      timesByQuery(name) = timesByQuery(name) :+ t
    }
    def round3(v: Double): Double = math.rint(v * 1000) / 1000
    val results = timesByQuery.toSeq.map { case (name, ts) =>
      name -> (if (ts.exists(_ < 0)) -1L else math.rint(ts.min * 10).toLong)
    }
    val total = round3(results.map(_._2).filter(_ >= 0).sum / 10.0)
    val json = serialize(results, total, sfDir, reps)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] $outPath write failed: ${e.getMessage}") }
    spark.stop()
    println(json)
  }
}
