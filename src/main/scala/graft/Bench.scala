package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Measurement protocol (round-2 verdict: a single pass is too noisy to
  * adjudicate — unchanged queries swung 5–10× run-to-run on a busy VM):
  * each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports
  * the per-query MINIMUM — the estimator least sensitive to external
  * contention; "value" is the sum of the minimums. The first rep absorbs
  * plan compilation + codegen; a global warm-up action absorbs session
  * init. Queries run in sorted name order.
  *
  * Output: the bare JSON line is the LAST stdout line (build.sbt sets
  * `run / outputStrategy := StdoutOutput` so sbt's forked-run logger
  * cannot prefix it with [info]), and the same line is persisted to
  * SPARK_GRAFT_BENCH_OUT (default ./bench_out.json, cwd-relative).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = GraftSession.builder(cpus.toInt, "graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: session init, codegen compiler, parquet footer reads
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failed query reports -1.0, never a fake timing — a regression
      // must read as breakage, not as a faster run
      val times = (1 to reps).map { _ =>
        // each rep must pay the full query: operators that persist() their
        // result would otherwise be cache-substituted in reps 2+ (identical
        // canonicalized plans) and the reported minimum would time a cache
        // scan, not the query
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0 }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] $outPath write failed: ${e.getMessage}") }
    spark.stop()
    println(json)
  }
}
