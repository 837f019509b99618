package graft

/** Time one or more SparkEntry queries repeatedly — the stage-audit
  * companion to [[Bench]] (same session config, same count() sink).
  * Usage: `runMain graft.BenchOne <name[,name...]> [reps]` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Multiple names
  * share one session (scale-rehearsal loops would otherwise pay ~15 s
  * of session startup per query); reps stay back-to-back per query —
  * for cross-round artifacts use Bench's interleaved passes. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus.toInt, "graft-bench-one").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        spark.catalog.clearCache()   // see Bench: no cross-rep cache reuse
        spark.sparkContext.getPersistentRDDs.values   // and no pinned blocks
          .foreach(_.unpersist(blocking = true))      // from rep to rep
        val t0 = System.nanoTime()
        val t =
          try {
            val n = fn(spark, sfDir).count()
            val secs = (System.nanoTime() - t0) / 1e9
            println(f"[benchone] $name rep$i: $secs%.3f s ($n rows)")
            secs
          } catch { case e: Throwable =>
            println(s"[benchone] $name rep$i FAILED: ${e.getMessage}")
            -1.0
          }
        t
      }
      if (times.forall(_ >= 0))
        println(f"[benchone] $name min=${times.min}%.3f s over $reps reps")
      else println(s"[benchone] $name FAILED")
    }
    spark.stop()
  }
}
