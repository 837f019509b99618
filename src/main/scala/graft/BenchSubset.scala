package graft

/** Bench's EXACT interleaved-pass methodology over a NAMED SUBSET of
  * queries — the dev-loop A/B tool round 12's verdict asked for
  * ("bench ... in the repo bench, not BenchOne"): BenchOne's
  * back-to-back reps measure a cold-JIT fresh session and are not
  * comparable to full-Bench numbers, while a full 382-query run costs
  * ~15 min per data point. This main copies Bench's protocol —
  * warm-up action, pass-major interleaving, per-query cache clear +
  * blocking unpersist of pinned blocks, min across passes, count()
  * sink — so subset numbers sit on the same axis as full-Bench
  * per-query values (modulo the shorter pass absorbing less ambient
  * noise). The one-line JSON goes to stdout with full query names
  * (no driver tail-window budget here).
  *
  * Usage: `runMain graft.BenchSubset <name[,name...]> [reps]` with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench. Bench itself is
  * UNTOUCHED — this is a separate tool, not a harness change. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val wanted = args(0).split(',').toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus.toInt, "graft-bench-subset").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = wanted.map(n => n -> SparkEntry.queries(n))
    val timesByQuery = scala.collection.mutable.LinkedHashMap(
      names.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    for (_ <- 1 to reps; (name, fn) <- names) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val t =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[benchsubset] $name FAILED: ${e.getMessage}"); -1.0 }
      timesByQuery(name) = timesByQuery(name) :+ t
    }
    val mins = timesByQuery.toSeq.map { case (n, ts) =>
      n -> (if (ts.exists(_ < 0)) -1.0 else math.rint(ts.min * 1000) / 1000)
    }
    val total = math.rint(mins.map(_._2).filter(_ >= 0).sum * 1000) / 1000
    val qs = mins.map { case (n, v) => s""""$n":$v""" }.mkString(",")
    println(s"""{"metric":"subset","value":$total,"unit":"sec","reps":$reps,"queries":{$qs},"sf":"${new java.io.File(sfDir).getName}"}""")
    spark.stop()
  }
}
