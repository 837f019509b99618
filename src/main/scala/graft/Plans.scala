package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: dumps `.explain("formatted")` for every query
  * (or the ones named in args) — the iterate-on-the-plan loop the builder
  * prompt calls for. Check: PushedFilters reach the scan, ReadSchema is
  * pruned, small dims broadcast, WholeStageCodegen spans are wide. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(4, "graft-plans")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
                 else args.toSeq
    wanted.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    }
    spark.stop()
  }
}
