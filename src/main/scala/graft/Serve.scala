package graft

import graft.audit.InMemoryAuditSink
import graft.calc.{CalcEngine, ViewQueryMeta}
import graft.io.ParquetTableStore
import graft.ops.SyncEngine
import graft.orchestration.TaskRunner
import graft.server.WebShell
import org.apache.spark.sql.SparkSession

/** Run the REST shell against the sf0.001 fixtures:
  * `runMain graft.Serve [port]` (default 8081, reference
  * `resources/control.conf:1-4`). Tables resolve as <schema>.<name> →
  * /root/testdata/sf0.001/<name>.parquet; calc query "flagship" is the
  * SparkEntry flagship SQL. */
object Serve {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8081)
    val spark = GraftSession.local(4, "graft-serve")
    val sfDir = "/root/testdata/sf0.001"
    SparkEntry.registerViews(spark, sfDir)

    val store  = new ParquetTableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-serve").toString)
    val audit  = new InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)
    val calc   = new CalcEngine(spark, store)
    val metas = Map("flagship" -> ViewQueryMeta(name = "flagship",
      sqlText = SparkEntry.flagshipSql,
      params = Map("min_price" -> "1000.0", "min_nation_pad" -> "000",
                   "min_year" -> 1992L),
      chTable = "db.flagship_res"))
    val shell = new WebShell(runner, calc, audit,
      sources = full => spark.read.parquet(s"$sfDir/${full.split('.').last}.parquet"),
      pkColumns = Map("wh.supplier" -> Seq("s_suppkey")),
      calcMetas = metas, port = port).start()
    println(s"[serve] listening on ${shell.boundPort}")
    Thread.currentThread().join()
  }
}
