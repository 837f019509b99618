package graft

import graft.audit.InMemoryAuditSink
import graft.io.ParquetTableStore
import graft.ops._
import graft.orchestration.TaskRunner
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end task demo over the sf0.001 fixtures: one two-wave task
  * (recreate + append_bymax + update) through TaskRunner, printing the
  * audit trail — the §3.1/§3.2 lifecycles on real data.
  *
  * `runMain graft.TaskDemo [sfDir] [--catalog]`: --catalog targets real
  * Spark catalog tables (CatalogTableStore) instead of parquet dirs. */
object TaskDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.001")
    val useCatalog = args.contains("--catalog")
    val spark = GraftSession.builder(4, "graft-taskdemo")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-demo-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val store: graft.io.TableStore =
      if (useCatalog) new graft.io.CatalogTableStore(spark)
      else new ParquetTableStore(spark, root)
    // --table-audit: persist the audit trail to warehouse tables (the
    // reference's ora_to_ch_* relations) instead of memory only
    val audit: graft.audit.AuditSink =
      if (args.contains("--table-audit"))
        new graft.audit.TableAuditSink(store)
      else new InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)

    def read(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")

    // wave 1: full load of nation; filtered load of orders
    // wave 2: update supplier balances for nation 1 (runs after)
    val task = TaskSpec(Seq(
      TableSpec(SyncOp.Recreate, "wh", "nation"),
      TableSpec(SyncOp.Recreate, "wh", "orders",
        whereFilter = Some("o_totalprice > 100000.0")),
      TableSpec(SyncOp.Update, "wh", "supplier",
        updateFields = Some(Seq("s_acctbal")))), degree = 4)

    // seed the update target, then run
    store.overwrite("wh.supplier", read("supplier"))
    val taskId = runner.run(task, {
      case "wh.nation"   => read("nation")
      case "wh.orders"   => read("orders")
      case "wh.supplier" => read("supplier")
        .filter(col("s_nationkey") === 1)
        .withColumn("s_acctbal", col("s_acctbal") * 2)
    }, pkColumns = Map("wh.supplier" -> Seq("s_suppkey")))

    println(s"[demo] taskId=$taskId state=${runner.currentState}")
    audit.events.sortBy(_.at).foreach(e =>
      println(s"[demo] ${e.at} ${e.table} ${e.operation} ${e.status} rows=${e.rowsCopied}"))
    println(s"[demo] wh.nation=${store.count("wh.nation")} " +
      s"wh.orders=${store.count("wh.orders")} wh.supplier=${store.count("wh.supplier")}")
    spark.stop()
  }
}
