package graft

import graft.audit.{TableAudit, TableAuditSink}
import graft.calc.CalcEngine
import graft.io.ParquetTableStore
import graft.meta.MetaStore
import graft.params.ParamBinder
import java.time.Instant

class MetaAndAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("query defs + typed params round-trip through the meta store and drive CalcEngine") {
    val store = new ParquetTableStore(spark, tmpDir("meta"))
    val meta = new MetaStore(store)
    Seq((1L, 5.0), (2L, 50.0)).toDF("k", "v").createOrReplaceTempView("meta_src")
    meta.save(
      meta.QueryDef(6184L, "v_cache",
        "SELECT k, v FROM meta_src WHERE v > {vmin:Decimal(38,6)}",
        chTable = "db.res", oraTable = Some("msk.res"),
        copyByPartsCnt = 4, copyByPartField = Some("k"),
        copyToLocalCache = false),
      Seq(meta.ParamDef(6184L, "vmin", "Decimal(38,6)", 1)))

    val vq = meta.toViewQueryMeta(6184L, Map("vmin" -> "10"))
    assert(vq.name == "v_cache" && vq.copyByPartsCnt == 4)
    val out = new CalcEngine(spark, store).calc(vq)
    assert(out.as[(Long, Double)].collect().toSet == Set((2L, 50.0)))
  }

  test("missing or mistyped param values fail fast against declared types") {
    val store = new ParquetTableStore(spark, tmpDir("meta"))
    val meta = new MetaStore(store)
    meta.save(
      meta.QueryDef(7L, "q", "SELECT {n:UInt32}", "db.r", None, 1, None, false),
      Seq(meta.ParamDef(7L, "n", "UInt32", 1)))
    intercept[ParamBinder.MissingParam](meta.toViewQueryMeta(7L, Map.empty))
    intercept[IllegalArgumentException](
      meta.toViewQueryMeta(7L, Map("n" -> -5)))   // UInt32 range
  }

  test("table audit sink: buffer + flush persists, ids continue across instances") {
    val store = new ParquetTableStore(spark, tmpDir("audit"))
    val sink = new TableAuditSink(store)
    val id1 = sink.nextTaskId()
    sink.taskEvent(id1, "executing")
    sink.tableEvent(TableAudit(id1, "db.t", "recreate", "finished_recreate",
      10, 5, None, Instant.now()))
    sink.taskEvent(id1, "finished")
    assert(sink.events.size == 1)       // readable before flush
    sink.flush()
    assert(sink.events.size == 1)       // readable after flush (from table)
    assert(sink.taskEvents.map(_.status).toSet == Set("executing", "finished"))
    // a new sink over the same store continues the id sequence durably
    val sink2 = new TableAuditSink(store)
    assert(sink2.nextTaskId() == id1 + 1)
    assert(sink2.events.size == 1)      // sees persisted history
  }

  test("nextTaskId survives an existing-but-empty task_log (null max)") {
    val store = new ParquetTableStore(spark, tmpDir("audit"))
    val sink = new TableAuditSink(store)
    sink.taskEvent(sink.nextTaskId(), "executing")
    sink.flush()
    store.truncate("orach_meta.task_log")   // exists, zero rows
    val sink2 = new TableAuditSink(store)
    assert(sink2.nextTaskId() == 1L)        // no NPE, restarts cleanly
  }
}
