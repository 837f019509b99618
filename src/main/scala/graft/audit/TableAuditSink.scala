package graft.audit

import graft.io.TableStore
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Audit sink persisted to warehouse tables — the durable analog of the
  * reference's Oracle audit relations (`ora_to_ch_tasks` /
  * `ora_to_ch_tasks_tables` / `ora_to_ch_query_log`,
  * `ora/jdbcSession.scala:429-446,518-542,40-197`).
  *
  * Events buffer in memory and flush on demand (a per-event single-row
  * append would dominate small tasks); `events`/`taskEvents` serve reads
  * from the buffer + table union so nothing is lost before a flush.
  */
final class TableAuditSink(store: TableStore, db: String = "orach_meta")
    extends AuditSink {

  private var mem = new InMemoryAuditSink
  private val tableT = s"$db.table_log"
  private val taskT  = s"$db.task_log"

  private val tableSchema = StructType(Seq(
    StructField("task_id", LongType, false),
    StructField("table_name", StringType, false),
    StructField("operation", StringType, false),
    StructField("status", StringType, false),
    StructField("rows_copied", LongType, false),
    StructField("speed_rows_sec", LongType, false),
    StructField("error", StringType, true),
    StructField("at_ms", LongType, false)))

  private val taskSchema = StructType(Seq(
    StructField("task_id", LongType, false),
    StructField("status", StringType, false),
    StructField("at_ms", LongType, false)))

  override def nextTaskId(): Long = synchronized {
    // durable id: continue after the highest persisted task id.
    // SINGLE-WRITER contract: `synchronized` serializes allocation only
    // within this JVM — the audit store is owned by one engine process
    // (matching the reference, where one orach service owns its Oracle
    // audit tables). Two processes sharing a warehouse could both read
    // the same persisted max and issue duplicate ids; deploy one writer
    // per store, or front ids with an external sequence.
    val base =
      if (store.exists(taskT)) {
        val row = store.read(taskT)
          .agg(org.apache.spark.sql.functions.max("task_id")).head()
        if (row.isNullAt(0)) 0L else row.getLong(0)   // empty table → null max
      } else 0L
    val next = math.max(base, lastIssued) + 1
    lastIssued = next
    next
  }
  private var lastIssued = 0L

  // all buffer access synchronized against flush()'s buffer swap — an
  // event emitted concurrently with a flush must land in either the
  // persisted batch or the fresh buffer, never a discarded one
  override def taskEvent(taskId: Long, status: String): Unit =
    synchronized { mem.taskEvent(taskId, status) }
  override def tableEvent(e: TableAudit): Unit =
    synchronized { mem.tableEvent(e) }
  // reads hold the lock across BOTH sources: a flush between the buffer
  // snapshot and the table read would return the same event twice
  override def events: Seq[TableAudit] =
    synchronized { mem.events ++ persistedTableEvents }
  override def taskEvents: Seq[TaskAudit] =
    synchronized { mem.taskEvents ++ persistedTaskEvents }

  /** Persist buffered events and clear the buffer. */
  override def flush(): Unit = synchronized {
    val spark = store.spark
    val te = mem.events
    if (te.nonEmpty) {
      store.append(tableT, spark.createDataFrame(
        java.util.Arrays.asList(te.map(e => Row(e.taskId, e.table, e.operation,
          e.status, e.rowsCopied, e.speedRowsSec, e.error.orNull,
          e.at.toEpochMilli)): _*), tableSchema))
    }
    val ke = mem.taskEvents
    if (ke.nonEmpty) {
      store.append(taskT, spark.createDataFrame(
        java.util.Arrays.asList(ke.map(k =>
          Row(k.taskId, k.status, k.at.toEpochMilli)): _*), taskSchema))
    }
    mem = new InMemoryAuditSink   // buffer cleared; events now in tables
  }

  private def persistedTableEvents: Seq[TableAudit] =
    if (!store.exists(tableT)) Nil
    else store.read(tableT).collect().toSeq.map(r => TableAudit(
      r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
      r.getLong(4), r.getLong(5), Option(r.getString(6)),
      java.time.Instant.ofEpochMilli(r.getLong(7))))

  private def persistedTaskEvents: Seq[TaskAudit] =
    if (!store.exists(taskT)) Nil
    else store.read(taskT).collect().toSeq.map(r =>
      TaskAudit(r.getLong(0), r.getString(1),
        java.time.Instant.ofEpochMilli(r.getLong(2))))
}
