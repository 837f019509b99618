package graft.audit

import java.time.Instant
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Task/calc state machine + audit trail.
  *
  * The reference keeps all of this in Oracle tables
  * (`ora_to_ch_tasks`, `ora_to_ch_tasks_tables`, `ora_to_ch_query_log` —
  * `ora/jdbcSession.scala:429-446,518-542,592-615,40-197`) and an
  * in-memory repo guarding single-flight (`task/TaskRepo.scala:13-58`,
  * states `common/State.scala:5-24`). Here: a pluggable sink trait with an
  * in-memory implementation; a JDBC/table-backed sink drops in without
  * touching the runner.
  */
sealed trait EngineState
object EngineState {
  case object Ready       extends EngineState
  case object Wait        extends EngineState
  case object Executing   extends EngineState
  case object Calculation extends EngineState
  case object Copying     extends EngineState
}

final case class TableAudit(
    taskId: Long, table: String, operation: String,
    status: String,                    // begin | copying | finished_<oper> | error
    rowsCopied: Long, speedRowsSec: Long,
    error: Option[String], at: Instant)

final case class TaskAudit(taskId: Long, status: String, at: Instant)

trait AuditSink {
  def nextTaskId(): Long
  def taskEvent(taskId: Long, status: String): Unit
  def tableEvent(e: TableAudit): Unit
  def events: Seq[TableAudit]
  def taskEvents: Seq[TaskAudit]
  /** Durability point (no-op for in-memory sinks); TaskRunner calls it
    * when a task leaves the Executing state. */
  def flush(): Unit = ()
}

final class InMemoryAuditSink extends AuditSink {
  private val ids = new java.util.concurrent.atomic.AtomicLong(0)
  private val tq  = new ConcurrentLinkedQueue[TableAudit]()
  private val kq  = new ConcurrentLinkedQueue[TaskAudit]()
  override def nextTaskId(): Long = ids.incrementAndGet()
  override def taskEvent(taskId: Long, status: String): Unit =
    kq.add(TaskAudit(taskId, status, Instant.now()))
  override def tableEvent(e: TableAudit): Unit = tq.add(e)
  override def events: Seq[TableAudit] = tq.asScala.toSeq
  override def taskEvents: Seq[TaskAudit] = kq.asScala.toSeq
}
