package graft.ops

/** The 5 per-table sync operations and their request-time invariants.
  *
  * Mirrors `request/OperType.scala:3-56` (operation semantics, doc-comments
  * preserved in SyncEngine) and the constructor-time validation of
  * `request/ReqNewTask.scala:28-61` — the reference's only fail-fast
  * correctness layer (SURVEY.md §5.2), ported as `TableSpec.validate`.
  */
sealed trait SyncOp { def operStr: String; def isRecreate: Boolean = false }
object SyncOp {
  case object Recreate    extends SyncOp { val operStr = "recreate"; override val isRecreate = true }
  case object AppendWhere extends SyncOp { val operStr = "append_where" }
  case object AppendNotIn extends SyncOp { val operStr = "append_notin" }
  case object AppendByMax extends SyncOp { val operStr = "append_bymax" }
  case object Update      extends SyncOp { val operStr = "update" }
  val all: Seq[SyncOp] = Seq(Recreate, AppendWhere, AppendNotIn, AppendByMax, Update)
}

final case class InvalidTableSpec(msg: String) extends RuntimeException(msg)

/** One table's sync request — field-for-field the reference's `OneTable`
  * (`request/ReqNewTask.scala:7-25`), minus the Oracle-session context
  * fields which become source options (SURVEY.md C8).
  */
final case class TableSpec(
    operation: SyncOp,
    schema: String,
    name: String,
    onlyColumns: Option[Seq[String]] = None,        // only_columns   (P1)
    whereFilter: Option[String] = None,             // where_filter   (P2)
    syncByColumnMax: Option[String] = None,         // append_bymax watermark col (P3)
    updateFields: Option[Seq[String]] = None,       // update op column list (P5)
    syncByColumns: Option[Seq[String]] = None,      // append_notin key cols (P4)
    syncUpdateByColumnMax: Option[String] = None,   // update watermark (W6)
    clrOraTableAftUpd: Option[String] = None,       // post-update staging cleanup
    orderByOraData: Option[String] = None,          // source-side ORDER BY (O1)
    srcTableFullName: Option[String] = None,
    curDateContext: Option[String] = None,
    analytDatecalc: Option[String] = None
) {
  import SyncOp._
  def fullName: String = s"$schema.$name"

  /** The 9 invariants of `request/ReqNewTask.scala:28-61`. */
  def validate(): this.type = {
    def fail(m: String) = throw InvalidTableSpec(s"$fullName: $m")
    def nonEmpty(o: Option[_]) = o.isDefined
    if (operation != Update && nonEmpty(clrOraTableAftUpd))
      fail(s"${operation.operStr} incompatible with non empty clr_ora_table_aft_upd")
    if (operation == AppendNotIn && syncByColumns.forall(_.isEmpty))
      fail("append_notin incompatible with empty sync_by_columns")
    if (operation == AppendWhere && whereFilter.isEmpty)
      fail("append_where incompatible with empty where_filter")
    if (operation == AppendByMax && syncByColumnMax.isEmpty)
      fail("append_bymax incompatible with empty sync_by_column_max")
    if (operation.isRecreate && nonEmpty(syncUpdateByColumnMax))
      fail("recreate incompatible with non empty sync_update_by_column_max")
    if (nonEmpty(syncUpdateByColumnMax) && updateFields.forall(_.isEmpty))
      fail("non empty sync_update_by_column_max incompatible with empty update_fields")
    if (operation.isRecreate && nonEmpty(syncByColumns))
      fail("recreate incompatible with non empty sync_by_columns")
    if (operation.isRecreate && nonEmpty(updateFields))
      fail("recreate incompatible with non empty update_fields")
    if (syncByColumns.exists(_.length > 3))
      fail("sync_by_columns supports only up to three fields with Int type")
    if (nonEmpty(syncByColumns) && nonEmpty(syncByColumnMax))
      fail("non empty sync_by_column_max incompatible with non empty sync_by_columns")
    this
  }
}

/** Whole-task request: schemas × tables + parallel degree 2–12
  * (`request/ReqNewTask.scala:68-87`). */
final case class TaskSpec(tables: Seq[TableSpec], degree: Int = 2) {
  if (degree < 2 || degree > 12)
    throw InvalidTableSpec(s"parallel.degree = $degree must be between 2 and 12")
  if (tables.isEmpty) throw InvalidTableSpec("tables array is empty")
  tables.foreach(_.validate())

  /** Two-wave split: updates always run after every other op
    * (`task/TaskLogic.scala:285-348`). */
  def nonUpdateWave: Seq[TableSpec] = tables.filterNot(_.operation == SyncOp.Update)
  def updateWave: Seq[TableSpec]    = tables.filter(_.operation == SyncOp.Update)
}
