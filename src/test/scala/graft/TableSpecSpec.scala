package graft

import graft.ops._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's 9 constructor-time invariants
  * (`request/ReqNewTask.scala:28-61`) as unit tests — SURVEY.md §5. */
class TableSpecSpec extends AnyFunSuite {

  def spec(op: SyncOp) = TableSpec(op, "s", "t",
    whereFilter = if (op == SyncOp.AppendWhere) Some("1=1") else None,
    syncByColumnMax = if (op == SyncOp.AppendByMax) Some("c") else None,
    syncByColumns = if (op == SyncOp.AppendNotIn) Some(Seq("k")) else None)

  test("every op validates with its required fields") {
    SyncOp.all.foreach(op => spec(op).validate())
  }

  test("clr_ora_table_aft_upd only valid for update") {
    intercept[InvalidTableSpec](
      spec(SyncOp.Recreate).copy(clrOraTableAftUpd = Some("x")).validate())
    spec(SyncOp.Update).copy(clrOraTableAftUpd = Some("x")).validate()
  }

  test("append_notin requires sync_by_columns") {
    intercept[InvalidTableSpec](
      TableSpec(SyncOp.AppendNotIn, "s", "t").validate())
  }

  test("append_where requires where_filter") {
    intercept[InvalidTableSpec](
      TableSpec(SyncOp.AppendWhere, "s", "t").validate())
  }

  test("append_bymax requires sync_by_column_max") {
    intercept[InvalidTableSpec](
      TableSpec(SyncOp.AppendByMax, "s", "t").validate())
  }

  test("recreate forbids sync_update_by_column_max / sync_by_columns / update_fields") {
    intercept[InvalidTableSpec](
      spec(SyncOp.Recreate).copy(syncUpdateByColumnMax = Some("c")).validate())
    intercept[InvalidTableSpec](
      spec(SyncOp.Recreate).copy(syncByColumns = Some(Seq("k"))).validate())
    intercept[InvalidTableSpec](
      spec(SyncOp.Recreate).copy(updateFields = Some(Seq("f"))).validate())
  }

  test("sync_update_by_column_max requires update_fields") {
    intercept[InvalidTableSpec](
      spec(SyncOp.Update).copy(syncUpdateByColumnMax = Some("c")).validate())
    spec(SyncOp.Update).copy(syncUpdateByColumnMax = Some("c"),
      updateFields = Some(Seq("f"))).validate()
  }

  test("key arity capped at 3") {
    intercept[InvalidTableSpec](
      spec(SyncOp.AppendNotIn)
        .copy(syncByColumns = Some(Seq("a", "b", "c", "d"))).validate())
  }

  test("sync_by_columns and sync_by_column_max are mutually exclusive") {
    intercept[InvalidTableSpec](
      spec(SyncOp.AppendNotIn).copy(syncByColumnMax = Some("c")).validate())
  }

  test("task degree bounds 2-12 and two-wave split") {
    intercept[InvalidTableSpec](TaskSpec(Seq(spec(SyncOp.Recreate)), degree = 1))
    intercept[InvalidTableSpec](TaskSpec(Seq(spec(SyncOp.Recreate)), degree = 13))
    intercept[InvalidTableSpec](TaskSpec(Nil))
    val ts = TaskSpec(Seq(spec(SyncOp.Recreate), spec(SyncOp.Update),
      spec(SyncOp.AppendByMax)))
    assert(ts.nonUpdateWave.map(_.operation) ==
      Seq(SyncOp.Recreate, SyncOp.AppendByMax))
    assert(ts.updateWave.map(_.operation) == Seq(SyncOp.Update))
  }
}
