package graft.calc

import graft.io.TableStore
import graft.params.ParamBinder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One stored analytic query: SQL text + typed params + target tables —
  * the reference's `ViewQueryMeta` (`calc/ViewQueryMeta.scala:9-17`,
  * loaded `ora/jdbcSession.scala:199-247`). */
final case class ViewQueryMeta(
    name: String,
    sqlText: String,                      // may contain {name:Type} placeholders
    params: Map[String, Any] = Map.empty,
    chTable: String,                      // result table (truncate + insert)
    oraTable: Option[String] = None,      // copy-back target
    copyByPartsCnt: Int = 1,              // NTILE-parallel copy-back degree
    copyByPartField: Option[String] = None,
    copyToLocalCache: Boolean = false,
    cacheTable: Option[String] = None     // local-cache promote target (C11)
)

/** The `POST /calc` lifecycle (`calc/CalcLogic.scala`; SURVEY.md §3.3) on
  * Spark: bind `{name:Type}` params → run the analytic SQL → materialize
  * into the result table → copy back (optionally hash-partitioned) and/or
  * promote to a local cache table.
  *
  * The reference ships the whole plan to ClickHouse
  * (`clickhouse/jdbsChSession.scala:712-743`); here Catalyst plans it —
  * multi-join calc queries get join reordering, broadcast selection and
  * AQE for free.
  */
final class CalcEngine(spark: SparkSession, store: TableStore) {

  /** Phase 1 "calculation" (`calc/CalcLogic.scala:103-115`): truncate the
    * result table, bind params via Spark named parameters (values never
    * enter the SQL text), execute, insert. */
  def calc(meta: ViewQueryMeta): DataFrame = {
    val (text, args) = ParamBinder.bindNamed(meta.sqlText, meta.params)
    val result = spark.sql(text, args)
    store.overwrite(meta.chTable, result)
    store.read(meta.chTable)
  }

  /** Phase 2 copy-back (`calc/CalcLogic.scala:54-65,117-120`).
    *
    * Whole copy = single insert-select
    * (`clickhouse/jdbsChSession.scala:400-414`); partitioned copy = the
    * reference's NTILE(cityHash64(part_field)) bucket fan-out
    * (`:416-450`) which on Spark is simply a `repartition(n, xxhash64)` —
    * the shuffle IS the bucketing, and each task writes its bucket
    * concurrently. No window function needed (SURVEY.md §4.1).
    */
  def copyBack(meta: ViewQueryMeta, write: DataFrame => Unit): Unit = {
    val df = store.read(meta.chTable)
    val parts =
      if (meta.copyByPartsCnt > 1)
        df.repartition(meta.copyByPartsCnt,
          xxhash64(col(meta.copyByPartField.getOrElse(df.columns.head))))
      else df
    write(parts)
  }

  /** Local-cache promote (C11, `clickhouse/jdbsChSession.scala:452-510`):
    * delete the cache slices whose `(sliceCols)` tuples appear in the new
    * result, then insert the new rows — a partition-overwrite by the
    * slice-key columns. Column alignment is BY POSITION like the
    * reference's `system.columns`-ordered insert (`:466-499`). */
  def promoteLocalCache(meta: ViewQueryMeta, sliceCols: Seq[String]): Unit = {
    // strip the ch_ prefix on the TABLE part — chTable is usually
    // schema-qualified ("db.ch_res"), where a whole-string stripPrefix
    // would match nothing and silently promote the table onto itself
    val cacheT = meta.cacheTable.getOrElse {
      val parts = meta.chTable.split('.')
      (parts.init :+ parts.last.stripPrefix("ch_")).mkString(".")
    }
    require(cacheT != meta.chTable,
      s"local-cache promote needs a distinct cache table for ${meta.chTable}")
    val fresh  = store.read(meta.chTable)
    if (!store.exists(cacheT)) {
      store.overwrite(cacheT, fresh)
    } else {
      val cache  = store.read(cacheT)
      val slices = fresh.select(sliceCols.map(col): _*).distinct()
      val kept   = cache.join(slices, sliceCols, "left_anti")
      val aligned = fresh.toDF(cache.columns.toIndexedSeq: _*) // by position
      store.overwrite(cacheT, kept.unionByName(aligned))
    }
  }

  /** Full lifecycle for a list of queries, executed sequentially in
    * `order_by` order (`calc/CalcLogic.scala:132,161-163`); the copy-back
    * and cache-promote of each query run concurrently
    * (`calc/CalcLogic.scala:117-120`). */
  /** `onPhase(queryName, phase)` mirrors the reference's per-phase query
    * log states — calculation → copying/local_copying →
    * finished_chora_copy/finished_local_copy → finished, error on
    * failure (`ora/jdbcSession.scala:40-197`). */
  def runAll(metas: Seq[(Int, ViewQueryMeta)],
             write: ViewQueryMeta => DataFrame => Unit,
             sliceCols: Seq[String] = Seq("datecalc_cache", "date_cache"),
             onPhase: (String, String) => Unit = (_, _) => ()): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    metas.sortBy(_._1).foreach { case (_, meta) =>
      try {
        onPhase(meta.name, "calculation")
        calc(meta)
        val jobs = Seq(
          if (meta.oraTable.isDefined) Some(Future {
            onPhase(meta.name, "copying")
            copyBack(meta, write(meta))
            onPhase(meta.name, "finished_chora_copy")
          }) else None,
          if (meta.copyToLocalCache) Some(Future {
            onPhase(meta.name, "local_copying")
            promoteLocalCache(meta, sliceCols)
            onPhase(meta.name, "finished_local_copy")
          }) else None
        ).flatten
        jobs.foreach(Await.result(_, Duration.Inf))
        onPhase(meta.name, "finished")
      } catch {
        case e: Throwable =>
          onPhase(meta.name, s"error: ${e.getMessage}")
          throw e
      }
    }
  }
}
