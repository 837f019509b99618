package graft.llm

import graft.audit.{AuditSink, TableAudit}
import graft.io.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LLM-pipeline operations as ORCHESTRATED TASKS — the round-9 stretch
  * ask: the reference surfaces its calc queries through a REST shell
  * with audit rows (`server/WServer.scala:124-133`,
  * `calc/CalcLogic.scala:185-200`); this is the same shape for the
  * extension surface's curation primitives, so a 100 TB operator can
  * drive dedup / quality-filter / ANN batches through the SAME
  * fire-and-forget + audit-trail machinery as sync and calc tasks.
  *
  * The core stays HTTP-free (the WebShell parses JSON into these
  * specs): each op reads its input through an injected resolver,
  * writes its result table through the [[graft.io.TableStore]], and
  * emits the reference's begin / finished / error audit rows with row
  * counts and rows/sec — the ora_to_ch_tasks_tables contract
  * (`ora/jdbcSession.scala:518-542`) applied to curation ops. */
object PipelineTasks {

  /** One curation step. `table` resolves through the injected reader
    * (a fixture dir or any registered source); `out` is the TableStore
    * destination. */
  sealed trait PipelineOp {
    def table: String
    def out: String
    def name: String
  }

  /** Exact content dedup → survivor rows (Dedup.exact). */
  final case class ExactDedup(table: String, idCol: String,
                              textCol: String, out: String)
      extends PipelineOp { val name = "exact_dedup" }

  /** Gopher-battery quality filter → kept rows + the count struct
    * (TextAnalysis.gopherCounts / gopherKeep, default thresholds
    * except the word floor, which web fixtures routinely need lower). */
  final case class QualityFilter(table: String, textCol: String,
                                 out: String, minWords: Int = 50)
      extends PipelineOp { val name = "quality_filter" }

  /** Batch ANN top-k of every query row against the corpus through the
    * unified dispatch (Similarity.topK — exact below the brute
    * threshold, LSH/indexed past it). `queryFilter` is a SQL predicate
    * selecting the query rows out of the same table. */
  final case class AnnTopK(table: String, idCol: String, vecCol: String,
                           queryFilter: String, k: Int, out: String)
      extends PipelineOp { val name = "ann_topk" }

  final case class InvalidPipelineOp(msg: String)
      extends RuntimeException(msg)

  private def transform(op: PipelineOp, in: DataFrame): DataFrame =
    op match {
      case ExactDedup(_, idCol, textCol, _) =>
        Dedup.exact(in, idCol, textCol)
      case q: QualityFilter =>
        in.withColumn("__g",
            TextAnalysis.gopherCounts(col(q.textCol)))
          .where(TextAnalysis.gopherKeep(col("__g"),
            minWords = q.minWords))
          .drop("__g")
      case a: AnnTopK =>
        Similarity.topK(in.where(a.queryFilter), in, a.idCol, a.vecCol,
          a.k)
    }

  /** Run the ops SEQUENTIALLY (each may read a predecessor's `out`
    * through the resolver — the calc order_by precedent, C1/O2),
    * auditing begin/finished/error per op. Returns (out table, rows)
    * per completed op; the first failure records its error row and
    * rethrows — partial pipelines must read as breakage in the audit
    * trail, never as silent truncation. */
  def run(store: TableStore, audit: AuditSink, taskId: Long,
          ops: Seq[PipelineOp],
          resolve: String => DataFrame): Seq[(String, Long)] = {
    require(ops.nonEmpty, "empty pipeline")
    ops.map { op =>
      val t0 = System.nanoTime()
      audit.tableEvent(TableAudit(taskId, op.out, op.name, "begin",
        0L, 0L, None, java.time.Instant.now()))
      try {
        val result = transform(op, resolve(op.table))
        store.overwrite(op.out, result)
        val rows = store.read(op.out).count()
        val secs = math.max(1e-9, (System.nanoTime() - t0) / 1e9)
        audit.tableEvent(TableAudit(taskId, op.out, op.name,
          s"finished_${op.name}", rows, math.round(rows / secs),
          None, java.time.Instant.now()))
        op.out -> rows
      } catch {
        case e: Throwable =>
          audit.tableEvent(TableAudit(taskId, op.out, op.name, "error",
            0L, 0L, Some(Option(e.getMessage).getOrElse(e.getClass.getName)),
            java.time.Instant.now()))
          throw e
      }
    }
  }
}
