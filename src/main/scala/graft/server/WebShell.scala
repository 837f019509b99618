package graft.server

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.audit.{AuditSink, EngineState}
import graft.calc.{CalcEngine, ViewQueryMeta}
import graft.ops._
import graft.orchestration.TaskRunner
import org.apache.spark.sql.DataFrame

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, TimeUnit}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Thin REST shell over the engine — the reference's HTTP surface
  * (`server/WServer.scala:146-154`) on the JDK HttpServer (no extra
  * dependencies; Jackson ships with Spark):
  *
  *   POST /task  — ReqNewTask-shaped JSON → two-wave sync task
  *   POST /calc  — ReqCalcSrc-shaped JSON → sequential calc queries
  *   GET  /status — engine state + audit trail
  *
  * Behavior ported: single-flight admission (`WServer.scala:38-52`,
  * rejected → 409 with an error body); fire-and-forget task start with
  * the 250 ms taskId poll then `{"taskid": N}` (`:105-120`); per-query
  * calc responds `{"calcId":"ok"}` immediately (`calc/CalcLogic.scala:
  * 185-200`). Sources and calc metas are injected registries — the
  * engine core stays HTTP-free.
  */
final class WebShell(
    runner: TaskRunner,
    calcEngine: CalcEngine,
    audit: AuditSink,
    sources: String => DataFrame,
    pkColumns: Map[String, Seq[String]] = Map.empty,
    calcMetas: Map[String, ViewQueryMeta] = Map.empty,
    calcWrite: ViewQueryMeta => DataFrame => Unit = _ => _ => (),
    pipelineStore: Option[graft.io.TableStore] = None,
    port: Int = 8081) {

  private val mapper = new ObjectMapper()
  private val pool = Executors.newCachedThreadPool()
  private var server: HttpServer = _

  def boundPort: Int = server.getAddress.getPort

  def start(): this.type = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.setExecutor(pool)
    server.createContext("/task", (ex: HttpExchange) => handle(ex, handleTask))
    server.createContext("/calc/status",
      (ex: HttpExchange) => handle(ex, handleCalcStatus))
    server.createContext("/calc", (ex: HttpExchange) => handle(ex, handleCalc))
    server.createContext("/pipeline",
      (ex: HttpExchange) => handle(ex, handlePipeline))
    server.createContext("/status", (ex: HttpExchange) => handle(ex, handleStatus))
    server.start()
    this
  }

  /** query name → latest phase (the reference's ora_to_ch_query_log
    * view). */
  private val calcLog =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** calc single-flight (the reference's CalcRepo state machine,
    * `calc/CalcLogic.scala:171-183`): one calc batch at a time —
    * concurrent batches would race on the shared result tables. */
  private val calcState =
    new java.util.concurrent.atomic.AtomicReference[EngineState](EngineState.Wait)

  def stop(): Unit = {
    server.stop(0)
    pool.shutdown()
    pool.awaitTermination(5, TimeUnit.SECONDS)
  }

  private def handle(ex: HttpExchange, f: HttpExchange => (Int, String)): Unit = {
    val (code, body) =
      try f(ex)
      catch {
        case e: InvalidTableSpec => 400 -> s"""{"error":"${esc(e.getMessage)}"}"""
        case NonFatal(e)         => 500 -> s"""{"error":"${esc(e.getMessage)}"}"""
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** JSON string-escape via Jackson (single escaping implementation —
    * no hand-rolled copy to drift): writeValueAsString("x") yields the
    * quoted literal; strip the quotes for interpolation. */
  private def esc(s: String): String = {
    val quoted = mapper.writeValueAsString(Option(s).getOrElse("null"))
    quoted.substring(1, quoted.length - 1)
  }

  /** POST /task: `{"schemas":[{"schema":"s","tables":[{"operation":...,
    * "name":..., ...}]}], "parallel":{"degree":N}}` — field names are the
    * reference's `OneTable` JSON (`request/ReqNewTask.scala:7-25`). */
  private def handleTask(ex: HttpExchange): (Int, String) = {
    require(ex.getRequestMethod == "POST", "POST only")
    val root = mapper.readTree(ex.getRequestBody)
    val degree = Option(root.path("parallel").path("degree"))
      .filter(!_.isMissingNode).map(_.asInt).filter(_ > 0).getOrElse(2)
    val specs = root.path("schemas").elements().asScala.flatMap { sn =>
      val schema = sn.path("schema").asText
      sn.path("tables").elements().asScala.map(tn => parseTable(schema, tn))
    }.toSeq
    val task = TaskSpec(specs, degree)   // throws InvalidTableSpec → 400
    // fire-and-forget (WServer forkDaemon :89-105): the response carries
    // the taskId as soon as the task is ADMITTED (reference polls 250 ms
    // for the generated id, :106-120); completion is observed via /status
    val idF = new java.util.concurrent.CompletableFuture[Long]()
    pool.submit(new Runnable {
      override def run(): Unit =
        try runner.run(task, sources, pkColumns,
          onAdmitted = id => idF.complete(id))
        catch { case e: Throwable => idF.completeExceptionally(e) }
    })
    try {
      val id = idF.get(60, TimeUnit.SECONDS)  // taskId poll window
      200 -> s"""{"taskid":$id}"""
    } catch {
      case e: java.util.concurrent.ExecutionException
          if e.getCause.isInstanceOf[runner.RejectedException] =>
        409 -> s"""{"error":"${esc(e.getCause.getMessage)}"}"""
      case e: java.util.concurrent.ExecutionException =>
        500 -> s"""{"error":"${esc(e.getCause.getMessage)}"}"""
      case _: java.util.concurrent.TimeoutException =>
        500 -> s"""{"error":"task admission timed out"}"""
    }
  }

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
  private def optList(n: JsonNode, field: String): Option[Seq[String]] =
    optText(n, field).map(_.split(",").map(_.trim).toSeq)

  private def parseTable(schema: String, tn: JsonNode): TableSpec = {
    val op = tn.path("operation").asText match {
      case "recreate"     => SyncOp.Recreate
      case "append_where" => SyncOp.AppendWhere
      case "append_notin" => SyncOp.AppendNotIn
      case "append_bymax" => SyncOp.AppendByMax
      case "update"       => SyncOp.Update
      case other => throw InvalidTableSpec(s"unknown operation $other")
    }
    TableSpec(op, schema, tn.path("name").asText,
      onlyColumns = optList(tn, "only_columns"),
      whereFilter = optText(tn, "where_filter"),
      syncByColumnMax = optText(tn, "sync_by_column_max"),
      updateFields = optList(tn, "update_fields"),
      syncByColumns = optList(tn, "sync_by_columns"),
      syncUpdateByColumnMax = optText(tn, "sync_update_by_column_max"),
      clrOraTableAftUpd = optText(tn, "clr_ora_table_aft_upd"),
      orderByOraData = optText(tn, "order_by_ora_data"),
      srcTableFullName = optText(tn, "src_table_full_name"))
  }

  /** POST /calc: `{"queries":[{"query":"name","order_by":N,
    * "params":{...}}]}` — responds ok immediately, computes async
    * (CalcLogic.scala:185-200). */
  private def handleCalc(ex: HttpExchange): (Int, String) = {
    require(ex.getRequestMethod == "POST", "POST only")
    val root = mapper.readTree(ex.getRequestBody)
    val metas = root.path("queries").elements().asScala.map { qn =>
      val name = qn.path("query").asText
      val base = calcMetas.getOrElse(name,
        throw InvalidTableSpec(s"unknown calc query $name"))
      val params = Option(qn.get("params")).map(_.properties().asScala
        .map(e => e.getKey -> (e.getValue.asText: Any)).toMap)
        .getOrElse(Map.empty[String, Any])
      qn.path("order_by").asInt(0) -> base.copy(params = base.params ++ params)
    }.toSeq
    if (!calcState.compareAndSet(EngineState.Wait, EngineState.Calculation))
      return 409 -> s"""{"error":"calc rejected: state = ${calcState.get()}"}"""
    try {
      pool.submit(new Runnable {
        override def run(): Unit =
          try calcEngine.runAll(metas, calcWrite,
            onPhase = (q, phase) => calcLog.put(q, phase))
          catch { case NonFatal(_) => () }
          finally calcState.set(EngineState.Wait)
      })
    } catch {
      // submit itself failed → the Runnable's finally will never run;
      // release the state here or /calc wedges in permanent 409
      case e: Throwable => calcState.set(EngineState.Wait); throw e
    }
    200 -> """{"calcId":"ok"}"""
  }

  /** pipeline single-flight, its own lane (a curation batch must not
    * block calc and vice versa — they write disjoint tables). */
  private val pipeState =
    new java.util.concurrent.atomic.AtomicReference[EngineState](EngineState.Wait)

  /** POST /pipeline: `{"ops":[{"op":"exact_dedup","table":t,
    * "id_col":c,"text_col":c,"out":o} | {"op":"quality_filter",
    * "table":t,"text_col":c,"out":o,"min_words":N} | {"op":"ann_topk",
    * "table":t,"id_col":c,"vec_col":c,"query_filter":sql,"k":N,
    * "out":o} | {"op":"semantic_dedup","table":t,"id_col":c,
    * "vec_col":c,"min_cosine":x,"dims":N,"target_cluster_size":N?,
    * "deterministic":b?,"out":o} | {"op":"agreement","method":m,
    * "table":t,"col_a":c,"col_b":c,"raters":N,"out":o} (wide shapes:
    * method "icc" takes item_col/rater_col/value_col/raters, method
    * "cronbach" takes cols[]) | {"op":"eval","method":m,"table":t,
    * "col_a":c,"col_b":c,"out":o} (method "c_index" takes time_col/
    * event_col/score_col; "qini" treated_col/outcome_col/score_col)]}`
    * — fire-and-forget with
    * an immediate taskid (the /task admission contract applied to
    * curation/analytic ops); per-op audit rows walk the reference's
    * query-log lifecycle (begin → calculation → copying →
    * finished_<op>) and surface through GET /status. Ops run
    * sequentially and may read a predecessor's `out` (resolver checks
    * the store first). Unknown ops/methods 400 at admission. */
  private def handlePipeline(ex: HttpExchange): (Int, String) = {
    require(ex.getRequestMethod == "POST", "POST only")
    import graft.llm.PipelineTasks
    import graft.llm.PipelineTasks._
    val store = pipelineStore.getOrElse(
      throw InvalidTableSpec("pipeline store not configured"))
    val root = mapper.readTree(ex.getRequestBody)
    def req(n: JsonNode, f: String): String = optText(n, f).getOrElse(
      throw InvalidTableSpec(s"pipeline op missing field $f"))
    val ops = root.path("ops").elements().asScala.map { on =>
      req(on, "op") match {
        case "exact_dedup" => ExactDedup(req(on, "table"),
          req(on, "id_col"), req(on, "text_col"), req(on, "out"))
        case "quality_filter" => QualityFilter(req(on, "table"),
          req(on, "text_col"), req(on, "out"),
          minWords = on.path("min_words").asInt(50))
        case "ann_topk" => AnnTopK(req(on, "table"), req(on, "id_col"),
          req(on, "vec_col"), req(on, "query_filter"),
          on.path("k").asInt(10), req(on, "out"))
        case "semantic_dedup" =>
          // admission validation mirrors semanticDedupCc's requires so
          // a bad spec 400s at POST time, not in the background run
          val mc = on.path("min_cosine").asDouble(Double.NaN)
          if (!(mc > 0.0 && mc < 1.0))
            throw InvalidTableSpec(
              s"semantic_dedup min_cosine must be in (0, 1), got $mc")
          val dims = on.path("dims").asInt(-1)
          if (dims < 1)
            throw InvalidTableSpec(
              s"semantic_dedup dims must be >= 1, got $dims")
          val tcs = on.path("target_cluster_size").asInt(16)
          if (tcs < 2)
            throw InvalidTableSpec(
              s"semantic_dedup target_cluster_size must be >= 2, got $tcs")
          SemanticDedup(req(on, "table"), req(on, "id_col"),
            req(on, "vec_col"), mc, dims, tcs,
            on.path("deterministic").asBoolean(false), req(on, "out"))
        case "agreement" =>
          val m = req(on, "method")
          if (!PipelineTasks.agreementMethods(m))
            throw InvalidTableSpec(s"unknown agreement method $m")
          m match {
            case "icc" =>
              val raters = on.path("raters").asInt(-1)
              if (raters < 2)
                throw InvalidTableSpec(
                  s"agreement icc needs raters >= 2, got $raters")
              IccOp(req(on, "table"), req(on, "item_col"),
                req(on, "rater_col"), req(on, "value_col"), raters,
                req(on, "out"))
            case "cronbach" =>
              val cols = on.path("cols").elements().asScala
                .map(_.asText()).toSeq
              if (cols.size < 2)
                throw InvalidTableSpec(
                  s"agreement cronbach needs cols[] with >= 2 items, " +
                    s"got ${cols.size}")
              CronbachOp(req(on, "table"), cols, req(on, "out"))
            case _ =>
              AgreementOp(req(on, "table"), m, req(on, "col_a"),
                req(on, "col_b"), on.path("raters").asInt(2),
                req(on, "out"))
          }
        case "eval" =>
          val m = req(on, "method")
          if (!PipelineTasks.evalMethods(m))
            throw InvalidTableSpec(s"unknown eval method $m")
          m match {
            case "c_index" =>
              CIndexOp(req(on, "table"), req(on, "time_col"),
                req(on, "event_col"), req(on, "score_col"),
                req(on, "out"))
            case "qini" =>
              QiniOp(req(on, "table"), req(on, "treated_col"),
                req(on, "outcome_col"), req(on, "score_col"),
                req(on, "out"))
            case "srm" =>
              val pm = on.path("expect_a_pm").asLong(500L)
              if (pm < 1 || pm > 999)
                throw InvalidTableSpec(
                  s"eval srm expect_a_pm must be in [1, 999], got $pm")
              SrmOp(req(on, "table"), req(on, "col_a"), pm,
                req(on, "out"))
            case "post_strat_ate" =>
              PostStratAteOp(req(on, "table"), req(on, "treated_col"),
                req(on, "value_col"), req(on, "strata_col"),
                req(on, "out"))
            case _ =>
              EvalOp(req(on, "table"), m, req(on, "col_a"),
                req(on, "col_b"), req(on, "out"))
          }
        case other => throw InvalidTableSpec(s"unknown pipeline op $other")
      }
    }.toSeq
    if (ops.isEmpty) throw InvalidTableSpec("empty pipeline")
    if (!pipeState.compareAndSet(EngineState.Wait, EngineState.Executing))
      return 409 -> s"""{"error":"pipeline rejected: state = ${pipeState.get()}"}"""
    val taskId = audit.nextTaskId()
    audit.taskEvent(taskId, "begin_pipeline")
    val resolve: String => DataFrame =
      name => if (store.exists(name)) store.read(name) else sources(name)
    try {
      pool.submit(new Runnable {
        override def run(): Unit =
          try {
            PipelineTasks.run(store, audit, taskId, ops, resolve)
            audit.taskEvent(taskId, "finished_pipeline")
          }
          catch { case NonFatal(_) => audit.taskEvent(taskId, "error") }
          finally pipeState.set(EngineState.Wait)
      })
    } catch {
      case e: Throwable => pipeState.set(EngineState.Wait); throw e
    }
    200 -> s"""{"taskid":$taskId}"""
  }

  private def handleCalcStatus(ex: HttpExchange): (Int, String) = {
    val entries = calcLog.entrySet().asScala.toSeq.sortBy(_.getKey)
      .map(e => s"""{"query":"${esc(e.getKey)}","phase":"${esc(e.getValue)}"}""")
      .mkString("[", ",", "]")
    200 -> s"""{"queries":$entries}"""
  }

  private def handleStatus(ex: HttpExchange): (Int, String) = {
    val events = audit.events.sortBy(_.at).takeRight(50).map { e =>
      s"""{"table":"${esc(e.table)}","operation":"${esc(e.operation)}",""" +
        s""""status":"${esc(e.status)}","rows":${e.rowsCopied}}"""
    }.mkString("[", ",", "]")
    200 -> s"""{"state":"${runner.currentState}","events":$events}"""
  }
}
