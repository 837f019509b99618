package graft

import graft.audit.InMemoryAuditSink
import graft.calc.{CalcEngine, ViewQueryMeta}
import graft.io.ParquetTableStore
import graft.ops.SyncEngine
import graft.orchestration.TaskRunner
import graft.server.WebShell

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

class WebShellSpec extends SparkTestBase {
  import spark.implicits._

  def post(port: Int, path: String, body: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  def get(port: Int, path: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  def fixture() = {
    val store = new ParquetTableStore(spark, tmpDir("web"))
    val audit = new InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)
    Seq((1L, 5.0), (2L, 25.0)).toDF("k", "v").createOrReplaceTempView("web_src")
    val calc = new CalcEngine(spark, store)
    val metas = Map("vq" -> ViewQueryMeta(name = "vq",
      sqlText = "SELECT k, v FROM web_src WHERE v > {vmin:Decimal(38,6)}",
      chTable = "db.calc_res"))
    val shell = new WebShell(runner, calc, audit,
      sources = _ => Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      calcMetas = metas, port = 0).start()
    (store, shell)
  }

  test("POST /task responds with the taskid at ADMISSION; completion via /status") {
    val (store, shell) = fixture()
    try {
      val r = post(shell.boundPort, "/task",
        """{"schemas":[{"schema":"db","tables":[
          |{"operation":"recreate","name":"t1"},
          |{"operation":"recreate","name":"t2","where_filter":"id = 1"}]}],
          |"parallel":{"degree":2}}""".stripMargin)
      assert(r.statusCode() == 200 && r.body().matches("""\{"taskid":\d+\}"""))
      // fire-and-forget: poll /status for completion like a real client
      val deadline = System.nanoTime() + 60_000_000_000L
      while (!get(shell.boundPort, "/status").body().contains("\"state\":\"Wait\"")
             && System.nanoTime() < deadline) Thread.sleep(100)
      val st = get(shell.boundPort, "/status")
      assert(st.body().contains("\"state\":\"Wait\""))
      assert(st.body().contains("finished_recreate"))
      assert(store.count("db.t1") == 2 && store.count("db.t2") == 1)
    } finally shell.stop()
  }

  test("POST /task returns before a slow task completes (fire-and-forget)") {
    val store = new ParquetTableStore(spark, tmpDir("web"))
    val audit = new graft.audit.InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val shell = new WebShell(runner, new CalcEngine(spark, store), audit,
      sources = _ => { gate.await(); Seq((1L, "a")).toDF("id", "name") },
      port = 0).start()
    try {
      val t0 = System.nanoTime()
      val r = post(shell.boundPort, "/task",
        """{"schemas":[{"schema":"db","tables":[{"operation":"recreate","name":"slow"}]}]}""")
      val elapsedMs = (System.nanoTime() - t0) / 1000000
      assert(r.statusCode() == 200 && r.body().matches("""\{"taskid":\d+\}"""))
      assert(elapsedMs < 10000, s"response must not wait for completion ($elapsedMs ms)")
      assert(get(shell.boundPort, "/status").body().contains("\"state\":\"Executing\""))
      gate.countDown()
      val deadline = System.nanoTime() + 60_000_000_000L
      while (!get(shell.boundPort, "/status").body().contains("\"state\":\"Wait\"")
             && System.nanoTime() < deadline) Thread.sleep(100)
      assert(store.count("db.slow") == 1)
    } finally { gate.countDown(); shell.stop() }
  }

  test("invalid spec → 400 with the invariant message; unknown op → 400") {
    val (_, shell) = fixture()
    try {
      val r = post(shell.boundPort, "/task",
        """{"schemas":[{"schema":"db","tables":[
          |{"operation":"append_where","name":"t"}]}]}""".stripMargin)
      assert(r.statusCode() == 400)
      assert(r.body().contains("append_where incompatible with empty where_filter"))
      val r2 = post(shell.boundPort, "/task",
        """{"schemas":[{"schema":"db","tables":[
          |{"operation":"merge","name":"t"}]}]}""".stripMargin)
      assert(r2.statusCode() == 400 && r2.body().contains("unknown operation"))
    } finally shell.stop()
  }

  test("POST /calc responds ok immediately and materializes the result async") {
    val (store, shell) = fixture()
    try {
      val r = post(shell.boundPort, "/calc",
        """{"queries":[{"query":"vq","order_by":1,"params":{"vmin":"10"}}]}""")
      assert(r.statusCode() == 200 && r.body() == """{"calcId":"ok"}""")
      val deadline = System.nanoTime() + 30_000_000_000L
      while (!store.exists("db.calc_res") && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(store.read("db.calc_res").as[(Long, Double)].collect().toSet ==
        Set((2L, 25.0)))
      val r2 = post(shell.boundPort, "/calc",
        """{"queries":[{"query":"nope"}]}""")
      assert(r2.statusCode() == 400 && r2.body().contains("unknown calc query"))
      // /calc/status reflects the per-phase query log
      val st = get(shell.boundPort, "/calc/status")
      assert(st.statusCode() == 200 &&
        st.body().contains("\"query\":\"vq\"") &&
        st.body().contains("\"phase\":\"finished\""))
    } finally shell.stop()
  }

  test("calc single-flight: concurrent batch rejected while one is in flight") {
    val store = new ParquetTableStore(spark, tmpDir("web"))
    val audit = new graft.audit.InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)
    Seq((1L, 5.0)).toDF("k", "v").createOrReplaceTempView("web_sf_src")
    val gate = new java.util.concurrent.CountDownLatch(1)
    // oraTable forces the copy-back write, which blocks on the latch —
    // the batch is deterministically in flight for the second post
    val metas = Map("slowq" -> ViewQueryMeta(name = "slowq",
      sqlText = "SELECT k, v FROM web_sf_src", chTable = "db.sf_res",
      oraTable = Some("ora.sf")))
    val shell = new WebShell(runner, new CalcEngine(spark, store), audit,
      sources = _ => Seq((1L, "a")).toDF("id", "name"),
      calcMetas = metas,
      calcWrite = _ => _ => gate.await(),
      port = 0).start()
    try {
      val r1 = post(shell.boundPort, "/calc", """{"queries":[{"query":"slowq"}]}""")
      assert(r1.statusCode() == 200)
      val r2 = post(shell.boundPort, "/calc", """{"queries":[{"query":"slowq"}]}""")
      assert(r2.statusCode() == 409 && r2.body().contains("calc rejected"),
        s"got ${r2.statusCode()} ${r2.body()}")
      gate.countDown()
      // after the batch drains, admission reopens
      val deadline = System.nanoTime() + 60_000_000_000L
      var r3 = r2
      while ({ r3 = post(shell.boundPort, "/calc",
               """{"queries":[{"query":"slowq"}]}"""); r3.statusCode() == 409 } &&
             System.nanoTime() < deadline) Thread.sleep(100)
      assert(r3.statusCode() == 200)
      gate.countDown()
    } finally { gate.countDown(); shell.stop() }
  }

  test("POST /pipeline: dedup -> quality chain with audit rows; " +
       "unknown op 400; ann_topk probes the dispatch") {
    val store = new ParquetTableStore(spark, tmpDir("web-pipe"))
    val audit = new graft.audit.InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)
    val docs = Seq(
      (1L, ("the be to of and that have with " * 8) + "alpha"),
      (2L, ("the be to of and that have with " * 8) + "alpha"), // dup of 1
      (3L, ("the be to of and that have with " * 8) + "beta"),
      (4L, "#### ### ## #")) // fails the gopher symbol screen
      .toDF("doc_id", "text")
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val shell = new WebShell(runner, new CalcEngine(spark, store), audit,
      sources = {
        case "docs" => docs
        case "vecs" => vecs
        case other  => sys.error(s"unknown source $other")
      },
      pipelineStore = Some(store), port = 0).start()
    try {
      val r = post(shell.boundPort, "/pipeline",
        """{"ops":[
          |{"op":"exact_dedup","table":"docs","id_col":"doc_id",
          | "text_col":"text","out":"p.dedup"},
          |{"op":"quality_filter","table":"p.dedup","text_col":"text",
          | "out":"p.clean","min_words":10},
          |{"op":"ann_topk","table":"vecs","id_col":"vec_id",
          | "vec_col":"embedding","query_filter":"vec_id < 2","k":3,
          | "out":"p.topk"}]}""".stripMargin)
      assert(r.statusCode() == 200 && r.body().matches("""\{"taskid":\d+\}"""),
        s"got ${r.statusCode()} ${r.body()}")
      val deadline = System.nanoTime() + 120_000_000_000L
      while (!audit.taskEvents.exists(e =>
               e.status == "finished_pipeline" || e.status == "error") &&
             System.nanoTime() < deadline) Thread.sleep(100)
      assert(audit.taskEvents.exists(_.status == "finished_pipeline"),
        s"pipeline did not finish: ${audit.taskEvents}")
      // dedup: 4 docs -> 3 survivors; quality: the symbol doc drops
      assert(store.count("p.dedup") == 3L)
      assert(store.count("p.clean") == 2L)
      // ann: 2 queries x top-3 through the unified dispatch
      assert(store.count("p.topk") == 6L)
      // audit rows: begin + finished per op, rows/sec recorded
      val ev = audit.events.filter(_.taskId == audit.taskEvents.head.taskId)
      Seq("exact_dedup", "quality_filter", "ann_topk").foreach { op =>
        assert(ev.exists(e => e.operation == op && e.status == "begin"))
        assert(ev.exists(e => e.operation == op &&
          e.status == s"finished_$op" && e.rowsCopied > 0))
      }
      // /status surfaces the pipeline rows like any sync task
      assert(get(shell.boundPort, "/status").body()
        .contains("finished_exact_dedup"))
      // unknown op -> 400, nothing admitted
      val bad = post(shell.boundPort, "/pipeline",
        """{"ops":[{"op":"nope","table":"docs","out":"x"}]}""")
      assert(bad.statusCode() == 400 &&
        bad.body().contains("unknown pipeline op"))
    } finally shell.stop()
  }

  test("POST /pipeline agreement/eval ops: byte-identical to the " +
       "q344/q348 gates, query-log lifecycle audit rows, 409 lane") {
    val dir = sf("sf0.01")
    val store = new ParquetTableStore(spark, tmpDir("web-agree"))
    val audit = new graft.audit.InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)
    // q348's exact input frame (the rule-A classifier vs the purchase
    // label) and q344's exact rating frame, served as REST sources
    import org.apache.spark.sql.functions.{col, floor}
    val mccInput = CoreQueries.tRead(spark, dir, "events")
      .where(col("value").isNotNull && col("event_type").isNotNull)
      .select(
        (floor(col("value") * 100).cast("long") >= 3500L).as("pred"),
        (col("event_type") === "purchase").as("label"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    @volatile var slowArmed = false
    val shell = new WebShell(runner, new CalcEngine(spark, store), audit,
      sources = {
        case "ratings" => AgreementGates.eventRatings(spark, dir)
        case "preds"   => mccInput
        case "slow"    => if (slowArmed) gate.await(); mccInput
        case other     => sys.error(s"unknown source $other")
      },
      pipelineStore = Some(store), port = 0).start()
    try {
      val r = post(shell.boundPort, "/pipeline",
        """{"ops":[
          |{"op":"agreement","method":"fleiss_kappa","table":"ratings",
          | "col_a":"item","col_b":"cat","raters":3,"out":"p.fleiss"},
          |{"op":"eval","method":"mcc","table":"preds",
          | "col_a":"pred","col_b":"label","out":"p.mcc"}]}""".stripMargin)
      assert(r.statusCode() == 200 && r.body().matches("""\{"taskid":\d+\}"""),
        s"got ${r.statusCode()} ${r.body()}")
      val deadline = System.nanoTime() + 120_000_000_000L
      while (!audit.taskEvents.exists(e =>
               e.status == "finished_pipeline" || e.status == "error") &&
             System.nanoTime() < deadline) Thread.sleep(100)
      assert(audit.taskEvents.exists(_.status == "finished_pipeline"),
        s"pipeline did not finish: ${audit.taskEvents}")
      // BYTE-IDENTICAL to the gates: same operator, same input — the
      // REST surface must not be a weaker sibling of the gate surface
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSeq
      assert(rows(store.read("p.fleiss")) ==
        rows(SparkEntry.queries("q344_fleiss_kappa")(spark, dir)),
        "REST fleiss output diverged from the q344 gate")
      assert(rows(store.read("p.mcc")) ==
        rows(SparkEntry.queries("q348_mcc")(spark, dir)),
        "REST mcc output diverged from the q348 gate")
      // the reference's query-log lifecycle per op, in order
      // (ora/jdbcSession.scala:40-197): begin -> calculation ->
      // copying -> finished_<op>
      for (op <- Seq("agreement_fleiss_kappa", "eval_mcc")) {
        val states = audit.events
          .filter(e => e.operation == op).map(_.status)
        assert(states.startsWith(
          Seq("begin", "calculation", "copying")) &&
          states.lastOption.contains(s"finished_$op"),
          s"$op lifecycle was $states")
      }
      // 409 single-flight on the pipeline lane while an op is running
      slowArmed = true
      val slow = post(shell.boundPort, "/pipeline",
        """{"ops":[{"op":"eval","method":"mcc","table":"slow",
          | "col_a":"pred","col_b":"label","out":"p.slow"}]}""".stripMargin)
      assert(slow.statusCode() == 200, s"got ${slow.statusCode()}")
      val rej = post(shell.boundPort, "/pipeline",
        """{"ops":[{"op":"eval","method":"mcc","table":"preds",
          | "col_a":"pred","col_b":"label","out":"p.rej"}]}""".stripMargin)
      assert(rej.statusCode() == 409 &&
        rej.body().contains("pipeline rejected"),
        s"got ${rej.statusCode()} ${rej.body()}")
      gate.countDown()
      // unknown method -> 400 at admission
      val badm = post(shell.boundPort, "/pipeline",
        """{"ops":[{"op":"agreement","method":"nope","table":"ratings",
          | "col_a":"item","col_b":"cat","out":"x"}]}""".stripMargin)
      assert(badm.statusCode() == 400 &&
        badm.body().contains("unknown agreement method"),
        s"got ${badm.statusCode()} ${badm.body()}")
    } finally { gate.countDown(); shell.stop() }
  }

  test("POST /pipeline continuous methods (ccc/bland_altman/mde_probe): " +
       "byte-identical to the q368/q372/q371 gates") {
    val dir = sf("sf0.01")
    val store = new ParquetTableStore(spark, tmpDir("web-cont"))
    val audit = new graft.audit.InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)
    import org.apache.spark.sql.functions.{col, expr, floor}
    val cents = CoreQueries.tRead(spark, dir, "events")
      .where(col("value").isNotNull)
      .select(floor(col("value") * 100).cast("long").as("cents"),
        col("user_id"))
    val pair = cents.select(col("cents").as("x"),
      (expr("cents div 2") + 12000).as("y"))
    val flagged = cents.where(col("user_id").isNotNull)
      .select((col("user_id") % 2 === 0).as("flag"), col("cents"))
    val shell = new WebShell(runner, new CalcEngine(spark, store), audit,
      sources = {
        case "pair"    => pair
        case "flagged" => flagged
        case other     => sys.error(s"unknown source $other")
      },
      pipelineStore = Some(store), port = 0).start()
    try {
      val r = post(shell.boundPort, "/pipeline",
        """{"ops":[
          |{"op":"agreement","method":"ccc","table":"pair",
          | "col_a":"x","col_b":"y","out":"p.ccc"},
          |{"op":"agreement","method":"bland_altman","table":"pair",
          | "col_a":"x","col_b":"y","out":"p.ba"},
          |{"op":"eval","method":"mde_probe","table":"flagged",
          | "col_a":"flag","col_b":"cents","out":"p.mde"}]}"""
          .stripMargin)
      assert(r.statusCode() == 200, s"got ${r.statusCode()} ${r.body()}")
      val deadline = System.nanoTime() + 120_000_000_000L
      while (!audit.taskEvents.exists(e =>
               e.status == "finished_pipeline" || e.status == "error") &&
             System.nanoTime() < deadline) Thread.sleep(100)
      assert(audit.taskEvents.exists(_.status == "finished_pipeline"),
        s"pipeline did not finish: ${audit.taskEvents}")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSeq
      assert(rows(store.read("p.ccc")) ==
        rows(SparkEntry.queries("q368_ccc")(spark, dir)),
        "REST ccc diverged from the q368 gate")
      assert(rows(store.read("p.ba")) ==
        rows(SparkEntry.queries("q372_bland_altman")(spark, dir)),
        "REST bland_altman diverged from the q372 gate")
      assert(rows(store.read("p.mde")) ==
        rows(SparkEntry.queries("q371_mde_probe")(spark, dir)),
        "REST mde_probe diverged from the q371 gate")
    } finally shell.stop()
  }

  test("POST /pipeline round-12 surface (semantic_dedup / icc / " +
       "cronbach / c_index / qini): byte-identical to the " +
       "q363/q367/q369/q376/q377 gates; bad specs 400 at admission") {
    val dir = sf("sf0.01")
    val store = new ParquetTableStore(spark, tmpDir("web-r12"))
    val audit = new graft.audit.InMemoryAuditSink
    val runner = new TaskRunner(spark, new SyncEngine(store), audit)
    import org.apache.spark.sql.functions._
    val dayUs = 86400000000L
    val events = CoreQueries.tRead(spark, dir, "events")
    // the q367 gate's 3-rater continuous-ratings frame
    val e = events.where(col("value").isNotNull)
      .select(col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    val ratings = e.select(col("event_id").as("item"),
        lit("a").as("rater"), col("cents").as("x"))
      .unionByName(e.select(col("event_id").as("item"),
        lit("b").as("rater"),
        (col("cents") + (col("event_id") % 1000) * 30 - 15000).as("x")))
      .unionByName(e.where(col("event_id") % 13 =!= 0)
        .select(col("event_id").as("item"), lit("c").as("rater"),
          (expr("cents div 2000") * 2000 + 5000).as("x")))
    // the q369 gate's 3 sub-score columns
    val scores = events
      .where(col("value").isNotNull && col("event_id").isNotNull &&
        col("user_id").isNotNull)
      .select(floor(col("value") * 100).cast("long").as("cents"),
        col("event_id"), col("user_id"))
      .select(expr("cents div 1000").as("s1"),
        expr("(cents + event_id % 20000) div 1000").as("s2"),
        expr("(cents + (user_id * 7) % 30000) div 1000").as("s3"))
    // the q376 gate's subject frame (tenure, event, lifetime cents)
    val subj = events.where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg((max(expr(s"ts div ${dayUs}L")) -
          min(expr(s"ts div ${dayUs}L"))).as("tenure"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("event"),
        coalesce(sum(floor(col("value") * 100).cast("long")), lit(0L))
          .as("score"))
    // the q377 gate's uplift frame (parity treatment, big-ticket flag)
    val uplift = events.where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
            floor(col("value") * 100).cast("long") >= 20000L, 1L)
          .otherwise(0L)).as("event"),
        coalesce(sum(floor(col("value") * 100).cast("long")), lit(0L))
          .as("score"))
      .select((col("user_id") % 2 === 0).as("treated"), col("event"),
        col("score"))
    // q381's event-grain arm frame and q382's stratified frame
    val arms = events.where(col("user_id").isNotNull)
      .select((col("user_id") % 2 === 0).as("arm"))
    val strat = events
      .where(col("value").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select((col("user_id") % 2 === 0).as("arm"),
        floor(col("value") * 100).cast("long").as("cents"),
        col("event_type").as("stratum"))
    val emb = CoreQueries.tRead(spark, dir, "embeddings")
    // q383's exact (lang, source) partition frame
    val pairdocs = CoreQueries.tRead(spark, dir, "documents")
      .where(col("lang").isNotNull && col("source").isNotNull)
      .select(col("lang"), col("source"))
    val shell = new WebShell(runner, new CalcEngine(spark, store), audit,
      sources = {
        case "emb"      => emb
        case "ratings"  => ratings
        case "scores"   => scores
        case "subj"     => subj
        case "uplift"   => uplift
        case "arms"     => arms
        case "strat"    => strat
        case "pairdocs" => pairdocs
        case other      => sys.error(s"unknown source $other")
      },
      pipelineStore = Some(store), port = 0).start()
    try {
      val r = post(shell.boundPort, "/pipeline",
        """{"ops":[
          |{"op":"semantic_dedup","table":"emb","id_col":"vec_id",
          | "vec_col":"embedding","min_cosine":0.25,"dims":64,
          | "target_cluster_size":16,"deterministic":true,
          | "out":"p.sem"},
          |{"op":"agreement","method":"icc","table":"ratings",
          | "item_col":"item","rater_col":"rater","value_col":"x",
          | "raters":3,"out":"p.icc"},
          |{"op":"agreement","method":"cronbach","table":"scores",
          | "cols":["s1","s2","s3"],"out":"p.cron"},
          |{"op":"eval","method":"c_index","table":"subj",
          | "time_col":"tenure","event_col":"event",
          | "score_col":"score","out":"p.cidx"},
          |{"op":"eval","method":"qini","table":"uplift",
          | "treated_col":"treated","outcome_col":"event",
          | "score_col":"score","out":"p.qini"},
          |{"op":"eval","method":"srm","table":"arms",
          | "col_a":"arm","expect_a_pm":500,"out":"p.srm"},
          |{"op":"eval","method":"post_strat_ate","table":"strat",
          | "treated_col":"arm","value_col":"cents",
          | "strata_col":"stratum","out":"p.psa"},
          |{"op":"agreement","method":"pair_counting",
          | "table":"pairdocs","col_a":"lang","col_b":"source",
          | "out":"p.pairc"},
          |{"op":"agreement","method":"bcubed","table":"pairdocs",
          | "col_a":"lang","col_b":"source","out":"p.bcub"},
          |{"op":"eval","method":"qte","table":"uplift",
          | "col_a":"treated","col_b":"score","out":"p.qte"}]}"""
          .stripMargin)
      assert(r.statusCode() == 200, s"got ${r.statusCode()} ${r.body()}")
      val deadline = System.nanoTime() + 300_000_000_000L
      while (!audit.taskEvents.exists(e2 =>
               e2.status == "finished_pipeline" || e2.status == "error") &&
             System.nanoTime() < deadline) Thread.sleep(100)
      assert(audit.taskEvents.exists(_.status == "finished_pipeline"),
        s"pipeline did not finish: ${audit.taskEvents}")
      // multi-row results: compare as sorted row sets (the store
      // round-trips through parquet, which may reorder partitions)
      def sortedRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq.toString).sorted.toSeq
      for ((out, gate) <- Seq(
          "p.sem"  -> "q363_semantic_dedup_cc",
          "p.icc"  -> "q367_icc",
          "p.cron" -> "q369_cronbach",
          "p.cidx" -> "q376_c_index",
          "p.qini" -> "q377_qini_curve",
          "p.srm"  -> "q381_srm_check",
          "p.psa"  -> "q382_post_strat_ate",
          "p.pairc" -> "q383_pair_counting",
          "p.bcub" -> "q386_bcubed",
          "p.qte"  -> "q384_qte")) {
        assert(sortedRows(store.read(out)) ==
          sortedRows(SparkEntry.queries(gate)(spark, dir)),
          s"REST $out diverged from the $gate gate")
      }
      // admission validation: out-of-range min_cosine and a short
      // cols[] must 400 BEFORE any background work
      val badMc = post(shell.boundPort, "/pipeline",
        """{"ops":[{"op":"semantic_dedup","table":"emb",
          |"id_col":"vec_id","vec_col":"embedding","min_cosine":1.5,
          |"dims":64,"out":"p.bad"}]}""".stripMargin)
      assert(badMc.statusCode() == 400 &&
        badMc.body().contains("min_cosine"),
        s"got ${badMc.statusCode()} ${badMc.body()}")
      val badCols = post(shell.boundPort, "/pipeline",
        """{"ops":[{"op":"agreement","method":"cronbach",
          |"table":"scores","cols":["s1"],"out":"p.bad"}]}""".stripMargin)
      assert(badCols.statusCode() == 400 &&
        badCols.body().contains("cols"),
        s"got ${badCols.statusCode()} ${badCols.body()}")
    } finally shell.stop()
  }
}
