package graft

import graft.io.{CatalogTableStore, Sources}
import graft.io.Sources.JdbcSourceConf
import graft.ops._

class SourcesAndCatalogSpec extends SparkTestBase {
  import spark.implicits._

  test("pull query assembles projection, filter, watermark and order like the reference") {
    val spec = TableSpec(SyncOp.AppendByMax, "msk", "t1",
      onlyColumns = Some(Seq("id", "val")),
      whereFilter = Some("val > 0"),
      syncByColumnMax = Some("id"),
      orderByOraData = Some("id desc"))
    assert(Sources.pullQuery(spec, maxValue = Some(42)) ==
      "SELECT ID, VAL FROM msk.t1 WHERE (val > 0) AND (id > 42) ORDER BY id desc")
    assert(Sources.pullQuery(TableSpec(SyncOp.Recreate, "msk", "t2")) ==
      "SELECT * FROM msk.t2")
    // no watermark when target had none (first load)
    assert(Sources.pullQuery(spec.copy(whereFilter = None), maxValue = None) ==
      "SELECT ID, VAL FROM msk.t1 ORDER BY id desc")
  }

  test("watermark literals render type-directed (no Long truncation, temporal pushdown)") {
    // fractional decimal watermark must NOT truncate (re-pull bug)
    assert(Sources.sqlLiteral(new java.math.BigDecimal("123.456789")) == "123.456789")
    assert(Sources.sqlLiteral(BigDecimal("9" * 20 + ".5")) == "9" * 20 + ".5")
    assert(Sources.sqlLiteral(42L) == "42")
    assert(Sources.sqlLiteral(0.25d) == "0.25")
    assert(Sources.sqlLiteral(java.sql.Timestamp.valueOf("2024-03-05 10:11:12.25")) ==
      "TO_TIMESTAMP('2024-03-05 10:11:12.25', 'YYYY-MM-DD HH24:MI:SS.FF')")
    assert(Sources.sqlLiteral(java.sql.Date.valueOf("2024-03-05")) ==
      "TO_DATE('2024-03-05', 'YYYY-MM-DD')")
    // through pullQuery: native decimal watermark in the predicate
    val spec = TableSpec(SyncOp.AppendByMax, "msk", "t1",
      syncByColumnMax = Some("amt"))
    assert(Sources.pullQuery(spec, maxValue = Some(new java.math.BigDecimal("10.5"))) ==
      "SELECT * FROM msk.t1 WHERE (amt > 10.5)")
    // unsupported literal type fails eagerly, not silently
    intercept[graft.types.OraTypeMap.UnsupportedTypeException] {
      Sources.sqlLiteral("2024-01-01")
    }
  }

  test("jdbc conf carries reference defaults (fetch/batch 1000)") {
    val c = JdbcSourceConf(url = "jdbc:h2:mem:x")
    assert(c.fetchSize == 1000 && c.batchSize == 1000)
  }

  test("catalog store: database creation, staged overwrite, append, truncate, drop") {
    val store = new CatalogTableStore(spark)
    store.overwrite("wh1.t", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    assert(spark.catalog.databaseExists("wh1"))
    assert(store.count("wh1.t") == 2)
    // self-referential overwrite (the trap saveAsTable(Overwrite) rejects)
    store.overwrite("wh1.t", store.read("wh1.t").filter($"id" === 1))
    assert(store.read("wh1.t").select("id").as[Long].collect().toSeq == Seq(1L))
    store.append("wh1.t", Seq((3L, "c")).toDF("id", "s"))
    assert(store.count("wh1.t") == 2)
    store.truncate("wh1.t")
    assert(store.exists("wh1.t") && store.count("wh1.t") == 0)
    store.drop("wh1.t")
    assert(!store.exists("wh1.t"))
  }

  test("staging cleanup reclaims only THIS table's expired leftovers, not a sibling's") {
    val store = new CatalogTableStore(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS wh4")
    val oldMillis = f"${System.currentTimeMillis() - 2L * 60 * 60 * 1000}%013d"
    // an expired leftover of table `t` itself — must be reclaimed...
    Seq((1L, "stale")).toDF("id", "s")
      .write.saveAsTable(s"wh4.__staging_t_${oldMillis}_00ab12")
    // ...and a staging table of the SIBLING `t_1`, whose name ALSO starts
    // with the prefix `__staging_t_` — a prefix match would parse its
    // "1" as an ancient timestamp and drop a live concurrent overwrite
    Seq((9L, "live")).toDF("id", "s")
      .write.saveAsTable(s"wh4.__staging_t_1_${oldMillis}_00cd34")
    store.overwrite("wh4.t", Seq((2L, "x")).toDF("id", "s"))
    val names = spark.catalog.listTables("wh4").collect().map(_.name).toSet
    assert(!names.exists(n => n.startsWith("__staging_t_") && n.endsWith("00ab12")),
      "expired staging leftover of t was not reclaimed")
    assert(names.contains(s"__staging_t_1_${oldMillis}_00cd34"),
      "sibling table's staging table was wrongly dropped")
    spark.sql("DROP DATABASE wh4 CASCADE")
  }

  test("catalog store: primary key kept in table properties (S10)") {
    val store = new CatalogTableStore(spark)
    store.overwrite("wh1.pkt", Seq((1L, 2L, "x")).toDF("k1", "k2", "v"))
    assert(store.primaryKey("wh1.pkt").isEmpty)
    store.setPrimaryKey("wh1.pkt", Seq("k1", "k2"))
    assert(store.primaryKey("wh1.pkt") == Seq("k1", "k2"))
    store.drop("wh1.pkt")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val store = new CatalogTableStore(spark)
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "vb")
    store.overwriteBucketed("wh3.ta", a, numBuckets = 4, Seq("k"))
    store.overwriteBucketed("wh3.tb", b, numBuckets = 4, Seq("k"))
    // disable auto-broadcast so the planner must pick the bucket-aware
    // sort-merge join (at real scale neither side fits a broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("wh3.ta").join(spark.table("wh3.tb"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(joined.count() == 1000)
      assert(joined.filter($"k" === 7L).select("va", "vb")
        .as[(String, Long)].head() == (("a7", 14L)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    store.drop("wh3.ta"); store.drop("wh3.tb")
  }

  test("catalog store drives the full sync engine (W1+W3) and compaction") {
    val store = new CatalogTableStore(spark)
    val eng = new SyncEngine(store)
    val src = (1L to 30L).map(i => (i, s"r$i")).toDF("id", "name")
    eng.recreate(TableSpec(SyncOp.Recreate, "wh2", "t").validate(),
      src.filter($"id" <= 10))
    val r = eng.appendByMax(TableSpec(SyncOp.AppendByMax, "wh2", "t",
      syncByColumnMax = Some("id")).validate(), src)
    assert(r.rowsAfter == 30)
    store.compact("wh2.t", targetFiles = 1)
    assert(store.count("wh2.t") == 30)
    store.drop("wh2.t")
  }
}
