package graft

import graft.calc.{CalcEngine, ViewQueryMeta}
import graft.io.ParquetTableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CalcEngineSpec extends SparkTestBase {
  import spark.implicits._

  test("calc lifecycle: bind params -> sql -> materialize result table") {
    val store = new ParquetTableStore(spark, tmpDir("calc"))
    val eng = new CalcEngine(spark, store)
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .createOrReplaceTempView("calc_src")
    val meta = ViewQueryMeta(
      name = "q", chTable = "db.res",
      sqlText = "SELECT k, v FROM calc_src WHERE v > {vmin:Decimal(38,6)} AND k <> {kex:UInt32}",
      params = Map("vmin" -> "15", "kex" -> 3))
    val out = eng.calc(meta)
    assert(out.as[(Long, Double)].collect().toSet == Set((2L, 20.0)))
    // re-calc truncates and replaces (not appends)
    eng.calc(meta)
    assert(store.count("db.res") == 1)
  }

  test("hash-partitioned copy-back covers all rows exactly once (partition-union equality)") {
    val store = new ParquetTableStore(spark, tmpDir("calc"))
    val eng = new CalcEngine(spark, store)
    store.overwrite("db.res",
      (1L to 100L).map(i => (i, s"r$i")).toDF("k", "s"))
    val meta = ViewQueryMeta(name = "q", sqlText = "", chTable = "db.res",
      oraTable = Some("ora.t"), copyByPartsCnt = 4,
      copyByPartField = Some("k"))
    val written = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    eng.copyBack(meta, df => {
      assert(df.rdd.getNumPartitions == 4)
      written += df.select("k").as[Long].collect()
    })
    // union over buckets == source, no dupes no loss (cityHash64 vs
    // xxhash64: bucket membership intentionally unasserted, SURVEY.md §7.4)
    assert(written.flatten.sorted.toSeq == (1L to 100L))
  }

  test("local-cache promote: delete matching slices, insert by position (C11)") {
    val store = new ParquetTableStore(spark, tmpDir("calc"))
    val eng = new CalcEngine(spark, store)
    // cache holds slices d=1 (stale) and d=2 (other)
    store.overwrite("cache_t",
      Seq((1L, "stale1"), (2L, "other")).toDF("date_cache", "payload"))
    // fresh result recomputes slice d=1
    store.overwrite("ch_cache_t",
      Seq((1L, "fresh1"), (1L, "fresh2")).toDF("date_cache", "payload"))
    val meta = ViewQueryMeta(name = "q", sqlText = "", chTable = "ch_cache_t",
      copyToLocalCache = true, cacheTable = Some("cache_t"))
    eng.promoteLocalCache(meta, sliceCols = Seq("date_cache"))
    val got = store.read("cache_t").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "fresh1"), (1L, "fresh2"), (2L, "other")))
  }

  test("runAll executes queries in order_by order") {
    val store = new ParquetTableStore(spark, tmpDir("calc"))
    val eng = new CalcEngine(spark, store)
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("calc_src2")
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val metas = Seq(
      2 -> ViewQueryMeta(name = "second", chTable = "db.r2",
        sqlText = "SELECT k FROM calc_src2", oraTable = Some("o2")),
      1 -> ViewQueryMeta(name = "first", chTable = "db.r1",
        sqlText = "SELECT v FROM calc_src2", oraTable = Some("o1")))
    eng.runAll(metas, meta => _ => { order.synchronized { order += meta.name }; () })
    assert(order.toSeq == Seq("first", "second"))
  }
}
