package graft

import graft.io.Sources
import graft.io.Sources.JdbcSourceConf
import graft.ops._
import org.apache.spark.sql.functions._

/** Live JDBC round trip against embedded Derby (ships with Spark) — the
  * reference's actual data path is engine-to-engine JDBC
  * (`clickhouse/jdbsChSession.scala:284-309`); round 1 verified option
  * assembly only. This drives the real read → sync-predicate → write
  * cycle through `Sources.readJdbc` / `readJdbcTable` / `writeJdbc`:
  * the same `JdbcSourceConf` would carry an Oracle/ClickHouse URL
  * unchanged. */
class JdbcRoundTripSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftRt;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(sqls: String*): Unit = withConn { c =>
    val st = c.createStatement()
    try sqls.foreach(st.execute) finally st.close()
  }

  private def dropIfExists(t: String): Unit =
    try exec(s"DROP TABLE $t") catch { case _: java.sql.SQLException => () }

  test("JDBC round trip: full pull, decimal-watermark incremental pull, write-back") {
    dropIfExists("APP.SRC_T"); dropIfExists("APP.DST_T")
    exec("CREATE TABLE APP.SRC_T (ID BIGINT NOT NULL, AMT DECIMAL(18,4), TAG VARCHAR(16))")
    exec((1 to 10).map(i => s"INSERT INTO APP.SRC_T VALUES ($i, $i.25, 'r$i')"): _*)

    val conf = JdbcSourceConf(url = url, numPartitions = Some(2))
    val spec = TableSpec(SyncOp.AppendByMax, "APP", "SRC_T",
      syncByColumnMax = Some("AMT"))

    // initial full pull through the assembled pull query
    val full = Sources.readJdbc(spark, conf, Sources.pullQuery(spec))
    assert(full.count() == 10)

    // seed the target with the first 6 rows (writeJdbc creates the table)
    Sources.writeJdbc(full.filter(col("ID") <= 6), conf, "APP.DST_T")

    // watermark probe on the TARGET read back through JDBC — the max is
    // a NATIVE decimal; the pull predicate must render it un-truncated
    val target = Sources.readJdbcTable(spark, conf, "APP.DST_T")
    val wm = Watermark.maxValAndCnt(Some(target), "AMT")
    assert(wm.cntRows == 6)
    val q1 = Sources.pullQuery(spec, maxValue = wm.maxValue)
    assert(q1.contains("AMT > 6.2500"), s"decimal watermark truncated: $q1")

    // incremental pull sees exactly the 4 rows above the watermark
    val delta = Sources.readJdbc(spark, conf, q1)
    assert(delta.count() == 4)
    assert(delta.agg(min(col("ID"))).head().getLong(0) == 7L)

    // append the delta; target now matches the source exactly
    Sources.writeJdbc(delta, conf, "APP.DST_T")
    val after = Sources.readJdbcTable(spark, conf, "APP.DST_T")
    assert(after.count() == 10)
    val sumAmt = after.agg(sum(col("AMT"))).head().getDecimal(0)
    val srcSum = full.agg(sum(col("AMT"))).head().getDecimal(0)
    assert(sumAmt == srcSum)
  }

  test("sessionInitStatement runs before the read (C8 context injection, live)") {
    // Spark runs sessionInitStatement on each DATA connection (not the
    // schema-resolution probe), so prove it via a visible side effect:
    // the init statement logs a row that must exist after the read
    dropIfExists("APP.T_CTX"); dropIfExists("APP.INIT_LOG")
    exec("CREATE TABLE APP.T_CTX (ID BIGINT NOT NULL)",
         "INSERT INTO APP.T_CTX VALUES (1), (2), (3)",
         "CREATE TABLE APP.INIT_LOG (MARK BIGINT)")
    val conf = JdbcSourceConf(url = url,
      sessionInit = Some("INSERT INTO APP.INIT_LOG VALUES (42)"))
    val df = Sources.readJdbc(spark, conf, "SELECT ID FROM APP.T_CTX")
    assert(df.count() == 3)
    val logged = withConn { c =>
      val rs = c.createStatement().executeQuery("SELECT count(*) FROM APP.INIT_LOG")
      rs.next(); rs.getLong(1)
    }
    assert(logged >= 1, "sessionInitStatement never ran on the data connection")
  }

  test("JDBC write respects numPartitions as the connection-pool bound") {
    dropIfExists("APP.POOL_T")
    import spark.implicits._
    val df = (1 to 100).toDF("N").repartition(16)
    Sources.writeJdbc(df, JdbcSourceConf(url = url, numPartitions = Some(2)),
      "APP.POOL_T")
    val back = Sources.readJdbcTable(spark, JdbcSourceConf(url = url), "APP.POOL_T")
    assert(back.count() == 100)
  }
}
