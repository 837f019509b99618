package graft.io

import graft.ops.TableSpec
import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}

/** Source/sink adapters (SURVEY.md §2.1 S1–S6).
  *
  * The reference moves data through the ClickHouse `jdbc('ora?...')`
  * bridge — ClickHouse pulls from Oracle server-side
  * (`clickhouse/jdbsChSession.scala:284-309`) — with a dead-but-canonical
  * row-streaming path whose fetch/batch windows document the intended
  * tuning (`:604-656`, fetch_size/batch_size defaults 1000,
  * `task/TaskLogic.scala:281-282`). On Spark both collapse into the JDBC
  * source/sink: per-partition connections replace the connection pool
  * (C9: pool size = parallelism ≡ `numPartitions`), `fetchsize`/
  * `batchsize` map 1:1, and the Oracle session-context injection (C8,
  * `ora/jdbcSession.scala:271-286`) becomes `sessionInitStatement`.
  *
  * Everything here is option plumbing around `spark.read/write` — pure
  * and unit-testable without a live database; the same `JdbcSourceConf`
  * drives a real Oracle/ClickHouse URL unchanged.
  */
object Sources {

  final case class JdbcSourceConf(
      url: String,
      user: String = "",
      password: String = "",
      fetchSize: Int = 1000,            // oraServer.fetch_size default
      batchSize: Int = 1000,            // clickhouseServer.batch_size default
      numPartitions: Option[Int] = None,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      sessionInit: Option[String] = None)  // C8 context injection

  /** Type-directed SQL literal for watermark values, honouring the
    * native-type watermark contract (graft.ops.Watermark.MaxValAndCnt
    * keeps decimal/timestamp values precisely to avoid truncation):
    * integers/decimals render as plain text (`toPlainString` — no
    * scientific notation, no fraction loss, so `c > v` never re-pulls
    * already-loaded rows), temporal values as TO_TIMESTAMP/TO_DATE
    * literals the Oracle side can push down. Anything else fails
    * eagerly (Watermark already rejects string sync columns). */
  private[graft] def sqlLiteral(v: Any): String = v match {
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    case f: Float if java.lang.Float.isFinite(f) =>
      new java.math.BigDecimal(f.toString).toPlainString
    case d: Double if java.lang.Double.isFinite(d) =>
      new java.math.BigDecimal(d.toString).toPlainString
    case f @ (_: Float | _: Double) =>
      // max() over a double column with one NaN row returns NaN (Spark
      // orders NaN above every double) — reject it as the typed error,
      // not a NumberFormatException from BigDecimal
      throw graft.types.OraTypeMap.UnsupportedTypeException(
        s"non-finite watermark value $f — the sync column contains " +
          "NaN/Infinity rows; clean them or use a different sync column")
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal           => d.bigDecimal.toPlainString
    case ts: java.sql.Timestamp  =>
      s"TO_TIMESTAMP('$ts', 'YYYY-MM-DD HH24:MI:SS.FF')"
    case i: java.time.Instant    =>
      s"TO_TIMESTAMP('${java.sql.Timestamp.from(i)}', 'YYYY-MM-DD HH24:MI:SS.FF')"
    case d: java.sql.Date        => s"TO_DATE('$d', 'YYYY-MM-DD')"
    case d: java.time.LocalDate  => s"TO_DATE('$d', 'YYYY-MM-DD')"
    case other => throw graft.types.OraTypeMap.UnsupportedTypeException(
      s"unsupported watermark literal type ${other.getClass.getName} " +
        s"(value $other) — sync_by_column_max supports numeric/timestamp/date")
  }

  /** S1: the Oracle pull query, assembled exactly like the reference's
    * `getDataResultSet` (`ora/jdbcSession.scala:347-373`): projection
    * (only_columns | *), raw where_filter, optional watermark predicate,
    * optional ORDER BY. Returned as text so it can ship to any engine —
    * the Spark reader uses it via the `query` option. The watermark
    * keeps its NATIVE type ([[sqlLiteral]]): an `Option[Long]` surface
    * here would truncate fractional watermarks and re-pull loaded rows. */
  def pullQuery(spec: TableSpec, maxValue: Option[Any] = None): String = {
    val cols = spec.onlyColumns.map(_.mkString(", ").toUpperCase)
      .getOrElse("*")
    val watermark = (spec.syncByColumnMax, maxValue) match {
      case (Some(c), Some(v)) => Some(s"$c > ${sqlLiteral(v)}")
      case _                  => None
    }
    val conds = spec.whereFilter.toSeq ++ watermark.toSeq
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE (", ") AND (", ")")
    val order = spec.orderByOraData.map(o => s" ORDER BY $o").getOrElse("")
    s"SELECT $cols FROM ${spec.fullName}$where$order"
  }

  /** S1/S2: partitioned JDBC read with the reference's fetch-size window
    * and session-context injection. */
  def readJdbc(spark: SparkSession, conf: JdbcSourceConf, query: String): DataFrame =
    jdbcReader(spark, conf).option("query", query).load()

  /** Read a whole table (dbtable form — enables Spark's partitioned read
    * when partitionColumn bounds are set). */
  def readJdbcTable(spark: SparkSession, conf: JdbcSourceConf, table: String): DataFrame = {
    val r = jdbcReader(spark, conf).option("dbtable", table)
    val p = (conf.partitionColumn, conf.lowerBound, conf.upperBound,
             conf.numPartitions) match {
      case (Some(c), Some(lo), Some(hi), Some(n)) =>
        r.option("partitionColumn", c).option("lowerBound", lo)
          .option("upperBound", hi).option("numPartitions", n)
      case _ => r
    }
    p.load()
  }

  private def jdbcReader(spark: SparkSession, conf: JdbcSourceConf): DataFrameReader = {
    var r = spark.read.format("jdbc")
      .option("url", conf.url)
      .option("fetchsize", conf.fetchSize)
    if (conf.user.nonEmpty) r = r.option("user", conf.user)
      .option("password", conf.password)
    conf.sessionInit.foreach(s => r = r.option("sessionInitStatement", s))
    r
  }

  /** S5/S6: batched JDBC write (the reference's copy-back / batched
    * PreparedStatement path). `numPartitions` bounds concurrent
    * connections — the C9 pool-size semantic. */
  def writeJdbc(df: DataFrame, conf: JdbcSourceConf, table: String,
                mode: SaveMode = SaveMode.Append): Unit = {
    val out = conf.numPartitions match {
      case Some(n) if df.rdd.getNumPartitions > n => df.coalesce(n)
      case _                                      => df
    }
    var w = out.write.format("jdbc").mode(mode)
      .option("url", conf.url)
      .option("dbtable", table)
      .option("batchsize", conf.batchSize)
    if (conf.user.nonEmpty) w = w.option("user", conf.user)
      .option("password", conf.password)
    w.save()
  }
}
