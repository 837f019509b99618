package graft

import graft.compat.ChFunctions
import org.apache.spark.sql.functions._

class ChFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("strptime → Spark pattern translation covers the reference's tokens") {
    assert(ChFunctions.strptimeToSpark("%Y-%m-%d") == "yyyy-MM-dd")
    assert(ChFunctions.strptimeToSpark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(ChFunctions.strptimeToSpark("%d.%m.%y") == "dd.MM.yy")
    // bare literal letters are quoted (Spark reserves all letters)
    assert(ChFunctions.strptimeToSpark("plain") == "'plain'")
    assert(ChFunctions.strptimeToSpark("%H h") == "HH' h'")
    assert(ChFunctions.strptimeToSpark("%Y-%m-%dT%H") == "yyyy-MM-dd'T'HH")
    // unsupported tokens fail eagerly instead of silently mis-parsing
    intercept[graft.types.OraTypeMap.UnsupportedTypeException] {
      ChFunctions.strptimeToSpark("%Y-%j")
    }
  }

  test("SQL aliases: ClickHouse-dialect function names run through spark.sql") {
    ChFunctions.registerSqlAliases(spark)
    val r = spark.sql(
      """SELECT toYear(TIMESTAMP '2024-03-05 10:00:00') AS y,
        |       toYYYYMMDD(TIMESTAMP '2024-03-05 10:00:00') AS ymd,
        |       toString(42) AS s,
        |       toFixedString('hello world', 5) AS fx,
        |       cityHash64('abc') AS h,
        |       parseDateTimeYmd('2024-03-05') AS ts,
        |       today() AS today
        |""".stripMargin).head()
    assert(r.getInt(0) == 2024)
    assert(r.getInt(1) == 20240305)
    assert(r.getString(2) == "42")
    assert(r.getString(3) == "hello")
    assert(r.getLong(4) == Seq("abc").toDF("x")
      .select(xxhash64($"x")).as[Long].head())
    assert(r.getTimestamp(5).toString.startsWith("2024-03-05"))
  }

  test("SQL toString accepts numeric COLUMNS like ClickHouse's (no pre-cast)") {
    // the reference's cached SQL calls toString on numbers
    // (v_cache_for_calc_6184_4626.txt:126,130); the alias is a plain
    // Cast registration, so any castable input works from spark.sql
    ChFunctions.registerSqlAliases(spark)
    Seq((7L, 2.5, "x")).toDF("n", "d", "s").createOrReplaceTempView("tostr_t")
    val r = spark.sql(
      "SELECT toString(n) AS a, toString(d) AS b, toString(s) AS c FROM tostr_t")
      .as[(String, String, String)].head()
    assert(r == (("7", "2.5", "x")))
  }

  test("column helpers: clamp idioms and date conversions") {
    val row = Seq(("2024-06-30", 123L)).toDF("d", "n")
      .select(
        ChFunctions.toYYYYMMDD(to_timestamp($"d")).as("ymd"),
        ChFunctions.lpadNum($"n", 6, "0").as("pad"),
        ChFunctions.coalesceFlag(when($"n" > 1000, $"n")).as("flag"),
        ChFunctions.dateStrToNumber($"d").as("num"),
        ChFunctions.chIf($"n" > 100, lit("big"), lit("small")).as("sz"))
      .head()
    assert(row.getInt(0) == 20240630)
    assert(row.getString(1) == "000123")
    assert(row.getLong(2) == 0L)          // no match → 0 flag
    assert(row.getLong(3) == 20240630L)
    assert(row.getString(4) == "big")
  }
}
