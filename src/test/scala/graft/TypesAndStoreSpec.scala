package graft

import graft.io.ParquetTableStore
import graft.types.OraTypeMap
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TypesAndStoreSpec extends SparkTestBase {
  import spark.implicits._

  test("Oracle type mapping follows OraChColumn rules") {
    assert(OraTypeMap.toSparkField("id", "NUMBER", 0, isNullable = true).dataType == LongType)
    assert(OraTypeMap.toSparkField("amt", "NUMBER", 2, isNullable = true).dataType == DecimalType(38, 6))
    assert(OraTypeMap.toSparkField("s", "VARCHAR2", 0, isNullable = true).dataType == StringType)
    assert(OraTypeMap.toSparkField("d", "DATE", 0, isNullable = true).dataType == TimestampType)
    assert(OraTypeMap.toSparkField("c", "CLOB", 0, isNullable = true).dataType == StringType)
    intercept[OraTypeMap.UnsupportedTypeException](
      OraTypeMap.toSparkField("b", "BLOB", 0, isNullable = true))
  }

  test("nullability: rn and notnull_columns force NOT NULL") {
    assert(!OraTypeMap.toSparkField("rn", "NUMBER", 0, isNullable = true).nullable)
    assert(!OraTypeMap.toSparkField("pk", "NUMBER", 0, isNullable = true,
      notNullColumns = Seq("PK")).nullable)
    assert(OraTypeMap.toSparkField("x", "NUMBER", 0, isNullable = true).nullable)
  }

  test("date clamp: epoch<=0 -> 1971-01-01, epoch>=high -> 2106-01-01, in-range untouched") {
    val df = Seq(
      "1960-05-05 00:00:00",   // pre-epoch → clamps low
      "2024-06-01 12:00:00",   // in range  → untouched
      "2150-01-01 00:00:00"    // post-2106 → clamps high
    ).toDF("s").select(to_timestamp($"s").as("ts"))
    val got = df.select(date_format(OraTypeMap.clampDateTime($"ts"),
      "yyyy-MM-dd HH:mm:ss")).as[String].collect().toSeq
    assert(got == Seq("1971-01-01 00:00:00", "2024-06-01 12:00:00",
      "2106-01-01 00:00:00"))
  }

  test("normalize reorders, casts and clamps to the target schema") {
    val target = StructType(Seq(
      StructField("id", LongType), StructField("amt", DecimalType(38, 6))))
    val df = Seq(("12.5", "7")).toDF("amt", "id")
    val out = OraTypeMap.normalize(df, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq("id" -> LongType, "amt" -> DecimalType(38, 6)))
    assert(out.as[(Long, BigDecimal)].head() == ((7L, BigDecimal("12.5"))))
  }

  test("fromJdbcMetadata infers the schema like the reference's ResultSet path") {
    // minimal ResultSetMetaData stub: (name, typeName, scale, nullable)
    val cols = Seq(("ID", "NUMBER", 0, false), ("AMT", "NUMBER", 2, true),
                   ("NAME", "VARCHAR2", 0, true), ("DT", "DATE", 0, true),
                   ("RN", "NUMBER", 0, true))
    val md = java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader,
      Array(classOf[java.sql.ResultSetMetaData]),
      (_, method, margs) => method.getName match {
        case "getColumnCount"    => Integer.valueOf(cols.size)
        case "getColumnName"     => cols(margs(0).asInstanceOf[Int] - 1)._1
        case "getColumnTypeName" => cols(margs(0).asInstanceOf[Int] - 1)._2
        case "getScale"          => Integer.valueOf(cols(margs(0).asInstanceOf[Int] - 1)._3)
        case "isNullable"        =>
          Integer.valueOf(if (cols(margs(0).asInstanceOf[Int] - 1)._4)
            java.sql.ResultSetMetaData.columnNullable
          else java.sql.ResultSetMetaData.columnNoNulls)
        case other => throw new UnsupportedOperationException(other)
      }).asInstanceOf[java.sql.ResultSetMetaData]
    val schema = OraTypeMap.fromJdbcMetadata(md)
    assert(schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq == Seq(
      ("ID", LongType, false), ("AMT", DecimalType(38, 6), true),
      ("NAME", StringType, true), ("DT", TimestampType, true),
      ("RN", LongType, false)))   // rn forced NOT NULL despite metadata
  }

  test("store overwrite is safe for read-modify-write over the same table") {
    val store = new ParquetTableStore(spark, tmpDir("store"))
    store.overwrite("db.t", (1L to 10L).toDF("id"))
    // derive from the table being overwritten — the classic parquet
    // self-overwrite trap; staged swap must make this safe
    val derived = store.read("db.t").filter($"id" <= 5)
    store.overwrite("db.t", derived)
    assert(store.read("db.t").as[Long].collect().sorted.toSeq == (1L to 5L))
  }

  test("truncate empties but keeps schema; drop removes") {
    val store = new ParquetTableStore(spark, tmpDir("store"))
    store.overwrite("db.t", Seq((1L, "a")).toDF("id", "s"))
    store.truncate("db.t")
    assert(store.exists("db.t") && store.count("db.t") == 0)
    assert(store.read("db.t").columns.toSeq == Seq("id", "s"))
    store.drop("db.t")
    assert(!store.exists("db.t"))
  }
}
