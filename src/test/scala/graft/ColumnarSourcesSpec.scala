package graft

import graft.io.ColumnarSources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** io/ColumnarSources — ORC round-trip fidelity, scan-level pushdown,
  * and schema-evolved parquet reads. */
class ColumnarSourcesSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("v", DoubleType)))

  test("ORC round trip is lossless, including nulls and empty strings") {
    val df = Seq((1L, "a", 1.5), (2L, "", -0.0), (3L, null.asInstanceOf[String], Double.NaN))
      .toDF("id", "s", "v")
    val tmp = java.nio.file.Files.createTempDirectory("orcspec").toString
    ColumnarSources.writeOrc(df, tmp)
    val back = ColumnarSources.readOrc(spark, tmp, schema)
    assert(back.schema == schema)
    val rows = back.as[(Long, Option[String], Double)].collect().toSet
    assert(rows.map(r => (r._1, r._2)) ==
      Set((1L, Some("a")), (2L, Some("")), (3L, None)))
    // NaN and -0.0 survive bit-faithfully
    val byId = back.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(java.lang.Double.doubleToRawLongBits(byId(2L)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(byId(3L).isNaN)
  }

  test("ORC scan prunes columns and pushes filters") {
    val tmp = java.nio.file.Files.createTempDirectory("orcpush").toString
    ColumnarSources.writeOrc(
      spark.range(1000).select(col("id"), col("id").cast("string").as("s"),
        (col("id") * 2).cast("double").as("v")), tmp)
    val q = ColumnarSources.readOrc(spark, tmp, schema)
      .filter(col("id") > 900).select(col("id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,900)]"),
      s"filter did not reach the ORC scan:\n$plan")
    assert(q.count() == 99)
  }

  test("readParquetMerged unions evolved shard schemas with NULL fill") {
    val tmp = java.nio.file.Files.createTempDirectory("pqmerge").toString
    Seq((1L, "x")).toDF("id", "s").write.mode("overwrite").parquet(tmp)
    Seq((2L, "y", 9L)).toDF("id", "s", "extra")
      .write.mode("append").parquet(tmp)
    val merged = ColumnarSources.readParquetMerged(spark, tmp)
    assert(merged.schema.fieldNames.toSet == Set("id", "s", "extra"))
    val got = merged.select("id", "extra").as[(Long, Option[Long])]
      .collect().toSet
    assert(got == Set((1L, None), (2L, Some(9L))))
  }
}
