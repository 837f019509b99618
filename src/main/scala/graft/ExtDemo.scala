package graft

import org.apache.spark.sql.SparkSession

/** Proves GraftExtensions wiring: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves vec_dot /
  * vec_cosine in plain SQL — the spark-submit deployment path. Must run
  * in a fresh JVM (sbt "runMain graft.ExtDemo"). */
object ExtDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      "SELECT vec_cosine(array(1.0F, 0.0F), array(2.0F, 0.0F)) AS c, " +
      "       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    println(s"[ext] vec_cosine=${r.getDouble(0)} vec_dot=${r.getDouble(1)}")
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 11.0)
    spark.stop()
  }
}
