package graft

import graft.ops.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkTestBase {
  import spark.implicits._

  test("globalRowNumber equals the single-partition window row_number") {
    val df = spark.range(0, 10000).select(
      (col("id") * 7919 % 10007).as("k"))   // shuffled distinct keys
    val viaWindow = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k"))).cast("long"))
    val viaGlobal = GlobalRank.globalRowNumber(df, Seq(col("k")), "rn")
    assert(viaGlobal.as("g").join(viaWindow.as("w"), Seq("k"))
      .filter(col("g.rn") =!= col("w.rn")).count() == 0)
  }

  test("ntileScalable is bit-identical to ntile() OVER (ORDER BY) incl. N<k and N%k>0") {
    for ((n, k) <- Seq((1000, 8), (1003, 8), (5, 8), (8, 8), (17, 4))) {
      val df = spark.range(0, n).select((col("id") * 131 % 100003).as("k"))
      val w = df.withColumn("b",
        ntile(k).over(Window.orderBy(col("k"))))
      val g = GlobalRank.ntileScalable(df, k, Seq(col("k")), "b")
      val diff = g.as("g").join(w.as("w"), Seq("k"))
        .filter(col("g.b") =!= col("w.b")).count()
      assert(diff == 0, s"n=$n k=$k: $diff bucket mismatches")
    }
  }

  test("helper/output column collisions are rejected, not silently clobbered") {
    val withMid = spark.range(3).select(col("id").as("k"), lit(1L).as("__mid"))
    intercept[IllegalArgumentException] {
      GlobalRank.globalRowNumber(withMid, Seq(col("k")))
    }
    val withOut = spark.range(3).select(col("id").as("k"), lit(1L).as("rn"))
    intercept[IllegalArgumentException] {
      GlobalRank.globalRowNumber(withOut, Seq(col("k")), "rn")
    }
  }

  test("scalable ntile plans no window at all") {
    val df = spark.range(0, 100).select(col("id").as("k"))
    val plan = GlobalRank.ntileScalable(df, 4, Seq(col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "scalable ntile must not plan a Window")
  }
}
