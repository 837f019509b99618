package graft

import graft.functions.TopKByScore
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  test("bounded top-k aggregator equals the row_number window (ties broken by payload)") {
    // scores with deliberate ties so the payload tiebreak is exercised
    val df = spark.range(0, 5000).select(
      ($"id" % 37).as("g"), (($"id" * 31 % 100) / 10.0).as("s"), $"id".as("p"))
    val agg = new TopKByScore(4)
    val viaAgg = df.as[(Long, Double, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (g, buf) =>
        buf.items.zipWithIndex.map { case ((s, p), i) => (g, p, i + 1) } }
      .toDF("g", "p", "rnk")
    val viaWindow = df.withColumn("rnk",
        row_number().over(Window.partitionBy($"g").orderBy($"s".desc, $"p".asc)))
      .filter($"rnk" <= 4).select($"g", $"p", $"rnk")
    val n = viaWindow.count()
    assert(viaAgg.count() == n)
    val joined = viaAgg.as("a").join(viaWindow.as("w"), Seq("g", "p")).cache()
    // the join itself must cover every row — equal counts with
    // different row SETS would otherwise pass vacuously
    assert(joined.count() == n)
    assert(joined.filter(col("a.rnk") =!= col("w.rnk")).count() == 0)
  }

  test("aggregation is partial (map-side combine) and plans no window") {
    val df = spark.range(0, 100).select(($"id" % 5).as("g"), ($"id" * 1.0).as("s"), $"id".as("p"))
    val agg = new TopKByScore(2)
    val plan = df.as[(Long, Double, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("topk"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    // typed aggregators plan ObjectHashAggregate/SortAggregate with a
    // partial stage before the exchange
    assert(plan.toLowerCase.contains("aggregate"))
    assert(plan.contains("partial"), s"expected partial aggregation:\n$plan")
  }

  test("groups smaller than k return all rows ranked") {
    val agg = new TopKByScore(10)
    val out = Seq((1L, 5.0, 100L), (1L, 7.0, 101L)).toDF("g", "s", "p")
      .as[(Long, Double, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (g, buf) => buf.items.map(_._2) }.collect().toSeq
    assert(out == Seq(101L, 100L))
  }
}
