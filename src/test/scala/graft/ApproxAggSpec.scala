package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (HLL++ distinct counts, quantile sketches) —
  * sketch-based ops have engine-specific results so they can't be
  * DuckDB-oracled; correctness contract = bounded relative error vs the
  * exact answer on real data. */
class ApproxAggSpec extends SparkTestBase {
  import spark.implicits._

  lazy val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")

  test("approx_count_distinct within 5% of exact on real keys") {
    val exact = li.select(countDistinct($"l_partkey")).as[Long].head()
    val approx = li.select(approx_count_distinct($"l_partkey", 0.02)).as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("percentile_approx brackets the exact median") {
    val exact = li.select(median($"l_extendedprice")).as[Double].head()
    val approx = li.select(
      percentile_approx($"l_extendedprice", lit(0.5), lit(10000))).as[Double].head()
    // with accuracy 10000 over 60k rows the sketch is near-exact
    assert(math.abs(approx - exact) / exact < 0.01,
      s"exact=$exact approx=$approx")
  }

  test("approx distinct is deterministic across runs (same sketch, same data)") {
    val a = li.select(approx_count_distinct($"l_orderkey")).as[Long].head()
    val b = li.select(approx_count_distinct($"l_orderkey")).as[Long].head()
    assert(a == b)
  }
}
