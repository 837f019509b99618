package graft

import graft.functions.ZOrderFunctions
import graft.ops.Layout
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("morton code interleaves bits correctly (known values)") {
    // (x=0b11, y=0b01), 2 bits/dim → bits: x0→b0, y0→b1, x1→b2, y1→b3
    // x=3 (11), y=1 (01): b0=1, b1=1, b2=1, b3=0 → 0b0111 = 7
    val got = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrderFunctions.zorderCode(Seq($"x", $"y"), 2).as("z"))
      .as[Long].head()
    assert(got == 7L)
    // clamping: negative → 0, over-range → max
    val clamped = Seq((-5L, 100L)).toDF("x", "y")
      .select(ZOrderFunctions.zorderCode(Seq($"x", $"y"), 2).as("z"))
      .as[Long].head()
    // x→0 (00), y→3 (11): b1=1, b3=1 → 0b1010 = 10
    assert(clamped == 10L)
  }

  test("morton code is monotonic in each dimension holding others fixed") {
    val df = spark.range(0, 64).select(($"id" % 8).as("x"), expr("id div 8").as("y"))
    val codes = df.select($"x", $"y",
        ZOrderFunctions.zorderCode(Seq($"x", $"y"), 3).as("z"))
      .as[(Long, Long, Long)].collect()
    val byY = codes.groupBy(_._2)
    byY.values.foreach { row =>
      val sorted = row.sortBy(_._1)
      assert(sorted.map(_._3).sliding(2).forall(p => p.head < p.last),
        "z must increase with x at fixed y")
    }
  }

  test("z-order clustering bounds per-partition span in BOTH dimensions") {
    // 64x64 grid, shuffled; cluster into 16 partitions
    val n = 64
    val grid = spark.range(0, n.toLong * n, 1, 8)
      .select(($"id" % n).as("x"), expr(s"id div $n").as("y"))
      .orderBy(xxhash64($"x", $"y"))   // destroy any natural order
    val z = Layout.withZOrderCode(grid, Seq("x", "y"), bitsPerDim = 6)
      .repartitionByRange(16, col("__zcode"))
      .sortWithinPartitions(col("__zcode"))
    val spans = z.groupBy(spark_partition_id().as("pid"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .select(max($"sx"), max($"sy")).as[(Long, Long)].head()
    // a single-column sort would leave the other dimension at full span
    // (63); the z-curve keeps BOTH spans a fraction of the grid
    assert(spans._1 < n / 2 && spans._2 < n / 2,
      s"per-partition spans too wide: $spans")
    // contrast: x-only range sort leaves y at full span
    val xSorted = grid.repartitionByRange(16, col("x"))
    val ySpan = xSorted.groupBy(spark_partition_id())
      .agg((max($"y") - min($"y")).as("sy"))
      .select(max($"sy")).as[Long].head()
    assert(ySpan >= n - 1, "sanity: single-column layout cannot bound y")
  }

  test("whole-stage codegen handles the zorder expression (no fallback)") {
    val df = spark.range(0, 1000).select($"id".as("x"), ($"id" * 7 % 1000).as("y"))
    val plan = df.select(ZOrderFunctions.zorderCode(Seq($"x", $"y"), 10))
      .queryExecution.executedPlan.toString
    // whole-stage-codegen stages render with a "*(n)" prefix
    assert(plan.contains("*("), s"expected codegen span:\n$plan")
  }
}
