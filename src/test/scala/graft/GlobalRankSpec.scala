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

  test("globalRunningSum equals the single-partition window running sum") {
    val df = spark.range(0, 5000).select(
      (col("id") * 7919 % 10007).as("k"),
      (col("id") % 37 + 1).as("v"))
    val viaWindow = df.withColumn("cum",
      sum(col("v")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val viaGlobal = GlobalRank.globalRunningSum(df, Seq(col("k")), "v", "cum")
    assert(viaGlobal.as("g").join(viaWindow.as("w"), Seq("k"))
      .filter(col("g.cum") =!= col("w.cum")).count() == 0)
    // the only window in the plan partitions by the range-partition id —
    // never a global (empty-partition) window
    val plan = viaGlobal.queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") ||
           !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      "running sum must not plan an unpartitioned window")
  }

  test("takeWhileBudget: inclusive boundary, zero-value rows at the edge survive") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, 5L), (4L, 0L), (5L, 1L))
      .toDF("id", "v")
    // cum: 10, 10, 15, 15, 16 — budget 15 keeps ids 1..4 (the zero-value
    // row AT the boundary included), id 5 tips over
    val kept = GlobalRank.takeWhileBudget(df, Seq(col("id")), "v", budget = 15L)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(kept.keySet == Set(1L, 2L, 3L, 4L))
    assert(kept(4L) == 15L)
    // budget below the first row -> empty prefix
    assert(GlobalRank.takeWhileBudget(df, Seq(col("id")), "v", 9L).count() == 0)
    // column guards match the rest of the file's discipline
    intercept[IllegalArgumentException] {
      GlobalRank.globalRunningSum(
        df.withColumn("cum", lit(1L)), Seq(col("id")), "v", "cum")
    }
  }

  test("scalable ntile plans no window at all") {
    val df = spark.range(0, 100).select(col("id").as("k"))
    val plan = GlobalRank.ntileScalable(df, 4, Seq(col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "scalable ntile must not plan a Window")
  }

  // ---- interleaveSources ------------------------------------------

  private lazy val mixed = spark.range(0, 1200).select(
    col("id"),
    when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
      .otherwise("c").as("src"))   // 400 rows each

  test("interleave: any epoch prefix holds sources in weight proportion") {
    val epoch = GlobalRank.interleaveSources(mixed, col("src"), col("id"),
        col("id"), Seq("a" -> 1, "b" -> 2, "c" -> 3))
      .orderBy("epoch_rank")
      .select("src", "epoch_rank").as[(String, Long)].collect()
    // weights 1:2:3 → in the first 120 rows expect 20/40/60 ± the
    // interleave phase (at most one row per source of drift)
    for (n <- Seq(60, 120, 300)) {
      val c = epoch.take(n).groupBy(_._1).view.mapValues(_.length).toMap
      assert(math.abs(c("a") - n / 6) <= 1, s"prefix $n: $c")
      assert(math.abs(c("b") - n / 3) <= 1, s"prefix $n: $c")
      assert(math.abs(c("c") - n / 2) <= 1, s"prefix $n: $c")
    }
    // total = everything with a listed source, ranks dense from 1
    assert(epoch.length == 1200)
    assert(epoch.map(_._2).toSet == (1L to 1200L).toSet)
  }

  test("interleave equals the window reference and is partition-independent") {
    val weights = Seq("a" -> 1, "b" -> 2, "c" -> 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      GlobalRank.interleaveSources(df, col("src"), col("id"), col("id"),
          weights)
        .select("id", "epoch_rank").as[(Long, Long)].collect().toMap
    val got = run(mixed)
    assert(got == run(mixed.repartition(17)))
    val wCol = element_at(
      map(weights.flatMap { case (s, w) => Seq(lit(s), lit(w.toLong)) }: _*),
      col("src"))
    val ref = mixed
      .withColumn("src_rank",
        row_number().over(Window.partitionBy("src").orderBy("id")).cast("long"))
      .withColumn("wt", wCol)
      .withColumn("vt", expr(s"src_rank * ${GlobalRank.VtScale}L DIV wt"))
      .withColumn("epoch_rank",
        row_number().over(Window.orderBy(col("vt"), col("src"), col("src_rank")))
          .cast("long"))
      .select("id", "epoch_rank").as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  test("curriculum: stages ascend with difficulty, epoch walks stages in order") {
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") * 7919 % 997).as("diff"))
    val out = GlobalRank.curriculumOrder(df, col("diff"), col("id"),
        stages = 4, shuffleKey = col("id") * 31 % 101)
      .select(col("id"), col("diff"), col("stage"), col("epoch_rank"))
      .as[(Long, Long, Int, Long)].collect()
    // every stage-1 difficulty <= every stage-2 difficulty, etc.
    val maxByStage = out.groupBy(_._3).view.mapValues(_.map(_._2).max).toMap
    val minByStage = out.groupBy(_._3).view.mapValues(_.map(_._2).min).toMap
    for (s <- 1 to 3) assert(maxByStage(s) <= minByStage(s + 1))
    // epoch order is stage-major
    val stagesInOrder = out.sortBy(_._4).map(_._3).toSeq
    assert(stagesInOrder == stagesInOrder.sorted)
    // within a stage the order follows the shuffle key, not difficulty
    val s1 = out.filter(_._3 == 1).sortBy(_._4).map(_._2).toSeq
    assert(s1 != s1.sorted, "stage must be shuffled, not difficulty-sorted")
    assert(out.map(_._4).toSet == (1L to 1000L).toSet)
  }

  test("interleave drops unlisted sources and validates weights") {
    val epoch = GlobalRank.interleaveSources(mixed, col("src"), col("id"),
      col("id"), Seq("a" -> 1))
    assert(epoch.select("src").distinct().as[String].collect().toSeq == Seq("a"))
    intercept[IllegalArgumentException] {
      GlobalRank.interleaveSources(mixed, col("src"), col("id"), col("id"), Nil)
    }
    intercept[IllegalArgumentException] {
      GlobalRank.interleaveSources(mixed, col("src"), col("id"), col("id"),
        Seq("a" -> 0))
    }
    intercept[IllegalArgumentException] {
      GlobalRank.interleaveSources(mixed, col("src"), col("id"), col("id"),
        Seq("a" -> 1, "a" -> 2))
    }
  }

  test("percentRanks matches SQL percent_rank/cume_dist semantics on ties") {
    // values 10, 20, 20, 30 (n=4): SQL says
    //   pr: 0, 1/3, 1/3, 1 → ppm 0, 333333, 333333, 1000000
    //   cume: 1/4, 3/4, 3/4, 1 → ppm 250000, 750000, 750000, 1000000
    val df = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L)).toDF("id", "v")
    val m = GlobalRank.percentRanks(df, "v")
      .select(col("id"), col("pr_ppm"), col("cume_ppm"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((0L, 250000L)))
    assert(m(2L) == ((333333L, 750000L)))
    assert(m(3L) == ((333333L, 750000L)))
    assert(m(4L) == ((1000000L, 1000000L)))
    // single row: pr defined 0, cume 1
    val one = GlobalRank.percentRanks(Seq((9L, 5L)).toDF("id", "v"), "v")
      .select(col("pr_ppm"), col("cume_ppm")).as[(Long, Long)].collect().head
    assert(one == ((0L, 1000000L)))
    // partition independence
    val again = GlobalRank.percentRanks(df.repartition(5), "v")
      .select(col("id"), col("pr_ppm"), col("cume_ppm"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == m)
  }
}
