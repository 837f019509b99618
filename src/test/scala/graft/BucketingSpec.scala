package graft

import graft.ops.Bucketing
import org.apache.spark.sql.functions._

/** ops/Bucketing — the layout declaration must actually buy the plan:
  * a join of two co-bucketed tables runs with ZERO exchanges (and no
  * per-side sort), a groupBy on the bucket key aggregates
  * shuffle-free, and results equal the plain-shuffle join. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  private def withSmjOnly[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private lazy val tables: (String, String) = {
    val facts = (0 until 2000).map(i => (i.toLong % 97, i.toLong, i * 3L))
      .toDF("k", "row_id", "v")
    val dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "bspec_facts", Seq("k"), 8)
    Bucketing.writeBucketed(dims, "bspec_dims", Seq("k"), 8)
    ("bspec_facts", "bspec_dims")
  }

  test("co-bucketed join plans zero exchanges; residual sorts are local") {
    val (ft, dt) = tables
    withSmjOnly {
      val joined = Bucketing.readBucketed(spark, ft)
        .join(Bucketing.readBucketed(spark, dt), Seq("k"))
      joined.count() // materialize so AQE settles the final plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n${plan.take(800)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("MergeJoin"),
        s"expected a merge join:\n${plan.take(400)}")
      // Spark 4 no longer derives output ordering from bucket sort
      // metadata (the pre-3.0 behavior and its legacy conf are gone),
      // so a Sort node remains — but it must be LOCAL (global=false:
      // per-bucket in-task, no range exchange behind it)
      assert(!plan.contains("], true, 0"),
        s"any residual sort must be local, never global:\n${plan.take(800)}")
      assert(plan.contains("SelectedBucketsCount"),
        "both sides must scan as bucketed tables")
    }
  }

  test("co-bucketed join returns exactly the plain join's rows") {
    val (ft, dt) = tables
    val bucketed = Bucketing.readBucketed(spark, ft)
      .join(Bucketing.readBucketed(spark, dt), Seq("k"))
      .select($"k", $"row_id", $"v", $"name")
      .as[(Long, Long, Long, String)].collect().toSet
    val facts = (0 until 2000).map(i => (i.toLong % 97, i.toLong, i * 3L))
      .toDF("k", "row_id", "v")
    val dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = facts.join(dims, Seq("k"))
      .select($"k", $"row_id", $"v", $"name")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(bucketed == plain)
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val (ft, _) = tables
    val agg = Bucketing.readBucketed(spark, ft)
      .groupBy($"k").agg(sum($"v").as("sv"))
    agg.count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must not shuffle:\n${plan.take(800)}")
    // values still exact
    val got = agg.as[(Long, Long)].collect().toMap
    val want = (0 until 2000).map(i => (i.toLong % 97, i * 3L))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(got == want)
  }

  test("writeBucketed validates its arguments") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(df, "bspec_bad", Seq.empty, 4)
    }
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(df, "bspec_bad", Seq("k"), 0)
    }
  }
}
