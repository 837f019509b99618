package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  // build: price snapshots per symbol; probe: trades to be stamped with
  // the price that was live at trade time
  lazy val snaps = Seq(
    ("A", 10L, 100.0), ("A", 20L, 110.0), ("A", 30L, 120.0),
    ("B", 15L, 7.0)
  ).toDF("sym", "snap_ts", "price")
  lazy val trades = Seq(
    (1L, "A", 5L),    // before any snapshot → null
    (2L, "A", 10L),   // exactly at a snapshot → inclusive (<=)
    (3L, "A", 25L),   // between snapshots → 20L one
    (4L, "A", 99L),   // after all → latest
    (5L, "B", 14L),   // before B's only snapshot → null
    (6L, "C", 50L)    // key with no build rows at all → null
  ).toDF("trade_id", "sym", "trade_ts")

  test("asof backward: inclusive ties, gaps, missing keys") {
    val got = AsofJoin.asofBackward(trades, snaps,
        keyCols = Seq("sym"), probeTs = "trade_ts", buildTs = "snap_ts",
        payloadCols = Seq("price"))
      .select($"trade_id", $"price").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(110.0),
      4L -> Some(120.0), 5L -> None, 6L -> None))
  }

  test("equal-ts build rows resolve by the tie column (last wins)") {
    val dup = snaps.unionByName(Seq(("A", 20L, 111.0)).toDF("sym", "snap_ts", "price"))
    val got = AsofJoin.asofBackward(trades.filter($"trade_id" === 3), dup,
        keyCols = Seq("sym"), probeTs = "trade_ts", buildTs = "snap_ts",
        payloadCols = Seq("price"), tieCols = Seq("price"))
      .select($"price").as[Double].head()
    assert(got == 111.0)   // 111.0 > 110.0 in tie order → last wins
  }

  test("numeric tiebreakers order natively, not lexicographically") {
    // seq 9 vs 10: lexicographic would pick 9 ("10" < "9"); native picks 10
    val build2 = Seq(("A", 20L, 9L, 9.0), ("A", 20L, 10L, 10.0))
      .toDF("sym", "snap_ts", "seq", "price")
    val probe2 = Seq((1L, "A", 25L)).toDF("trade_id", "sym", "trade_ts")
    val got = AsofJoin.asofBackward(probe2, build2,
        keyCols = Seq("sym"), probeTs = "trade_ts", buildTs = "snap_ts",
        payloadCols = Seq("price"), tieCols = Seq("seq"))
      .select($"price").as[Double].head()
    assert(got == 10.0,
      s"tiebreak must use the column's natural numeric order, got $got")
  }

  test("null-ts build rows never match; null-ts probe rows survive unmatched") {
    val build2 = Seq((Option(10L), 1L), (Option.empty[Long], 99L))
      .toDF("snap_ts", "payload").withColumn("sym", lit("A"))
    val probe2 = Seq((1L, Option(20L)), (2L, Option(5L)), (3L, Option.empty[Long]))
      .toDF("trade_id", "trade_ts").withColumn("sym", lit("A"))
    val got = AsofJoin.asofBackward(probe2, build2,
        keyCols = Seq("sym"), probeTs = "trade_ts", buildTs = "snap_ts",
        payloadCols = Seq("payload"))
      .select($"trade_id", $"payload").as[(Long, Option[Long])]
      .collect().toMap
    // the null-ts build row (payload 99) must never be carried: not onto
    // the pre-snapshot probe (id 2), not onto the null-ts probe (id 3)
    assert(got == Map(1L -> Some(1L), 2L -> None, 3L -> None))
  }

  test("matches an inequality-join formulation on real events (sf0.001)") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts".as("ts_ns"))
    val purch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"event_id")
      .groupBy($"user_id", $"pts").agg(min($"event_id").as("purchase_id"))
    val got = AsofJoin.asofBackward(clicks, purch,
        keyCols = Seq("user_id"), probeTs = "ts_ns", buildTs = "pts",
        payloadCols = Seq("purchase_id", "pts"))
      .select($"event_id", coalesce($"purchase_id", lit(-1L)))
      .as[(Long, Long)].collect().toMap
    // reference: plain inequality join + max-ts pick (exploding plan —
    // fine at spec scale, the thing asofBackward exists to avoid)
    val ref = clicks.join(purch,
        clicks("user_id") === purch("user_id") && $"pts" <= $"ts_ns", "left")
      .groupBy(clicks("event_id").as("event_id"))
      .agg(max(struct($"pts", $"purchase_id")).as("m"))
      .select($"event_id", coalesce($"m.purchase_id", lit(-1L)))
      .as[(Long, Long)].collect().toMap
    assert(got == ref)
    assert(got.values.exists(_ >= 0), "fixture must produce real matches")
  }

  test("plans one window over the key, never a nested-loop or range join") {
    val plan = AsofJoin.asofBackward(trades, snaps,
        keyCols = Seq("sym"), probeTs = "trade_ts", buildTs = "snap_ts",
        payloadCols = Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
      s"as-of join must not plan a nested loop:\n${plan.take(600)}")
    assert(plan.contains("Window"), "expected the carry-forward window")
  }

  test("a matched build row is attached AS-IS: its null fields stay null") {
    // build rows: (ts=10, a=1, b=2) then (ts=20, a=null, b=3). A probe at
    // 25 matches the ts=20 ROW — per-column null-skipping would stitch
    // (a=1, b=3), a row that never existed
    val build2 = Seq(("A", 10L, Option(1L), Option(2L)),
                     ("A", 20L, Option.empty[Long], Option(3L)))
      .toDF("sym", "snap_ts", "a", "b")
    val probe2 = Seq((1L, "A", 25L)).toDF("trade_id", "sym", "trade_ts")
    val got = AsofJoin.asofBackward(probe2, build2,
        keyCols = Seq("sym"), probeTs = "trade_ts", buildTs = "snap_ts",
        payloadCols = Seq("a", "b"))
      .select($"a", $"b").as[(Option[Long], Option[Long])].head()
    assert(got == ((None, Some(3L))), s"expected the ts=20 row as-is, got $got")
  }

  test("null-key build rows never match (SQL equality semantics)") {
    val build2 = Seq((Option("A"), 10L, 1L), (Option.empty[String], 5L, 99L))
      .toDF("sym", "snap_ts", "payload")
    val probe2 = Seq((1L, Option("A"), 20L), (2L, Option.empty[String], 20L))
      .toDF("trade_id", "sym", "trade_ts")
    val got = AsofJoin.asofBackward(probe2, build2,
        keyCols = Seq("sym"), probeTs = "trade_ts", buildTs = "snap_ts",
        payloadCols = Seq("payload"))
      .select($"trade_id", $"payload").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(1L -> Some(1L), 2L -> None),
      "a null-key probe row must survive with a null payload, not match a null-key build row")
  }

  test("helper-column and payload collisions are rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades.withColumn("__side", lit(1)), snaps,
        Seq("sym"), "trade_ts", "snap_ts", Seq("price"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(trades.withColumn("price", lit(1.0)), snaps,
        Seq("sym"), "trade_ts", "snap_ts", Seq("price"))
    }
  }

  test("asofNearest: closest match either direction, earlier wins ties") {
    val probe = Seq(
      ("a", 1L, 100L),  // back@90 (d=10) vs fwd@105 (d=5) → fwd
      ("a", 2L, 92L),   // back@90 (d=2) vs fwd@105 (d=13) → back
      ("a", 3L, 50L),   // nothing before → fwd@90
      ("a", 4L, 200L),  // nothing after → back@105
      ("a", 5L, 95L),   // equidistant 90/100... no: back@90 d=5, fwd@105 d=10 → back
      ("b", 6L, 10L)    // key with no build rows → null
    ).toDF("k", "id", "t")
    val build = Seq(("a", 90L, 901L), ("a", 105L, 905L))
      .toDF("k", "bt", "pay")
    val got = AsofJoin.asofNearest(probe, build, Seq("k"), "t", "bt",
        Seq("pay"), tieCols = Seq("pay"))
      .select(col("id"), col("pay"), col("matched_ts"), col("asof_delta"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((Some(905L), Some(105L), Some(5L))))
    assert(got(2L) == ((Some(901L), Some(90L), Some(2L))))
    assert(got(3L) == ((Some(901L), Some(90L), Some(40L))))
    assert(got(4L) == ((Some(905L), Some(105L), Some(95L))))
    assert(got(5L) == ((Some(901L), Some(90L), Some(5L))))
    assert(got(6L) == ((None, None, None)))
    // true equidistance: probe at 97.5 impossible with longs; use 90/104
    // around probe 97 → back d=7, fwd d=7 → EARLIER (back) wins
    val eq = AsofJoin.asofNearest(
        Seq(("a", 1L, 97L)).toDF("k", "id", "t"),
        Seq(("a", 90L, 901L), ("a", 104L, 904L)).toDF("k", "bt", "pay"),
        Seq("k"), "t", "bt", Seq("pay"))
      .select(col("pay"), col("asof_delta")).as[(Long, Long)].collect().head
    assert(eq == ((901L, 7L)))
    // exact-ts hit: delta 0, beats everything
    val hit = AsofJoin.asofNearest(
        Seq(("a", 1L, 90L)).toDF("k", "id", "t"),
        Seq(("a", 90L, 901L), ("a", 91L, 911L)).toDF("k", "bt", "pay"),
        Seq("k"), "t", "bt", Seq("pay"))
      .select(col("pay"), col("asof_delta")).as[(Long, Long)].collect().head
    assert(hit == ((901L, 0L)))
  }
}
