package graft

import graft.ops.Ivm
import graft.ops.Ivm.AggSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ops/Ivm — incremental view maintenance: delta-merge ≡ full recompute
  * (the defining contract), key birth/death, snapshot-diff changelog
  * round trip, and the no-base-rescan plan claim. */
class IvmSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = AggSpec(
    Seq("sum_v" -> col("v").cast("decimal(18,4)")), "n_rows")

  private def view(df: DataFrame) =
    Ivm.materialize(df, Seq("k"), spec)

  private def asSet(df: DataFrame) =
    df.select(col("k"), col("n_rows"), col("sum_v").cast("double"))
      .as[(Long, Long, Double)].collect().toSet

  test("applyDelta ≡ full recompute (inserts, retracts, births, deaths)") {
    val base = Seq((1L, 10.0), (1L, 5.0), (2L, 7.0), (3L, 1.0))
      .toDF("k", "v")
    // retract both rows of key 1's sibling 3 (death), add key 4 (birth),
    // update key 2 (retract old + insert new)
    val changes = Seq(
      (3L, 1.0, -1),             // key 3 dies
      (4L, 9.0, 1),              // key 4 born
      (2L, 7.0, -1), (2L, 8.5, 1), // key 2 updated
      (1L, 2.0, 1)               // key 1 grows
    ).toDF("k", "v", "op")
    val got = Ivm.applyDelta(view(base), changes, Seq("k"), spec)
    val effective = Seq((1L, 10.0), (1L, 5.0), (1L, 2.0), (2L, 8.5),
      (4L, 9.0)).toDF("k", "v")
    assert(asSet(got) == asSet(view(effective)))
    assert(!asSet(got).exists(_._1 == 3L), "dead key must disappear")
  }

  test("corrupt changelog (over-retract) stays visible as negative count") {
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val changes = Seq((1L, 1.0, -1), (1L, 1.0, -1)).toDF("k", "v", "op")
    val got = Ivm.applyDelta(view(base), changes, Seq("k"), spec)
    assert(got.select("n_rows").as[Long].collect().toSeq == Seq(-1L))
  }

  test("snapshotChangelog → applyDelta reproduces the after-snapshot view") {
    val before = Seq((1L, 1.0), (1L, 1.0), (2L, 3.0), (3L, 4.0))
      .toDF("k", "v")
    // after: one copy of (1,1.0) removed (multiplicity!), key 3 gone,
    // key 5 appears twice
    val after = Seq((1L, 1.0), (2L, 3.0), (5L, 2.0), (5L, 2.0))
      .toDF("k", "v")
    val log = Ivm.snapshotChangelog(before, after)
    val got = Ivm.applyDelta(view(before), log, Seq("k"), spec,
      multiplicityCol = Some("multiplicity"))
    assert(asSet(got) == asSet(view(after)))
    // the changelog itself is minimal: one collapsed row per changed row-value
    val rows = log.select("k", "v", "op", "multiplicity")
      .as[(Long, Double, Int, Long)].collect().toSet
    assert(rows == Set((1L, 1.0, -1, 1L), (3L, 4.0, -1, 1L),
      (5L, 2.0, 1, 2L)))
  }

  test("property: random changelog chains ≡ one-shot recompute (seeded LCG)") {
    // deterministic pseudo-random row stream: 120 rows over 12 keys,
    // split into 4 batches; each batch inserts its rows and retracts a
    // keyed slice of what is live so far — after every batch the
    // incrementally-merged view must equal materialize(effective rows)
    def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L
    val rows = (0 until 120).map { i =>
      val h = lcg(i.toLong + 7)
      (math.floorMod(h, 12).toLong, math.floorMod(h >> 8, 50).toDouble, i / 30)
    } // (k, v, batch)
    var live = Vector.empty[(Long, Double)]
    var v: org.apache.spark.sql.DataFrame = null
    for (b <- 0 until 4) {
      val ins = rows.filter(_._3 == b).map(t => (t._1, t._2))
      // retract every live row whose key ≡ b (mod 5): exercises deaths
      val del = live.filter(t => t._1 % 5 == b)
      val changes = (ins.map(t => (t._1, t._2, 1)) ++
        del.map(t => (t._1, t._2, -1))).toDF("k", "v", "op")
      v = if (v == null) Ivm.applyDelta(view(Seq.empty[(Long, Double)]
            .toDF("k", "v")), changes, Seq("k"), spec)
          else Ivm.applyDelta(v, changes, Seq("k"), spec)
      v = v.localCheckpoint()
      live = live.filterNot(t => t._1 % 5 == b) ++ ins
      assert(asSet(v) == asSet(view(live.toDF("k", "v"))),
        s"divergence after batch $b")
    }
  }

  test("merge plan splits the view map-only and never rescans the base frame") {
    val baseV = view(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
      .localCheckpoint() // stand-in for a persisted materialized view
    val changes = Seq((1L, 4.0, 1)).toDF("k", "v", "op")
    val merged = Ivm.applyDelta(baseV, changes, Seq("k"), spec)
    // every leaf is a checkpointed frame (the view via the semi/anti
    // split, the delta aggregate via its three probe branches) — the
    // base fact table appears NOWHERE in the plan
    val leaves = merged.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty &&
      leaves.forall(_.toString.startsWith("LogicalRDD")),
      s"expected only checkpointed leaves, got $leaves")
    // the untouched slice passes through an anti join (broadcast-able —
    // map-only over the view), never a full-view shuffle join
    val p = merged.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti") && p.contains("LeftSemi"),
      s"view must split touched/untouched:\n${p.take(600)}")
  }

  test("extrema: deleting the current min promotes the next value, " +
       "no base rescan") {
    val base = Seq((1L, 5L), (1L, 5L), (1L, 9L), (2L, 3L)).toDF("k", "v")
    val aux = Ivm.extremaMaterialize(base, Seq("k"), "v")
    // retract ONE copy of key 1's min → min stays 5; then both → 9
    val c1 = Seq((1L, 5L, -1)).toDF("k", "v", "op")
    val a1 = Ivm.applyExtremaDelta(aux, c1, Seq("k"), "v")
    val s1 = Ivm.extremaSnapshot(a1, Seq("k"), "v")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(s1(1L) == ((1L, 5L, 9L, 2L)), s"got $s1")
    val c2 = Seq((1L, 5L, -1), (1L, 5L, -1)).toDF("k", "v", "op")
    val s2 = Ivm.extremaSnapshot(
      Ivm.applyExtremaDelta(aux, c2, Seq("k"), "v"), Seq("k"), "v")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(s2(1L) == ((1L, 9L, 9L, 1L)))
    assert(s2(2L) == ((2L, 3L, 3L, 1L)))
  }

  test("extrema: incremental ≡ recompute over a mixed changelog") {
    val base = (1L to 40L).map(i => (i % 5, i * 7 % 23)).toDF("k", "v")
    val changes = ((1L to 40L).filter(_ % 3 == 0)
        .map(i => (i % 5, i * 7 % 23, -1)) ++       // retract thirds
      (41L to 55L).map(i => (i % 5, i * 7 % 23, 1)) ++
      Seq((9L, 100L, 1))                            // key birth
    ).toDF("k", "v", "op")
    val inc = Ivm.extremaSnapshot(
      Ivm.applyExtremaDelta(Ivm.extremaMaterialize(base, Seq("k"), "v"),
        changes, Seq("k"), "v"), Seq("k"), "v")
    val effective = ((1L to 40L).filterNot(_ % 3 == 0) ++ (41L to 55L))
      .map(i => (i % 5, i * 7 % 23)).toDF("k", "v")
      .union(Seq((9L, 100L)).toDF("k", "v"))
    val full = Ivm.extremaSnapshot(
      Ivm.extremaMaterialize(effective, Seq("k"), "v"), Seq("k"), "v")
    assert(inc.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
  }
}
