package graft

import graft.ops.{CommitLog, EventAnalytics, Hierarchy, Sampling}
import org.apache.spark.sql.functions._

/** Randomized properties for the session's operators — each checked
  * against an independent driver-side fold, seeds fixed for replay. */
class OpPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  test("commit-log property: snapshotAt(v) ≡ sequential replay, every v") {
    val rnd = new scala.util.Random(17)
    // unique versions 1..60 over 12 keys, ~1/3 removes
    val actions = rnd.shuffle((1L to 60L).toList).zipWithIndex.map {
      case (v, i) =>
        (rnd.nextInt(12).toLong, v,
          if (rnd.nextInt(3) == 0) "remove" else "add", s"p$i")
    }
    val log = actions.toDF("k", "v", "op", "p")
    for (cut <- Seq(0L, 7L, 23L, 41L, 60L)) {
      // driver replay: apply actions in version order
      val state = scala.collection.mutable.Map[Long, (Long, String)]()
      actions.filter(_._2 <= cut).sortBy(_._2).foreach {
        case (k, v, "add", p) => state(k) = (v, p)
        case (k, _, _, _)     => state.remove(k)
      }
      // the op reports max action version ≤ cut, which the replay must
      // recompute (a re-add after removes keeps ITS version)
      val lastV = actions.filter(_._2 <= cut).groupBy(_._1)
        .map { case (k, as) => k -> as.map(_._2).max }
      val expected = state.map { case (k, (_, p)) => (k, lastV(k), p) }.toSet
      val got = CommitLog.snapshotAt(log, "k", "v", "op", cut, Seq("p"))
        .as[(Long, Long, String)].collect().toSet
      assert(got == expected, s"snapshot at v=$cut diverged from replay")
    }
  }

  test("attribution property: first/last credits count touched conversions") {
    val rnd = new scala.util.Random(23)
    val types = Array("view", "click", "purchase", "error")
    val events = (1 to 600).map { i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(5000).toLong,
        types(rnd.nextInt(4)))
    }
    val df = events.toDF("u", "id", "ts", "k")
    val look = 700L
    val got = EventAnalytics.attribution(df, "u", "ts", "id", "k",
        "purchase", Seq("view", "click"), look)
      .as[(String, Long, Long, Long, Long)].collect()
    // driver reference: assign each touch to its next conversion
    val byUser = events.groupBy(_._1)
    val assignments = byUser.toSeq.flatMap { case (_, evs) =>
      val convs = evs.filter(_._4 == "purchase").map(e => (e._3, e._2)).sorted
      evs.filter(e => e._4 == "view" || e._4 == "click").flatMap { t =>
        convs.find { case (cts, _) => cts > t._3 && cts <= t._3 + look }
          .map(c => (t._1, c) -> t)   // (user, conv) -> touch
      }
    }
    val perConv = assignments.groupBy(_._1).values
    val nConvTouched = perConv.size.toLong
    assert(got.map(_._3).sum == nConvTouched, "one first credit per conversion")
    assert(got.map(_._4).sum == nConvTouched, "one last credit per conversion")
    assert(got.map(_._2).sum == assignments.size.toLong)
    // linear credit: each conversion distributes 10⁶ minus a floor loss < n
    val linear = got.map(_._5).sum
    val totalTouches = assignments.size.toLong
    assert(linear <= 1000000L * nConvTouched)
    assert(linear > 1000000L * nConvTouched - totalTouches)
    assert(got.map(_._2).sum > 0, "fixture must attribute something")
  }

  test("hierarchy property: closure over a random forest ≡ driver walk") {
    val rnd = new scala.util.Random(31)
    // parent(n) strictly smaller → acyclic by construction; 0 is a root
    val parents = (1L to 80L).map(n => n -> rnd.nextLong(n)).toMap
    val edges = parents.toSeq.map { case (c, p) => (c, p) }.toDF("c", "p")
    val expected = parents.keys.flatMap { n =>
      Iterator.iterate(n)(parents.getOrElse(_, -1L))
        .drop(1).takeWhile(_ >= 0L).take(64).zipWithIndex
        .map { case (a, d) => (n, a, d + 1) }
    }.toSet
    val got = Hierarchy.ancestors(edges, "c", "p", maxDepth = 64)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("systematicPps property: copies sum to the lattice-point count") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val ws = (1L to 50L).map(i => (i, rnd.nextLong(40))) // zeros included
      val stride = 17L; val phase = 1L + rnd.nextLong(stride)
      val total = ws.map(_._2).sum
      val expectPoints =
        if (total >= phase) (total - phase + stride) / stride else 0L
      val copies = Sampling.systematicPps(ws.toDF("id", "w"),
          Seq(col("id")), "w", stride, phase)
        .agg(sum(col("copies"))).as[Long].collect().head
      assert(copies == expectPoints,
        s"trial $trial: $copies lattice points, expected $expectPoints")
    }
  }
}
