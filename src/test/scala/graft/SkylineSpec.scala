package graft

import graft.ops.{GlobalRank, Skyline}
import org.apache.spark.sql.functions._

/** ops/Skyline (2-D Pareto frontier) + the exclusive prefix max that
  * powers it. */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("globalRunningMaxExclusive: strictly-earlier max, MinValue start") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 9L), (5L, 1L))
      .toDF("k", "v")
    val got = GlobalRank.globalRunningMaxExclusive(df, Seq($"k"), "v")
      .select($"k", $"prevMax").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> Long.MinValue, 2L -> 5L, 3L -> 5L,
      4L -> 9L, 5L -> 9L))
    val again = GlobalRank
      .globalRunningMaxExclusive(df.repartition(7), Seq($"k"), "v")
      .select($"k", $"prevMax").as[(Long, Long)].collect().toMap
    assert(again == got)
  }

  test("skyline2D: hand case — dominated, tied-x, and frontier rows") {
    val pts = Seq(
      (1L, 10L),   // frontier (max y overall)
      (1L, 4L),    // equal-x, lower y → collapsed away
      (3L, 7L),    // frontier
      (3L, 7L),    // duplicate point → once
      (4L, 7L),    // dominates nothing... (4,7): x>3, y=7 → dominates (3,7)!
      (2L, 6L),    // dominated by (3,7) and (4,7)
      (6L, 2L)     // frontier (max x)
    ).toDF("x", "y")
    val got = Skyline.skyline2D(pts, "x", "y")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (4L, 7L), (6L, 2L)))
  }

  test("skyline2D matches brute-force dominance on random points") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val collapsed = pts.groupBy(_._1).map { case (x, ps) =>
      (x, ps.map(_._2).max) }.toSeq
    val expected = collapsed.filter { case (x, y) =>
      !collapsed.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.toSet
    val got = Skyline.skyline2D(pts.toDF("x", "y").repartition(11), "x", "y")
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
    // frontier shape: y strictly decreases as x increases
    val sorted = got.toSeq.sortBy(_._1)
    assert(sorted.zip(sorted.tail).forall { case ((_, y1), (_, y2)) => y1 > y2 })
  }
}
