package graft

import org.apache.spark.sql.functions._
import graft.ops.Spatial

/** Grid-bucketed spatial join: the cell decomposition must reproduce
  * the brute-force distance join exactly — including points straddling
  * cell borders, negative coordinates around the origin (where
  * truncating division would fold four cells into one), and inclusive
  * radius boundaries. */
class SpatialSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], r: Long) =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet

  test("radiusPairs: hand-placed pairs, inclusive boundary, cross-cell") {
    // (1,2): same cell; (3,4): adjacent cells, distance exactly r
    // (inclusive); (5): isolated; (6,7): diagonal-cell neighbors.
    val pts = Seq(
      (1L, 10L, 10L), (2L, 13L, 14L), // d2 = 9+16 = 25 = r², kept
      (3L, 99L, 50L), (4L, 104L, 50L), // d2 = 25, straddles x-cells
      (5L, 500L, 500L),
      (6L, 199L, 299L), (7L, 201L, 301L)) // d2 = 8, diagonal cells
    val df = pts.toDF("id", "x", "y")
    val got = Spatial.radiusPairs(df, "id", "x", "y", 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 25L), (3L, 4L, 25L), (6L, 7L, 8L)))
  }

  test("radiusPairs: negative coordinates around the origin") {
    // Truncating division maps x ∈ (−r, r) all to cell 0 — floor
    // division must keep (−1,−1) and (1,1) in different cells yet
    // still find the pair through neighbor probing.
    val pts = Seq((1L, -1L, -1L), (2L, 1L, 1L), (3L, -9L, -9L))
    val got = Spatial.radiusPairs(pts.toDF("id", "x", "y"),
        "id", "x", "y", 4L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 8L)))
  }

  test("radiusPairs: random points match brute force, any partitioning") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(2000).toLong - 1000L, rnd.nextInt(2000).toLong - 1000L))
    val expect = brute(pts, 120L)
    assert(expect.nonEmpty, "fixture must produce pairs")
    val got = Spatial.radiusPairs(
        pts.toDF("id", "x", "y").repartition(7), "id", "x", "y", 120L)
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "pairs must be emitted once")
    assert(got.toSet == expect)
  }

  test("gridDensity + hotspots: counts, floor cells, deterministic cut") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 9L, 9L),   // cell (0,0)
      (3L, 10L, 0L),                // cell (1,0)
      (4L, -1L, 0L),                // cell (-1,0) — floor, not trunc
      (5L, 25L, 25L), (6L, 26L, 26L), (7L, 27L, 27L)) // cell (2,2)
    val df = pts.toDF("id", "x", "y")
    val dens = Spatial.gridDensity(df, "x", "y", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(dens == Set((0L, 0L, 2L), (1L, 0L, 1L), (-1L, 0L, 1L),
      (2L, 2L, 3L)))
    val top = Spatial.gridHotspots(df, "x", "y", 10L, 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(top == Seq((2L, 2L, 3L), (0L, 0L, 2L)))
  }

  test("nearestWithin: argmin per point, distance ties to smaller id") {
    // 1 and 2 are mutual nearest; 3 is closer to 2 than to 1;
    // 4 has two equidistant neighbors (5, 6) → picks 5; 7 isolated
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 0L),
      (5L, 100L, 0L), (4L, 103L, 0L), (6L, 106L, 0L),
      (7L, 500L, 500L))
    val got = Spatial.nearestWithin(pts.toDF("id", "x", "y"),
        "id", "x", "y", 10L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) == ((2L, 9L)))
    assert(got(2L) == ((1L, 9L)))
    assert(got(3L) == ((2L, 16L)))
    assert(got(4L) == ((5L, 9L)), "equidistant tie must pick smaller id")
    assert(got(5L) == ((4L, 9L)) && got(6L) == ((4L, 9L)))
    assert(!got.contains(7L), "isolated point emits no row")
  }

  test("validation fails loud") {
    val df = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException](
      Spatial.radiusPairs(df, "id", "x", "y", 0L))
    intercept[IllegalArgumentException](
      Spatial.gridDensity(df, "x", "y", -5L))
    intercept[IllegalArgumentException](
      Spatial.gridHotspots(df, "x", "y", 10L, 0))
  }
}
