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

  test("dbscan: hand blobs — cores, borders, noise, min-id labels") {
    // blob A {1,2,3} all-pairs within eps; 4 reaches only 3 (border);
    // blob B {5,6,7}; 8 borders B; 9 isolated
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L), (4L, 4L, 0L),
      (5L, 10L, 0L), (6L, 11L, 0L), (7L, 12L, 0L), (8L, 14L, 0L),
      (9L, 100L, 100L)).toDF("id", "x", "y")
    val got = Spatial.dbscan(pts, "id", "x", "y", eps = 2L, minPts = 3)
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(Seq(1L, 2L, 3L).forall(got(_) == (("core", Some(1L)))))
    assert(got(4L) == (("border", Some(1L))))
    assert(Seq(5L, 6L, 7L).forall(got(_) == (("core", Some(5L)))))
    assert(got(8L) == (("border", Some(5L))))
    assert(got(9L) == (("noise", None)))
  }

  test("dbscan: matches a driver reference on random points, any partitioning") {
    val rnd = new scala.util.Random(31)
    val pts = (1L to 250L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val eps = 40L; val minPts = 4
    // driver reference with the identical pinned rules
    val near = pts.map { case (i, xi, yi) =>
      i -> pts.filter { case (j, xj, yj) =>
        j != i &&
          (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= eps * eps
      }.map(p => (p._1, (xi - p._2) * (xi - p._2) +
        (yi - p._3) * (yi - p._3)))
    }.toMap
    val core = pts.map(_._1).filter(i => near(i).size + 1 >= minPts).toSet
    // components over core-core edges (driver union-find)
    val parent = scala.collection.mutable.Map(core.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (c <- core; (n, _) <- near(c) if core(n)) {
      val (a, b) = (find(c), find(n))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val label = core.map(c => c -> core.filter(o => find(o) == find(c)).min)
      .toMap
    val expect = pts.map { case (i, _, _) =>
      if (core(i)) (i, "core", Some(label(i)))
      else {
        val coreNbs = near(i).filter(p => core(p._1))
        if (coreNbs.isEmpty) (i, "noise", None)
        else {
          val best = coreNbs.minBy(p => (p._2, p._1))
          (i, "border", Some(label(best._1)))
        }
      }
    }.toSet
    val got = Spatial.dbscan(
        pts.toDF("id", "x", "y").repartition(7), "id", "x", "y",
        eps, minPts)
      .as[(Long, String, Option[Long])].collect().toSet
    assert(got == expect)
    assert(got.exists(_._2 == "core") && got.exists(_._2 == "border") &&
      got.exists(_._2 == "noise"), "fixture must exercise all roles")
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

  test("pointInPolygon: square in/out, concave notch, vertex-height ray") {
    val square = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val pts = Seq((1L, 5L, 5L), (2L, 15L, 5L), (3L, -5L, 5L),
      (4L, 5L, 15L)).toDF("id", "x", "y")
    val got = Spatial.pointInPolygon(pts, "x", "y", square)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // concave: notch cut into the right side at y=5 — (8,5) sits in
    // the notch (outside), (3,5) left of it (inside); both points are
    // AT a vertex's height, exercising the half-open straddle rule
    val notched = Seq((0L, 0L), (10L, 0L), (5L, 5L), (10L, 10L),
      (0L, 10L))
    val np = Seq((1L, 8L, 5L), (2L, 3L, 5L), (3L, 7L, 2L))
      .toDF("id", "x", "y")
    val ng = Spatial.pointInPolygon(np, "x", "y", notched)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(ng == Map(1L -> false, 2L -> true, 3L -> true), s"got $ng")
    // reversed winding gives identical verdicts (parity is unsigned)
    val rev = Spatial.pointInPolygon(np, "x", "y", notched.reverse)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(rev == ng)
    intercept[IllegalArgumentException](
      Spatial.pointInPolygon(np, "x", "y", Seq((0L, 0L), (1L, 1L))))
    intercept[IllegalArgumentException](
      Spatial.pointInPolygon(np, "x", "y",
        Seq((0L, 0L), (2000000000L, 0L), (0L, 5L))))
  }
}
