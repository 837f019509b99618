package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial operators over integer fixed-point
  * coordinates — the "find everything near X" family (store/user
  * geo joins, density hotspots) distributed without an all-pairs
  * join. Coordinates are integer micro-units (micro-degrees,
  * millimeters — caller pre-scales, the repo-wide fixed-point
  * discipline), so every distance comparison is exact integer
  * arithmetic: squared Euclidean distance, never a float sqrt.
  *
  * Scale shape: the plane is cut into cells of side `radius`; a point
  * can only be within `radius` of points in its own or the eight
  * adjacent cells, so the candidate join is cell-keyed — one shuffle
  * on the cell key with a constant ×9 replication of the probe side
  * (ids + two longs, not payloads). An all-pairs distance join is
  * O(n²); this is O(n·density). Density skew (everyone in one city
  * cell) concentrates one key — the standard salting/AQE-skew
  * remedies apply, and [[gridDensity]] is the diagnostic that finds
  * such cells first.
  */
object Spatial {

  /** Floor division that is correct for NEGATIVE coordinates too —
    * integer `div` truncates toward zero, which would make the four
    * cells around the origin twice as wide. `c − pmod(c, n)` is an
    * exact multiple of n, so the trailing `div` is exact integer
    * arithmetic (never a double `/`). */
  private def fdiv(c: org.apache.spark.sql.Column, n: Long) =
    call_function("div", c - pmod(c, lit(n)), lit(n))

  /** All unordered point pairs within `radius` (inclusive, Euclidean)
    * of each other: (id_a < id_b, dist2 = squared distance).
    *
    * Plan: home cell per point; the probe side replicates each point
    * to its 9 neighbor cells (explode of a literal offset array);
    * equi-join probe-cell == home-cell; exact integer distance filter.
    * Every qualifying pair is produced exactly twice (a probing b's
    * home and b probing a's home — cell adjacency is symmetric), and
    * the id order filter keeps exactly one.
    *
    * Coordinates must sit within ±2⁶¹ᐟ² of each other (squared deltas
    * stay in a long) — micro-degrees are 10 orders inside the bound. */
  def radiusPairs(points: DataFrame, idCol: String, xCol: String,
                  yCol: String, radius: Long): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val pts = points.select(
      col(idCol).cast("long").as("__id"),
      col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("__cx", fdiv(col("__x"), radius).cast("long"))
      .withColumn("__cy", fdiv(col("__y"), radius).cast("long"))
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probe = pts
      .select(col("__id").as("id_a"), col("__x").as("xa"),
        col("__y").as("ya"),
        explode(offsets).as("__o"),
        col("__cx"), col("__cy"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("__cx") + col("__o.dx")).as("__jx"),
        (col("__cy") + col("__o.dy")).as("__jy"))
    val home = pts.select(col("__id").as("id_b"), col("__x").as("xb"),
      col("__y").as("yb"), col("__cx").as("__jx"), col("__cy").as("__jy"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    probe.join(home, Seq("__jx", "__jy"))
      .where(col("id_a") < col("id_b") &&
        dx * dx + dy * dy <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), (dx * dx + dy * dy).as("dist2"))
  }

  /** NEAREST NEIGHBOR within `radius`: for every point, the closest
    * OTHER point at squared distance ≤ radius² — (id, nn_id, dist2) —
    * or no row when none is in range (the caller left-joins if
    * presence matters). Ties on distance break to the smaller
    * neighbor id, a total order. Same cell-keyed candidate plan as
    * [[radiusPairs]]; the argmin is one map-side-partial min(struct)
    * groupBy per point, never a rank window. */
  def nearestWithin(points: DataFrame, idCol: String, xCol: String,
                    yCol: String, radius: Long): DataFrame = {
    val pairs = radiusPairs(points, idCol, xCol, yCol, radius)
    // each unordered pair serves both endpoints
    val directed = pairs.select(col("id_a").as("id"),
        col("id_b").as("nn"), col("dist2"))
      .unionByName(pairs.select(col("id_b").as("id"),
        col("id_a").as("nn"), col("dist2")))
    directed.groupBy(col("id"))
      .agg(min(struct(col("dist2"), col("nn"))).as("__best"))
      .select(col("id"), col("__best.nn").as("nn_id"),
        col("__best.dist2").as("dist2"))
  }

  /** Point count per grid cell of side `cellSize` — the density map
    * (and the skew diagnostic for [[radiusPairs]]). One map-side
    * partial groupBy on the cell key; output is cell-bounded. */
  def gridDensity(points: DataFrame, xCol: String, yCol: String,
                  cellSize: Long): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    points.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(fdiv(col(xCol).cast("long"), cellSize).cast("long").as("cx"),
        fdiv(col(yCol).cast("long"), cellSize).cast("long").as("cy"))
      .agg(count(lit(1)).as("n"))
  }

  /** DBSCAN density clustering (Ester et al. 1996), made fully
    * DETERMINISTIC: classic DBSCAN's border assignment depends on
    * scan order; here a border point joins the cluster of its NEAREST
    * core neighbor (ties to the smaller core id) — a pinned rule, so
    * the labeling is a pure function of the data. Core iff the
    * eps-neighborhood INCLUDING the point itself holds ≥ minPts
    * points; cluster label = the smallest core id of the component.
    *
    * Output: (id, role ∈ {core, border, noise}, cluster — NULL for
    * noise).
    *
    * Scale shape: neighborhoods come from [[radiusPairs]]' cell-keyed
    * join (checkpointed once, consumed three times: degrees, core
    * edges, border argmin); components via the bounded label
    * propagation of `Dedup.connectedComponents`; border assignment is
    * one min(struct) groupBy. Everything is joins + partial
    * aggregates — no windows, no collects beyond the components
    * convergence counter. */
  def dbscan(points: DataFrame, idCol: String, xCol: String,
             yCol: String, eps: Long, minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val pairs = radiusPairs(points, idCol, xCol, yCol, eps)
      .localCheckpoint()
    val directed = pairs.select(col("id_a").as("id"), col("id_b").as("nb"),
        col("dist2"))
      .unionByName(pairs.select(col("id_b").as("id"),
        col("id_a").as("nb"), col("dist2")))
    val degrees = directed.groupBy(col("id")).agg(count(lit(1)).as("__deg"))
    val ids = points.select(col(idCol).cast("long").as("id"))
      .where(col("id").isNotNull).distinct()
    val cores = ids.join(degrees, Seq("id"), "left")
      .where(coalesce(col("__deg"), lit(0L)) + 1 >= minPts)
      .select(col("id"))
      .localCheckpoint()
    val coreEdges = pairs
      .join(cores.select(col("id").as("id_a")), "id_a")
      .join(cores.select(col("id").as("id_b")), "id_b")
      .select(col("id_a"), col("id_b"))
    val comp = graft.llm.Dedup.connectedComponents(coreEdges)
      .select(col("id").as("__cid"), col("comp"))
    val coreLabeled = cores
      .join(comp, col("id") === col("__cid"), "left")
      .select(col("id"), coalesce(col("comp"), col("id"))
        .as("cluster"))
    val borderBest = directed
      .join(coreLabeled.select(col("id").as("nb"),
        col("cluster").as("__nc")), "nb")
      .join(cores.withColumnRenamed("id", "__self"),
        col("id") === col("__self"), "left_anti")
      .groupBy(col("id"))
      .agg(min(struct(col("dist2"), col("nb"), col("__nc"))).as("__b"))
      .select(col("id"), col("__b.__nc").as("cluster"))
    val core = coreLabeled.withColumn("role", lit("core"))
    val border = borderBest.withColumn("role", lit("border"))
    val labeled = core.unionByName(border)
    ids.join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("role"), lit("noise")).as("role"),
        col("cluster"))
  }

  /** Top-k densest cells by (n DESC, cx, cy) — a total order, so the
    * cut is engine-deterministic. TakeOrderedAndProject over the
    * cell-bounded density frame, never a global sort of points. */
  def gridHotspots(points: DataFrame, xCol: String, yCol: String,
                   cellSize: Long, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    gridDensity(points, xCol, yCol, cellSize)
      .orderBy(col("n").desc, col("cx"), col("cy"))
      .limit(k)
  }

  /** POINT-IN-POLYGON containment flag — geofencing ("which users are
    * inside this delivery zone / country outline?") via the crossing-
    * number rule, entirely in exact integer arithmetic: an upward ray
    * from the point crosses edge (x₁,y₁)→(x₂,y₂) iff the edge
    * straddles the point's y (half-open: `y₁ > y` ≠ `y₂ > y`, so a
    * vertex counts for exactly one of its two edges) and the point is
    * left of the edge at that height — `px < x₁ + (x₂−x₁)(y−y₁)/
    * (y₂−y₁)` cross-multiplied by (y₂−y₁), with the inequality
    * direction resolved at BUILD time from the constant edge (no
    * signed division, no floats). Odd crossings = inside. Points
    * exactly ON an edge get the algorithm's deterministic verdict
    * (boundary is measure-zero in the integer grid; callers needing
    * closed/open boundary semantics pre-filter with an exact on-edge
    * test). Works for any simple polygon, convex or not; vertices in
    * either winding order.
    *
    * Coordinate bound: |coords| ≤ 10⁹ keeps every cross-product in a
    * long (4·10¹⁸ < 2⁶³) — enforced on the polygon, documented for
    * the points.
    *
    * Scale shape: the polygon folds into ONE literal whole-stage-
    * codegen'd expression — a map-only scan, zero shuffles, zero
    * joins; 100 TB of points stream through at scan speed. For
    * many-polygon workloads, pre-filter with a bounding-box
    * [[gridDensity]]-style cell join, then apply the exact test. */
  def pointInPolygon(points: DataFrame, xCol: String, yCol: String,
                     polygon: Seq[(Long, Long)],
                     outCol: String = "inside"): DataFrame = {
    require(polygon.size >= 3, s"polygon needs >= 3 vertices")
    require(polygon.forall { case (x, y) =>
      math.abs(x) <= 1000000000L && math.abs(y) <= 1000000000L },
      "polygon coordinates must be within +-1e9 (long cross-products)")
    val px = col(xCol).cast("long")
    val py = col(yCol).cast("long")
    val crossings = polygon.indices.map { i =>
      val (x1, y1) = polygon(i)
      val (x2, y2) = polygon((i + 1) % polygon.size)
      if (y1 == y2) lit(0L)
      else {
        val straddles = (lit(y1) > py) =!= (lit(y2) > py)
        val lhs = (px - lit(x1)) * lit(y2 - y1)
        val rhs = lit(x2 - x1) * (py - lit(y1))
        val leftOf = if (y2 > y1) lhs < rhs else lhs > rhs
        when(straddles && leftOf, 1L).otherwise(0L)
      }
    }.reduce(_ + _)
    points.withColumn(outCol, pmod(crossings, lit(2L)) === 1L)
  }
}
