package graft

import graft.ops.{Association, Hierarchy}
import org.apache.spark.sql.functions._

/** ops/Association (market-basket rules) and ops/Hierarchy (recursive
  * ancestor closure) against hand-computable fixtures. */
class AssociationHierarchySpec extends SparkTestBase {
  import spark.implicits._

  test("associationRules: support/confidence/lift from a hand-built basket set") {
    // 10 baskets: x in 8, y in 4 (all with x), z in 2 (disjoint from y)
    val rows =
      (1 to 8).map(b => (b.toLong, "x")) ++
      (1 to 4).map(b => (b.toLong, "y")) ++
      Seq((9L, "z"), (10L, "z"), (9L, "x"),
        (9L, "x"))                      // duplicate (basket, item): set semantics
    val got = Association.associationRules(rows.toDF("bk", "it"), "bk", "it",
        minSupportPm = 150)
      .select($"ante", $"cons", $"n_pair", $"support_pm", $"confidence_pm",
        $"lift_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // x∧y = 4; |baskets| = 10; |x| = 9 (baskets 1-8 + 9), |y| = 4
    // x→y: conf 4/9 = 444‰, lift 10⁶·4·10/(9·4) = 1111111
    assert(got(("x", "y"))   == ((4L, 400L, 444L, 1111111L)))
    assert(got(("y", "x"))   == ((4L, 400L, 1000L, 1111111L)))
    // x∧z = 1 < minPairCount → absent in both directions
    assert(!got.contains(("x", "z")) && !got.contains(("z", "x")))
    // partition independence
    val again = Association.associationRules(
        rows.toDF("bk", "it").repartition(7), "bk", "it", 150)
      .select($"ante", $"cons", $"n_pair", $"support_pm", $"confidence_pm",
        $"lift_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(again == got)
    intercept[IllegalArgumentException] {
      Association.associationRules(rows.toDF("bk", "it"), "bk", "it", 0)
    }
  }

  test("associationRules: maxBasketSize drops mega-baskets entirely") {
    // basket 1 holds every item (the crawler-session hot key); baskets
    // 2-4 hold {a,b} — with the cap at 3 the mega-basket contributes
    // NOTHING, including to item counts and the basket denominator
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d")) ++
      (2 to 4).flatMap(b => Seq((b.toLong, "a"), (b.toLong, "b")))
    val got = Association.associationRules(rows.toDF("bk", "it"), "bk", "it",
        minSupportPm = 100, maxBasketSize = 3)
      .select($"ante", $"cons", $"n_pair", $"support_pm")
      .as[(String, String, Long, Long)].collect().toSet
    // 3 surviving baskets, a∧b = 3 → support 1000‰
    assert(got == Set(("a", "b", 3L, 1000L), ("b", "a", 3L, 1000L)))
  }

  test("itemSimilarity: cosine^2 scoring, top-k cut, direction symmetry") {
    // x in baskets 1-4, y in 1-2, z in 3 only
    val rows = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"),
      (1L, "y"), (2L, "y"), (3L, "z"))
    val got = Association.itemSimilarity(rows.toDF("bk", "it"), "bk", "it",
        k = 1, minCo = 1L)
      .select($"item", $"cand", $"co", $"cos2_ppm", $"rnk")
      .as[(String, String, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // cos²(x,y) = 2²/(4·2) = 0.5; cos²(x,z) = 1/(4·1) = 0.25 →
    // x's top-1 is y; y's and z's top-1 are both x
    assert(got("x") == (("y", 2L, 500000L)))
    assert(got("y") == (("x", 2L, 500000L)))
    assert(got("z") == (("x", 1L, 250000L)))
    // k=2 exposes x→z as rank 2
    val k2 = Association.itemSimilarity(rows.toDF("bk", "it"), "bk", "it",
        k = 2, minCo = 1L)
      .filter($"item" === "x" && $"rnk" === 2)
      .select($"cand", $"cos2_ppm").as[(String, Long)].collect().head
    assert(k2 == (("z", 250000L)))
    // minCo floor prunes the weak pair entirely
    val floored = Association.itemSimilarity(rows.toDF("bk", "it"), "bk", "it",
        k = 2, minCo = 2L)
      .select($"item", $"cand").as[(String, String)].collect().toSet
    assert(floored == Set(("x", "y"), ("y", "x")))
  }

  test("ancestors: closure of a binary tree with depths, early exit") {
    // tree: parent(n) = n/2; nodes 1..15 (root 0 reached by all)
    val edges = (1L to 15L).map(n => (n, n / 2)).toDF("c", "p")
    val got = Hierarchy.ancestors(edges, "c", "p", maxDepth = 10)
      .as[(Long, Long, Int)].collect().toSet
    // node 11: 11→5→2→1→0 at depths 1..4
    assert(got.filter(_._1 == 11L) ==
      Set((11L, 5L, 1), (11L, 2L, 2), (11L, 1L, 3), (11L, 0L, 4)))
    // node 1: single hop to root
    assert(got.filter(_._1 == 1L) == Set((1L, 0L, 1)))
    // closure size: Σ depth(n) for 1..15 = 1+2·2+4·3+8·4 = 49
    assert(got.size == 49)
    // depth capped: maxDepth 2 keeps only hops 1 and 2
    val capped = Hierarchy.ancestors(edges, "c", "p", maxDepth = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(capped == got.filter(_._3 <= 2))
    // partition independence
    val again = Hierarchy.ancestors(edges.repartition(5), "c", "p", 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(again == got)
  }

  test("ancestors: DAG diamond emits one row per (node, ancestor, depth)") {
    // diamond: 1 has parents 2 and 3, both of which have parent 4 —
    // node 1 reaches 4 at depth 2 along TWO paths; the closure must
    // still carry exactly one (1, 4, 2) row
    val dag = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("c", "p")
    val rows = Hierarchy.ancestors(dag, "c", "p", maxDepth = 10)
      .as[(Long, Long, Int)].collect()
    assert(rows.length == rows.toSet.size, "closure contains duplicate rows")
    assert(rows.toSet == Set(
      (1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 2), (2L, 4L, 1), (3L, 4L, 1)))
    // stacked diamonds: 4 also reaches 7 through 5 and 6 — path count
    // to the apex is 2·2 = 4 but row count stays 1 per (node, anc, d)
    val dbl = (Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 7L), (6L, 7L))).toDF("c", "p")
    val r2 = Hierarchy.ancestors(dbl, "c", "p", maxDepth = 10)
      .as[(Long, Long, Int)].collect()
    assert(r2.length == r2.toSet.size)
    assert(r2.count(t => t._1 == 1L && t._2 == 7L) == 1)
    assert(r2.filter(t => t._1 == 1L && t._2 == 7L).head._3 == 4)
  }

  test("ancestors: diamond CHAIN (the q337 shape) stays polynomial — " +
       "closure matches a driver reference, never the path count") {
    // every node n has parents n−1 AND n−2: the path count to an
    // ancestor at gap g is Fibonacci(g) (exponential), but the closure
    // contract is one row per (node, ancestor, depth) — on a 60-node
    // chain with maxDepth 8 that is ≤ 9 ancestors per depth per node
    val n = 60
    val maxD = 8
    val edges = ((2 until n).map(i => (i.toLong, i - 1L)) ++
      (2 until n).map(i => (i.toLong, i - 2L))).toDF("c", "p")
    val got = Hierarchy.ancestors(edges, "c", "p", maxDepth = maxD)
      .as[(Long, Long, Int)].collect().toSet
    // driver reference: frontier BFS with set-dedup per depth
    val parents = (2 until n)
      .map(i => i.toLong -> Set(i - 1L, i - 2L)).toMap
    var frontier = parents.toSeq
      .flatMap { case (c, ps) => ps.map(p => (c, p)) }.toSet
    val expected = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    expected ++= frontier.map { case (c, p) => (c, p, 1) }
    for (d <- 2 to maxD) {
      frontier = frontier.flatMap { case (c, a) =>
        parents.getOrElse(a, Set.empty[Long]).map(p => (c, p)) }
      expected ++= frontier.map { case (c, p) => (c, p, d) }
    }
    assert(got == expected.toSet)
    // polynomial bound: per node, ≤ (depth+1) ancestors per depth —
    // nothing Fibonacci-shaped survives the per-hop distinct
    assert(got.size <= n * (1 to maxD).map(_ + 1).sum,
      s"closure size ${got.size} exceeds the polynomial bound")
  }

  test("ancestors: cycle fails loud unless requireAcyclic=false") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("c", "p")
    intercept[IllegalArgumentException] {
      Hierarchy.ancestors(cyc, "c", "p", maxDepth = 5)
    }
    // depth-bounded traversal still terminates and self-loops appear
    val tolerated = Hierarchy.ancestors(cyc, "c", "p", maxDepth = 5,
        requireAcyclic = false)
      .as[(Long, Long, Int)].collect()
    assert(tolerated.exists(r => r._1 == r._2))
    assert(tolerated.forall(_._3 <= 5))
  }

  test("depthAndRoot summarizes the closure per node") {
    val edges = (1L to 7L).map(n => (n, n / 2)).toDF("c", "p")
    val got = Hierarchy.depthAndRoot(
        Hierarchy.ancestors(edges, "c", "p", maxDepth = 10))
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set((1L, 1, 0L), (2L, 2, 0L), (3L, 2, 0L),
      (4L, 3, 0L), (5L, 3, 0L), (6L, 3, 0L), (7L, 3, 0L)))
  }
}
