package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph diffusion — PageRank-style score propagation over an
  * edge frame. The pipeline use: propagate quality/trust across a
  * document graph (links, near-dup clusters, citation edges) so a
  * curation pass can rank sources by more than their own content —
  * the iterative sibling of Dedup's connected components.
  *
  * Determinism contract (engine-independent integer rule, the repo's
  * per-mille discipline): ranks live in integer MICRO-units, damping is
  * per-mille, and one iteration is
  *
  *   contrib(e) = rank(src) div outdeg(src)          (floor division)
  *   r'(v)     = (1000−d)·1000 + (d · Σ contrib(in-edges)) div 1000
  *
  * — every operation exact integer arithmetic, so any engine unrolling
  * the same rule matches bit-for-bit, and the result is independent of
  * partitioning and join order (integer sums are associative). Dangling
  * mass (nodes with no out-edges) is dropped, the standard simple
  * variant; multi-edges contribute once per instance.
  *
  * Scale shape (the 100 TB story): the classic Pregel-by-joins loop —
  * per iteration one src-keyed join (rank onto edges), one dst-keyed
  * map-side-partial sum, one node-keyed left join; all shuffles on
  * graph keys, no windows, no driver-side data. The static
  * (edges ⋈ outdeg) frame builds once and persists across iterations;
  * ranks checkpoint each iteration so the plan stays one-iteration
  * deep instead of growing O(iters) (reliable checkpoint when a
  * checkpoint dir is configured, executor-local otherwise — the
  * GlobalRank/BPE stance). On a real cluster, pre-bucketing edges by
  * src makes the per-iteration rank join shuffle-free on one side.
  */
object GraphOps {

  /** PageRank over `edges`: (node, rank_micro) after `iters`
    * iterations from a uniform 1,000,000-micro start. Nodes are the
    * union of sources and destinations. `dampingPm` is per-mille
    * (850 = the classic 0.85). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingPm: Int = 850): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPm >= 0 && dampingPm <= 1000,
      s"dampingPm must be in [0, 1000], got $dampingPm")
    val spark = edges.sparkSession
    val base = (1000L - dampingPm) * 1000L // (1−d)·1e6 in micro, exact

    // pin the raw edge frame: deg, the contribEdges join, and the node
    // union all read it — an expensive edge LINEAGE (e.g. a k-NN graph,
    // q143) would otherwise recompute up to 4× before the downstream
    // persists materialize
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst")).persist()
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__outdeg"))
    // static across iterations: every edge with its source's out-degree
    val contribEdges = e.join(deg, Seq("__src")).persist()
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node")))
      .distinct().persist()

    def pin(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iters) {
      val inMass = contribEdges
        .join(ranks.withColumnRenamed("node", "__src"), Seq("__src"))
        .select(col("__dst").as("node"),
          expr("rank_micro div __outdeg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__m"))
      ranks = pin(nodes
        .join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampingPm * coalesce(__m, 0L)) div 1000"))
            .as("rank_micro")))
    }
    e.unpersist()
    contribEdges.unpersist()
    nodes.unpersist()
    ranks
  }
}
