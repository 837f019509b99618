package graft

/** Automated plan-quality assertions — the properties that decide
  * whether a query survives a 100× scale-up, pinned so a regression
  * (a filter that stops pushing, a dim that stops broadcasting, a
  * window that sneaks back in) fails CI instead of surfacing as a
  * cluster incident. String checks are kept loose (node names +
  * key fragments), not full plan snapshots. */
class PlanAuditSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("q4: scan prunes lineitem to the two projected columns") {
    val p = plan("q4_distinct_keys")
    assert(p.contains("l_orderkey") && p.contains("l_linenumber"))
    // columns that DO exist in the fixture — a vacuous check against a
    // column the data lacks could never fire
    assert(!p.contains("l_extendedprice") && !p.contains("l_discount"),
      "distinct-keys scan must not read unprojected columns")
  }

  test("q6: watermark predicate pushes down to the parquet scan") {
    val p = plan("q6_bymax_delta")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(event_id"),
      s"watermark filter not pushed:\n${p.take(800)}")
  }

  test("q2: dimension joins broadcast (no shuffle join for nation/region)") {
    val p = plan("q2_join_agg")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast dim joins")
  }

  test("q1: aggregation is partial (map-side combine before the shuffle)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "expected partial aggregation before the exchange")
  }

  test("q0 flagship: broadcast-heavy plan, filters pushed") {
    val p = plan("q0_flagship")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters"))
  }

  test("q10: scalable ntile stays windowless (both sides of the checkpoint)") {
    // the checkpoint truncates q10's visible plan, so audit the
    // pre-checkpoint ranking stage explicitly as well as the tail
    assert(!plan("q10_ntile").contains("Window"))
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    val pre = graft.ops.GlobalRank
      .rangedFrame(orders, Seq(org.apache.spark.sql.functions.col("o_orderkey")), 8)
      .queryExecution.executedPlan.toString
    assert(!pre.contains("Window") && !pre.contains("row_number"),
      "ranking stage must use range partitioning, not a window")
  }

  test("q34: pair-mode near-dup plans no top-k row_number") {
    assert(!plan("q34_embedding_neardup").contains("row_number"))
  }

  test("q26/q34: deterministic cosine runs the native kernel, no lambda chains") {
    // the decimal dot must be the fused vec_dot_decimal expression;
    // aggregate/zip_with higher-order lambdas are CodegenFallback and
    // were 5-10× the gate queries' wall time before the kernel swap
    for (q <- Seq("q26_cosine_topk", "q34_embedding_neardup")) {
      val p = plan(q)
      assert(p.contains("vec_dot_decimal"), s"$q lost the native kernel")
      assert(!p.contains("zip_with") && !p.contains("aggregate("),
        s"$q plans an interpreted higher-order lambda chain")
    }
  }
}
