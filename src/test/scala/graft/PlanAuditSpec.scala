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

  test("q53: bloom probe filters the fact side BEFORE the exact semi join") {
    val p = plan("q53_bloom_semi")
    assert(p.contains("might_contain"), s"expected the bloom probe:\n${p.take(600)}")
    // the probe must sit under the join (scan-side), not above it
    val probeIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "might_contain must appear below the join in the plan tree (scan side)")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q58: interval overlap joins on the bin key, no nested loop") {
    val p = plan("q58_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n${p.take(600)}")
  }

  test("q59: unpivot stays map-only (no exchange)") {
    val p = plan("q59_unpivot")
    assert(!p.contains("Exchange"), s"unpivot must not shuffle:\n${p.take(600)}")
  }

  test("q61: centroid assignment broadcasts centroids and partial-aggregates the argmin") {
    val p = plan("q61_kmeans_assign")
    assert(p.contains("vec_dot_decimal"), "distance must run the native kernel")
    assert(p.contains("partial_min") || p.contains("partial"),
      "argmin must combine map-side before the shuffle")
    assert(!p.contains("Window"), "assignment must not use a window")
  }

  test("q34: pair-mode near-dup plans no top-k row_number") {
    assert(!plan("q34_embedding_neardup").contains("row_number"))
  }

  test("q62: the only window is the per-doc ranking; df partial-aggregates") {
    // round-4 verdict: df via count().over(Window.partitionBy(term)) put
    // a stop-word's corpus-sized partition into ONE task. df now comes
    // from groupBy(term)+join — the sole surviving window is the per-doc
    // row_number (millions of small partitions).
    val p = plan("q62_tfidf_terms")
    val winSpecs = "windowspecdefinition\\(([A-Za-z_0-9]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(winSpecs.nonEmpty && winSpecs.forall(_.startsWith("doc_id")),
      s"windows must partition by doc_id only, got: $winSpecs")
    assert(p.contains("partial_count"),
      "df must combine map-side before the shuffle")
  }

  test("q27/q28/q34: dedup candidate paths plan no window at all") {
    // the LSH bucket-size guards aggregate map-side (groupBy+join) —
    // a window guard would materialize the degenerate bucket it exists
    // to drop inside a single task (round-4 verdict)
    for (q <- Seq("q27_minhash_pairs", "q28_simhash_pairs",
                  "q34_embedding_neardup")) {
      val p = plan(q)
      assert(!p.contains("windowspecdefinition"), s"$q plans a window")
      assert(p.contains("partial_"),
        s"$q must partial-aggregate its guard/verify counts")
    }
  }

  test("q67: chunking is a single map-only stage — no exchange, no window") {
    val p = plan("q67_token_chunks")
    assert(!p.contains("Exchange") && !p.contains("windowspecdefinition"),
      "chunking must stay inside the scan stage")
    assert(p.contains("*(1)"),
      "the whole chunk pipeline must sit in one codegen stage")
  }

  test("q69: repetition signals plan no window and partial-aggregate both levels") {
    val p = plan("q69_repetition")
    assert(!p.contains("windowspecdefinition"))
    assert(p.contains("partial_count"),
      "gram rollup must combine map-side before the shuffle")
  }

  test("q70: packing shuffles once, window partitions by the bucket stream") {
    val p = plan("q70_seq_packing")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges")
    val winSpecs = """windowspecdefinition\((\w+)""".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(winSpecs == Set("bucket"),
      s"pack window must partition by bucket only, got $winSpecs")
  }

  test("q72: hamming search runs the native kernel on broadcast queries") {
    val p = plan("q72_hamming_topk")
    assert(p.contains("vec_hamming"), "hamming must use the fused kernel")
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      "q72 plans an interpreted higher-order lambda chain")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side must broadcast")
  }

  test("q74: decontamination is a gram-keyed join — no cartesian, no window") {
    val p = plan("q74_decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "cross-corpus check must never go all-pairs")
    assert(!p.contains("windowspecdefinition"))
    assert(p.contains("partial_count"),
      "shared-gram counts must combine map-side")
    assert(p.contains("word_ngrams"), "shingling must use the native kernel")
  }

  test("q81: sequence decontamination joins on fingerprints — no cartesian, no window, native winnow kernel") {
    val p = plan("q81_seq_decontam")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "cross-corpus run check must never go all-pairs")
    assert(!p.contains("windowspecdefinition"))
    assert(p.contains("winnow_mins"),
      "fingerprints must come from the fused sliding-min kernel")
    assert(p.contains("partial_count"),
      "shared-fingerprint counts must combine map-side")
  }

  test("q75: vocabulary top-k is distributed TakeOrdered, not a global sort") {
    val p = plan("q75_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected distributed top-k:\n${p.take(600)}")
  }

  test("q26/q72: brute-force top-k aggregates, never window-sorts the corpus") {
    // round-5 verdict: the per-query row_number window put every
    // candidate row into one task's sort — the TopKByScore swap bounds
    // the shuffle at k pairs per query, and partial aggregation must
    // survive in the plan
    for (q <- Seq("q26_cosine_topk", "q72_hamming_topk",
                  "q105_hard_negatives")) {
      val p = plan(q)
      assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
        s"$q reintroduced the per-query window sort")
      assert(p.contains("partial_topkbyscore"),
        s"$q top-k must combine map-side:\n${p.take(600)}")
    }
  }

  test("q84: md5-LSH search plans the fused signature kernel and aggregated top-k") {
    val p = plan("q84_lsh_topk")
    assert(p.contains("vec_lsh_signature_md5"),
      "the signature must be the fused one-pass kernel (round 12: " +
        "converts each element once, not once per plane)")
    assert(p.contains("vec_dot_decimal"),
      "rerank cosine must run the native decimal kernel, not interpreted lambdas")
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      "q84 plans an interpreted higher-order lambda chain")
    assert(!p.replace("vec_lsh_signature_md5", "").contains("md5"),
      "plane components must be baked into the kernel, not per-row md5 calls")
    assert(!p.contains("Window") && p.contains("partial_topkbyscore"),
      "rerank must be the k-bounded aggregation")
  }

  test("q86/q87: decimal-ANN gates plan kernel dots, no windows, aggregated top-k") {
    for (q <- Seq("q86_ivf_topk", "q87_pq_topk")) {
      val p = plan(q)
      assert(p.contains("vec_dot_decimal"), s"$q lost the native decimal kernel")
      assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
        s"$q must stay windowless (argmin = min(struct), rank = aggregation)")
      assert(p.contains("partial_topkbyscore"),
        s"$q top-k must combine map-side")
      assert(!p.contains("zip_with") && !p.contains("aggregate("),
        s"$q plans an interpreted higher-order lambda chain")
    }
  }

  test("q110: SQ8 gate plans the kernel dots, no windows, aggregated top-k") {
    val p = plan("q110_sq_topk")
    assert(p.contains("vec_dot_decimal"), "q110 lost the native decimal kernel")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
      "q110 must stay windowless (stats = groupBy, rank = aggregation)")
    assert(p.contains("partial_topkbyscore"), "q110 top-k must combine map-side")
  }

  test("q88/q91: sub-document dedup gates plan partial aggregation, no windows, no cartesian") {
    for (q <- Seq("q88_para_dedup", "q91_span_scrub")) {
      val p = plan(q)
      assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
        s"$q must stay windowless (keep-first/argmin = min(struct) aggregation)")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q planned an all-pairs join")
      assert(p.contains("partial_"), s"$q lost map-side partial aggregation")
    }
  }

  test("q89: the only window partitions by the range-partition id, never the corpus") {
    // the budget prefix sum is range-repartitioned with per-partition
    // offsets; its running-sum window must be keyed by the partition id
    // (bounded n/p rows) — an unpartitioned window would be the global
    // single-task sort this operator exists to avoid. The checkpoint
    // truncates the visible plan, so audit the window's partition spec
    // in the tail: `windowspecdefinition(<pid expr>, ...)` with a
    // non-empty partition clause.
    val p = plan("q89_token_budget")
    assert(p.contains("windowspecdefinition"), "expected the in-partition running sum")
    assert(!p.matches("(?s).*windowspecdefinition\\(__mid[^,]*ASC.*"),
      "window must partition by pid, not merely order globally")
    assert(p.contains("shiftright"),
      "window partition key must be the __mid-derived partition id")
  }

  test("q111/q112: map-only quality battery; diff is one id-keyed join, windowless") {
    val p111 = plan("q111_gopher")
    assert(!p111.contains("Exchange") || p111.contains("coalesce"),
      s"the gopher battery is a scan-stage map — no shuffle expected:\n$p111")
    assert(!p111.contains("Window") && !p111.contains("windowspecdefinition"))
    val p112 = plan("q112_corpus_diff")
    assert(!p112.contains("Window") && !p112.contains("windowspecdefinition"))
    assert(!p112.contains("CartesianProduct") && !p112.contains("BroadcastNestedLoop"),
      "the diff must ride the id-keyed join")
  }

  test("q114/q115/q119: ranked gates window only within range partitions") {
    // lengthBatches / perplexityBuckets / epochOrders rank through
    // globalRowNumber: the checkpoint truncates the visible plan, so
    // like q89 the only acceptable window in the TAIL is the
    // pid-partitioned in-partition one; a corpus-wide window would
    // show an un-partitioned windowspecdefinition
    for (q <- Seq("q114_length_batches", "q115_ppl_buckets",
        "q119_epoch_shuffle")) {
      val p = plan(q)
      assert(!p.matches("(?s).*windowspecdefinition\\(__mid[^,]*ASC.*"),
        s"$q must not window over the whole corpus")
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian")
    }
  }

  test("q117/q118: composites plan no cartesian and no corpus-wide window") {
    for (q <- Seq("q117_curate_v3", "q118_token_blocks")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q planned an all-pairs join")
      assert(!p.matches("(?s).*windowspecdefinition\\(__mid[^,]*ASC.*"),
        s"$q must not window over the whole corpus")
    }
  }

  test("q116/q120: eval metrics and vocab encode aggregate map-side, no windows") {
    val p116 = plan("q116_retrieval_eval")
    assert(!p116.contains("Window") && !p116.contains("windowspecdefinition")
      || p116.contains("partial_topkbyscore"),
      "retrieval metrics must not add windows beyond the search's own rank")
    val p120 = plan("q120_vocab_encode")
    // buildVocab's id window runs over exactly k rows (TakeOrdered
    // bounds it); the encode itself must aggregate with a partial stage
    assert(p120.contains("TakeOrderedAndProject"),
      "vocab must be the distributed top-k, not a full sort")
    assert(p120.contains("ObjectHashAggregate") || p120.contains("partial"),
      "per-doc reassembly must aggregate with a partial stage")
  }

  test("q92: composite curation plans no cartesian and no corpus-wide window") {
    // stages 1-2 (dedup + scrub) are windowless aggregations; stage 3
    // contributes the one pid-partitioned running-sum window (see the
    // q89 audit) — nothing may window over the whole corpus
    val p = plan("q92_curate_v2")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "q92 planned an all-pairs join")
    if (p.contains("windowspecdefinition"))
      assert(p.contains("shiftright"),
        "the only window allowed is the pid-partitioned running sum")
  }

  test("q90: mixture sampling is a counts join + map-only filter") {
    val p = plan("q90_mixture_sample")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
      "q90 must not plan a window")
    assert(p.contains("partial_count"), "group counts must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
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

  test("q93: semantic dedup — native kernel, windowless, pairs equi-join on cluster") {
    val p = plan("q93_semantic_dedup")
    assert(p.contains("vec_dot_decimal"), "q93 lost the native decimal-dot kernel")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
      "assignment argmin and keep-first must be aggregations, not windows")
    // the only nested-loop allowed is the k-row broadcast centroid
    // cross join inside assignToCentroids (k caller-bounded); the pair
    // join itself must never go cartesian over the corpus
    assert(!p.contains("CartesianProduct"),
      "within-cluster pairing must equi-join on centroid_id")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "q93 lost map-side partial aggregation")
  }

  test("q94: cluster resolution argmax is a partial min(struct) groupBy, no window") {
    val p = plan("q94_cluster_best")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
      "survivor selection must not plan a window")
    assert(p.contains("partial_min"), "argmax must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q97/q98: hashed scorers broadcast the weight table, aggregate partial, never window") {
    for (q <- Seq("q97_quality_classifier", "q98_dsir_score")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q weight table must broadcast")
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$q doc rollup must combine map-side")
      assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
        s"$q must not plan a window")
      assert(!p.contains("SortMergeJoin"),
        s"$q must not shuffle-join the dim-bounded weight side")
    }
  }

  test("q99: novelty df is a groupBy+join on hashed gram keys — no window, no cartesian") {
    val p = plan("q99_ngram_novelty")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
      "df must never be a gram-partitioned window (boilerplate gram = corpus-sized partition)")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(p.contains("partial_count"), "gram counts must combine map-side")
  }

  test("q100: dsir selection is distributed TakeOrdered, not a global sort") {
    val p = plan("q100_dsir_select")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k selection must be TakeOrdered:\n${p.take(600)}")
    assert(!p.contains("Exchange rangepartitioning"),
      "top-k must not plan a global range sort")
  }

  test("q101: temperature sampling is a map-only key filter — no join, no shuffle") {
    val p = plan("q101_temperature_mix")
    assert(!p.contains("Join"), "membership must be a when-chain, not a join")
    assert(!p.contains("Exchange"), "the sampling filter itself must not shuffle")
  }

  test("q103: interleave ranks are the window-free form — any window is pid-partitioned") {
    // per-source and epoch ranks both come from globalRowNumber: the
    // only admissible window partitions by the __mid-derived partition
    // id (bounded n/p), exactly the q89 rule
    val p = plan("q103_interleave")
    assert(!p.matches("(?s).*windowspecdefinition\\(__mid[^,]*ASC.*"),
      "rank windows must partition by pid, never merely order globally")
    assert(!p.matches("(?s).*windowspecdefinition\\(source.*"),
      "no window may partition by source (a whole source in one task)")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q106: water-fill selects through bottom-k buffers; only the counts frame windows") {
    val p = plan("q106_water_fill")
    assert(p.contains("partial_bottomklong"),
      s"selection buffers must combine map-side:\n${p.take(800)}")
    // the one admissible window ranks the ≤|groups|-row counts frame by
    // group value (remainder distribution) — never a corpus column
    val winSpecs = """windowspecdefinition\((\w+)""".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(winSpecs.subsetOf(Set("__wf_g")),
      s"only the counts-frame remainder window is allowed, got $winSpecs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q104: bin assembly adds one partial-combining aggregate to the pack plan") {
    val p = plan("q104_pack_assemble")
    // exactly the q78 shape plus a groupBy: still only the bucket-
    // partitioned pack window, never one keyed finer
    val winSpecs = """windowspecdefinition\((\w+)""".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(winSpecs == Set("bucket"),
      s"only the pack stage may window, partitioned by bucket; got $winSpecs")
    assert(p.contains("ObjectHashAggregate"),
      s"collect_list assembly must be an object-hash aggregate:\n${p.take(600)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q102: exact quota is a k-bounded partial aggregate, never a window") {
    val p = plan("q102_cap_exact")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
      "the exact per-group cap must not plan the row_number window it replaces")
    assert(p.contains("partial_bottomklong"),
      s"quota buffers must combine map-side:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q124/q125: corpus-stat gates aggregate map-side, no windows") {
    for (q <- Seq("q124_fertility", "q125_distinct_ngrams")) {
      val p = plan(q)
      assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
        s"$q must stay windowless")
      assert(p.contains("partial_"),
        s"$q must combine map-side before the shuffle:\n${p.take(600)}")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    }
  }

  test("q126: margin mining runs kernel dots, aggregated top-k, no windows") {
    val p = plan("q126_margin_mining")
    assert(p.contains("vec_dot_decimal"),
      "cosines must run the native decimal kernel")
    assert(p.contains("partial_topkbyscore"),
      s"both directions' top-k must combine map-side:\n${p.take(600)}")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"),
      "neighborhood stats must aggregate, never window")
    // the only nested-loop is the q26-shape broadcast of the QUERY side
    // (non-equi self-exclusion); a plain cartesian would be a regression
    assert(!p.contains("CartesianProduct"))
  }

  test("q130: bloom decontamination probes the sketch at the train scan, gram-keyed join only") {
    val p = plan("q130_bloom_decontam")
    assert(p.contains("might_contain"),
      "train grams must probe the test-gram sketch before the join shuffle")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "decontamination must stay a gram-keyed equi join, never all-pairs")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    assert(p.contains("partial_count"), "pair counts must combine map-side")
  }

  test("q131: quantiles run over the value histogram — partial counts, probe broadcast, no global window") {
    val p = plan("q131_len_quantiles")
    assert(p.contains("partial_count"),
      "value histogram must combine map-side before the shuffle")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the probe-fraction join must ride a broadcast")
    // the per-lang window partitions by the group key; the global path's
    // window partitions by the range-partition id — neither is corpus-wide
    assert(!p.contains("windowspecdefinition()"),
      "no unpartitioned (corpus-global) window allowed")
    assert(!p.contains("CartesianProduct"))
  }

  test("q132: histogram is one partial-combining aggregate over map-side bins") {
    val p = plan("q132_len_histogram")
    assert(p.contains("partial_count"), "bin counts must combine map-side")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    // the 1-row min/max stats frame joins back as a broadcast, lazily
    assert(p.contains("BroadcastNestedLoopJoin"),
      "stats row must broadcast back, not shuffle")
  }

  test("q133: boilerplate removal is a df-count anti join + per-doc reassembly, windowless") {
    val p = plan("q133_boilerplate")
    assert(p.contains("LeftAnti"), "hot lines must drop via an anti join")
    assert(p.contains("partial_count"),
      "line document-frequency must combine map-side")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q136: HLL registers are one partial-max groupBy — no distinct, no window") {
    val p = plan("q136_hll_registers")
    assert(p.contains("partial_max"),
      "register maxima must combine map-side before the shuffle")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      "the sketch is a pure scan→aggregate pipeline")
  }

  test("q137: edit pairs join only within blocks, never cartesian") {
    val p = plan("q137_edit_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "blocking must keep pair generation an equi join")
    assert(p.contains("levenshtein"), "distance must run the native kernel")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
  }

  test("q138: covariance stats are join-free — pair expansion inside the scan stage") {
    val p = plan("q138_covariance_stats")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "the transform×slice comprehension must replace the self-join")
    assert(p.contains("partial_sum"),
      "pair sums must combine map-side before the (i,j) shuffle")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
  }

  test("q139: rouge overlap joins grams by pair id — windowless, no cartesian") {
    val p = plan("q139_rouge_overlap")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "clipped-overlap sums must combine map-side")
  }

  test("q140: key-skew report is TakeOrderedAndProject, never a global sort") {
    val p = plan("q140_key_skew")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected per-partition top-K + driver merge:\n${p.take(400)}")
    assert(!p.contains("Exchange rangepartitioning"),
      "a range exchange would mean a full global sort")
    assert(p.contains("partial_count"), "key counts must combine map-side")
  }

  test("q142/q143: knn graph runs kernel dots + aggregated top-k; centrality joins on graph keys") {
    val p = plan("q142_knn_graph")
    assert(p.contains("vec_dot_decimal"), "cosine must run the fused kernel")
    assert(p.contains("partial_topkbyscore"),
      "neighbor selection must be the k-bounded aggregator")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    val c = plan("q143_graph_centrality")
    assert(!c.contains("CartesianProduct"))
    assert(!c.contains("Window") && !c.contains("windowspecdefinition"))
  }

  test("q141: shard assignment windows only by the range-partition id") {
    val p = plan("q141_shard_assign")
    // the only window is the in-partition running sum over the
    // __mid-derived pid — the globalRunningSum contract (q89's audit)
    assert(!p.contains("windowspecdefinition()"),
      "no unpartitioned (corpus-global) window allowed")
    assert(!p.contains("CartesianProduct"))
  }

  test("q146/q147: CM sketch is scan→aggregate; point query joins the register table") {
    val p = plan("q146_cm_registers")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "the register build is one generate + groupBy, no joins")
    assert(p.contains("partial_sum"),
      "cell counts must combine map-side before the shuffle")
    val q = plan("q147_cm_merge_query")
    assert(!q.contains("Window") && !q.contains("CartesianProduct"))
    assert(q.contains("partial_min"),
      "the min-over-d estimate must combine map-side")
  }

  test("q153: corpus data card is ONE scan — no joins, no windows") {
    val p = plan("q153_corpus_report")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "the data card must not join")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    // Spark 4 plans the single count-distinct as a multi-phase
    // HashAggregate over (lang, hash) — no Expand needed; either shape
    // is one scan, so only assert the aggregate pipeline exists
    assert(p.contains("HashAggregate"), "expected an aggregate pipeline")
  }

  test("q156: SNM pairs hash-join on the rank block, never cartesian") {
    val p = plan("q156_snm_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "block keys must keep SNM pairing an equi join")
    assert(!p.contains("windowspecdefinition()"),
      "rank must come from globalRowNumber, not a global window")
  }

  test("q157/q158: event analytics shuffle user-keyed pairs — no windows, no cartesian") {
    val p = plan("q157_funnel")
    assert(!p.contains("Window") && !p.contains("windowspecdefinition"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(p.contains("partial_min"),
      "per-step first-touch times must combine map-side")
    val r = plan("q158_retention")
    assert(!r.contains("Window") && !r.contains("CartesianProduct"))
    assert(r.contains("partial_min"),
      "first-seen period must combine map-side")
  }

  test("q174: row-level DQ rules fuse into one pass; FKs are anti joins, not loops") {
    val p = plan("q174_dq_constraints")
    // 1-row report frames cross-join as BNL legitimately; the DATA-sized
    // joins must be hash anti joins
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftAnti"), "orphan detection must plan an anti join")
    assert(!p.contains("windowspecdefinition"))
    // all four row-level rules fused into one aggregate over one scan
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      "row-level counters must combine map-side in the fused aggregate")
  }

  test("q175: IVM merges delta aggregates — partial aggregation, no window, no loop") {
    val p = plan("q175_ivm_agg")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "changelog aggregate must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("windowspecdefinition"))
  }

  test("q176/q177: KMV buffers aggregate; linkage joins only inside blocks") {
    val k = plan("q176_kmv_sketch")
    assert(!k.contains("windowspecdefinition"),
      "bottom-k must ride the k-bounded aggregator, not a rank window")
    assert(k.contains("partial_bottomklong") || k.contains("BottomKLong") ||
      k.contains("partial_"), "KMV must partial-aggregate map-side")
    val l = plan("q177_record_linkage")
    assert(!l.contains("CartesianProduct") && !l.contains("BroadcastNestedLoop"),
      "blocked linkage must be an equi join on the block key")
  }

  test("q178/q186: quantile machinery plans no corpus-wide window sort") {
    // the q131 stance: the only window is the range-partition-id prefix
    // sum inside globalRunningSum — bounded by one partition, and never
    // the __mid-ordered corpus-wide form
    for (q <- Seq("q178_discretize", "q186_weighted_quantiles")) {
      val p = plan(q)
      assert(!p.contains("windowspecdefinition()"),
        s"$q: no unpartitioned (corpus-global) window allowed")
      assert(!p.matches("(?s).*windowspecdefinition\\(__mid[^,]*ASC.*"),
        s"$q must not window over the whole corpus")
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian")
    }
  }

  test("q180/q183: sketch estimates touch register tables, not re-scans") {
    val p = plan("q180_cm_join_size")
    assert(!p.contains("CartesianProduct") && !p.contains("windowspecdefinition"))
    // after the localCheckpoint the estimate plan reads the d-row dots
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      "dot products must be pinned, not rebuilt per branch")
    val h = plan("q183_sliding_hll")
    assert(!h.contains("windowspecdefinition") && !h.contains("CartesianProduct"))
    assert(h.contains("partial_max"),
      "window register merge must combine map-side")
  }

  test("q182/q187: bar aggregates window only within (group, period)") {
    val t = plan("q182_twap")
    assert(t.contains("windowspecdefinition(event_type") ||
      t.contains("windowspecdefinition(vc#") || t.contains("partitionBy"),
      "TWAP lead must partition by (group, period)")
    assert(!t.contains("windowspecdefinition()"),
      "no partition-less window allowed")
    val o = plan("q187_ohlc")
    assert(!o.contains("windowspecdefinition"),
      "OHLC must use min_by/max_by aggregates, not rank windows")
    assert(o.contains("partial_min_by") || o.contains("partial_"),
      "candle endpoints must combine map-side")
  }

  test("q185: SCD2 enrichment is a keyed as-of — no range explosion, no loop") {
    val p = plan("q185_scd2_enrich")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(!p.contains("windowspecdefinition()"),
      "as-of window must partition by the dimension key")
  }

  test("q188: partition filter prunes the scan to the two event_type dirs") {
    val p = plan("q188_partition_prune")
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      s"event_type predicate must prune partitions:\n${p.take(600)}")
  }

  test("q194: attribution windows partition by (user, conversion), joins stay equi") {
    val p = plan("q194_attribution")
    assert(!p.contains("windowspecdefinition()"),
      "credit windows must partition by (user, conversion)")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "touch-conversion pairing must ride the user equi key")
  }

  test("q195/q198: prefix-sum operators stay free of global windows") {
    // systematicPps and aucPpm both ride globalRunningSum — the window
    // inside partitions by the range-partition id, never empty
    for (q <- Seq("q195_pps_sample", "q198_auc")) {
      val p = plan(q)
      assert(!p.contains("windowspecdefinition()"),
        s"$q must not sort the corpus under one window partition")
    }
  }

  test("q196/q201: co-occurrence self-joins are equi on the basket key") {
    for (q <- Seq("q196_triangles", "q201_assoc_rules")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q pair generation must join on the order key, not enumerate pairs")
    }
  }

  test("q197: prefix-filtered join plans no cartesian and prunes text early") {
    val p = plan("q197_prefix_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    // the per-doc rank window must partition by doc_id (bounded state)
    assert(!p.contains("windowspecdefinition()"),
      "prefix rank must partition by doc_id")
  }

  test("q203/q200: test statistics reduce map-side to metadata rows") {
    val chi = plan("q203_chi2")
    assert(chi.contains("partial_count") || chi.contains("partial_sum"),
      "chi-square cells must combine map-side")
    assert(!chi.contains("windowspecdefinition"))
    val kap = plan("q200_kappa")
    // kappa's 1-row chance-rate frame crossJoins BY DESIGN — the audit
    // is that it broadcasts (1-row metadata), not that no product exists
    assert(kap.contains("Broadcast"),
      "kappa's 1-row chance-rate frame must broadcast")
  }

  test("q202: hierarchy iteration plans equi joins, never a loop product") {
    val p = plan("q202_hierarchy")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "frontier expansion must join on the parent key")
  }

  test("q206: profiler aggregates combine map-side, no windows anywhere") {
    val p = plan("q206_profile")
    assert(p.contains("partial_"), "fused basics must partial-aggregate")
    assert(!p.contains("windowspecdefinition"),
      "mode/distinct must come from groupBys, not rank windows")
  }

  test("q207: set operations plan as aggregates/joins, never products") {
    val p = plan("q207_set_ops")
    assert(!p.contains("CartesianProduct"),
      "intersect/except must not enumerate pairs")
  }

  test("q208: winsorize fences broadcast onto the fact side") {
    val p = plan("q208_winsorize")
    assert(p.contains("BroadcastHashJoin"),
      "group fences (groups × 2 rows) must broadcast")
  }

  test("q230/q232: blocklist and URL normalize stay map-only in codegen") {
    // one scan, zero shuffles before the surface: a per-pattern join or
    // a regex-per-pattern loop would show as Exchange/Join nodes
    val bl = plan("q230_blocklist")
    assert(!bl.contains("Exchange") || bl.indexOf("Exchange") > bl.indexOf("ac_matches"),
      "blocklist stats must not shuffle before the automaton scan")
    // executedPlan.toString marks codegen stages with "*(n)" — the
    // projection evaluating ac_matches must carry the star
    val acLine = bl.linesIterator.find(_.contains("ac_matches")).getOrElse("")
    assert(acLine.contains("*("),
      s"the automaton expression must stay inside codegen: $acLine")
    assert(!bl.contains("Join"), "no per-pattern join allowed")
    val un = plan("q232_url_normalize")
    assert(!un.contains("Exchange") && !un.contains("Join"),
      "URL normalization is a pure map — no shuffle, no join")
  }

  test("q229: approx profiler shuffles registers, not values") {
    val p = plan("q229_approx_profile")
    // the exact profiler's (column, value) histogram groupBy is gone;
    // both aggregates (register max, estimator sum) partial-aggregate
    assert(p.contains("partial_max") && p.contains("partial_"),
      "register build must combine map-side")
    assert(!p.contains("windowspecdefinition"), "no rank windows")
  }

  test("q236/q237: Benford grid broadcasts; CUSUM is one window pass") {
    val b = plan("q236_benford")
    assert(b.contains("partial_count"), "digit counts must map-combine")
    assert(!b.contains("CartesianProduct"),
      "digit grid must come from explode, not a product")
    val c = plan("q237_cusum")
    assert(c.contains("BroadcastHashJoin"),
      "per-group totals (|groups| rows) must broadcast onto the series")
    // exactly one window function pass (running sum + row_number share
    // the same (group, period) window spec)
    val firstW = c.indexOf("Window")
    assert(firstW >= 0 && c.indexOf("Window", firstW + 6) < 0 ||
      c.sliding(6).count(_ == "Window") <= 2,
      "CUSUM must not stack window passes")
  }

  test("q234: frontier schedule plans one host-partitioned window") {
    val p = plan("q234_frontier")
    assert(p.contains("windowspecdefinition(host"),
      "schedule must window by host (hosts are the crawl parallelism)")
  }

  test("q238/q240: distribution stats window by group over histograms") {
    // every windowspecdefinition must carry a partition key — a global
    // (unpartitioned) window would serialize the whole alphabet
    for (q <- Seq("q238_equi_depth", "q240_gini")) {
      val p = plan(q)
      val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(m =>
        p.substring(m.end, math.min(p.length, m.end + 40))).toList
      assert(specs.nonEmpty, s"$q expected a group window")
      assert(specs.forall(s => !s.startsWith(",") && !s.startsWith("__v")),
        s"$q has an unpartitioned/value-only window: $specs")
      assert(p.contains("partial_count"), s"$q histogram must map-combine")
    }
  }

  test("q239: KS runs on the windowless prefix sum (pid windows only)") {
    val p = plan("q239_ks_drift")
    // globalRunningSum windows partition by the derived partition id,
    // never leaving a truly global (empty-partition) window spec
    assert(!p.contains("windowspecdefinition(__v"),
      "KS cumulatives must not window over the raw value globally")
  }

  test("q241/q247: moment statistics are one partial pass, no windows") {
    for (q <- Seq("q241_pearson", "q247_anova")) {
      val p = plan(q)
      assert(p.contains("partial_sum"),
        s"$q moment sums must combine map-side")
      assert(!p.contains("windowspecdefinition"),
        s"$q must not plan any window")
      assert(!p.contains("CartesianProduct"), s"$q planned a product")
    }
  }

  test("q242/q243: trend pair frames join on the group key, not a product") {
    for (q <- Seq("q242_mann_kendall", "q243_theil_sen")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q pair frame must be a keyed join (bounded by periods²)")
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$q must aggregate with map-side partials")
    }
  }

  test("q245/q246: resampling shuffles replicate aggregates, not rows") {
    for (q <- Seq("q245_bootstrap_ci", "q246_perm_test")) {
      val p = plan(q)
      assert(p.contains("partial_sum"),
        s"$q replicate sums must combine map-side before the shuffle")
      assert(p.contains("explode") || p.contains("Generate"),
        s"$q replicates must fan out via explode, map-side")
      assert(!p.contains("windowspecdefinition(__id") &&
        !p.contains("windowspecdefinition(__r"),
        s"$q must not window over replicates")
    }
    // the observed 1-row statistic broadcasts onto the permutation diffs
    assert(plan("q246_perm_test").contains("Broadcast"),
      "observed stat must broadcast, never shuffle the diffs against it")
  }

  test("q249: Spearman ranks join on value keys, windows stay grouped") {
    val p = plan("q249_spearman")
    // midrank windows must partition by the group — never a global sort
    val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(m =>
      p.substring(m.end, math.min(p.length, m.end + 30))).toList
    assert(specs.nonEmpty && specs.forall(_.startsWith("__g")),
      s"midrank windows must partition by group: $specs")
    assert(!p.contains("CartesianProduct"))
  }

  test("q250/q251: behavior windows partition by the user, partials combine") {
    for ((q, key) <- Seq("q250_streaks" -> "__g", "q251_dwell" -> "__u")) {
      val p = plan(q)
      val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map(m =>
        p.substring(m.end, math.min(p.length, m.end + 30))).toList
      assert(specs.nonEmpty && specs.forall(_.startsWith(key)),
        s"$q windows must partition by $key: $specs")
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$q aggregates must map-combine")
    }
  }

  test("q252: contingency grid broadcasts margins, cells shuffle not rows") {
    val p = plan("q252_cramers_v")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "margins and the 1-row total must broadcast onto the grid")
    assert(p.contains("partial_count"), "cell counts must map-combine")
    assert(!p.contains("windowspecdefinition"))
  }

  test("q244: TV drift aggregates key counts; totals broadcast back") {
    val p = plan("q244_tv_drift")
    assert(p.contains("partial_count"), "key counts must map-combine")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the 1-row totals must broadcast onto the key frame")
    assert(!p.contains("windowspecdefinition"), "TV needs no window")
  }

  test("q269: trimmed mean runs on histograms; fences broadcast back") {
    // (q268 isotonic has no distributed finish to audit: the operator
    // is one histogram groupBy + a guarded ≤maxScores driver PAVA, so
    // its result plan is a LocalTableScan by design)
    val p = plan("q269_trimmed_mean")
    assert(p.contains("partial_count"), "value histogram must map-combine")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"),
      "the per-group fences must broadcast onto the rows")
    assert(!p.contains("CartesianProduct"))
  }

  test("q270/q271: matrix joins on the key axis; sweep windows by group") {
    val p = plan("q270_corr_matrix")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "pair generation must equi-join on the alignment key")
    assert(p.contains("partial_count"), "pair moments must map-combine")
    assert(!p.contains("windowspecdefinition"), "matrix needs no window")
    val c = plan("q271_concurrency")
    assert(c.contains("windowspecdefinition(__g"),
      "the sweep window must partition by the group")
    assert(!c.contains("CartesianProduct"))
  }

  test("q272: split finder scans histograms; prefix window stays grouped") {
    val p = plan("q272_best_split")
    assert(p.contains("partial_count"), "value histogram must map-combine")
    assert(p.contains("windowspecdefinition(__g"),
      "prefix sums must partition by the group")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "group totals must broadcast onto the candidate rows")
    assert(!p.contains("CartesianProduct"))
  }

  test("q273/q274: journey window stays session-keyed; report cells partial-agg") {
    val p = plan("q273_top_paths")
    assert(p.contains("windowspecdefinition(user_id"),
      "path rank must partition by the session key")
    assert(p.contains("TakeOrderedAndProject"),
      "path cut must be distributed top-k, not a global sort")
    val c = plan("q274_class_report")
    assert(c.contains("partial_count"), "confusion cells must map-combine")
    assert(!c.contains("windowspecdefinition") &&
      !c.contains("CartesianProduct"))
  }

  test("q275/q276/q277: histogram gains, distinct-mapping FD, closure rollup") {
    val g = plan("q275_gains")
    assert(g.contains("partial_count"), "score histogram must map-combine")
    assert(!g.contains("windowspecdefinition()"),
      "no unpartitioned window in the gains table")
    val f = plan("q276_fd_check")
    assert(f.contains("partial_count") || f.contains("partial_first"),
      "FD cardinalities must map-combine")
    assert(!f.contains("windowspecdefinition") &&
      !f.contains("CartesianProduct"))
    val r = plan("q277_subtree_rollup")
    assert(r.contains("partial_count"), "rollup must map-combine")
    assert(!r.contains("CartesianProduct"))
  }

  test("q278/q279/q280: grouped quantile windows, series lag, argmin groupBy") {
    val e = plan("q278_seasonal_envelope")
    assert(e.contains("partial_count"), "count histogram must map-combine")
    assert(!e.contains("windowspecdefinition()"),
      "quantile windows must stay group-partitioned")
    val m = plan("q279_top_movers")
    assert(m.contains("TakeOrderedAndProject"),
      "movers cut must be distributed top-k")
    assert(m.contains("windowspecdefinition(g"),
      "the lag window must partition by the series")
    val n = plan("q280_nearest")
    assert(!n.contains("CartesianProduct") &&
      !n.contains("BroadcastNestedLoopJoin"),
      "nearest neighbor must ride the cell join")
    assert(n.contains("partial_min"), "argmin must map-combine")
    assert(!n.contains("windowspecdefinition"))
  }

  test("q282/q283: trajectory and rolling windows stay series-partitioned") {
    val p = plan("q282_trajectory")
    assert(p.contains("windowspecdefinition(__g"),
      "lag must partition by the trajectory group")
    assert(p.contains("partial_count"), "totals must map-combine")
    val r = plan("q283_rolling_corr")
    assert(r.contains("windowspecdefinition"), "RANGE frame expected")
    assert(!r.contains("CartesianProduct"))
    // all six moments must ride ONE Window operator (one pass)
    assert("(?m)^\\s*(?:\\+- )?Window ".r.findAllIn(r).size == 1,
      s"moment sums must share a single Window exec:\n$r")
  }

  test("q281: dbscan rides the cell join — no distance product, no window") {
    val p = plan("q281_dbscan")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "neighborhoods must come from the cell-keyed candidate join")
    assert(!p.contains("windowspecdefinition"),
      "core/border/label assignment is joins + partial aggregates")
  }

  test("q262/q263: spatial gates join on cell keys — never a distance product") {
    val p = plan("q262_radius_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "radius pairs must candidate-join on the grid cell, not all-pairs")
    assert(p.contains("__jx") && p.contains("__jy"),
      "the equi join must key on the two cell coordinates")
    assert(!p.contains("windowspecdefinition"))
    val h = plan("q263_hotspots")
    assert(h.contains("TakeOrderedAndProject"),
      "hotspot cut must be distributed top-k, not a global sort")
    assert(h.contains("partial_count"), "cell counts must map-combine")
  }

  test("q264/q265: MAD and CCF run on histograms/series, windows stay grouped") {
    val p = plan("q264_mad")
    assert(p.contains("partial_count"), "value histogram must map-combine")
    // the only windows are the per-group running sums of the two
    // quantile passes — partitioned by the group key, never global
    assert(!p.contains("windowspecdefinition()"),
      "no unpartitioned window allowed")
    val c = plan("q265_ccf")
    assert(!c.contains("CartesianProduct"),
      "lagged pairs must equi-join on (group, time)")
    assert(c.contains("partial_count"), "moments must map-combine")
    assert(!c.contains("windowspecdefinition"), "CCF needs no window")
  }

  test("q266: RRF fuses k-bounded ranker outputs through the topk aggregator") {
    val p = plan("q266_rrf")
    assert(p.contains("partial_topkbyscore"),
      "fused cut must be the k-bounded aggregator, never a rank window")
    assert(!p.contains("windowspecdefinition"))
    assert(p.contains("partial_sum"), "RRF scores must map-combine")
  }

  test("q267: split gain shuffles (feature, value, label) cells, not rows") {
    val p = plan("q267_split_gain")
    assert(p.contains("partial_count"), "cell counts must map-combine")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the 1-row parent impurity must broadcast onto the feature rows")
    assert(!p.contains("windowspecdefinition"),
      "gain arithmetic needs no window")
    assert(!p.contains("CartesianProduct"),
      "only the broadcast 1-row cross join is allowed")
  }

  test("q311: geofence is ONE map-only expression — no join, no window") {
    val p = plan("q311_geofence")
    assert(!p.contains("Join") && !p.contains("windowspecdefinition"),
      s"point-in-polygon must fold into the scan stage:\n${p.take(600)}")
    assert(p.contains("partial_count"),
      "per-nation rollup must map-combine")
  }

  test("q304/q313/q318: one-pass conditional aggregates, no joins " +
       "beyond the broadcast expectation table") {
    for (q <- Seq("q304_welch_t2", "q318_did")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q must be a single scan + aggregate, got:\n${p.take(500)}")
      assert(p.contains("partial_"), s"$q must map-combine")
    }
    // q313's full outer vs the 5-row expectation table legitimately
    // sort-merges (full outer can't broadcast) — but only AFTER the
    // category aggregate, so what must hold is alphabet-sized join
    // inputs: the category histogram map-combines before any join
    val srm = plan("q313_srm_check")
    assert(srm.contains("partial_count"),
      "category histogram must aggregate before the expectation join")
  }

  test("q305: Kendall pairs join CELLS within groups — never row pairs") {
    val p = plan("q305_kendall_tau")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "cell pairs must ride the group-keyed equi join")
    assert(p.contains("partial_count"), "cells must map-combine first")
  }

  test("q306/q307: ROC/AP run on score histograms via the " +
       "checkpoint-offset running sum — no global window over rows") {
    for (q <- Seq("q306_roc_points", "q307_avg_precision")) {
      val p = plan(q)
      // the histogram aggregate sits BEHIND the running sum's
      // checkpoint, so the visible plan must read from checkpointed
      // leaves (Scan ExistingRDD) — never re-derive rows — and the
      // only window is the pid-partitioned offset form
      assert(p.contains("Scan ExistingRDD"),
        s"$q: running sums must read the checkpointed histogram")
      assert(!p.contains("windowspecdefinition()"),
        s"$q: no unpartitioned window allowed")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("q308: extrema merge splits touched/untouched — no full-view " +
       "shuffle join") {
    val p = plan("q308_ivm_extrema")
    assert(p.contains("LeftAnti") && p.contains("LeftSemi"),
      "aux view must split on the delta key probes")
  }

  test("q309/q317: graph scoring joins on node keys; tournament " +
       "ratings iterate Pregel-style") {
    val m = plan("q309_modularity")
    assert(!m.contains("CartesianProduct"),
      "endpoint tagging must equi-join on the node key")
    val bt = plan("q317_bradley_terry")
    assert(!bt.contains("CartesianProduct") &&
      !bt.contains("windowspecdefinition"),
      "BT iterations are joins + partial sums only")
  }

  test("q320: rolling actives replicate pairs by literal offsets — " +
       "semi join on the period spine, no range self-join of rows") {
    val p = plan("q320_wau")
    assert(p.contains("LeftSemi"),
      "observed-period filter must be a semi join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "window coverage must come from the explode, not a range join")
  }
}
