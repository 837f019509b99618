package graft

import graft.llm.{Chunking, TextAnalysis}
import graft.ops.Packing
import org.apache.spark.sql.functions._

/** Chunking, packing, repetition signals, JSON extraction — the round-5
  * training-data-assembly operators (gate queries q67–q70). */
class ChunkPackSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
    (2L, "a b c"),                                   // shorter than a chunk
    (3L, "solo")                                     // single token
  ).toDF("doc_id", "text")

  test("chunking covers every token exactly once at stride boundaries") {
    val chunks = Chunking.chunkByTokens(docs, Seq("doc_id"), "text",
        chunkSize = 32, stride = 32) // non-overlapping
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect()
    val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
      id -> cs.sortBy(_._2).map(_._3).mkString(" ")
    }
    val orig = docs.as[(Long, String)].collect().toMap
    assert(rebuilt == orig, "concat of stride=size chunks must rebuild the doc")
  }

  test("overlapping chunks: starts advance by stride, all sizes bounded, tail short") {
    val chunks = Chunking.chunkByTokens(docs.where($"doc_id" === 1L),
        Seq("doc_id"), "text", chunkSize = 32, stride = 24)
      .orderBy("chunk_id").as[(Long, Long, String, Long)].collect()
    // 100 tokens, stride 24 -> starts 0,24,48,72,96 -> 5 chunks
    assert(chunks.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // chunk i holds min(32, 100 - 24*i) tokens: 32,32,32,28,4
    assert(chunks.map(_._4).toSeq == Seq(32L, 32L, 32L, 28L, 4L))
    // chunk i begins with token i*stride+1 (w{i*24+1})
    chunks.foreach { case (_, i, text, _) =>
      assert(text.startsWith(s"w${i * 24 + 1} ") || !text.contains(" "))
    }
  }

  test("single-token and short docs chunk to one (short) chunk") {
    val m = Chunking.chunkByTokens(docs, Seq("doc_id"), "text", 32, 24)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum("n_chunk_tokens").as("t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(2L) == (1L, 3L))
    assert(m(3L) == (1L, 1L))
  }

  test("chunking validates size/stride") {
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(docs, Seq("doc_id"), "text", 8, 9)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(docs, Seq("doc_id"), "text", 0, 1)
    }
  }

  private lazy val sized = spark.range(0, 2000).select(
    $"id".as("doc_id"), (pmod($"id" * 37L, lit(90L)) + 10L).as("n_tokens"))

  test("packing: bins are contiguous and per-bin totals bounded by budget + max doc") {
    val packed = Packing.packGreedy(sized, $"doc_id", $"n_tokens",
      budget = 512L, buckets = 8)
    val maxDoc = 99L
    val binTotals = packed.groupBy("bucket", "bin_id")
      .agg(sum("n_tokens").as("t")).as[(Long, Long, Long)].collect()
    assert(binTotals.forall(_._3 <= 512L + maxDoc),
      "a bin can overshoot by at most one (unsplit) document")
    // bins within a bucket are dense 0..max (contiguous fill)
    val byBucket = binTotals.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    byBucket.foreach { case (_, bins) =>
      assert(bins.toSeq == (0L to bins.max).toSeq)
    }
    // every non-final bin is at least budget-full minus one doc
    val maxBin = byBucket.mapValues(_.max).toMap
    binTotals.filter(bt => bt._2 < maxBin(bt._1)).foreach { bt =>
      assert(bt._3 > 512L - maxDoc)
    }
  }

  test("packing is deterministic and partition-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packGreedy(df, $"doc_id", $"n_tokens", 512L, 8)
        .select("doc_id", "bucket", "bin_id")
        .as[(Long, Long, Long)].collect().toSet
    assert(run(sized) == run(sized.repartition(13)))
  }

  test("packing derives buckets from parallelism when the caller passes none") {
    val packed = Packing.packGreedy(sized, $"doc_id", $"n_tokens", budget = 512L)
    val para = spark.sparkContext.defaultParallelism
    val usedBuckets = packed.select(countDistinct($"bucket")).as[Long].head()
    // 2000 sequential ids mod nb hit every bucket, so distinct-bucket
    // count IS the derived nb (holds while nb <= 2000)
    assert(usedBuckets >= para,
      s"derived buckets ($usedBuckets) must be >= defaultParallelism ($para) " +
        "so no caller serializes the corpus into one stream")
  }

  test("packing and chunking reject reserved output-column collisions") {
    intercept[IllegalArgumentException] {
      Packing.packGreedy(sized.withColumn("bin_id", lit(1)),
        $"doc_id", $"n_tokens", 512L, 8)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(
        Seq((1L, "a b c", 0)).toDF("doc_id", "text", "chunk_id"),
        Seq("doc_id"), "text", 32, 24)
    }
  }

  test("lengthBatches: full batches of length-neighbors, exact padding accounting") {
    // 100 docs, lengths 1..100 -> 10 batches of 10 consecutive lengths
    val df = (1 to 100).map(i => (i.toLong, (101 - i).toLong))
      .toDF("doc_id", "n_tokens")
    val batched = Packing.lengthBatches(df, $"n_tokens", $"doc_id", 10)
    val rows = batched.select($"doc_id", $"n_tokens", $"batch_id")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 100)
    // batch b holds exactly lengths 10b+1..10b+10
    rows.foreach { case (_, len, b) =>
      assert((len - 1) / 10 == b, s"len $len in batch $b")
    }
    val stats = Packing.paddingStats(batched, $"n_tokens", $"batch_id")
      .select($"batch_id", $"n_rows", $"max_len", $"sum_len", $"waste")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.length == 10)
    stats.foreach { case (b, n, mx, sm, w) =>
      assert(n == 10 && mx == 10 * b + 10)
      assert(sm == (10 * b + 1 to 10 * b + 10).sum)
      assert(w == n * mx - sm && w == 45, s"batch $b waste $w")
    }
    // partition-independence + guard
    val again = Packing.lengthBatches(df.repartition(7), $"n_tokens",
        $"doc_id", 10)
      .select($"doc_id", $"batch_id").as[(Long, Long)].collect().toSet
    assert(again == rows.map(r => (r._1, r._3)).toSet)
    intercept[IllegalArgumentException] {
      Packing.lengthBatches(df.withColumn("batch_id", lit(1)),
        $"n_tokens", $"doc_id", 10)
    }
  }

  test("tokenBlocks: blocks cross doc boundaries, every block full but the last") {
    val df = Seq((1L, "a b c"), (2L, "d e"), (3L, "f"))
      .toDF("doc_id", "text")
    // stream: a b c <eos> d e <eos> f <eos>  (9 tokens, blockSize 4)
    val got = Packing.tokenBlocks(df, $"doc_id", "text", blockSize = 4)
      .select($"block_id", $"n_tokens", $"text", $"spans")
      .as[(Long, Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 4L, "a b c <eos>", "0:4"),
      (1L, 4L, "d e <eos> f", "0:3,3:1"),  // crosses the doc-2/3 boundary
      (2L, 1L, "<eos>", "0:1")))
    // partition-independence
    val again = Packing.tokenBlocks(df.repartition(5), $"doc_id", "text",
        blockSize = 4)
      .select($"block_id", $"text").as[(Long, String)].collect().toSet
    assert(again == got.map(r => (r._1, r._3)).toSet)
    // a doc longer than a block spans several fragments
    val long = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val blocks = Packing.tokenBlocks(long, $"doc_id", "text", blockSize = 3)
      .select($"block_id", $"n_tokens", $"text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(blocks.length == 4 && blocks.take(3).forall(_._2 == 3L))
    assert(blocks.map(_._3).mkString(" ") ==
      (1 to 10).map(i => s"t$i").mkString(" ") + " <eos>")
  }

  test("property: tokenBlocks reconstructs the exact stream; spans tile every block") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 5) {
      val blockSize = 1 + rnd.nextInt(9)
      val docs = (1 to 2 + rnd.nextInt(30)).map { i =>
        (i.toLong, (0 until 1 + rnd.nextInt(12))
          .map(j => s"d${i}t$j").mkString(" "))
      }
      val blocks = Packing.tokenBlocks(docs.toDF("doc_id", "text"),
          $"doc_id", "text", blockSize)
        .select($"block_id", $"n_tokens", $"text", $"spans")
        .as[(Long, Long, String, String)].collect().sortBy(_._1)
      // 1. contiguous 0-based block ids
      assert(blocks.map(_._1).toSeq == blocks.indices.map(_.toLong),
        s"trial $trial: block ids not contiguous")
      // 2. every block full except possibly the last
      assert(blocks.init.forall(_._2 == blockSize), s"trial $trial: short mid-block")
      // 3. reassembled stream == docs joined with <eos> in id order
      val expect = docs.map(_._2 + " <eos>").mkString(" ")
      assert(blocks.map(_._3).mkString(" ") == expect,
        s"trial $trial: stream reconstruction failed")
      // 4. spans tile each block exactly: start at 0, contiguous, sum = n
      blocks.foreach { case (b, n, _, spans) =>
        val parsed = spans.split(",").map { s =>
          val Array(st, ln) = s.split(":"); (st.toInt, ln.toInt) }
        assert(parsed.head._1 == 0, s"trial $trial block $b: first span not at 0")
        parsed.sliding(2).foreach {
          case Array((s1, l1), (s2, _)) =>
            assert(s1 + l1 == s2, s"trial $trial block $b: span gap")
          case _ => ()
        }
        assert(parsed.map(_._2).sum == n, s"trial $trial block $b: span sum != n")
      }
    }
  }

  test("capPerGroupApprox includeNulls caps null-group rows as one sentinel group") {
    val df = spark.range(0, 6000).select(
      $"id".as("doc_id"),
      when(pmod($"id", lit(3)) === 0, lit(null).cast("string"))
        .otherwise(concat(lit("g"), pmod($"id", lit(3)))).as("grp"))
    val dropped = graft.ops.Sampling.capPerGroupApprox(df,
      graft.ops.Sampling.lcgKey($"doc_id"), $"grp", maxPerGroup = 500L)
    assert(dropped.where($"grp".isNull).count() == 0,
      "default behavior: null groups documented-dropped")
    val kept = graft.ops.Sampling.capPerGroupApprox(df,
      graft.ops.Sampling.lcgKey($"doc_id"), $"grp", maxPerGroup = 500L,
      includeNulls = true)
    val nullKept = kept.where($"grp".isNull).count()
    // 2000 null rows, quota 500 -> rate 250 per-mille, binomial sd ~19
    assert(nullKept > 0 && math.abs(nullKept - 500L) < 120,
      s"null group must be capped like any other, kept=$nullKept")
    // non-null groups behave identically in both modes
    val a = dropped.where($"grp".isNotNull).select("doc_id").as[Long].collect().toSet
    val b = kept.where($"grp".isNotNull).select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("repetition signals: exact counts on a hand-built doc") {
    val d = Seq((1L, "a a b a"), (2L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(d, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // tokens: a,a,b,a -> 4 total, 2 distinct, top 'a' = 3
    // bigrams: "a a","a b","b a" -> 3 total, 3 distinct, top = 1
    assert(r(1L) == ((1L, 4L, 2L, 3L, 3L, 3L, 1L)))
    // single token: no bigrams, zeros not nulls
    assert(r(2L) == ((2L, 1L, 1L, 1L, 0L, 0L, 0L)))
  }

  test("capPerGroupApprox: small groups untouched, large groups near quota, deterministic") {
    val df = spark.range(0, 30000).select(
      $"id".as("doc_id"),
      concat(lit("g"), pmod($"id", lit(3))).as("grp"))
    val big = graft.ops.Sampling.capPerGroupApprox(df,
      graft.ops.Sampling.lcgKey($"doc_id"), $"grp", maxPerGroup = 500L)
    val kept = big.groupBy("grp").count().as[(String, Long)].collect().toMap
    // 10000 rows/group, rate 50 per-mille -> E=500, binomial sd ~22
    kept.values.foreach(k => assert(math.abs(k - 500L) < 120, s"kept=$k"))
    // below quota: everything survives
    val small = graft.ops.Sampling.capPerGroupApprox(
      df.where($"doc_id" < 900),
      graft.ops.Sampling.lcgKey($"doc_id"), $"grp", maxPerGroup = 500L)
    assert(small.count() == 900)
    // pure function of (id, group count): repartitioning changes nothing
    val a = big.select("doc_id").as[Long].collect().toSet
    val b = graft.ops.Sampling.capPerGroupApprox(df.repartition(17),
        graft.ops.Sampling.lcgKey($"doc_id"), $"grp", 500L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("normalizeText: NFC composition, lowercase, whitespace collapse") {
    import graft.llm.TextAnalysis.normalizeText
    val decomposed = "Café  du\tMonde\n" // e + combining acute, messy ws
    val composed = "café du monde"
    val rows = Seq((1L, decomposed), (2L, "cafÉ du  monde"), (3L, " x "))
      .toDF("id", "t").select($"id", normalizeText($"t").as("n"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) == composed, "NFD input must compose and collapse")
    assert(rows(2L) == composed, "case must fold")
    assert(rows(3L) == "x", "ends must trim")
    // idempotent
    val again = Seq((1L, rows(1L))).toDF("id", "t")
      .select(normalizeText($"t")).as[String].head()
    assert(again == composed)
  }

  test("assembleBins concatenates a bin's payloads in pack order with exact counts") {
    val docs = Seq(
      (1L, "a a a", 3L), (2L, "b b", 2L), (3L, "c c c c", 4L),
      (4L, "d", 1L), (5L, "e e", 2L))
      .toDF("doc_id", "text", "n_tokens")
    // one bucket, budget 5; cum_before = 0,3,5,9,10 → bins 0,0,1,1,2
    val packed = Packing.packGreedy(docs, $"doc_id", $"n_tokens", 5L, 1)
    val bins = Packing.assembleBins(packed, $"doc_id", $"n_tokens", $"text",
        sep = " | ")
      .select($"bin_id", $"n_items", $"n_tokens", $"text")
      .as[(Long, Long, Long, String)].collect().map(b => b._1 -> b).toMap
    assert(bins(0L) == ((0L, 2L, 5L, "a a a | b b")))
    assert(bins(1L) == ((1L, 2L, 5L, "c c c c | d")))
    assert(bins(2L) == ((2L, 1L, 2L, "e e")))
  }

  test("assembleBins is partition-independent, requires a packed frame, plans no window") {
    val withText = sized.withColumn("text",
      concat(lit("doc"), $"doc_id".cast("string")))
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.assembleBins(
          Packing.packGreedy(df, $"doc_id", $"n_tokens", 512L, 8),
          $"doc_id", $"n_tokens", $"text")
        .select($"bucket", $"bin_id", $"text")
        .as[(Long, Long, String)].collect().toSet
    assert(run(withText) == run(withText.repartition(13)))
    intercept[IllegalArgumentException] {
      Packing.assembleBins(withText, $"doc_id", $"n_tokens", $"text")
    }
    val plan = Packing.assembleBins(
        Packing.packGreedy(withText, $"doc_id", $"n_tokens", 512L, 8),
        $"doc_id", $"n_tokens", $"text")
      .queryExecution.executedPlan.toString
    // the pack stage owns the (bucket-bounded) running-sum window; the
    // ASSEMBLY itself must add only a partial-combining aggregate
    assert(plan.contains("ObjectHashAggregate") || plan.contains("partial"),
      s"bin assembly must aggregate with a partial stage:\n$plan")
  }

  test("json extraction: missing/malformed keys null out, aggregates skip them") {
    val ev = Seq(
      ("a", """{"k": 5}"""), ("a", """{"k": 7}"""),
      ("a", """{"other": 1}"""), ("b", "not json")
    ).toDF("event_type", "props")
    val k = get_json_object($"props", "$.k").cast("long")
    val agg = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(k).as("n_k"), sum(k).as("s"))
      .as[(String, Long, Long, Option[Long])].collect().map(t => t._1 -> t).toMap
    assert(agg("a") == (("a", 3L, 2L, Some(12L))))
    assert(agg("b") == (("b", 1L, 0L, None)))
  }

  test("shardAssign: exclusive-prefix rule vs window reference, shards contiguous") {
    val rnd = new scala.util.Random(71)
    val docs = (0 until 400).map(i => (i.toLong, 50L + rnd.nextInt(400)))
    val df = docs.toDF("doc_id", "sz")
    val budget = 2000L
    val got = Packing.shardAssign(df, Seq(col("doc_id")), "sz", budget)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // reference: driver prefix sum with the identical integer rule
    var cum = 0L
    val want = docs.map { case (id, sz) =>
      cum += sz; (id, sz, cum, (cum - sz) / budget)
    }
    assert(got.toSeq == want)
    // shards are contiguous, monotone, and never split a doc: a doc's
    // shard is decided by its START offset alone
    assert(got.map(_._4).toSeq == got.map(_._4).sorted.toSeq)
    // every shard's content lands in [budget - maxItem, budget + maxItem)
    val maxItem = docs.map(_._2).max
    val totals = got.groupBy(_._4).map { case (s, rs) => s -> rs.map(_._2).sum }
    val last = totals.keys.max
    for ((s, t) <- totals if s != last)
      assert(t >= budget - maxItem && t < budget + maxItem,
        s"shard $s total $t outside the never-split band")
  }

  test("shardAssign is partition-independent; shardManifest matches") {
    val docs = (0 until 300).map(i => (i.toLong, (i % 37 + 1).toLong))
    val df = docs.toDF("doc_id", "sz")
    val a = Packing.shardAssign(df, Seq(col("doc_id")), "sz", 150L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Packing.shardAssign(df.repartition(11), Seq(col("doc_id")),
        "sz", 150L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    val manifest = Packing.shardManifest(
        Packing.shardAssign(df, Seq(col("doc_id")), "sz", 150L), "sz")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want = a.toSeq.groupBy(_._4).map { case (s, rs) =>
      s -> ((rs.size.toLong, rs.map(_._2).sum)) }
    assert(manifest == want)
    intercept[IllegalArgumentException] {
      Packing.shardAssign(df, Seq(col("doc_id")), "sz", 0L)
    }
  }
}
