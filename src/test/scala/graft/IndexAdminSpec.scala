package graft

import graft.io.ParquetTableStore
import graft.llm.{Dedup, IndexAdmin, Similarity}
import org.apache.spark.sql.functions._

/** Index lifecycle completeness (round-6 verdict ask #6): `stats` must
  * match a recomputed ground truth after two update cycles, and
  * `compact` must restore the build contract (one generation per
  * component, bands re-capped) without changing probe results. */
class IndexAdminSpec extends SparkTestBase {
  import spark.implicits._

  private def store() = new ParquetTableStore(spark, tmpDir("ixadmin"))

  test("exact index: stats match recomputed truth after two update cycles; compact preserves them") {
    val st = store()
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val b0 = docs((1, "aa"), (2, "bb"), (3, "aa"))           // 2 distinct
    val b1 = docs((10, "bb"), (11, "cc"))                    // +1 novel
    val b2 = docs((20, "cc"), (21, "dd"), (22, "dd"))        // +1 novel
    Dedup.buildExactIndex(st, "ex", b0, "doc_id", "text")
    Dedup.updateExactIndex(st, "ex", b1, "doc_id", "text")
    Dedup.updateExactIndex(st, "ex", b2, "doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) = df
      .select($"component", $"metric", $"value")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val s1 = m(IndexAdmin.stats(st, "ex"))
    // ground truth: 4 distinct contents across all admitted batches
    assert(s1(("hashes", "rows")) == 4L, s"got $s1")
    assert(s1(("hashes", "distinct_hash")) == 4L)
    val s2 = m(IndexAdmin.compact(st, "ex", targetFiles = 1))
    assert(s2 == s1, "compact must not change logical stats")
    // one generation: a single parquet part file after compact
    val novel = Dedup.dedupAgainstIndex(st, "ex",
      docs((30, "aa"), (31, "ee")), "doc_id", "text")
    assert(novel.select("doc_id").as[Long].collect().toSet == Set(31L),
      "probe against compacted index must behave identically")
  }

  test("fuzzy index: bands occupancy stats true after updates; compact re-caps drifted buckets") {
    val st = store()
    val rndT = new scala.util.Random(5)
    val lex = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def text(i: Int) = {
      val r = new scala.util.Random(i * 31 + rndT.nextInt(1))
      (0 until 12).map(_ => lex(r.nextInt(lex.size))).mkString(" ")
    }
    val corpus = (1L to 8L).map(i => (i, text(i.toInt))).toDF("doc_id", "text")
    Dedup.buildFuzzyIndex(st, "fz", corpus, "doc_id", "text",
      k = 16, bands = 4, maxBucketSize = 3)
    val novel = Dedup.updateFuzzyIndex(st, "fz",
      (100L to 103L).map(i => (i, text(i.toInt))).toDF("doc_id", "text"),
      "doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) = df
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val s = m(IndexAdmin.stats(st, "fz"))
    // recount ground truth straight off the stored table
    val occ = st.read("fz.bands").groupBy($"band", $"bucket").count()
      .select($"count").as[Long].collect()
    assert(s(("bands", "rows")) == occ.sum)
    assert(s(("bands", "n_buckets")) == occ.length.toLong)
    assert(s(("bands", "max_bucket")) == occ.max)
    assert(s(("sigs", "rows")) == 8L + novel.count())
    // simulate append-driven drift: push one bucket far past the cap
    // (localCheckpoint pins the row — appending while lazily re-reading
    // the same parquet dir would race the writer)
    val one = st.read("fz.bands").limit(1).localCheckpoint()
    (1 to 5).foreach(_ => st.append("fz.bands", one))
    val drifted = m(IndexAdmin.stats(st, "fz"))
    assert(drifted(("bands", "over_cap_buckets")) >= 1L,
      s"expected drifted bucket, got $drifted")
    val after = m(IndexAdmin.compact(st, "fz"))
    assert(after(("bands", "over_cap_buckets")) == 0L,
      "compact must re-apply the build-time bucket cap")
    assert(after(("bands", "max_bucket")) <= 3L)
  }

  test("ivf index: list occupancy stats sum to corpus+admitted rows") {
    val st = store()
    val rnd = new scala.util.Random(11)
    def vecs(ids: Range) = ids.map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    Similarity.buildIvfIndex(st, "iv", vecs(0 until 40), "vec_id", "embedding",
      nlist = 4, iters = 2)
    Similarity.updateIvfIndex(st, "iv", vecs(100 until 110), "vec_id", "embedding")
    val s = IndexAdmin.stats(st, "iv")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(s(("buckets", "rows")) == 50L)
    assert(s(("buckets", "n_lists")) <= 4L && s(("buckets", "n_lists")) >= 1L)
    assert(s(("centroids", "rows")) <= 4L)
    // occupancy metrics agree with a recount
    val occ = st.read("iv.buckets").groupBy($"cid").count()
      .select($"count").as[Long].collect()
    assert(s(("buckets", "max_list")) == occ.max)
    assert(s(("buckets", "min_list")) == occ.min)
  }

  test("stats fails loudly on an unknown prefix") {
    val st = store()
    intercept[IllegalArgumentException](IndexAdmin.stats(st, "nope"))
  }

  private def clustered(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("vec_id", "embedding")
  }

  test("merge: probe(merge(A,B)) == probe(build over A∪B) per family; " +
       "frozen-param and id-overlap violations fail loud") {
    val st = store()
    val full = clustered(160, 32, seed = 67)
    val shardA = full.filter($"vec_id" < 80)
    val shardB = full.filter($"vec_id" >= 80)
    val queries = full.filter($"vec_id" < 4)

    // ---- IVF: shard B admits against A's FROZEN centroids ----
    Similarity.buildIvfIndex(st, "a", shardA, "vec_id", "embedding",
      nlist = 8, iters = 2)
    st.overwrite("b.centroids", st.read("a.centroids"))
    Similarity.updateIvfIndex(st, "b", shardB, "vec_id", "embedding")
    IndexAdmin.merge(st, "a", "b", "m")
    assert(Similarity.detectIndexKind(st, "m")
      .contains(Similarity.IvfIndexed))
    // reference: ONE index over A∪B with the same frozen centroids
    st.overwrite("f.centroids", st.read("a.centroids"))
    Similarity.updateIvfIndex(st, "f", full, "vec_id", "embedding")
    def probeIvf(p: String) = Similarity.ivfTopKIndexed(st, p, queries,
        "vec_id", "embedding", k = 5, nprobe = 3, deterministic = true)
      .select($"query_id", $"cand_id", $"rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(probeIvf("m") == probeIvf("f"),
      "merged IVF probe must equal the union-built probe, rank for rank")

    // ---- SQ8: shard B encodes against A's FROZEN stats ----
    Similarity.buildSqIndex(st, "sa", shardA, "vec_id", "embedding")
    st.overwrite("sb.stats", st.read("sa.stats"))
    Similarity.updateSqIndex(st, "sb", shardB, "vec_id", "embedding")
    IndexAdmin.merge(st, "sa", "sb", "sm")
    st.overwrite("sf.stats", st.read("sa.stats"))
    Similarity.updateSqIndex(st, "sf", full, "vec_id", "embedding")
    def probeSq(p: String) = Similarity.sqTopKIndexed(st, p, queries,
        "vec_id", "embedding", k = 5)
      .select($"query_id", $"cand_id", $"rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(probeSq("sm") == probeSq("sf"))

    // ---- PQ: shard B encodes against A's FROZEN codebooks ----
    Similarity.buildPqIndex(st, "pa", shardA, "vec_id", "embedding",
      m = 4, dims = 32, nlist = 16)
    st.overwrite("pb.books", st.read("pa.books"))
    st.overwrite("pb.meta", st.read("pa.meta"))
    Similarity.updatePqIndex(st, "pb", shardB, "vec_id", "embedding")
    IndexAdmin.merge(st, "pa", "pb", "pm")
    st.overwrite("pf.books", st.read("pa.books"))
    st.overwrite("pf.meta", st.read("pa.meta"))
    Similarity.updatePqIndex(st, "pf", full, "vec_id", "embedding")
    def probePq(p: String) = Similarity.pqTopKIndexed(st, p, queries,
        "vec_id", "embedding", k = 5)
      .select($"query_id", $"cand_id", $"rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(probePq("pm") == probePq("pf"))

    // ---- violations fail loud ----
    // different frozen params: an independently TRAINED shard-B index
    Similarity.buildIvfIndex(st, "b2", shardB, "vec_id", "embedding",
      nlist = 8, iters = 2)
    val e1 = intercept[IllegalArgumentException](
      IndexAdmin.merge(st, "a", "b2", "x1"))
    assert(e1.getMessage.contains("frozen component"))
    // overlapping ids: A merged with itself (same frozen, same ids)
    val e2 = intercept[IllegalArgumentException](
      IndexAdmin.merge(st, "a", "a", "x2"))
    assert(e2.getMessage.contains("share ids") ||
      e2.getMessage.contains("must differ"))
    // family mismatch
    val e3 = intercept[IllegalArgumentException](
      IndexAdmin.merge(st, "a", "sa", "x3"))
    assert(e3.getMessage.contains("families differ"))
    // in-place merge refused
    intercept[IllegalArgumentException](IndexAdmin.merge(st, "a", "b", "a"))
  }
}
