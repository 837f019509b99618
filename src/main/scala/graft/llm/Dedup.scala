package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines — exact and
  * near-duplicate (MinHash+LSH, SimHash, n-gram Jaccard). All builtin
  * expressions (codegen) + at most one shuffle per stage; no driver-side
  * collection anywhere, so every path survives a 1000-executor corpus.
  */
object Dedup {

  /** Exact dedup: one survivor (min id) per distinct content hash.
    * Hash-groupBy — partial aggregation map-side, one shuffle on the
    * 64-bit content hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = xxhash64(col(textCol))
    df.groupBy(fp.as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .join(df, Seq(idCol))
  }

  // -------------------------------------------------------------------
  // MinHash + LSH
  //
  // shingle → 64-bit hash → k minhashes via the universal-hash family
  //   h_i(x) = (a_i * x + b_i) mod p   (p = 2^61 - 1, a/b derived from a
  // seed — deterministic, no RNG state) → signature Array[Long] → band
  // into b groups of r = k/b rows; docs sharing any band bucket are
  // candidate pairs, verified by exact signature similarity.
  //
  // Scale shape: signatures are one narrow map-side pass; the band
  // explode multiplies rows by b (small constant); the bucket join is one
  // shuffle on (band, bucketHash). Huge buckets (degenerate shingles) are
  // capped — the classic skew guard.
  // -------------------------------------------------------------------

  private val MersennePrime = (1L << 61) - 1

  private def hashParams(i: Int, seed: Int): (Long, Long) = {
    // deterministic odd multiplier + offset per hash index
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val a = (mix(seed.toLong * 1315423911L + i) & MersennePrime) | 1L
    val b = mix(i.toLong * 2654435761L + seed) & MersennePrime
    (a, b)
  }

  /** k-minhash signature over an array-of-shingles column. */
  def minHashSignature(shingles: Column, k: Int, seed: Int = 42): Column = {
    val hashed = transform(shingles, s => pmod(xxhash64(s), lit(MersennePrime)))
    array((0 until k).map { i =>
      val (a, b) = hashParams(i, seed)
      // (a*x+b) mod p in unsigned 128-free arithmetic: do it in two pmod
      // steps to stay in Long range: ((a mod p)*(x mod p)) can overflow —
      // use double-limbed multiply via BigInt-free trick: split a into
      // hi/lo 31-bit halves.
      aggregate(hashed, lit(Long.MaxValue), (acc, x) => {
        val ax = modMul(lit(a), x)
        least(acc, pmod(ax + lit(b), lit(MersennePrime)))
      })
    }: _*)
  }

  /** (a*b) mod 2^61-1: both operands < 2^61 so the product needs 122 bits
    * — Spark has no int128, but DECIMAL(38,0) holds 10^38 > 2^122, so the
    * mod-multiply runs exactly in decimal and casts back to long. */
  private def modMul(a: Column, b: Column): Column =
    pmod((a.cast("decimal(38,0)") * b.cast("decimal(38,0)")) %
           lit(MersennePrime).cast("decimal(38,0)"), lit(MersennePrime).cast("decimal(38,0)"))
      .cast("long")

  /** Candidate near-dup pairs via MinHash banding over word n-gram
    * shingles, verified by signature agreement ≥ `threshold`. Returns
    * (id_a, id_b, sig_sim) with id_a < id_b. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 32, bands: Int = 8, ngram: Int = 2,
                        threshold: Double = 0.5, seed: Int = 42,
                        maxBucketSize: Int = 1000): DataFrame = {
    val rows = k / bands
    val sigd = df.select(col(idCol).as("doc_id"),
      minHashSignature(TextShingles.wordNgrams(col(textCol), ngram), k, seed).as("sig"))
    val banded = sigd.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map { bnd =>
        struct(lit(bnd).as("band"),
          xxhash64(to_json(slice(col("sig"), bnd * rows + 1, rows))).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"),
              col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // skew guard: drop degenerate buckets
    val sized = banded.withColumn("bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bucket"))))
      .filter(col("bsz") <= maxBucketSize)
    val a = sized.select(col("band"), col("bucket"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = sized.select(col("band"), col("bucket"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
    pairs.select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => x === y), b => b)).cast("double") / lit(k))
          .as("sig_sim"))
      .filter(col("sig_sim") >= threshold)
  }

  // -------------------------------------------------------------------
  // SimHash: 64-bit fingerprint where near-dups differ in few bits.
  // Bit j = sign of Σ_tokens (bit j of xxhash64(token) ? +1 : −1).
  // Candidate pairs: pigeonhole on 16-bit chunks (hamming ≤ 3 ⇒ ≥1 of 4
  // chunks equal), verified with bit_count(xor).
  // -------------------------------------------------------------------

  /** 64-bit SimHash of a token-array column, as one expression tree. */
  def simHash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L) * lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Near-dup pairs with Hamming distance ≤ maxDist (≤ 3 for the 4-chunk
    * pigeonhole to be exhaustive). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-chunk pigeonhole covers hamming <= 3")
    val sh = df.select(col(idCol).as("doc_id"),
      simHash(TextShingles.words(col(textCol))).as("sh"))
    val chunked = sh.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("ck"))
      .select(col("doc_id"), col("sh"),
              col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val a = chunked.select(col("chunk"), col("key"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("key"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding near-dup: pairs above a cosine threshold via LSH buckets
    * (delegates to Similarity's banding; exact verify). */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       minCosine: Double, bits: Int = 16, bands: Int = 4): DataFrame =
    Similarity.lshBucketTopK(df, df, idCol, vecCol, k = Int.MaxValue,
        bits = bits, bands = bands)
      .filter(col("cosine") >= minCosine)
      .filter(col("query_id") < col("cand_id"))
      .select(col("query_id").as("id_a"), col("cand_id").as("id_b"), col("cosine"))
}
