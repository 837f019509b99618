package graft

import graft.llm.{MediaCodecs, Multimodal}
import graft.llm.Multimodal.MediaRow

class MediaCodecsSpec extends SparkTestBase {
  import spark.implicits._

  test("BMP round trip: decoded pixel stats match the generator exactly") {
    // 5x3 image, solid-ish gradient; width 5 forces a padded stride (15 -> 16)
    val (w, h) = (5, 3)
    def px(x: Int, y: Int) = (x * 40, y * 80, 200)
    val bytes = MediaCodecs.encodeBmp24(w, h, px)
    val Some((f, frames)) = MediaCodecs.decodeBmp24(bytes)
    assert(frames == 1)
    // independent expected stats straight from the generator
    val pixels = for (y <- 0 until h; x <- 0 until w) yield px(x, y)
    val n = pixels.size
    assert(math.abs(f(0) - pixels.map(_._1).sum.toDouble / n / 255.0) < 1e-6)
    assert(math.abs(f(1) - pixels.map(_._2).sum.toDouble / n / 255.0) < 1e-6)
    assert(math.abs(f(2) - pixels.map(_._3).sum.toDouble / n / 255.0) < 1e-6)
    val lumas = pixels.map { case (r, g, b) => 0.299 * r + 0.587 * g + 0.114 * b }
    assert(math.abs(f(3) - lumas.sum / n / 255.0) < 1e-6)
    // 8-bin luma histogram fractions sum to 1
    assert(math.abs((5 until 13).map(f(_).toDouble).sum - 1.0) < 1e-6)
    assert(math.abs(f(13) - w.toDouble / (w + h)) < 1e-6)
  }

  test("WAV round trip: RMS / mean / zero crossings match the samples exactly") {
    // a square wave: rms = amplitude, zcr = one crossing per half-period
    val amp: Short = 8192
    val samples = Array.tabulate[Short](800)(i => if ((i / 4) % 2 == 0) amp else (-amp).toShort)
    val bytes = MediaCodecs.encodePcm16Wav(16000, samples)
    val Some((f, frames)) = MediaCodecs.decodeWavPcm16(bytes)
    assert(frames == 0)
    assert(math.abs(f(0) - amp / 32768.0) < 1e-6, "rms of a square wave = amplitude")
    assert(math.abs(f(1) - 0.0) < 1e-6, "symmetric wave has zero mean")
    val zc = (1 until samples.length)
      .count(i => (samples(i - 1) >= 0) != (samples(i) >= 0))
    assert(math.abs(f(2) - zc.toDouble / (samples.length - 1)) < 1e-6)
    assert(math.abs(f(3) - amp / 32768.0) < 1e-6)
    assert(math.abs(f(12) - 0.16) < 1e-6)   // 16000 / 1e5
  }

  test("PNG decodes bit-identically to the BMP of the same pixels") {
    // PNG is lossless, and both paths normalize to sRGB before the
    // shared feature math — so features must be exactly equal
    val (w, h) = (7, 5)
    def px(x: Int, y: Int) = ((x * 37) % 256, (y * 61) % 256, (x + y) * 11 % 256)
    val Some((fBmp, _)) = MediaCodecs.decodeBmp24(MediaCodecs.encodeBmp24(w, h, px))
    val Some((fPng, frames)) = MediaCodecs.decodeImageIO(
      MediaCodecs.encodeImage("png", w, h, px))
    assert(frames == 1)
    assert(fPng.toSeq == fBmp.toSeq, "PNG and BMP of identical pixels must match")
  }

  test("JPEG and GIF decode through ImageIO with stats near the source pixels") {
    val (w, h) = (16, 12)
    def px(x: Int, y: Int) = (200, 100, 50)   // solid color survives DCT well
    for (fmt <- Seq("jpg", "gif")) {
      val bytes = MediaCodecs.encodeImage(fmt, w, h, px)
      val row = MediaRow(1L, "image", bytes, w, h, 0, 0L)
      val got = MediaCodecs.BuiltinCodec.decode(row)
      assert(got.decode_ok, s"$fmt must decode")
      assert(got.n_frames == 1)
      // lossy/palette round trip: means within a few intensity levels
      assert(math.abs(got.feature(0) - 200 / 255.0) < 0.03, s"$fmt meanR")
      assert(math.abs(got.feature(1) - 100 / 255.0) < 0.03, s"$fmt meanG")
      assert(math.abs(got.feature(2) - 50 / 255.0) < 0.03, s"$fmt meanB")
      assert(math.abs(got.feature(13) - w.toDouble / (w + h)) < 1e-6)
    }
  }

  test("truncated JPEG fails closed") {
    val bytes = MediaCodecs.encodeImage("jpg", 8, 8, (_, _) => (9, 9, 9))
    val got = MediaCodecs.BuiltinCodec.decode(
      MediaRow(7L, "image", bytes.take(bytes.length / 2), 8, 8, 0, 0L))
    // ImageIO either throws or returns a null/partial frame; the codec
    // must never surface decode_ok with garbage stats from an overread
    if (got.decode_ok) assert(got.feature.forall(f => f >= 0f && f <= 1f))
    else assert(got.feature.forall(_ == 0.0f))
  }

  test("builtin codec sniffs magic bytes and fails closed on garbage") {
    val bmpRow = MediaRow(1L, "image",
      MediaCodecs.encodeBmp24(4, 4, (_, _) => (10, 20, 30)), 4, 4, 0, 0L)
    val wavRow = MediaRow(2L, "audio",
      MediaCodecs.encodePcm16Wav(8000, Array.tabulate[Short](100)(i => (i * 300).toShort)),
      0, 0, 8000, 0L)
    val junkRow = MediaRow(3L, "video", Array.tabulate[Byte](64)(_.toByte), 0, 0, 0, 0L)
    val truncated = MediaRow(4L, "image",
      MediaCodecs.encodeBmp24(8, 8, (_, _) => (1, 2, 3)).take(60), 8, 8, 0, 0L)
    val got = Seq(bmpRow, wavRow, junkRow, truncated)
      .map(MediaCodecs.BuiltinCodec.decode)
    assert(got(0).decode_ok && got(0).n_frames == 1)
    assert(got(1).decode_ok && got(1).n_frames == 0)
    assert(!got(2).decode_ok && got(2).feature.forall(_ == 0.0f))
    assert(!got(3).decode_ok, "truncated pixel array must fail, not overread")
  }

  test("real-bytes corpus flows through the distributed extractFeatures pipeline") {
    // mixed BMP/PNG/JPEG/WAV payloads across partitions — the same
    // mapPartitions plumbing q33 gates, now decoding real wire formats
    val rows = (0 until 60).map { i =>
      (i % 4) match {
        case 0 =>
          MediaRow(i.toLong, "image",
            MediaCodecs.encodeBmp24(8 + i % 5, 6, (x, y) => (x * 20 % 256, y * 30 % 256, i % 256)),
            8 + i % 5, 6, 0, 0L)
        case 1 =>
          MediaRow(i.toLong, "image",
            MediaCodecs.encodeImage("png", 8 + i % 5, 6,
              (x, y) => (x * 20 % 256, y * 30 % 256, i % 256)),
            8 + i % 5, 6, 0, 0L)
        case 2 =>
          MediaRow(i.toLong, "image",
            MediaCodecs.encodeImage("jpg", 8 + i % 5, 6,
              (x, y) => (x * 20 % 256, y * 30 % 256, i % 256)),
            8 + i % 5, 6, 0, 0L)
        case _ =>
          MediaRow(i.toLong, "audio",
            MediaCodecs.encodePcm16Wav(16000,
              Array.tabulate[Short](400 + i)(j => ((j * (i + 3) * 137) % 20000 - 10000).toShort)),
            0, 0, 16000, 0L)
      }
    }
    val ds = spark.createDataset(rows).repartition(4)
    val feats = Multimodal.extractFeatures(ds, MediaCodecs.BuiltinCodec)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.size == 60)
    assert(feats.values.forall(_.decode_ok), "every real payload must decode")
    assert(feats.values.filter(_.kind == "image").forall(_.n_frames == 1))
    assert(feats.values.filter(_.kind == "audio").forall(_.n_frames == 0))
    // distributed result == local decode (codec is a pure function)
    val local = rows.map(MediaCodecs.BuiltinCodec.decode).map(f => f.media_id -> f).toMap
    assert(feats.forall { case (id, f) =>
      f.feature.sameElements(local(id).feature) })
  }

  test("multi-channel WAV averages channels; odd-length chunks stay aligned") {
    // hand-build a stereo WAV: L = 1000, R = 3000 -> mono mean 2000
    val nFrames = 50
    val mono = MediaCodecs.encodePcm16Wav(8000, Array.fill[Short](nFrames)(2000))
    val stereoData = new Array[Byte](nFrames * 4)
    for (i <- 0 until nFrames) {
      def w16(o: Int, v: Int): Unit = {
        stereoData(o) = (v & 0xff).toByte
        stereoData(o + 1) = ((v >> 8) & 0xff).toByte
      }
      w16(i * 4, 1000); w16(i * 4 + 2, 3000)
    }
    val header = mono.take(44)
    def patch16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte }
    def patch32(b: Array[Byte], o: Int, v: Int): Unit = {
      patch16(b, o, v & 0xffff); patch16(b, o + 2, v >>> 16) }
    val stereo = header ++ stereoData
    patch16(stereo, 22, 2)                       // channels
    patch32(stereo, 28, 8000 * 4)                // byte rate
    patch16(stereo, 32, 4)                       // block align
    patch32(stereo, 40, stereoData.length)       // data size
    patch32(stereo, 4, 36 + stereoData.length)   // riff size
    val Some((f, _)) = MediaCodecs.decodeWavPcm16(stereo)
    assert(math.abs(f(1) - 2000.0 / 32768.0) < 1e-6, s"mean ${f(1)}")
  }

  // deterministic 36×32 gradient-ish test pattern with structure in
  // every grid cell (no flat ties for the dHash comparisons)
  private def pattern(shift: Int)(x: Int, y: Int): (Int, Int, Int) = {
    val v = ((x * 13 + y * 29 + (x * y) % 37) % 200) + shift
    (v, (v + 20) min 255, v / 2)
  }

  test("dHash64: deterministic, format-independent, brightness-invariant") {
    val bmp = MediaCodecs.encodeBmp24(36, 32, pattern(0))
    val h1 = MediaCodecs.dHash64(bmp)
    assert(h1.isDefined)
    assert(MediaCodecs.dHash64(bmp) == h1, "must be deterministic")
    // same pixels through PNG (lossless) → identical hash
    val png = MediaCodecs.encodeImage("png", 36, 32, pattern(0))
    assert(MediaCodecs.dHash64(png) == h1, "PNG of same pixels differs")
    // clip-free uniform brightness shift preserves every comparison
    val bright = MediaCodecs.encodeBmp24(36, 32, pattern(30))
    assert(MediaCodecs.dHash64(bright) == h1, "brightness shift moved bits")
  }

  test("dHash64: local edits move few bits, inversion moves many") {
    val base = MediaCodecs.dHash64(
      MediaCodecs.encodeBmp24(36, 32, pattern(0))).get
    // corrupt one grid cell's worth of pixels
    val edited = MediaCodecs.encodeBmp24(36, 32, (x, y) =>
      if (x < 4 && y < 4) (255, 255, 255) else pattern(0)(x, y))
    val he = MediaCodecs.dHash64(edited).get
    val hd = java.lang.Long.bitCount(base ^ he)
    assert(hd >= 1 && hd <= 6, s"local edit moved $hd bits")
    // inversion flips (almost) every comparison
    val inv = MediaCodecs.encodeBmp24(36, 32, (x, y) => {
      val (r, g, b) = pattern(0)(x, y); (255 - r, 255 - g, 255 - b) })
    val hi = MediaCodecs.dHash64(inv).get
    assert(java.lang.Long.bitCount(base ^ hi) >= 32,
      "inversion must land far away")
  }

  test("dHash64: fails closed on garbage and sub-grid images") {
    assert(MediaCodecs.dHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.dHash64(
      MediaCodecs.encodeBmp24(8, 8, (_, _) => (1, 2, 3))).isEmpty)
  }

  test("streaming media ingest: dHash probe-and-admit across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def bmp(seed: Int, edit: Boolean) = MediaCodecs.encodeBmp24(36, 32,
      (x, y) => {
        val v = ((x * (11 + seed) + y * (17 + 3 * seed) + x * y % 7) % 200)
        if (edit && x < 4 && y < 4) (255, 255, 255) else (v, v, v)
      })
    val src = tmpDir("media-stream") + "/feed"
    // batch 1: A(1) B(2) C(3) + near-dup of A (101); batch 2 appended
    // after (file-source picks files in modification order — the
    // EventStreamSpec cross-batch pattern)
    Seq(MediaRow(1L, "image", bmp(1, false), 36, 32, 0, 0),
      MediaRow(2L, "image", bmp(2, false), 36, 32, 0, 0),
      MediaRow(3L, "image", bmp(3, false), 36, 32, 0, 0),
      MediaRow(101L, "image", bmp(1, true), 36, 32, 0, 0))
      .toDF().coalesce(1).write.parquet(src)
    // batch 2: PNG re-encode of B (202 — exact hash dup ACROSS
    // batches), new D (4), near-dup of C (103)
    val bPixels = (x: Int, y: Int) => {
      val v = ((x * 13 + y * 23 + x * y % 7) % 200); (v, v, v) }
    Seq(MediaRow(202L, "image",
        MediaCodecs.encodeImage("png", 36, 32, bPixels), 36, 32, 0, 0),
      MediaRow(4L, "image", bmp(4, false), 36, 32, 0, 0),
      MediaRow(103L, "image", bmp(3, true), 36, 32, 0, 0))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    // fixture sanity: bmp(2) pixels == bPixels, so the PNG re-encode
    // must hash-match its BMP source
    assert(MediaCodecs.dHash64(bmp(2, false)) ==
      MediaCodecs.dHash64(MediaCodecs.encodeImage("png", 36, 32, bPixels)),
      "fixture: PNG re-encode must hash-match its BMP source")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    graft.streaming.EventStream.runStreamForeachBatch(spark, src,
      (df, _) => {
        val rows = df.as[MediaRow]
        val hashes = Multimodal.perceptualHashes(rows)
          .where(col("decode_ok"))
        val index = admitted.toSeq.toDF("media_id", "dhash")
          .withColumn("decode_ok", lit(true))
        val all = index.unionByName(hashes)
        val dupPairs = Multimodal.imageNearDupPairs(all, maxHamming = 7)
        // a batch row is a duplicate if it pairs with the index or
        // with a smaller batch id (min-id survivor rule)
        val dupIds = dupPairs.select(col("id_b").as("dup"))
          .as[Long].collect().toSet
        hashes.as[(Long, Long, Boolean)].collect().foreach {
          case (id, h, _) => if (!dupIds.contains(id)) admitted += ((id, h))
        }
      },
      options = Map("maxFilesPerTrigger" -> "1"))
    val ids = admitted.map(_._1).toSet
    assert(ids.contains(1L) && ids.contains(2L) && ids.contains(3L) &&
      ids.contains(4L), s"originals must admit: $ids")
    assert(!ids.contains(101L), "batch-1 near-dup must drop within batch")
    assert(!ids.contains(202L),
      "batch-2 exact re-encode must drop AGAINST THE INDEX (cross-batch)")
    assert(!ids.contains(103L), "batch-2 near-dup must drop vs the index")
  }

  test("perceptualHashes + imageNearDupPairs: banded join finds the planted near-dups") {
    import spark.implicits._
    // 30 distinct base images; ids 100+i are 1-cell edits of i (near
    // dups); id 999 is undecodable
    def img(seed: Int, edit: Boolean)(x: Int, y: Int): (Int, Int, Int) = {
      val v = ((x * (7 + seed) + y * (11 + 2 * seed) + x * y % (5 + seed))
        % 200)
      if (edit && x < 4 && y < 4) (255, 255, 255) else (v, v, v)
    }
    val rows = (0 until 30).flatMap { i =>
      Seq(
        MediaRow(i.toLong, "image",
          MediaCodecs.encodeBmp24(36, 32, img(i, edit = false)),
          36, 32, 0, 0L),
        MediaRow(100L + i, "image",
          MediaCodecs.encodeBmp24(36, 32, img(i, edit = true)),
          36, 32, 0, 0L))
    } :+ MediaRow(999L, "image", Array[Byte](9, 9, 9), 0, 0, 0, 0L)
    val hashes = Multimodal.perceptualHashes(
      spark.createDataset(rows).repartition(5))
    val hm = hashes.as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!hm(999L)._2 && hm(999L)._1 == 0L, "garbage must quarantine")
    assert(hm(0L)._2 && hm(0L)._1 != hm(1L)._1,
      "distinct images must hash apart")
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 7)
      .as[(Long, Long, Int)].collect()
    assert(pairs.length == pairs.map(p => (p._1, p._2)).distinct.length,
      "each pair exactly once")
    val found = pairs.map(p => (p._1, p._2)).toSet
    val planted = (0 until 30).map(i => (i.toLong, 100L + i)).toSet
    // every planted edit is within 7 bits of its base (local edit
    // bound pinned above) → banding must recover ALL of them
    val withinThreshold = planted.filter { case (a, b) =>
      java.lang.Long.bitCount(hm(a)._1 ^ hm(b)._1) <= 7 }
    assert(withinThreshold.subsetOf(found),
      s"missed planted pairs: ${withinThreshold.diff(found)}")
    assert(withinThreshold.size >= 25,
      s"fixture too weak: only ${withinThreshold.size} planted pairs " +
        "within threshold")
    // verify step: nothing past the threshold survives
    assert(pairs.forall(_._3 <= 7))
  }

  // deterministic "melody": 650 samples = 10 per fingerprint frame,
  // energy stepping with the frame index by a key-dependent pattern
  private def clip(key: Int, bend: Int => Int = identity): Array[Short] =
    Array.tabulate[Short](650) { i =>
      val frame = i / 10
      val amp = bend(100 + 311 * ((frame * (key + 3) + key) % 37))
      (if (i % 2 == 0) amp else -amp).toShort
    }

  test("audioFingerprint64: deterministic, gain-invariant, " +
       "local edits move few bits") {
    val w1 = MediaCodecs.encodePcm16Wav(8000, clip(1))
    val h1 = MediaCodecs.audioFingerprint64(w1)
    assert(h1.isDefined)
    assert(MediaCodecs.audioFingerprint64(w1) == h1, "not deterministic")
    // uniform gain (×2, clip-free) preserves every energy comparison
    val louder = MediaCodecs.encodePcm16Wav(8000,
      clip(1).map(s => (s * 2).toShort))
    assert(MediaCodecs.audioFingerprint64(louder) == h1,
      "gain change moved bits")
    // resampled rate metadata is irrelevant (contour is time-relative)
    assert(MediaCodecs.audioFingerprint64(
      MediaCodecs.encodePcm16Wav(16000, clip(1))) == h1)
    // a burst confined to ~2 frames moves only the straddling bits
    val edited = clip(1).zipWithIndex.map { case (s, i) =>
      if (i >= 300 && i < 320) 20000.toShort else s }
    val he = MediaCodecs.audioFingerprint64(
      MediaCodecs.encodePcm16Wav(8000, edited)).get
    val moved = java.lang.Long.bitCount(h1.get ^ he)
    assert(moved >= 1 && moved <= 6, s"local burst moved $moved bits")
    // a different melody lands far away
    val other = MediaCodecs.audioFingerprint64(
      MediaCodecs.encodePcm16Wav(8000, clip(9))).get
    assert(java.lang.Long.bitCount(h1.get ^ other) >= 16,
      "different clips must not collide")
  }

  test("audioFingerprint64: fails closed on garbage and short clips") {
    assert(MediaCodecs.audioFingerprint64(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.audioFingerprint64(
      MediaCodecs.encodePcm16Wav(8000, Array.fill[Short](64)(100))).isEmpty)
  }

  test("audio near-dup pairs ride the hash-agnostic pigeonhole banding") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      MediaRow(1L, "audio", MediaCodecs.encodePcm16Wav(8000, clip(1)),
        0, 0, 8000, 0L),
      MediaRow(2L, "audio", MediaCodecs.encodePcm16Wav(8000,
        clip(1).zipWithIndex.map { case (s, i) =>
          if (i >= 300 && i < 320) 20000.toShort else s }), 0, 0, 8000, 0L),
      MediaRow(3L, "audio", MediaCodecs.encodePcm16Wav(8000, clip(9)),
        0, 0, 8000, 0L),
      MediaRow(4L, "audio", Array[Byte](9, 9, 9), 0, 0, 0, 0L))
    val hashes = Multimodal.audioFingerprints(rows.toDS())
    assert(hashes.where(!col("decode_ok")).select("media_id")
      .as[Long].collect().toSeq == Seq(4L))
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 7,
        hashCol = "afp")
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"got ${pairs.toSeq}")
  }
}
