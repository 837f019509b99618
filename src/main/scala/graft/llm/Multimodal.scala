package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media as opaque `binary` columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample as per-partition
  * batch transforms.
  *
  * The Spark-side shape is real and tested — schema, partitioning,
  * batch-iterator transform signature (`mapPartitions`, the JVM analog of
  * `mapInPandas` batch processing). Codecs are pluggable behind
  * [[MediaCodec]]: [[MediaCodecs.BuiltinCodec]] decodes real BMP 24-bit
  * and WAV PCM-16 payloads pure-JVM; [[StubCodec]] remains the
  * deterministic fake for formats that need native libs (JPEG/MP3/
  * video — absent in this container) and for pinned fixtures.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, height: Int,      // images/video
      sample_rate: Int,             // audio
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long, kind: String,
      feature: Array[Float],        // embedding-like feature vector
      n_frames: Int,
      decode_ok: Boolean)

  /** Codec contract: one media row in, one feature row out. Must be
    * serializable (implement as an `object`) — instances ship to
    * executors inside the mapPartitions closure. Real formats a JVM
    * can decode without native libs live in
    * [[MediaCodecs.BuiltinCodec]] (BMP 24-bit, WAV PCM-16, and
    * JPEG/PNG/GIF through the JDK's ImageIO readers). */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB decode: deterministic pseudo-features from the payload bytes —
    * `???`-grade placeholder for codecs that genuinely need native libs
    * (MP3/video only: JPEG/PNG/GIF decode pure-JVM through ImageIO in
    * [[MediaCodecs.BuiltinCodec]], alongside BMP and PCM WAV), but
    * shape-faithful: consumes bytes, emits a fixed-width float vector
    * per media item. Deterministic so tests can assert exact outputs. */
  object StubCodec extends MediaCodec {
    val FeatureDim = 16
    def decode(row: MediaRow): MediaFeatures = {
      var h = 0xcbf29ce484222325L
      row.payload.foreach { b => h = (h ^ (b & 0xffL)) * 0x100000001b3L }
      val feats = Array.tabulate(FeatureDim) { i =>
        val x = h * (i + 1) + row.media_id
        ((x % 1000L).toFloat) / 1000.0f
      }
      val frames = row.kind match {
        case "video" => math.max(1, (row.duration_ms / 40L).toInt) // 25 fps
        case "image" => 1
        case _       => 0
      }
      MediaFeatures(row.media_id, row.kind, feats, frames, decode_ok = true)
    }
  }

  /** Synthesize a deterministic media corpus for tests/bench (payload =
    * seeded bytes; in production this column comes from object storage). */
  def syntheticCorpus(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val payload = Array.tabulate[Byte](64)(j => ((i * 31 + j) % 127).toByte)
      MediaRow(i, kind, payload,
        width = 64 + (i % 8).toInt * 32, height = 64,
        sample_rate = if (kind == "audio") 16000 else 0,
        duration_ms = 1000L + (i % 10) * 200L)
    }
  }

  /** Batch decode/feature-extract: `mapPartitions` so a real codec can
    * amortize per-partition init (model load, ffmpeg process) across the
    * batch — the same contract `mapInPandas` gives Python. Partition
    * count controls decode parallelism; payloads never hit the driver.
    * Default codec is the stub (pinned fixtures); pass
    * [[MediaCodecs.BuiltinCodec]] for real BMP/WAV payloads. */
  def extractFeatures(media: Dataset[MediaRow],
                      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (codec/context); stub has none
      it.map(codec.decode)
    }
  }

  /** Frame-sampling plan for videos: one row per sampled frame index at
    * `everyMs` granularity — pure relational explode, runs at scan speed;
    * the actual frame fetch joins back through the codec. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))

  /** Resize plan: target geometry per image row (aspect-preserving fit);
    * the byte transform happens in the codec stage. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.filter(col("kind") === "image")
      .withColumn("scale",
        least(lit(maxSide) / col("width"), lit(maxSide) / col("height"),
              lit(1.0)))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))

  /** Perceptual hash per image row ([[MediaCodecs.dHash64]]):
    * (media_id, dhash, decode_ok) — the 64-bit near-duplicate key for
    * the image side of the corpus, computed where the payload lives
    * (mapPartitions over the media partitioning; payload bytes never
    * shuffle — only the 8-byte hash leaves the scan stage). Rows that
    * fail to decode surface decode_ok = false with dhash 0, the
    * quarantine-not-drop stance of the DataQuality suite. */
  def perceptualHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val h = MediaCodecs.dHash64(r.payload)
        (r.media_id, h.getOrElse(0L), h.isDefined)
      }
    }.toDF("media_id", "dhash", "decode_ok")
  }

  /** Image near-duplicate pairs within `maxHamming` bits over
    * [[perceptualHashes]] output — banded exactly like MinHash-LSH:
    * the 64-bit hash slices into maxHamming+1 bands, and by pigeonhole
    * any pair within the threshold agrees on at least one FULL band,
    * so candidates are a band-keyed equi-join (ids + hashes shuffle,
    * never payloads) verified by an exact `bit_count(xor)`. Never an
    * all-pairs comparison.
    *
    * Output: (id_a < id_b, hamming ≤ maxHamming).
    *
    * Skew note: a corpus full of EXACT duplicates (or flat images
    * hashing to the same value) concentrates one band key — run the
    * exact groupBy-on-dhash dedup first and feed one representative
    * per hash here, the hash-first discipline of Dedup.minhashLsh. */
  /** Audio fingerprints per row ([[MediaCodecs.audioFingerprint64]]):
    * (media_id, afp, decode_ok) — the energy-contour near-duplicate
    * key for the audio side, same shape and shuffle discipline as
    * [[perceptualHashes]] (8 bytes leave the scan, payloads never
    * shuffle). Near-duplicates: feed this straight into
    * [[imageNearDupPairs]] with `hashCol = "afp"` — the pigeonhole
    * banding is hash-agnostic. */
  def audioFingerprints(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val h = MediaCodecs.audioFingerprint64(r.payload)
        (r.media_id, h.getOrElse(0L), h.isDefined)
      }
    }.toDF("media_id", "afp", "decode_ok")
  }

  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int,
                        idCol: String = "media_id",
                        hashCol: String = "dhash"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming in [0, 15] (64-bit hash needs bands of >= 4 bits), " +
        s"got $maxHamming")
    val bands = maxHamming + 1
    val base = 64 / bands
    val h = hashes
      .where(if (hashes.columns.contains("decode_ok")) col("decode_ok")
             else lit(true))
      .select(col(idCol).cast("long").as("__id"),
        col(hashCol).cast("long").as("__h"))
    val bandCols = (0 until bands).map { i =>
      val lo = i * base
      val width = if (i == bands - 1) 64 - lo else base
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(i).as("b"),
        shiftrightunsigned(col("__h"), lo).bitwiseAND(lit(mask)).as("v"))
    }
    val probe = h.select(col("__id"), col("__h"),
        explode(array(bandCols: _*)).as("__band"))
      .select(col("__id"), col("__h"),
        col("__band.b").as("__b"), col("__band.v").as("__v"))
    val left = probe.select(col("__id").as("id_a"),
      col("__h").as("__ha"), col("__b"), col("__v"))
    val right = probe.select(col("__id").as("id_b"),
      col("__h").as("__hb"), col("__b"), col("__v"))
    left.join(right, Seq("__b", "__v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(__ha ^ __hb)").cast("int").as("hamming"))
      .distinct() // a close pair matches in several bands — emit once
      .where(col("hamming") <= maxHamming)
  }
}
