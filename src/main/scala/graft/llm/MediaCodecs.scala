package graft.llm

import graft.llm.Multimodal.{MediaFeatures, MediaRow}

/** Real pure-JVM media codecs — closes the "codec honestly stubbed" gap
  * for the formats a JVM can decode without native libraries:
  *
  *   - BMP, 24-bit uncompressed (BITMAPINFOHEADER): header parse +
  *     pixel stats. The wire format is fully public (Windows BMP spec).
  *   - WAV, PCM 16-bit (RIFF/fmt/data): chunk walk + sample stats.
  *   - JPEG / PNG / GIF via `javax.imageio.ImageIO` — the readers ship
  *     in the standard JDK (java.desktop module), pure Java, zero new
  *     dependencies; decoded pixels feed the same feature contract as
  *     the BMP path (spec-pinned: a PNG of the same pixels produces
  *     bit-identical features, PNG being lossless).
  *
  * MP3 and video stay out of scope — no pure-JVM codec exists, so such
  * a payload (or any unparseable payload) returns
  * `decode_ok = false` with zeroed features rather than pretending.
  * [[Multimodal.StubCodec]] remains the default for pinned fixtures;
  * select this codec via `Multimodal.extractFeatures(ds, BuiltinCodec)`.
  *
  * Feature contract (FeatureDim = 16, like the stub):
  *   image: [meanR, meanG, meanB, meanLuma, varLuma,
  *           8-bin luma histogram (fractions), aspect = w/(w+h), 0, 0]
  *   audio: [rms, mean, zeroCrossRate, maxAbs, 8 segment RMS values,
  *           sampleRate/1e5, nSamples/1e6] — amplitudes in [-1, 1].
  * All stats are plain float math over the decoded payload —
  * deterministic, spec-assertable against an independent computation.
  */
object MediaCodecs {

  val FeatureDim: Int = Multimodal.StubCodec.FeatureDim

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** The real-codec implementation of the [[Multimodal.MediaCodec]]
    * contract: sniffs the payload magic, never trusts `kind`. */
  object BuiltinCodec extends Multimodal.MediaCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val p = row.payload
      val decoded =
        if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') decodeBmp24(p)
        else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' &&
                 p(2) == 'F' && p(3) == 'F' && p(8) == 'W' &&
                 p(9) == 'A' && p(10) == 'V' && p(11) == 'E') decodeWavPcm16(p)
        else if (isJpeg(p) || isPng(p) || isGif(p)) decodeImageIO(p)
        else None
      decoded match {
        case Some((feats, frames)) =>
          MediaFeatures(row.media_id, row.kind, feats, frames, decode_ok = true)
        case None =>
          MediaFeatures(row.media_id, row.kind,
            new Array[Float](FeatureDim), 0, decode_ok = false)
      }
    }
  }

  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
      (p(2) & 0xff) == 0xff
  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
      p(3) == 'G'
  private def isGif(p: Array[Byte]): Boolean =
    p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8'

  /** JPEG/PNG/GIF via the JDK's ImageIO readers → the same feature
    * contract as [[decodeBmp24]] (meanRGB, luma stats, 8-bin histogram,
    * aspect); None when ImageIO cannot parse the payload. Alpha is
    * ignored (getRGB pre-composites into sRGB). */
  private[graft] def decodeImageIO(b: Array[Byte]): Option[(Array[Float], Int)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val width = img.getWidth; val height = img.getHeight
    if (width <= 0 || height <= 0) return None
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var sl = 0.0; var sl2 = 0.0
    val hist = new Array[Long](8)
    // one getRGB row at a time: bounded buffer, any underlying raster
    // layout (banded, indexed, grayscale) normalized to packed sRGB
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      img.getRGB(0, y, width, 1, row, 0, width)
      var x = 0
      while (x < width) {
        val px = row(x)
        val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val bl = px & 0xff
        sr += r; sg += g; sb += bl
        val luma = 0.299 * r + 0.587 * g + 0.114 * bl
        sl += luma; sl2 += luma * luma
        hist(math.min(7, (luma / 32.0).toInt)) += 1
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    val meanL = sl / n
    val varL = math.max(0.0, sl2 / n - meanL * meanL)
    val f = new Array[Float](FeatureDim)
    f(0) = (sr / n / 255.0).toFloat
    f(1) = (sg / n / 255.0).toFloat
    f(2) = (sb / n / 255.0).toFloat
    f(3) = (meanL / 255.0).toFloat
    f(4) = (varL / (255.0 * 255.0)).toFloat
    var i = 0
    while (i < 8) { f(5 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
    f(13) = (width.toDouble / (width + height)).toFloat
    Some((f, 1))
  }

  /** 24-bit uncompressed BMP → (features, n_frames = 1); None when the
    * header or pixel array is malformed/truncated. */
  private[graft] def decodeBmp24(b: Array[Byte]): Option[(Array[Float], Int)] = {
    if (b.length < 54) return None
    val dataOffset = i32(b, 10)
    val headerSize = i32(b, 14)
    val width = i32(b, 18)
    val heightRaw = i32(b, 22)
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (headerSize < 40 || bpp != 24 || compression != 0) return None
    if (width <= 0 || heightRaw == 0) return None
    val height = math.abs(heightRaw)
    val bottomUp = heightRaw > 0
    val stride = ((width * 3 + 3) / 4) * 4
    val need = dataOffset.toLong + stride.toLong * height
    if (dataOffset < 54 || need > b.length) return None
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var sl = 0.0; var sl2 = 0.0
    val hist = new Array[Long](8)
    var y = 0
    while (y < height) {
      val rowStart = dataOffset +
        stride * (if (bottomUp) height - 1 - y else y)
      var x = 0
      while (x < width) {
        val o = rowStart + x * 3
        val bl = b(o) & 0xff; val g = b(o + 1) & 0xff; val r = b(o + 2) & 0xff
        sr += r; sg += g; sb += bl
        val luma = 0.299 * r + 0.587 * g + 0.114 * bl
        sl += luma; sl2 += luma * luma
        hist(math.min(7, (luma / 32.0).toInt)) += 1
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    val meanL = sl / n
    val varL = math.max(0.0, sl2 / n - meanL * meanL)
    val f = new Array[Float](FeatureDim)
    f(0) = (sr / n / 255.0).toFloat
    f(1) = (sg / n / 255.0).toFloat
    f(2) = (sb / n / 255.0).toFloat
    f(3) = (meanL / 255.0).toFloat
    f(4) = (varL / (255.0 * 255.0)).toFloat
    var i = 0
    while (i < 8) { f(5 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
    f(13) = (width.toDouble / (width + height)).toFloat
    Some((f, 1))
  }

  /** PCM 16-bit WAV (mono or interleaved multi-channel, averaged) →
    * (features, n_frames = 0); None on malformed chunks or a
    * non-PCM-16 encoding. */
  private[graft] def decodeWavPcm16(b: Array[Byte]): Option[(Array[Float], Int)] = {
    var fmtOk = false
    var channels = 0; var sampleRate = 0
    var dataOff = -1; var dataLen = 0
    var off = 12
    while (off + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(b.slice(off, off + 4), "US-ASCII")
      val len = i32(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      id match {
        case "fmt " if len >= 16 =>
          val audioFormat = u16(b, off + 8)
          channels = u16(b, off + 10)
          sampleRate = i32(b, off + 12)
          val bits = u16(b, off + 22)
          fmtOk = audioFormat == 1 && bits == 16 && channels >= 1
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1)   // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || channels == 0) return None
    val nFrames = dataLen / (2 * channels)
    if (nFrames == 0) return None
    val mono = new Array[Double](nFrames)
    var i = 0
    while (i < nFrames) {
      var c = 0; var acc = 0.0
      while (c < channels) {
        val o = dataOff + (i * channels + c) * 2
        acc += u16(b, o).toShort / 32768.0
        c += 1
      }
      mono(i) = acc / channels
      i += 1
    }
    var sum = 0.0; var sum2 = 0.0; var maxAbs = 0.0; var zc = 0L
    i = 0
    while (i < nFrames) {
      val x = mono(i)
      sum += x; sum2 += x * x
      if (math.abs(x) > maxAbs) maxAbs = math.abs(x)
      if (i > 0 && (mono(i - 1) >= 0) != (x >= 0)) zc += 1
      i += 1
    }
    val f = new Array[Float](FeatureDim)
    f(0) = math.sqrt(sum2 / nFrames).toFloat
    f(1) = (sum / nFrames).toFloat
    f(2) = (zc.toDouble / math.max(1, nFrames - 1)).toFloat
    f(3) = maxAbs.toFloat
    var s = 0
    while (s < 8) {   // 8 equal time segments, RMS each
      val lo = (s.toLong * nFrames / 8).toInt
      val hi = ((s + 1).toLong * nFrames / 8).toInt
      var e = 0.0; var j = lo
      while (j < hi) { e += mono(j) * mono(j); j += 1 }
      f(4 + s) = (if (hi > lo) math.sqrt(e / (hi - lo)) else 0.0).toFloat
      s += 1
    }
    f(12) = (sampleRate / 1e5).toFloat
    f(13) = (nFrames / 1e6).toFloat
    Some((f, 0))
  }

  /** Integer luminance raster via ImageIO (reads BMP/PNG/GIF/JPEG with
    * the stock JDK plugins): per-pixel luma in MILLI units
    * (299·r + 587·g + 114·b — the BT.601 weights ×1000, pure integer
    * so downstream comparisons never touch a float). None when ImageIO
    * cannot parse the payload. */
  private[graft] def lumaPixels(b: Array[Byte])
      : Option[(Array[Int], Int, Int)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val width = img.getWidth; val height = img.getHeight
    if (width <= 0 || height <= 0) return None
    val out = new Array[Int](width * height)
    val row = new Array[Int](width)
    var y = 0
    while (y < height) {
      img.getRGB(0, y, width, 1, row, 0, width)
      var x = 0
      while (x < width) {
        val px = row(x)
        out(y * width + x) = 299 * ((px >> 16) & 0xff) +
          587 * ((px >> 8) & 0xff) + 114 * (px & 0xff)
        x += 1
      }
      y += 1
    }
    Some((out, width, height))
  }

  /** 64-bit DIFFERENCE HASH (dHash) of an image payload — the
    * perceptual near-duplicate key: luma downsampled onto a 9×8 grid
    * (exact integer box sums over floor-boundary cells), bit (y,x) set
    * iff cell (x,y) is brighter than its right neighbor. Compares
    * AVERAGES by cross-multiplication (sumA·nB > sumB·nA) so unequal
    * cell sizes never need a division — fully integer, bit-identical
    * everywhere. Uniform brightness shifts that don't clip preserve
    * every comparison, resizes/re-encodes move only the few bits whose
    * cells straddle a change — Hamming distance over these hashes is
    * the image analog of SimHash over text. None for undecodable or
    * sub-9×8 payloads (too small to carry the grid) and for images
    * past 10⁸ pixels (the cross-multiplication sum·count product is
    * exact in a long up to there — fail closed, never overflow). */
  def dHash64(b: Array[Byte]): Option[Long] =
    lumaPixels(b).flatMap { case (luma, w, h) =>
      if (w < 9 || h < 8 || w.toLong * h > 100000000L) None
      else {
        val sums = Array.ofDim[Long](8, 9)
        val cnts = Array.ofDim[Long](8, 9)
        var gy = 0
        while (gy < 8) {
          val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
          var gx = 0
          while (gx < 9) {
            val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
            var s = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { s += luma(y * w + x); x += 1 }
              y += 1
            }
            sums(gy)(gx) = s
            cnts(gy)(gx) = (y1 - y0).toLong * (x1 - x0)
            gx += 1
          }
          gy += 1
        }
        var hash = 0L
        var i = 0
        while (i < 64) {
          val gy = i / 8; val gx = i % 8
          // avg(gx) > avg(gx+1) without dividing
          if (sums(gy)(gx) * cnts(gy)(gx + 1) >
              sums(gy)(gx + 1) * cnts(gy)(gx))
            hash |= (1L << i)
          i += 1
        }
        Some(hash)
      }
    }

  /** 64-bit AUDIO energy-contour fingerprint — the audio sibling of
    * [[dHash64]]: the decoded PCM stream splits into 65 equal frames
    * (per-frame energy = Σ|sample|, exact long — ≤ 2¹⁵·frameLen, no
    * overflow below ~2⁴⁷ samples), and bit i is set iff frame i+1 is
    * MORE energetic than frame i (cross-frame comparison by
    * cross-multiplication of sums × lengths, so a ragged final frame
    * never needs a division). The rhythm/dynamics envelope, not the
    * waveform: uniform gain changes that don't clip preserve every
    * comparison (amplitude-invariant), re-encodes move only bits whose
    * frames straddle a change — Hamming distance over these is the
    * audio analog of image dHash, and the same pigeonhole banding
    * finds near-duplicates. None for undecodable payloads or clips
    * shorter than 65 samples (too short to carry the contour). */
  def audioFingerprint64(b: Array[Byte]): Option[Long] = {
    // own chunk walk (decodeWavPcm16 surfaces float FEATURES; the
    // fingerprint needs raw integer sample magnitudes). Multi-channel
    // frames contribute Σ_channels |s| — an integer, and a uniform
    // factor the sign-of-delta comparison cancels anyway.
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return None
    var fmtOk = false
    var channels = 0
    var dataOff = -1; var dataLen = 0
    var off = 12
    while (off + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(b.slice(off, off + 4), "US-ASCII")
      val len = i32(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmtOk = u16(b, off + 8) == 1 && u16(b, off + 22) == 16 &&
            u16(b, off + 10) >= 1
          channels = u16(b, off + 10)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1)
    }
    if (!fmtOk || dataOff < 0 || channels == 0) return None
    val n = dataLen / (2 * channels)
    if (n < 65) return None
    val sums = new Array[Long](65)
    val lens = new Array[Long](65)
    var f = 0
    while (f < 65) {
      val i0 = (f.toLong * n / 65).toInt
      val i1 = ((f + 1).toLong * n / 65).toInt
      var s = 0L
      var i = i0
      while (i < i1) {
        var c = 0
        while (c < channels) {
          s += math.abs(u16(b, dataOff + (i * channels + c) * 2)
            .toShort.toLong)
          c += 1
        }
        i += 1
      }
      sums(f) = s; lens(f) = (i1 - i0).toLong
      f += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      // avg(i+1) > avg(i) without dividing
      if (sums(i + 1) * lens(i) > sums(i) * lens(i + 1))
        hash |= (1L << i)
      i += 1
    }
    Some(hash)
  }

  // ---------------------------------------------------------------
  // Encoders — fixture builders for specs/demos (and the proof that
  // the decoders read the real wire format, not a private one).
  // ---------------------------------------------------------------

  /** Minimal 24-bit bottom-up BMP with the standard 54-byte header. */
  def encodeBmp24(width: Int, height: Int,
                  pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, "bmp dims must be positive")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def w32(o: Int, v: Int): Unit = { w16(o, v & 0xffff); w16(o + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    w32(2, 54 + dataSize); w32(10, 54)
    w32(14, 40); w32(18, width); w32(22, height)
    w16(26, 1); w16(28, 24); w32(30, 0); w32(34, dataSize)
    var y = 0
    while (y < height) {
      val rowStart = 54 + stride * (height - 1 - y)   // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        val o = rowStart + x * 3
        out(o) = (b & 0xff).toByte
        out(o + 1) = (g & 0xff).toByte
        out(o + 2) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode the pixel function through ImageIO into `format` ("png",
    * "jpg", "gif") — fixture builder proving [[decodeImageIO]] reads the
    * real interchange formats, not a private byte layout. */
  def encodeImage(format: String, width: Int, height: Int,
                  pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, "image dims must be positive")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) {
      val (r, g, b) = pixel(x, y)
      img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out),
      s"no ImageIO writer for format $format")
    out.toByteArray
  }

  /** Minimal mono PCM-16 WAV (RIFF + fmt + data). */
  def encodePcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "sample rate must be positive")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def w32(o: Int, v: Int): Unit = { w16(o, v & 0xffff); w16(o + 2, v >>> 16) }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) => out(o + i) = c }
    tag(0, "RIFF"); w32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, 1)
    w32(24, sampleRate); w32(28, sampleRate * 2); w16(32, 2); w16(34, 16)
    tag(36, "data"); w32(40, dataLen)
    samples.zipWithIndex.foreach { case (s, i) => w16(44 + i * 2, s & 0xffff) }
    out
  }
}
