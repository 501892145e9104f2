package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/** Real decoders for the codec-FREE media containers — PCM WAV (RIFF),
  * uncompressed 24-bit BMP, and the MJPEG-in-AVI RIFF walk — in pure
  * JVM byte arithmetic, so the multimodal layer genuinely decodes where
  * no codec library is needed; PNG/JPEG/GIF ride javax.imageio (so
  * MJPEG AVI frames decode end-to-end). Formats with no JDK codec
  * (H.264, compressed audio) still fall back to the declared stub
  * ([[Multimodal.decodeStub]]); an honest stub beats a fake decoder.
  *
  * Everything here is a pure function of the byte array — executor-safe
  * inside `mapPartitions`, deterministic on any partitioning.
  */
object MediaCodecs {

  // ------------------------------------------------------------- WAV
  /** PCM WAV metadata: fmt-chunk fields + frame count. */
  case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Int)

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Decode 16-bit PCM WAV: walk RIFF chunks (skipping unknown ones —
    * LIST/INFO etc.), read `fmt ` and `data`. Returns meta + interleaved
    * samples, or None when not PCM-16 or structurally invalid. */
  def decodeWav(bytes: Array[Byte]): Option[(WavMeta, Array[Short])] = {
    if (!isWav(bytes)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bps)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = buf.getShort(pos + 8).toInt
          if (audioFormat != 1) return None // PCM only
          fmt = Some((buf.getShort(pos + 10).toInt, buf.getInt(pos + 12),
            buf.getShort(pos + 22).toInt))
        case "data" => data = Some((pos + 8, size))
        case _ => () // skip LIST, fact, cue, …
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    for {
      (channels, rate, bps) <- fmt
      (off, len) <- data
      if bps == 16 && channels >= 1
    } yield {
      val n = len / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = buf.getShort(off + i * 2); i += 1 }
      (WavMeta(rate, channels, bps, n / channels), samples)
    }
  }

  /** Encode interleaved 16-bit PCM samples as a canonical 44-byte-header
    * WAV — the synthesis side for tests/demos and the re-encode side of
    * audio transforms. */
  def encodeWav(samples: Array[Short], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(channels >= 1, "channels must be >= 1")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  // G.711 μ-law (ITU-T G.711, the telephony companding codec; the
  // formulas below are the public reference algorithm, e.g. Sun's
  // historical ulaw.c): 16-bit PCM ↔ 8-bit logarithmic code. This is
  // the repo's REAL compressed-audio path — lossy, 2:1, with a
  // per-segment quantization step of 2^(exp+3).
  private val MuBias = 132 // 0x84
  private val MuClip = 32635

  /** μ-law encode one 16-bit sample to its 8-bit code (as Int 0..255).
    * Pure integer arithmetic — executor-safe, engine-portable. */
  def muLawEncodeSample(v: Int): Int = {
    val sign = if (v < 0) 0x80 else 0
    var t = math.min(math.abs(v), MuClip) + MuBias
    var exp = 7
    var probe = 0x4000
    while (exp > 0 && (t & probe) == 0) { exp -= 1; probe >>= 1 }
    val man = (t >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | man) & 0xff
  }

  /** μ-law decode an 8-bit code back to its 16-bit sample. */
  def muLawDecodeSample(b: Int): Int = {
    val u = ~b & 0xff
    val exp = (u >> 4) & 7
    val man = u & 0x0f
    val mag = (((man << 3) + MuBias) << exp) - MuBias
    if ((u & 0x80) != 0) -mag else mag
  }

  /** Encode a PCM buffer to μ-law bytes (1 byte per sample). */
  def encodeMuLaw(samples: Array[Short]): Array[Byte] =
    samples.map(s => muLawEncodeSample(s.toInt).toByte)

  /** Decode μ-law bytes back to PCM samples. */
  def decodeMuLaw(bytes: Array[Byte]): Array[Short] =
    bytes.map(b => muLawDecodeSample(b.toInt & 0xff).toShort)

  /** 8-dim audio features: RMS energy of 8 equal time segments,
    * normalized to [0, 1] (full-scale square wave → 1.0). */
  def wavFeatures(meta: WavMeta, samples: Array[Short]): Array[Float] = {
    val out = new Array[Float](8)
    if (samples.isEmpty) return out
    val seg = math.max(1, samples.length / 8)
    var s = 0
    while (s < 8) {
      val from = s * seg
      val to = if (s == 7) samples.length else math.min((s + 1) * seg,
        samples.length)
      if (from < to) {
        var acc = 0.0
        var i = from
        while (i < to) { val v = samples(i).toDouble; acc += v * v; i += 1 }
        out(s) = (math.sqrt(acc / (to - from)) / 32768.0).toFloat
      }
      s += 1
    }
    out
  }

  // ------------------------------------------------------------- BMP
  /** Top-down row-major RGB image (3 bytes per pixel). */
  case class BmpImage(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3, "rgb length mismatch")
  }

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  /** Decode uncompressed 24-bit BMP (BITMAPINFOHEADER; bottom-up rows,
    * or top-down via negative height; 4-byte row padding). */
  def decodeBmp(bytes: Array[Byte]): Option[BmpImage] = {
    if (!isBmp(bytes)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    if (bpp != 24 || compression != 0 || width <= 0 || height == 0)
      return None
    val rowSize = (width * 3 + 3) / 4 * 4
    if (dataOffset.toLong + rowSize.toLong * height > bytes.length)
      return None
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val src = dataOffset + srcRow * rowSize
      var x = 0
      while (x < width) {
        val d = (y * width + x) * 3
        // BMP stores BGR
        rgb(d) = bytes(src + x * 3 + 2)
        rgb(d + 1) = bytes(src + x * 3 + 1)
        rgb(d + 2) = bytes(src + x * 3)
        x += 1
      }
      y += 1
    }
    Some(BmpImage(width, height, rgb))
  }

  /** Encode as canonical bottom-up 24-bit BMP. */
  def encodeBmp(img: BmpImage): Array[Byte] = {
    val rowSize = (img.width * 3 + 3) / 4 * 4
    val dataLen = rowSize * img.height
    val buf = ByteBuffer.allocate(54 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(img.width).putInt(img.height)
      .putShort(1).putShort(24).putInt(0).putInt(dataLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        buf.put(img.rgb(s + 2)).put(img.rgb(s + 1)).put(img.rgb(s))
        x += 1
      }
      var pad = rowSize - img.width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Nearest-neighbor resize on REAL pixels. */
  def resizeBmp(img: BmpImage, targetW: Int, targetH: Int): BmpImage = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val rgb = new Array[Byte](targetW * targetH * 3)
    var y = 0
    while (y < targetH) {
      val sy = (y.toLong * img.height / targetH).toInt
      var x = 0
      while (x < targetW) {
        val sx = (x.toLong * img.width / targetW).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * targetW + x) * 3
        rgb(d) = img.rgb(s); rgb(d + 1) = img.rgb(s + 1)
        rgb(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    BmpImage(targetW, targetH, rgb)
  }

  // ------------------------------------------------- PNG / JPEG / GIF
  // Compressed still images decode through the JDK's own ImageIO
  // (javax.imageio — public API shipped with every JRE, no new
  // dependency), so width/height/pixel stats are REAL for the formats
  // a web-scale corpus actually contains. Only video/compressed audio
  // remain stubbed (the JDK has no such codecs).

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8'

  /** True when [[decodeImage]] has a real JDK decoder for the payload. */
  def isImageIoDecodable(b: Array[Byte]): Boolean =
    isPng(b) || isJpeg(b) || isGif(b)

  /** Decoded-pixel ceiling (64M px ≈ 8192×8192). A few-hundred-byte
    * PNG/GIF can DECLARE arbitrary dimensions (decompression bomb); in
    * an untrusted web-scale corpus that would mean multi-GB allocations
    * per row on executors. The guard reads w×h from the HEADER (no pixel
    * decode) and rejects before any allocation; it also keeps
    * `w*h*3` safely inside Int, so the RGB buffer can't overflow. */
  val MaxImagePixels: Long = 64L * 1024 * 1024

  /** Decode PNG/JPEG/GIF via `javax.imageio.ImageIO` into the same
    * top-down RGB [[BmpImage]] the pure-JVM BMP path produces, so every
    * downstream feature/resize works identically on compressed input.
    * Pure function of the bytes, executor-safe in `mapPartitions`
    * (ImageIO is headless-safe; no AWT rendering involved). Returns
    * None on truncated/corrupt/bomb payloads rather than failing the
    * task: ImageIO readers throw RuntimeExceptions (not just
    * IOException) on malformed input — ArrayIndexOutOfBounds on bad
    * GIF tables, CMMException on bad ICC profiles — so the net is
    * `NonFatal`, and dimensions are validated from the header before
    * any pixel buffer exists ([[MaxImagePixels]]). */
  def decodeImage(bytes: Array[Byte]): Option[BmpImage] = {
    if (!isImageIoDecodable(bytes)) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) None
          else {
            val img = reader.read(0)
            // bulk ARGB grab: one color-model conversion for the whole
            // raster instead of a per-pixel getRGB call
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val rgb = new Array[Byte](w * h * 3)
            var i = 0
            val n = w * h
            while (i < n) {
              val p = px(i)
              rgb(i * 3) = ((p >> 16) & 0xff).toByte
              rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
              rgb(i * 3 + 2) = (p & 0xff).toByte
              i += 1
            }
            Some(BmpImage(w, h, rgb))
          }
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def toBufferedImage(img: BmpImage): java.awt.image.BufferedImage = {
    val buf = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val n = img.width * img.height
    val px = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = i * 3
      px(i) = ((img.rgb(s) & 0xff) << 16) |
        ((img.rgb(s + 1) & 0xff) << 8) | (img.rgb(s + 2) & 0xff)
      i += 1
    }
    buf.setRGB(0, 0, img.width, img.height, px, 0, img.width)
    buf
  }

  private def encodeVia(img: BmpImage, format: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // write() returns false when no registered writer handled the
    // format — silently returning an empty payload would propagate a
    // zero-byte "image" downstream, so fail the call instead
    val handled = javax.imageio.ImageIO.write(toBufferedImage(img),
      format, out)
    if (!handled)
      throw new IllegalStateException(s"no ImageIO writer for '$format'")
    out.toByteArray
  }

  /** Encode as PNG (lossless) via ImageIO — the re-encode side of image
    * transforms and the synthesis side for tests. */
  def encodePng(img: BmpImage): Array[Byte] = encodeVia(img, "png")

  /** Encode as JPEG (lossy — for round-trip tolerance tests). */
  def encodeJpeg(img: BmpImage): Array[Byte] = encodeVia(img, "jpg")

  /** 8-dim image features: mean R/G/B, luminance of the 4 quadrants,
    * and aspect ratio — all in [0, 1]-ish ranges, deterministic. */
  def bmpFeatures(img: BmpImage): Array[Float] = {
    val out = new Array[Float](8)
    val n = img.width * img.height
    if (n == 0) return out
    var (r, g, b) = (0L, 0L, 0L)
    val quad = new Array[Long](4)
    val quadN = new Array[Long](4)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val (pr, pg, pb) = (img.rgb(s) & 0xff, img.rgb(s + 1) & 0xff,
          img.rgb(s + 2) & 0xff)
        r += pr; g += pg; b += pb
        val q = (if (y * 2 >= img.height) 2 else 0) +
          (if (x * 2 >= img.width) 1 else 0)
        // integer luma (ITU-R 601 weights scaled by 1000)
        quad(q) += 299L * pr + 587L * pg + 114L * pb
        quadN(q) += 1
        x += 1
      }
      y += 1
    }
    out(0) = r.toFloat / n / 255f
    out(1) = g.toFloat / n / 255f
    out(2) = b.toFloat / n / 255f
    var q = 0
    while (q < 4) {
      if (quadN(q) > 0) out(3 + q) = (quad(q).toDouble / quadN(q) / 255000.0)
        .toFloat
      q += 1
    }
    out(7) = img.width.toFloat / math.max(1, img.height)
    out
  }

  // ------------------------------------------------------------- AVI
  /** AVI container metadata (from the `avih` main header). */
  case class AviMeta(width: Int, height: Int, usecPerFrame: Int,
      frameCount: Int)

  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Encode an MJPEG-in-AVI container: minimal RIFF layout (hdrl with
    * avih + one vids/MJPG stream, movi with one `00dc` chunk per JPEG
    * frame) in pure byte arithmetic — the video-side counterpart of
    * [[encodeWav]]. `frames` are already-encoded JPEG payloads (use
    * [[encodeJpeg]]); all frames are declared at (width, height). */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
      usecPerFrame: Int): Array[Byte] = {
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length % 2
      val buf = ByteBuffer.allocate(8 + data.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.put(fourcc(id)).putInt(data.length).put(data)
      if (pad == 1) buf.put(0.toByte)
      buf.array()
    }
    def list(subtype: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(subtype) ++ payload)
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usecPerFrame).putInt(0).putInt(0).putInt(0)
      b.putInt(frames.length).putInt(0).putInt(1).putInt(0)
      b.putInt(width).putInt(height)
      b.array() // 4 reserved dwords stay zero
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourcc("vids")).put(fourcc("MJPG"))
      b.putInt(0).putShort(0).putShort(0).putInt(0)
      b.putInt(usecPerFrame).putInt(1000000) // scale/rate = frame rate
      b.putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
      b.putShort(0).putShort(0)
      b.putShort(width.toShort).putShort(height.toShort)
      b.array()
    }
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height).putShort(1)
      b.putShort(24).put(fourcc("MJPG")).putInt(width * height * 3)
      b.array() // remaining BITMAPINFOHEADER fields zero
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(fourcc("RIFF")).putInt(body.length).put(body)
    out.array()
  }

  /** Walk the RIFF tree of an AVI and return the main-header metadata
    * plus every video frame payload (`##dc`/`##db` chunks inside LIST
    * movi, in file order — for MJPEG each payload is a complete JPEG,
    * decodable by [[decodeImage]]). Unknown chunks are skipped, chunk
    * word-alignment is honored, and any structural violation returns
    * None — same discipline as [[decodeWav]]/[[decodeBmp]]. */
  def decodeAviFrames(bytes: Array[Byte])
      : Option[(AviMeta, Seq[Array[Byte]])] = {
    if (!isAvi(bytes)) return None
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val riffLen = buf.getInt(4)
      val end = math.min(bytes.length.toLong, 8L + riffLen).toInt
      var meta: Option[AviMeta] = None
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def id(off: Int): String =
        new String(bytes, off, 4, "US-ASCII")
      // walk one chunk run [from, until); recurse into LIST hdrl/movi
      def walk(from: Int, until: Int): Unit = {
        var off = from
        while (off + 8 <= until) {
          val cid = id(off)
          val len = buf.getInt(off + 4)
          if (len < 0 || off + 8 + len > until) return // truncated
          if (cid == "LIST" && len >= 4) {
            val sub = id(off + 8)
            if (sub == "hdrl" || sub == "movi" || sub == "strl")
              walk(off + 12, off + 8 + len)
          } else if (cid == "avih" && len >= 40) {
            meta = Some(AviMeta(
              width = buf.getInt(off + 8 + 32),
              height = buf.getInt(off + 8 + 36),
              usecPerFrame = buf.getInt(off + 8),
              frameCount = buf.getInt(off + 8 + 16)))
          } else if (cid.length == 4 &&
              cid(0).isDigit && cid(1).isDigit &&
              (cid.endsWith("dc") || cid.endsWith("db"))) {
            frames += java.util.Arrays.copyOfRange(bytes, off + 8,
              off + 8 + len)
          }
          off += 8 + len + (len % 2) // chunks are word-aligned
        }
      }
      walk(12, end)
      meta.map(m => (m, frames.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
