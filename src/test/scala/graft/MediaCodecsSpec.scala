package graft

import graft.pipeline.{MediaCodecs, Multimodal}
import graft.pipeline.MediaCodecs.{BmpImage, WavMeta}

/** Real-codec tests: WAV/BMP encode↔decode round-trips, chunk/padding
  * edge cases, pixel-exact resize, and the content-sniffing dispatch in
  * the multimodal pipeline. */
class MediaCodecsSpec extends SparkSpec {

  // ------------------------------------------------------------- WAV
  test("WAV round-trip: encode → decode recovers meta and samples") {
    val samples = Array.tabulate[Short](480)(i =>
      (math.sin(i * 0.1) * 20000).toShort)
    val bytes = MediaCodecs.encodeWav(samples, 16000, 1)
    val Some((meta, got)) = MediaCodecs.decodeWav(bytes): @unchecked
    assert(meta === WavMeta(16000, 1, 16, 480))
    assert(got === samples)
  }

  test("WAV stereo: frame count is per-channel") {
    val samples = Array.tabulate[Short](400)(_.toShort) // 200 frames x 2ch
    val Some((meta, _)) =
      MediaCodecs.decodeWav(MediaCodecs.encodeWav(samples, 44100, 2))
        : @unchecked
    assert(meta === WavMeta(44100, 2, 16, 200))
  }

  test("WAV decoder skips unknown chunks (LIST before data)") {
    val samples = Array[Short](100, -100, 200, -200)
    val canonical = MediaCodecs.encodeWav(samples, 8000, 1)
    // splice a LIST chunk (odd size → word-aligned skip) between fmt and
    // data: header(12) + fmt(8+16) = 36
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes, odd
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ listBody ++ Array[Byte](0) // pad byte
    val spliced = canonical.take(36) ++ list ++ canonical.drop(36)
    // fix the RIFF size field (total - 8)
    val buf = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(4, spliced.length - 8)
    val Some((meta, got)) = MediaCodecs.decodeWav(spliced): @unchecked
    assert(meta.sampleRate === 8000)
    assert(got === samples)
  }

  test("WAV features: constant full-scale signal → RMS 1.0 per segment") {
    val samples = Array.fill[Short](800)(Short.MinValue) // |x| = 32768
    val Some((meta, got)) =
      MediaCodecs.decodeWav(MediaCodecs.encodeWav(samples, 8000, 1))
        : @unchecked
    val f = MediaCodecs.wavFeatures(meta, got)
    assert(f.length === 8)
    f.foreach(v => assert(math.abs(v - 1.0f) < 1e-6f))
  }

  test("non-PCM and truncated WAV decode to None, not garbage") {
    val good = MediaCodecs.encodeWav(Array[Short](1, 2, 3, 4), 8000, 1)
    // flip audioFormat to 3 (IEEE float)
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(MediaCodecs.decodeWav(nonPcm) === None)
    assert(MediaCodecs.decodeWav(good.dropRight(4)) === None)
  }

  // ------------------------------------------------------------- BMP
  /** case-class equality on Array is by reference — compare content */
  private def assertSameImage(got: Option[BmpImage],
      want: BmpImage): Unit = {
    assert(got.isDefined)
    assert(got.get.width === want.width)
    assert(got.get.height === want.height)
    assert(got.get.rgb.toSeq === want.rgb.toSeq)
  }

  private def gradient(w: Int, h: Int): BmpImage = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      rgb(d) = (x * 40 % 256).toByte
      rgb(d + 1) = (y * 40 % 256).toByte
      rgb(d + 2) = ((x + y) * 20 % 256).toByte
    }
    BmpImage(w, h, rgb)
  }

  test("BMP round-trip incl. row padding (width not a multiple of 4)") {
    for ((w, h) <- Seq((3, 2), (5, 3), (4, 4), (1, 1))) {
      val img = gradient(w, h)
      assertSameImage(MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img)),
        img)
    }
  }

  test("BMP top-down (negative height) decodes to the same pixels") {
    val img = gradient(3, 2)
    val bytes = MediaCodecs.encodeBmp(img)
    // rewrite height to -2 and reorder rows top-down
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2)
    val rowSize = (3 * 3 + 3) / 4 * 4
    val row0 = bytes.slice(54, 54 + rowSize)
    val row1 = bytes.slice(54 + rowSize, 54 + 2 * rowSize)
    // encoded bottom-up: row0 holds y=1; top-down wants y=0 first
    System.arraycopy(row1, 0, bytes, 54, rowSize)
    System.arraycopy(row0, 0, bytes, 54 + rowSize, rowSize)
    assertSameImage(MediaCodecs.decodeBmp(bytes), img)
  }

  test("nearest-neighbor resize picks exact source pixels") {
    // 4x4 image where pixel (x,y) has R = 16*y + x
    val rgb = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) rgb((y * 4 + x) * 3) =
      (16 * y + x).toByte
    val small = MediaCodecs.resizeBmp(BmpImage(4, 4, rgb), 2, 2)
    // (0,0)→src(0,0)=0, (1,0)→src(2,0)=2, (0,1)→src(0,2)=32, (1,1)→src(2,2)=34
    assert(small.rgb(0) === 0)
    assert(small.rgb(3) === 2)
    assert(small.rgb(6) === 32)
    assert(small.rgb(9) === 34)
    // upscale back keeps only those values
    val big = MediaCodecs.resizeBmp(small, 4, 4)
    assert(big.rgb.grouped(3).map(_(0)).toSet === Set(0.toByte, 2.toByte,
      32.toByte, 34.toByte))
  }

  test("BMP features: solid color → exact channel means") {
    val rgb = Array.fill[Byte](8 * 4 * 3)(0)
    for (i <- 0 until 8 * 4) { rgb(i * 3) = -1 } // R=255, G=0, B=0
    val f = MediaCodecs.bmpFeatures(BmpImage(8, 4, rgb))
    assert(math.abs(f(0) - 1.0f) < 1e-6f)
    assert(f(1) === 0.0f && f(2) === 0.0f)
    // quadrant luma = 0.299 exactly for solid red
    (3 to 6).foreach(q => assert(math.abs(f(q) - 0.299f) < 1e-6f))
    assert(f(7) === 2.0f) // aspect 8/4
  }

  test("property: random WAV and BMP payloads round-trip exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.Gen.Parameters
    import org.scalacheck.rng.Seed
    var seed = Seed(7L)
    def draw[A](g: Gen[A]): A = {
      val v = g.pureApply(Parameters.default, seed); seed = seed.next; v
    }
    (1 to 30).foreach { i =>
      // WAV: random sample payload, rate, channels (payload length a
      // multiple of channel count so frames divide evenly)
      val channels = draw(Gen.choose(1, 4))
      val frames = draw(Gen.choose(0, 300))
      val samples = Array.fill[Short](frames * channels)(
        draw(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
          .toShort)
      val rate = draw(Gen.oneOf(8000, 16000, 44100))
      val Some((meta, got)) =
        MediaCodecs.decodeWav(MediaCodecs.encodeWav(samples, rate,
          channels)): @unchecked
      assert(meta === WavMeta(rate, channels, 16, frames), s"wav $i")
      assert(got.toSeq === samples.toSeq, s"wav $i")
      // BMP: random dims incl. every padding remainder, random pixels
      val w = draw(Gen.choose(1, 9))
      val h = draw(Gen.choose(1, 9))
      val rgb = Array.fill[Byte](w * h * 3)(
        draw(Gen.choose(-128, 127)).toByte)
      val img = BmpImage(w, h, rgb)
      assertSameImage(MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img)),
        img)
      // same-size nearest-neighbor resize is the identity
      val same = MediaCodecs.resizeBmp(img, w, h)
      assert(same.rgb.toSeq === rgb.toSeq, s"bmp resize-id $i")
    }
  }

  // ------------------------------------------- pipeline dispatch
  test("decodeFeatures sniffs WAV/BMP and falls back to the stub") {
    val wav = MediaCodecs.encodeWav(Array.fill[Short](160)(16384), 8000, 1)
    val wavF = Multimodal.decodeFeatures(wav)
    assert(math.abs(wavF(0) - 0.5f) < 1e-3f) // RMS of constant half-scale
    val bmp = MediaCodecs.encodeBmp(gradient(4, 4))
    assert(Multimodal.decodeFeatures(bmp) ===
      MediaCodecs.bmpFeatures(gradient(4, 4)))
    val junk = Array.tabulate[Byte](100)(_.toByte)
    assert(Multimodal.decodeFeatures(junk) === Multimodal.decodeStub(junk))
  }

  test("extractFeatures pipeline: real media decodes, junk stubs") {
    import spark.implicits._
    val wav = MediaCodecs.encodeWav(Array.fill[Short](160)(16384), 8000, 1)
    val bmp = MediaCodecs.encodeBmp(gradient(4, 4))
    val junk = Array.tabulate[Byte](64)(_.toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav, 0, 0, 8000),
      Multimodal.MediaRow(2L, "image", bmp, 4, 4, 0),
      Multimodal.MediaRow(3L, "video", junk, 0, 0, 0)).toDS()
    val got = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features).toMap
    assert(math.abs(got(1L)(0) - 0.5f) < 1e-3f)
    assert(got(2L) === MediaCodecs.bmpFeatures(gradient(4, 4)))
    assert(got(3L) === Multimodal.decodeStub(junk))
  }

  test("resize routes BMP through real pixel resize, junk through stub") {
    import spark.implicits._
    val bmp = MediaCodecs.encodeBmp(gradient(4, 4))
    val junk = Array.tabulate[Byte](96)(_.toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", bmp, 4, 4, 0),
      Multimodal.MediaRow(2L, "image", junk, 4, 4, 0)).toDS()
    val out = Multimodal.resizeStub(media, 2, 2).collect()
      .map(r => r.media_id -> r).toMap
    // BMP output is a valid 2x2 BMP with the nearest-neighbor pixels
    assertSameImage(MediaCodecs.decodeBmp(out(1L).bytes),
      MediaCodecs.resizeBmp(gradient(4, 4), 2, 2))
    // junk output shrank by the pixel ratio (stub path)
    assert(out(2L).bytes.length === 96 * (2 * 2) / (4 * 4))
  }
}
