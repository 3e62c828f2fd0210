package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.Multimodal

/** The multimodal decode pipeline: byte-histogram decoder correctness and
  * the pluggable mapPartitions featurize shape. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("byteHistogram: 16 bins, sums to ~1, matches naive recount, empty -> zeros") {
    val payload = Array.tabulate(1000)(i => ((i * 31 + 7) % 256).toByte)
    val feats = Multimodal.byteHistogram(payload)
    assert(feats.length == 16)
    // exact recount per high nibble, with the same 4-dp floor fixing
    val naive = (0 until 16).map { bin =>
      val c = payload.count(b => ((b & 0xff) >>> 4) == bin)
      math.floor(c / 1000.0 * 10000.0 + 0.5) / 10000.0
    }
    assert(feats.toSeq == naive)
    assert(math.abs(feats.sum - 1.0) < 0.01) // rounding slack only
    assert(Multimodal.byteHistogram(Array.empty[Byte]).toSeq == Seq.fill(16)(0.0))
  }

  /** Minimal PCM-16 mono WAV: canonical 44-byte header + LE samples. */
  private def wavBytes(samples: Seq[Short], rate: Int = 8000): Array[Byte] = {
    val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes); le32(36L + data.size); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16); le16(1); le16(1) // PCM, mono
    le32(rate); le32(rate * 2L); le16(2); le16(16)
    out.write("data".getBytes); le32(data.size); data.foreach(b => out.write(b))
    out.toByteArray
  }

  /** Minimal 24-bpp bottom-up BMP with the given row-major pixels (r,g,b). */
  private def bmpBytes(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val out = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until h).foreach { yFromBottom =>
      val y = h - 1 - yFromBottom
      (0 until w).foreach { x =>
        val (r, g, b) = px(x, y)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      (w * 3 until rowBytes).foreach(_ => out.put(0.toByte))
    }
    out.array()
  }

  test("WAV decoder: real RIFF/PCM-16 parse, features match hand computation") {
    // square wave +8192/-8192: rms = 0.25, zcr = 1/2, peak = 0.25
    val sq = (0 until 400).map(i => if (i % 2 == 0) 8192 else -8192).map(_.toShort)
    val f = Multimodal.decodeWavPcm16(wavBytes(sq, rate = 8000)).get
    assert(f(0) == 400.0 && f(1) == 8000.0 && f(2) == 1.0)
    assert(math.abs(f(3) - 0.25) < 1e-9)  // rms
    assert(math.abs(f(4) - 399.0 / 400) < 1e-9) // zcr: flips every sample
    assert(math.abs(f(6) - 0.25) < 1e-9)  // peak
    assert(math.abs(f(7) - 400.0 / 8000) < 1e-12) // duration
    // non-WAV payloads are rejected, not misparsed
    assert(Multimodal.decodeWavPcm16("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeWavPcm16(Array.empty[Byte]).isEmpty)
  }

  test("BMP decoder: real 24-bpp parse incl. row padding and bottom-up order") {
    // 3x2 image: left column pure red, rest black — w=3 forces row padding
    val f = Multimodal.decodeBmp24(bmpBytes(3, 2,
      (x, _) => if (x == 0) (255, 0, 0) else (0, 0, 0))).get
    assert(f(0) == 3.0 && f(1) == 2.0)
    assert(math.abs(f(2) - 255.0 / 3) < 1e-9) // mean R: 2 of 6 pixels
    assert(f(3) == 0.0 && f(4) == 0.0)        // no green/blue anywhere
    val lum = 0.299 * 255
    assert(math.abs(f(5) - lum / 3) < 1e-9)   // mean luminance
    // edge-ness: per row |lum(x)-lum(x-1)| = [lum, 0] → mean = lum/2
    assert(math.abs(f(7) - lum / 2) < 1e-9)
    assert(Multimodal.decodeBmp24("BMnope".getBytes).isEmpty)
  }

  test("featurizeAuto: per-row kind dispatch — real decoders, stub fallback") {
    val s0 = spark
    import s0.implicits._
    val wav = wavBytes((0 until 100).map(_ => 1000.toShort))
    val bmp = bmpBytes(2, 2, (_, _) => (10, 20, 30))
    val ds = Seq(
      Multimodal.MediaRecord(1L, "audio/wav", wav),
      Multimodal.MediaRecord(2L, "image/bmp", bmp),
      Multimodal.MediaRecord(3L, "video/mp4", Array[Byte](1, 2, 3))).toDS()
    val got = Multimodal.featurizeAuto(ds, dim = 8).collect().sortBy(_.doc_id)
    assert(got.map(_.kind).toSeq == Seq("audio/wav", "image/bmp", "video/mp4"))
    assert(got(0).features.toSeq == Multimodal.decodeWavPcm16(wav).get.toSeq)
    assert(got(1).features.toSeq == Multimodal.decodeBmp24(bmp).get.toSeq)
    assert(got(2).features.toSeq ==
      Multimodal.decodeStub(Array[Byte](1, 2, 3), 8).toSeq)
    assert(got.map(_.n_bytes).toSeq ==
      Seq(wav.length.toLong, bmp.length.toLong, 3L))
  }

  test("decoder SPI: a registered codec overrides the stub and unplugs cleanly") {
    val s0 = spark
    import s0.implicits._
    val payload = Array[Byte](9, 9, 9)
    val rec = Seq(Multimodal.MediaRecord(7L, "audio/mp3", payload)).toDS()
    // Codec-less kind without a registration: deterministic stub.
    assert(Multimodal.featurizeAuto(rec, dim = 4).collect().head.features.toSeq
      == Multimodal.decodeStub(payload, 4).toSeq)
    // Register a fake mp3 codec: the SPI tier wins; short vectors pad to dim.
    Multimodal.registerDecoder("audio/mp3",
      p => Some(Array(p.length.toDouble, 42.0)))
    try {
      assert(Multimodal.featurizeAuto(rec, dim = 4).collect().head.features.toSeq
        == Seq(3.0, 42.0, 0.0, 0.0))
      // A codec may decline (None): falls through to the stub tier.
      Multimodal.registerDecoder("audio/mp3", _ => None)
      assert(Multimodal.featurizeAuto(rec, dim = 4).collect().head.features.toSeq
        == Multimodal.decodeStub(payload, 4).toSeq)
      // User codecs take priority over BUILT-IN decoders too.
      Multimodal.registerDecoder("image/bmp", _ => Some(Array(-1.0)))
      try assert(Multimodal.decodeAuto("image/bmp")(
        bmpBytes(2, 2, (_, _) => (10, 20, 30)), 2).toSeq == Seq(-1.0, 0.0))
      finally Multimodal.unregisterDecoder("image/bmp")
    } finally Multimodal.unregisterDecoder("audio/mp3")
    // Unregistered again: back to the stub.
    assert(Multimodal.featurizeAuto(rec, dim = 4).collect().head.features.toSeq
      == Multimodal.decodeStub(payload, 4).toSeq)
  }

  test("JDK codecs: PNG/JPEG decode real features; BMP agrees both ways") {
    import java.awt.image.BufferedImage
    // Deterministic 4×3 image with a known pixel function.
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 40 + 10) % 256, (y * 70 + 20) % 256, (x * y * 30 + 5) % 256)
    val img = new BufferedImage(4, 3, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    def encode(fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    // PNG is lossless: ImageIO features equal the hand-rolled BMP parser's
    // features over the SAME pixels — two independent decoders, one truth.
    val pngFeat = Multimodal.decodeImageIO(encode("png")).get
    val bmpFeat = Multimodal.decodeBmp24(bmpBytes(4, 3, px)).get
    assert(pngFeat.zip(bmpFeat).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      s"png=${pngFeat.toSeq} bmp=${bmpFeat.toSeq}")
    // The JDK's own BMP reader agrees with the hand-rolled parser too.
    val bmpViaImageIO = Multimodal.decodeImageIO(bmpBytes(4, 3, px)).get
    assert(bmpViaImageIO.toSeq == bmpFeat.toSeq)
    // JPEG is lossy: dimensions exact, means close.
    val jpgFeat = Multimodal.decodeImageIO(encode("jpg")).get
    assert(jpgFeat(0) == 4.0 && jpgFeat(1) == 3.0)
    assert(math.abs(jpgFeat(5) - bmpFeat(5)) < 16.0, // mean luminance
      s"jpeg luminance drifted: ${jpgFeat(5)} vs ${bmpFeat(5)}")
    // Garbage payload → None (falls back to the stub in decodeAuto).
    assert(Multimodal.decodeImageIO(Array[Byte](1, 2, 3)).isEmpty)
    // decodeAuto routes the compressed kinds to ImageIO.
    assert(Multimodal.decodeAuto("image/png")(encode("png"), 8).toSeq ==
      java.util.Arrays.copyOf(pngFeat, 8).toSeq)
  }

  test("JDK audio converters: u-law WAV decodes to the PCM feature shape") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // Synthesize a PCM-16 sine, convert to u-law, write as WAV bytes.
    val rate = 8000f
    val pcmSamples = (0 until 800).map(i =>
      (math.sin(i * 2 * math.Pi * 440 / rate) * 12000).toShort)
    val pcmBytes = pcmSamples.flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, 1, 2, rate, false)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      rate, 8, 1, 1, rate, false)
    val ulawStream = AudioSystem.getAudioInputStream(ulawFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(pcmBytes),
        pcmFmt, pcmSamples.length))
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawStream, AudioFileFormat.Type.WAVE, out)
    val ulawWav = out.toByteArray
    // The hand-rolled PCM parser refuses it; the JDK converter serves it.
    assert(Multimodal.decodeWavPcm16(ulawWav).isEmpty)
    val feat = Multimodal.decodeAudioJdk(ulawWav).get
    assert(feat(0) == 800.0 && feat(1) == 8000.0 && feat(2) == 1.0,
      feat.toSeq.toString)
    // RMS of a 12000/32768-amplitude sine ≈ 0.259; u-law is lossy but close.
    assert(math.abs(feat(3) - 12000.0 / 32768 / math.sqrt(2)) < 0.01,
      s"rms=${feat(3)}")
    // decodeAuto reaches it through the audio/wav fallback.
    assert(Multimodal.decodeAuto("audio/wav")(ulawWav, 8).toSeq ==
      java.util.Arrays.copyOf(feat, 8).toSeq)
  }

  test("featurize pipeline: pluggable decoder, one row per record, n_bytes carried") {
    val s0 = spark
    import s0.implicits._
    val ds = Seq(
      Multimodal.MediaRecord(1L, "text", "hello world".getBytes("UTF-8")),
      Multimodal.MediaRecord(2L, "text", Array.empty[Byte])).toDS()
    val hist = Multimodal.featurize(ds, dim = 16,
      (p, _) => Multimodal.byteHistogram(p)).collect().sortBy(_.doc_id)
    assert(hist.length == 2)
    assert(hist(0).n_bytes == 11L && hist(1).n_bytes == 0L)
    assert(hist(0).features.toSeq ==
      Multimodal.byteHistogram("hello world".getBytes("UTF-8")).toSeq)
    // the stub decoder rides the same pipeline and is deterministic
    val stub1 = Multimodal.featurize(ds, dim = 8).collect().sortBy(_.doc_id)
    val stub2 = Multimodal.featurize(ds, dim = 8).collect().sortBy(_.doc_id)
    assert(stub1.map(_.features.toSeq).toSeq == stub2.map(_.features.toSeq).toSeq)
    assert(stub1.forall(_.features.length == 8))
  }
}
