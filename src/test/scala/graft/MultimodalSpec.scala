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
