package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch
  * shape — is real, and so are the decoders for every format the JVM
  * itself ships codecs for: PCM-16 WAV ([[decodeWavPcm16]]) and 24-bpp
  * BMP ([[decodeBmp24]]) hand-rolled, PNG/JPEG/GIF through the JDK's
  * ImageIO ([[decodeImageIO]]), u-law/a-law WAV / AIFF / AU through the
  * JDK's sound converters ([[decodeAudioJdk]]) — dispatched per record
  * kind by [[decodeAuto]]. Only formats with NO JDK codec (MP3/MP4/AAC/
  * WebP …) fall back to the deterministic [[decodeStub]]; a production
  * deployment swaps those entries for codec-backed decoders without
  * touching the pipeline shape. The byte-histogram
  * featurizer ([[byteHistogram]]) is the oracle-checkable path.
  */
object Multimodal {

  /** One media record: payload + metadata travelling together. */
  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: fixed-width vector + provenance. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                           features: Array[Double])

  /** STUB decoder: a real implementation would decode the image/audio payload
    * and extract model features. This deterministic fake derives `dim`
    * pseudo-features by hashing the payload, preserving the exact signature
    * and batch shape a real codec would have. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Double] = {
    var h = 0x9E3779B97F4A7C15L
    payload.foreach { b => h = (h ^ (b & 0xffL)) * 0x100000001B3L }
    Array.tabulate(dim) { i =>
      val mixed = {
        var z = h + i * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z ^ (z >>> 27)
      }
      (mixed.toDouble / Long.MaxValue.toDouble)
    }
  }

  /** Deterministic, oracle-checkable featurizer: a 16-bin histogram of the
    * payload's byte values (bin = high nibble), normalized to fractions and
    * fixed to 4 dp with the engine-portable `floor(x*1e4 + 0.5)/1e4` (Spark
    * `round` HALF_UP ≠ DuckDB binary rounding on .5 boundaries; floor is
    * bit-identical in both). DuckDB reproduces it from `hex(blob)` — byte
    * i's high nibble is hex char 2i+1 — so unlike [[decodeStub]] this
    * feature path hash-matches an exact SQL oracle. Empty payload → all
    * zeros. */
  def byteHistogram(payload: Array[Byte]): Array[Double] = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) >>> 4) += 1
      i += 1
    }
    if (payload.isEmpty) new Array[Double](16)
    else {
      val n = payload.length.toDouble
      counts.map(c => math.floor(c / n * 10000.0 + 0.5) / 10000.0)
    }
  }

  /** Per-partition featurization: the decoder runs once per record inside a
    * partition iterator (a real codec would amortize per-batch model setup
    * here — that is exactly what this shape gives it). Narrow, no shuffle.
    * Default decoder is the documented stub; [[byteHistogram]] plugs into
    * the same pipeline as a fully oracle-checkable decoder. */
  def featurize(ds: Dataset[MediaRecord], dim: Int,
                decoder: (Array[Byte], Int) => Array[Double] = decodeStub)
      : Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      // per-partition "codec init" would go here
      it.map { r =>
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong,
          decoder(r.payload, dim))
      }
    }
  }

  /** REAL audio decode, no libraries: RIFF/WAVE PCM-16 mono/stereo parse
    * (header walk to the `fmt ` and `data` chunks, little-endian samples)
    * → fixed-width acoustic features: [n_samples, sample_rate, channels,
    * rms, zero-crossing rate, mean |amplitude|, peak |amplitude|, duration
    * seconds]. Non-PCM encodings fall through to [[decodeAudioJdk]]'s JDK
    * converters. Returns None unless the payload is a well-formed PCM-16
    * WAV. */
  def decodeWavPcm16(payload: Array[Byte]): Option[Array[Double]] = {
    def u16(i: Int) = ((payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8))
    def u32(i: Int): Long = (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
      ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
    def tag(i: Int) = new String(payload, i, 4, "US-ASCII")
    if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // chunk walk: chunks are (4-byte tag, 4-byte size, payload), word-aligned
    var off = 12
    var fmtOff = -1; var dataOff = -1; var dataLen = 0L
    while (off + 8 <= payload.length && (fmtOff < 0 || dataOff < 0)) {
      val t = tag(off); val sz = u32(off + 4)
      if (t == "fmt ") fmtOff = off + 8
      else if (t == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (fmtOff < 0 || dataOff < 0) return None
    val audioFormat = u16(fmtOff)
    val channels = u16(fmtOff + 2)
    val sampleRate = u32(fmtOff + 4)
    val bitsPerSample = u16(fmtOff + 14)
    if (audioFormat != 1 || bitsPerSample != 16 || channels < 1) return None
    val end = math.min(payload.length.toLong, dataOff + dataLen).toInt
    val n = (end - dataOff) / 2
    if (n <= 0) return None
    var i = 0; var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
    var zc = 0; var prevNeg = false
    while (i < n) {
      val s = (u16(dataOff + 2 * i).toShort).toDouble / 32768.0
      sumSq += s * s; sumAbs += math.abs(s)
      if (math.abs(s) > peak) peak = math.abs(s)
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    val frames = n / channels
    Some(Array(n.toDouble, sampleRate.toDouble, channels.toDouble,
      math.sqrt(sumSq / n), zc.toDouble / n, sumAbs / n, peak,
      frames.toDouble / sampleRate))
  }

  /** REAL image decode, no libraries: uncompressed 24-bpp BMP (BITMAPFILE +
    * BITMAPINFO headers, bottom-up BGR rows padded to 4 bytes) → fixed-width
    * visual features: [width, height, mean R, mean G, mean B, mean
    * luminance, luminance variance, edge-ness (mean |horizontal luminance
    * delta|)]. Returns None unless the payload is that exact shape —
    * compressed/other-depth images stay with the stub. */
  def decodeBmp24(payload: Array[Byte]): Option[Array[Double]] = {
    def u16(i: Int) = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
      ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val dataOff = u32(10).toInt
    val w = u32(18).toInt; val h = u32(22).toInt
    val bpp = u16(28); val compression = u32(30)
    if (bpp != 24 || compression != 0L || w <= 0 || h <= 0) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (dataOff + rowBytes.toLong * h > payload.length) return None
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
    var edge = 0.0; var edgeN = 0L
    var y = 0
    while (y < h) {
      val row = dataOff + (h - 1 - y) * rowBytes // bottom-up storage
      var x = 0; var prevLum = 0.0
      while (x < w) {
        val b = payload(row + 3 * x) & 0xff
        val g = payload(row + 3 * x + 1) & 0xff
        val r = payload(row + 3 * x + 2) & 0xff
        val lum = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += lum; sl2 += lum * lum
        if (x > 0) { edge += math.abs(lum - prevLum); edgeN += 1 }
        prevLum = lum
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val meanL = sl / n
    Some(Array(w.toDouble, h.toDouble, sr / n, sg / n, sb / n, meanL,
      sl2 / n - meanL * meanL, if (edgeN == 0) 0.0 else edge / edgeN))
  }

  /** REAL compressed-image decode through the JDK's OWN codecs
    * (`javax.imageio`: PNG, JPEG, GIF, BMP — present in every JVM,
    * headless-safe, no native libraries): decode to pixels and compute the
    * SAME visual features as [[decodeBmp24]] — [width, height, mean R,
    * mean G, mean B, mean luminance, luminance variance, edge-ness]. A
    * BMP decoded here and by the hand-rolled parser yields identical
    * features (same pixels, same math). Returns None when ImageIO has no
    * reader for the payload. */
  def decodeImageIO(payload: Array[Byte]): Option[Array[Double]] = {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) return None
        var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
        var edge = 0.0; var edgeN = 0L
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0; var prevLum = 0.0
          while (x < w) {
            val argb = row(x)
            val r = (argb >>> 16) & 0xff
            val g = (argb >>> 8) & 0xff
            val b = argb & 0xff
            val lum = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += lum; sl2 += lum * lum
            if (x > 0) { edge += math.abs(lum - prevLum); edgeN += 1 }
            prevLum = lum
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val meanL = sl / n
        Some(Array(w.toDouble, h.toDouble, sr / n, sg / n, sb / n, meanL,
          sl2 / n - meanL * meanL, if (edgeN == 0) 0.0 else edge / edgeN))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL non-PCM audio decode through the JDK's `javax.sound.sampled`
    * (u-law/a-law WAV, AIFF, AU — every JVM ships these converters):
    * convert to PCM-16 and compute the SAME acoustic features as
    * [[decodeWavPcm16]]. MP3/AAC have no JDK codec and stay with the
    * stub. Returns None when the JDK cannot read or convert the payload. */
  def decodeAudioJdk(payload: Array[Byte]): Option[Array[Double]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val conv = AudioSystem.getAudioInputStream(pcm, in)
        try {
          val bytes = conv.readAllBytes()
          val n = bytes.length / 2
          if (n <= 0) return None
          var i = 0; var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
          var zc = 0; var prevNeg = false
          while (i < n) {
            val s = (((bytes(2 * i) & 0xff) |
              ((bytes(2 * i + 1) & 0xff) << 8)).toShort).toDouble / 32768.0
            sumSq += s * s; sumAbs += math.abs(s)
            if (math.abs(s) > peak) peak = math.abs(s)
            val neg = s < 0
            if (i > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            i += 1
          }
          val channels = pcm.getChannels
          val frames = n / channels
          Some(Array(n.toDouble, pcm.getSampleRate.toDouble,
            channels.toDouble, math.sqrt(sumSq / n), zc.toDouble / n,
            sumAbs / n, peak, frames.toDouble / pcm.getSampleRate))
        } finally conv.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoder SPI: a codec takes the raw payload and returns `Some`
    * feature vector, or `None` to fall through to the next tier. MUST be
    * serializable — registered decoders ship to executors inside the
    * `mapPartitions` closure (registration itself is driver-side; the
    * registry is SNAPSHOTTED at plan time, so late registrations never
    * race a running job). */
  type Decoder = Array[Byte] => Option[Array[Double]]

  private val userDecoders =
    new java.util.concurrent.ConcurrentHashMap[String, Decoder]()

  /** Register a codec for a MIME kind (e.g. `audio/mp3`, `image/webp`).
    * User codecs take priority over the built-in JDK chain, so a kind the
    * JVM half-handles can be overridden outright; a codec-less kind stops
    * falling back to the deterministic stub. */
  def registerDecoder(kind: String, d: Decoder): Unit =
    userDecoders.put(kind, d)

  def unregisterDecoder(kind: String): Unit = userDecoders.remove(kind)

  /** The registry as an immutable, closure-shippable snapshot. */
  private def registrySnapshot(): Map[String, Decoder] = {
    import scala.jdk.CollectionConverters._
    userDecoders.asScala.toMap
  }

  /** Built-in tier: REAL decoders for every format the JVM itself can
    * decode — PCM WAV (hand-rolled, zero-copy), u-law/a-law WAV / AIFF /
    * AU (JDK sound converters), 24-bpp BMP (hand-rolled), PNG / JPEG /
    * GIF (JDK ImageIO); None for codec-less formats (MP3/MP4/AAC/WebP …). */
  def builtinDecode(kind: String, payload: Array[Byte]): Option[Array[Double]] =
    kind match {
      case "audio/wav" => decodeWavPcm16(payload).orElse(decodeAudioJdk(payload))
      case "audio/aiff" | "audio/basic" => decodeAudioJdk(payload)
      case "image/bmp" => decodeBmp24(payload).orElse(decodeImageIO(payload))
      case "image/png" | "image/jpeg" | "image/gif" => decodeImageIO(payload)
      case _ => None
    }

  /** Kind-dispatched decode against an explicit registry snapshot:
    * user codec → built-in JDK chain → deterministic stub. */
  def decodeWith(reg: Map[String, Decoder])(kind: String)(
      payload: Array[Byte], dim: Int): Array[Double] = {
    val real = reg.get(kind).flatMap(_(payload))
      .orElse(builtinDecode(kind, payload))
    real.map(f => java.util.Arrays.copyOf(f, dim))
      .getOrElse(decodeStub(payload, dim))
  }

  /** Kind-dispatched decoder for [[featurize]] under the CURRENT registry
    * (driver-side convenience; distributed paths snapshot once at plan
    * time — see [[featurizeAuto]]). */
  def decodeAuto(kind: String)(payload: Array[Byte], dim: Int): Array[Double] =
    decodeWith(registrySnapshot())(kind)(payload, dim)

  /** [[featurize]] with the per-record kind driving the dispatch — the
    * full production shape: one partition iterator, user codecs where
    * registered, real JDK decoders where the JVM has them, stub
    * elsewhere. The registry snapshot is taken HERE, on the driver, and
    * travels in the closure — executors never consult mutable state. */
  def featurizeAuto(ds: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    val reg = registrySnapshot()
    ds.mapPartitions(_.map(r =>
      MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong,
        decodeWith(reg)(r.kind)(r.payload, dim))))
  }

  /** Column-level metadata extraction over a binary column — fully
    * oracle-checkable (length + content hash), no stub involved. */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(binCol)).cast("long").as("bin_len"),
      sha2(col(binCol), 256).as("sha"),
      md5(col(binCol)).as("content_md5"))

  /** Deterministic frame-sampling plan for a (stubbed) video payload: emit
    * every strideBytes-th offset as a "frame" pointer — demonstrates the
    * explode/offset bookkeeping a real frame sampler needs. */
  def frameSample(df: DataFrame, idCol: String, binCol: String, strideBytes: Int): DataFrame =
    df.select(col(idCol), octet_length(col(binCol)).cast("long").as("len"))
      // empty payload → no frames (matches range(0, 0, stride) semantics)
      .withColumn("frame_off", explode(when(col("len") > 0, expr(
        s"sequence(CAST(0 AS BIGINT), len - 1, CAST($strideBytes AS BIGINT))"))
        .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
      .select(col(idCol), col("frame_off"))
}
