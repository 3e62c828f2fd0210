package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque `binary`
  * columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch shape —
  * is real; the codec itself is STUBBED with a deterministic fake because this
  * container has no image/audio libraries. A production deployment swaps
  * [[decodeStub]] for a real decoder without touching the pipeline shape.
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
