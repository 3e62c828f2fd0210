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
