package graft

import java.io.FileOutputStream
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.codec.Framing
import graft.proto.Messages
import graft.proto.Messages._

class FrameSourceV2Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("huckli-frames DSv2: reads frames, prunes by prefix and after/before") {
    val dir = Files.createTempDirectory("graft-dsv2")
    def fixture(name: String, n: Int): Unit = {
      val frames = (0 until n).map(i => Messages.VerifiedSpeedtest.encode(VerifiedSpeedtest(
        Some(SpeedtestIngest(Some(SpeedtestReq(Array[Byte](1), s"s$i", 1700000000L,
          1, 2, 3)), 1700000000L)), 1700000000L, 0)))
      val out = new FileOutputStream(dir.resolve(name).toFile)
      try Framing.writeGzipFrames(out, frames) finally out.close()
    }
    fixture("verified_speedtest.1700000001000.gz", 3)
    fixture("verified_speedtest.1700000002000.gz", 2)
    fixture("other_prefix.1700000001500.gz", 4)

    val all = spark.read.format("huckli-frames")
      .option("path", dir.toString).option("prefix", "verified_speedtest").load()
    assert(all.count() == 5)
    assert(all.schema.fieldNames.toSeq ==
      Seq("file_source", "prefix", "file_timestamp_ms", "frame_index", "bytes"))
    // per-file frame indices restart at 0 (deterministic surrogate-key input)
    val idx = all.groupBy("file_source").max("frame_index").collect()
      .map(_.getLong(1)).sorted.toSeq
    assert(idx == Seq(1L, 2L))

    val pruned = spark.read.format("huckli-frames")
      .option("path", dir.toString).option("prefix", "verified_speedtest")
      .option("afterMs", "1700000001000").load()
    assert(pruned.count() == 2) // after is exclusive: only the second file

    // frames decode through the normal flatten path
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.STRING
    val serials = all.select("bytes").collect()
      .map(r => Messages.VerifiedSpeedtest.decode(r.getAs[Array[Byte]]("bytes")))
      .flatMap(_.report.flatMap(_.report).map(_.serial))
    assert(serials.toSet == Set("s0", "s1", "s2"))

    // Column pruning reaches the scan: a metadata-only projection must not
    // read `bytes` into rows (SupportsPushDownRequiredColumns).
    val meta = all.select("file_source", "frame_index")
    val scanSchema = meta.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema()
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scanSchema.fieldNames.toSeq == Seq("file_source", "frame_index"))
    assert(meta.groupBy("file_source").count().collect().map(_.getLong(1)).sorted.toSeq
      == Seq(2L, 3L))
  }

  test("streaming ingest honors maxFilesPerTrigger with same-ms ride-along") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.sources.v2.{FrameMicroBatchStream, FrameOffset}
    val dir = Files.createTempDirectory("graft-dsv2-rate")
    def fixture(name: String, n: Int): Unit = {
      val frames = (0 until n).map(i => Messages.VerifiedSpeedtest.encode(VerifiedSpeedtest(
        Some(SpeedtestIngest(Some(SpeedtestReq(Array[Byte](1), s"s$i", 1700000000L,
          1, 2, 3)), 1700000000L)), 1700000000L, 0)))
      val out = new FileOutputStream(dir.resolve(name).toFile)
      try Framing.writeGzipFrames(out, frames) finally out.close()
    }
    fixture("verified_speedtest.1700000001000.gz", 1)
    fixture("verified_speedtest.1700000002000.gz", 1)
    // two files sharing one millisecond: an offset cannot split them —
    // they must ride one trigger together
    fixture("verified_speedtest.1700000003000.gz", 1)
    fixture("verified_speedtest.1700000003000.b.gz", 1)
    fixture("verified_speedtest.1700000004000.gz", 1)

    import scala.jdk.CollectionConverters._
    val stream = new FrameMicroBatchStream(
      new CaseInsensitiveStringMap(Map(
        "path" -> dir.toString, "prefix" -> "verified_speedtest").asJava),
      new org.apache.spark.sql.types.StructType().add("file_source", "string"))
    val limit = ReadLimit.maxFiles(1)
    var off = stream.initialOffset()
    val batches = scala.collection.mutable.ArrayBuffer[Int]()
    var progressed = true
    while (progressed && batches.size < 10) {
      val next = stream.latestOffset(off, limit)
      progressed = next.asInstanceOf[FrameOffset].ts != off.asInstanceOf[FrameOffset].ts
      if (progressed) {
        batches += stream.planInputPartitions(off, next).length
        off = stream.deserializeOffset(next.json())
      }
    }
    // 5 files over 4 distinct timestamps → 4 triggers; the same-ms pair
    // rides together (bounded overshoot), everything served exactly once.
    assert(batches.toSeq == Seq(1, 1, 2, 1), s"got $batches")

    // AvailableNow pins the bound: files landing after prepare are not
    // drained by this run.
    val pinned = new FrameMicroBatchStream(
      new CaseInsensitiveStringMap(Map(
        "path" -> dir.toString, "prefix" -> "verified_speedtest").asJava),
      new org.apache.spark.sql.types.StructType().add("file_source", "string"))
    pinned.prepareForTriggerAvailableNow()
    fixture("verified_speedtest.1700000009000.gz", 1)
    val end = pinned.latestOffset(pinned.initialOffset(), ReadLimit.allAvailable())
    assert(end.asInstanceOf[FrameOffset].ts == 1700000004000L)
  }

  test("LPT packing balances skewed file sizes across tasks") {
    import graft.sources.{FileCatalog, FrameSource}
    def f(i: Int, size: Long) =
      FileCatalog.FileInfo(s"p.$i.gz", "p", i.toLong, size)
    // one giant + many small: the giant must sit alone-ish, not stack
    val files = f(0, 10000L) +: (1 to 12).map(i => f(i, 1000L))
    val packed = FrameSource.packLpt(files, 4)
    assert(packed.map(_._2).toSet == files.toSet) // nothing lost
    val loads = packed.groupBy(_._1).view.mapValues(_.map(_._2.size_bytes).sum).toMap
    assert(loads.keys.forall(b => b >= 0 && b < 4))
    // ideal = 22000/4 = 5500; LPT guarantees max ≤ ideal + largest ⇒ the
    // giant's bucket holds only the giant, small files spread over the rest
    assert(loads.values.max == 10000L)
    assert(loads.filter(_._2 < 10000L).values.forall(_ == 4000L))
    // unknown sizes spread, never collapse into one bucket
    val unknown = (1 to 8).map(i => f(i, -1L))
    assert(FrameSource.packLpt(unknown, 4).map(_._1).distinct.size == 4)
  }
}
