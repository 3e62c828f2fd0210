package graft

import java.io.FileOutputStream
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.codec.Framing
import graft.ingest.{FileSelection, IngestJob}
import graft.proto.Messages
import graft.proto.Messages._

/** Dev drive: fabricate a bucket dir, run a real ingest, print per-table
  * counts + the checkpoint resume behavior.
  * Usage: sbt "Test/runMain graft.IngestDemo" */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft-demo")
    def fixture(name: String, frames: Seq[Array[Byte]]): Unit = {
      val out = new FileOutputStream(dir.resolve(name).toFile)
      try Framing.writeGzipFrames(out, frames) finally out.close()
    }
    val shares = Seq(
      MobileRewardShare(1700000000L, 1700003600L, GatewayArm(Array[Byte](1), 10, 20, 30)),
      MobileRewardShare(1700000000L, 1700003600L, UnallocatedArm(1, 7)),
      MobileRewardShare(1700000000L, 1700003600L, RadioArm(Array[Byte](3), Some("1.5"),
        None, None, None, 1, 2, 1700000000L, Array.tabulate[Byte](16)(_.toByte), None, None,
        0, 0, Some(SpeedtestAvgMsg(1, 2, 3, 1700000000L)),
        Seq(TrustScoreMsg(5, Some("0.9"))), Nil,
        Seq(CoveredHexMsg(9L, Some("2.0"), None, 0, 1, 2, Some("1.0"), 1, Some("0.5"), 1, true)))))
    fixture("mobile_network_reward_shares_v1.1700000001000.gz",
      shares.map(Messages.MobileRewardShare.encode))
    val wh = dir.resolve("wh").toString
    val r1 = IngestJob.run(spark, dir.toString, wh, "mobile-rewards")
    println(s"INGEST1 files=${r1.files.size} counts=${r1.rowCounts.toSeq.sorted}")
    fixture("mobile_network_reward_shares_v1.1700000002000.gz",
      Seq(Messages.MobileRewardShare.encode(
        MobileRewardShare(1700000000L, 1700003600L, GatewayArm(Array[Byte](5), 1, 2, 3)))))
    val r2 = IngestJob.run(spark, dir.toString, wh, "mobile-rewards", FileSelection(continue = true))
    println(s"INGEST2 resume files=${r2.files.map(_.key).map(_.split('/').last)} gateway=${r2.rowCounts("mobile_gateway_rewards")}")
    println("DDL: " + graft.types.Schemas.ddl("mobile_reward_covered_hexes"))
    // drive a generic flat-spec type end-to-end too
    import graft.proto.DynMessage.b
    fixture("boosted_hex_update.1700000005000.gz", Seq(
      b.i64(1, 1700000000L).msg(2, b.i64(1, 631210968L).i64(2, 1700000000L)
        .i64(3, 1700003600L).i32(4, 720).i64(5, 4L).i32(6, 2)).toBytes))
    val r3 = IngestJob.run(spark, dir.toString, wh, "boosted-hex-update")
    println(s"INGEST3 boosted_hex counts=${r3.rowCounts.toSeq.sorted} registry=${graft.ingest.IngestSpecs.registry.size}")
    spark.stop()
  }
}
