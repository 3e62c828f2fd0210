package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.ingest.{Snapshots, TxnCommit}

/** Manual smoke for the warehouse-maintenance CLI (`graft.Main --compact /
  * --zorder / --vacuum / --retention-hours`): builds a small TxnCommit
  * warehouse, then drives the real `Main.main` argument paths end-to-end.
  * Usage: sbt "Test/runMain graft.CliSmoke" — prints CLISMOKE OK on success.
  */
object CliSmoke {
  def main(args: Array[String]): Unit = {
    val wh = Files.createTempDirectory("graft-cli-smoke").toString
    val boot = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    boot.sparkContext.setLogLevel("ERROR")
    val fs = new Path(wh).getFileSystem(boot.sparkContext.hadoopConfiguration)
    (0 until 4).foreach { i =>
      val cid = java.util.UUID.randomUUID().toString
      import boot.implicits._
      (i * 100 until i * 100 + 50).map(x => (x.toLong, (x % 7).toLong))
        .toDF("a", "b").coalesce(1)
        .write.parquet(s"${TxnCommit.stagingDir(wh, cid)}/t")
      val moves = TxnCommit.movesFor(fs, wh, cid, "t")
      TxnCommit.commit(fs, wh, cid, moves)
      TxnCommit.publish(fs, wh, cid, moves)
    }
    boot.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    Main.main(Array("--warehouse", wh, "--compact", "t",
      "--sort-by", "a", "--target-bytes", "4096"))
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    Main.main(Array("--warehouse", wh, "--compact", "t",
      "--zorder", "a,b", "--target-bytes", "1"))
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    // Roll back to the sorted-compaction state (version after the first
    // maintenance pass), then forward again via the CLI.
    Main.main(Array("--warehouse", wh, "--restore", "t", "--to-version", "4"))
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    // Dry run previews without deleting — the real run after must still
    // find everything the preview promised.
    Main.main(Array("--warehouse", wh, "--vacuum", "1",
      "--retention-hours", "0", "--dry-run"))
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    Main.main(Array("--warehouse", wh, "--vacuum", "1", "--retention-hours", "0"))
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    val check = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    check.sparkContext.setLogLevel("ERROR")
    val n = Snapshots.read(check, wh, "t").count()
    val hist = Snapshots.history(check, wh).select("op").collect().map(_.getString(0))
    check.stop()
    assert(n == 200, s"expected 200 rows after maintenance, got $n")
    assert(hist.contains("zorder") || hist.contains("restore"),
      s"history ops: ${hist.mkString(",")}")
    println(s"CLISMOKE OK rows=$n ops=${hist.mkString(",")}")
  }
}
