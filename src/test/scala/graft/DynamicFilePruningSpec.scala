package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{Snapshots, TxnCommit}
import graft.operators.DynamicFilePruning

/** Broadcast-side file pruning over the snapshot log (DPP without Hive
  * partitions): a selective dim must shrink the fact side's planned file
  * list via log stats, with results identical to the unpruned join. */
class DynamicFilePruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val dir = Files.createTempDirectory("graft-dpp")
  private lazy val wh = dir.resolve("wh").toString
  private def fs = new Path(dir.toString)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s0 = spark
    import s0.implicits._
    // Key-clustered fact table: 4 commits of disjoint key ranges — one
    // file each, so the log's [min,max] stats separate them cleanly.
    (0 until 4).foreach { i =>
      val cid = java.util.UUID.randomUUID().toString
      (i * 100 until i * 100 + 100).map(k => (k.toLong, s"payload$k"))
        .toDF("k", "payload").coalesce(1)
        .write.parquet(s"${TxnCommit.stagingDir(wh, cid)}/fact")
      val moves = TxnCommit.movesFor(fs, wh, cid, "fact")
      TxnCommit.commit(fs, wh, cid, moves)
      TxnCommit.publish(fs, wh, cid, moves)
    }
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("selective dim prunes fact files from the plan; results unchanged") {
    val s0 = spark
    import s0.implicits._
    val dimAll = (0L until 400L by 7L).map(k => (k, s"d$k")).toDF("k", "dname")
    val dimOneFile = dimAll.filter($"k" >= 210 && $"k" < 240) // file 2 only

    val full = DynamicFilePruning.joinPruned(spark, wh, "fact", "k", dimAll, "k")
    val selective = DynamicFilePruning.joinPruned(
      spark, wh, "fact", "k", dimOneFile, "k")
    // filesScanned drops: the selective dim plans ONE of the four files
    assert(full.inputFiles.length == 4)
    assert(selective.inputFiles.length == 1)
    // results are byte-identical to the unpruned join
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"payload", $"dname").as[(String, String)].collect().toSet
    val plainFact = Snapshots.read(spark, wh, "fact")
    assert(rows(selective) ==
      rows(plainFact.join(dimOneFile, "k")))
    assert(rows(full) == rows(plainFact.join(dimAll, "k")))
    assert(selective.count() == 5) // 210..239 step 7: 210,217,224,231,238
  }

  test("beyond maxKeys the bounds envelope still prunes non-overlapping files") {
    val s0 = spark
    import s0.implicits._
    // 60 distinct keys inside file 1's range with maxKeys=16: exact per-key
    // pruning overflows, the [min,max] envelope must still plan 1 file.
    val dim = (100L until 160L).map(k => (k, s"d$k")).toDF("k", "dname")
    val joined = DynamicFilePruning.joinPruned(
      spark, wh, "fact", "k", dim, "k", maxKeys = 16)
    assert(joined.inputFiles.length == 1)
    assert(joined.count() == 60)
  }

  test("sparse keys across files: per-key OR beats the bounds envelope") {
    val s0 = spark
    import s0.implicits._
    // Two keys in files 0 and 3 — a bounds envelope [5, 305] would keep all
    // four files; the exact per-key OR plans exactly two.
    val dim = Seq((5L, "a"), (305L, "b")).toDF("k", "dname")
    val joined = DynamicFilePruning.joinPruned(spark, wh, "fact", "k", dim, "k")
    assert(joined.inputFiles.length == 2)
    assert(joined.count() == 2)
  }

  test("soundness guards: fact-preserving join types rejected; empty dim plans zero files") {
    val s0 = spark
    import s0.implicits._
    val dim = Seq((5L, "a")).toDF("k", "dname")
    intercept[IllegalArgumentException](
      DynamicFilePruning.joinPruned(spark, wh, "fact", "k", dim, "k", "left"))
    intercept[IllegalArgumentException](
      DynamicFilePruning.joinPruned(spark, wh, "fact", "k", dim, "k", "full_outer"))
    // right join IS sound (unmatched fact rows drop from the result anyway)
    val right = DynamicFilePruning.joinPruned(
      spark, wh, "fact", "k", dim, "k", "right")
    assert(right.inputFiles.length == 1 && right.count() == 1)
    val empty = DynamicFilePruning.readForKeys(spark, wh, "fact", "k",
      dim.filter($"k" < 0).select("k"))
    assert(empty.inputFiles.length <= 1 && empty.count() == 0)
  }

  test("blooms extend DPP to NON-clustered fact tables") {
    val s0 = spark
    import s0.implicits._
    // Interleaved keys: every file's [min,max] spans the whole key space,
    // so range stats alone cannot prune — the per-file bloom
    // (bloom.columns table property, consulted by the append writer) is
    // what makes the dim's point keys selective.
    val w2 = dir.resolve("wh-bloom").toString
    Snapshots.setProperties(fs, w2, "fact",
      Map("bloom.columns" -> "k", "bloom.ndv" -> "1000"))
    (0 until 4).foreach { i =>
      val cid = java.util.UUID.randomUUID().toString
      (0 until 400).filter(_ % 4 == i).map(k => (k.toLong, s"payload$k"))
        .toDF("k", "payload").coalesce(1)
        .write.options(Snapshots.bloomWriteOptionsFor(fs, w2, "fact", None))
        .parquet(s"${TxnCommit.stagingDir(w2, cid)}/fact")
      val moves = TxnCommit.movesFor(fs, w2, cid, "fact")
      TxnCommit.commit(fs, w2, cid, moves)
      TxnCommit.publish(fs, w2, cid, moves)
    }
    // Dim keys all ≡ 1 (mod 4) → they live in file 1 alone.
    val dim = (1L until 400L by 4L).take(20).map(k => (k, s"d$k"))
      .toDF("k", "dname")
    val pruned = DynamicFilePruning.joinPruned(spark, w2, "fact", "k", dim, "k")
    assert(pruned.inputFiles.length == 1,
      s"bloom-backed DPP should plan 1 of 4 files, planned ${pruned.inputFiles.length}")
    assert(pruned.count() == 20L)
  }
}
