package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{Compaction, Snapshots, TxnCommit}

/** Distributed VACUUM parity: the SparkSession overload runs the orphan
  * sweep, file sizing, and deletion as Spark jobs (broadcast referenced-
  * set, `parallelize(dirs)` listing, `foreachPartition` deletes) but must
  * reap the EXACT set the driver-sequential executor computes — dry-run
  * parity on a multi-table multi-partition warehouse is the proof, then a
  * real distributed run is checked against the dry-run preview it made. */
class VacuumSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val dir = Files.createTempDirectory("graft-vacuum")
  private def wh(name: String) = dir.resolve(name).toString
  private def fs = new Path(dir.toString)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def publish(warehouse: String, table: String, ids: Range,
                      partitioned: Boolean = false): Unit = {
    val commitId = java.util.UUID.randomUUID().toString
    val staging = s"${TxnCommit.stagingDir(warehouse, commitId)}/$table"
    val s0 = spark
    import s0.implicits._
    val df = ids.map(i => (i.toLong, s"p${i % 3}")).toDF("id", "pt").coalesce(1)
    if (partitioned) df.write.partitionBy("pt").parquet(staging)
    else df.write.parquet(staging)
    val moves = TxnCommit.movesFor(fs, warehouse, commitId, table)
    TxnCommit.commit(fs, warehouse, commitId, moves)
    TxnCommit.publish(fs, warehouse, commitId, moves)
  }

  private def strayFile(path: String): Unit = {
    val p = new Path(path)
    val out = fs.create(p, true)
    try out.write("orphan".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** A warehouse with everything vacuum can reap: truncatable log entries,
    * compaction-superseded data files across two tables (one partitioned),
    * stray orphans in table and partition dirs, and a fake bloom-sidecar
    * orphan under `_bloomidx`. */
  private def buildWarehouse(w: String): Unit = {
    (1 to 4).foreach(i => publish(w, "a", (i * 10) until (i * 10 + 5),
      partitioned = true))                                       // v0–v3
    (1 to 2).foreach(i => publish(w, "b", (i * 100) until (i * 100 + 5))) // v4–v5
    // Compaction rewrites inputs → REMOVE lines whose files become
    // unreachable once the cutoff passes their entries.
    Compaction.compact(spark, w, "a", targetBytes = 512L * 1024 * 1024) // v6
    Compaction.compact(spark, w, "b", targetBytes = 512L * 1024 * 1024) // v7
    // Post-compaction publishes keep BOTH tables' dirs referenced by
    // RETAINED entries (the orphan sweep derives its dir list from them).
    publish(w, "a", 90 until 95, partitioned = true)             // v8
    publish(w, "b", 900 until 905)                               // v9
    strayFile(s"$w/a/pt=p0/crashed-job-leftover.parquet")
    strayFile(s"$w/b/lost-occ-rewrite.parquet")
    strayFile(s"$w/_bloomidx/b/stale-sidecar.bloom")
  }

  test("distributed dry-run reap set is identical to the driver executor's") {
    val w = wh("whParity")
    buildWarehouse(w)
    val driver = Snapshots.vacuumStats(fs, w, keepVersions = 2,
      minAgeMs = 0L, dryRun = true)
    val dist = Snapshots.vacuumStats(spark, w, keepVersions = 2,
      minAgeMs = 0L, dryRun = true)
    assert(driver.files.nonEmpty, "scenario must produce a non-trivial reap set")
    // Both truncated-entry REMOVEs and orphans must be in play.
    assert(driver.files.exists(_._1.contains("crashed-job-leftover")))
    assert(driver.files.exists(_._1.contains("lost-occ-rewrite")))
    assert(driver.files.exists(_._1.contains("stale-sidecar")))
    assert(driver.entriesRemoved == dist.entriesRemoved)
    assert(driver.files.toMap == dist.files.toMap,
      s"driver=${driver.files.map(_._1).sorted}\ndist=${dist.files.map(_._1).sorted}")
    assert(driver.bytesDeleted == dist.bytesDeleted)
    // Dry runs write and delete nothing — every previewed file still exists.
    driver.files.foreach { case (f, _) => assert(fs.exists(new Path(f)), f) }
  }

  test("distributed real run reaps exactly its dry-run preview; tables stay readable") {
    val w = wh("whReal")
    buildWarehouse(w)
    val preview = Snapshots.vacuumStats(spark, w, keepVersions = 2,
      minAgeMs = 0L, dryRun = true)
    val real = Snapshots.vacuumStats(spark, w, keepVersions = 2,
      minAgeMs = 0L, dryRun = false)
    assert(real.files.toMap == preview.files.toMap)
    assert(real.entriesRemoved == preview.entriesRemoved)
    real.files.foreach { case (f, _) =>
      assert(!fs.exists(new Path(f)), s"reaped file still present: $f") }
    // Live data is untouched: both tables read their full latest contents.
    assert(Snapshots.read(spark, w, "a").count() == 25)
    assert(Snapshots.read(spark, w, "b").count() == 15)
    // The accounting commit landed with the real counts.
    val vac = Snapshots.history(spark, w).filter("op = 'vacuum'").collect()
    assert(vac.nonEmpty, "vacuum accounting commit missing from history")
    assert(vac.head.getAs[Long]("files_deleted") == real.filesDeleted)
  }

  test("distributed retention window still shields young orphans") {
    val w = wh("whYoung")
    publish(w, "t", 1 to 5)
    strayFile(s"$w/t/fresh-inflight-move.parquet")
    val st = Snapshots.vacuumStats(spark, w, keepVersions = 32,
      minAgeMs = 3600000L, dryRun = true)
    assert(st.files.isEmpty, s"young orphan must be shielded: ${st.files}")
    val st0 = Snapshots.vacuumStats(spark, w, keepVersions = 32,
      minAgeMs = 0L, dryRun = true)
    assert(st0.files.exists(_._1.contains("fresh-inflight-move")))
  }
}
