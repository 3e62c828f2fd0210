package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{Snapshots, TxnCommit}

/** Boundary-exact inclusivity matrix for EVERY timestamp-taking surface:
  * two commits C0 (t0) and C1 (t1), probed at t1−1 / t1 / t1+1 (and t0),
  * asserting the documented bound each time. One off-by-one here means a
  * ported Delta pipeline double-processes or drops a commit — the
  * r16→r17 `inclusiveFromTimestamp` fix was exactly this class of bug.
  *
  * Documented bounds under test:
  *  - `timestampAsOf` / `TIMESTAMP AS OF` / RESTORE TO TIMESTAMP:
  *    state AT the instant — a commit landing exactly at ts is included
  *    (versionAt(ts)).
  *  - CDF batch/stream `startingTimestamp`: Delta parity, INCLUSIVE —
  *    changes committed at-or-after ts (exclusive bound versionAt(ts−1)).
  *  - CDF batch `endingTimestamp` / TVF TO bound: INCLUSIVE — everything
  *    committed by ts (versionAt(ts)).
  *  - `table_changes` FROM bound: EXCLUSIVE by default ("the version
  *    current at ts is what you already saw"); Delta-inclusive under
  *    `graft.cdf.inclusiveFromTimestamp`.
  */
class TimestampBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val dir = Files.createTempDirectory("graft-tsbounds")
  private lazy val wh = dir.resolve("wh").toString
  private def fs = new Path(dir.toString)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private var t0 = 0L // C0 commit instant (ids 0..9)
  private var t1 = 0L // C1 commit instant (ids 10..19)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.warehouse", wh)
    val s0 = spark
    import s0.implicits._
    def pub(ids: Range): Unit = {
      val cid = java.util.UUID.randomUUID().toString
      ids.map(_.toLong).toDF("id").coalesce(1)
        .write.parquet(s"${TxnCommit.stagingDir(wh, cid)}/t")
      val moves = TxnCommit.movesFor(fs, wh, cid, "t")
      TxnCommit.commit(fs, wh, cid, moves)
      TxnCommit.publish(fs, wh, cid, moves)
    }
    pub(0 until 10)
    Thread.sleep(20) // guarantee t0 < t1-1 < t1 at ms resolution
    pub(10 until 20)
    val es = Snapshots.entries(fs, wh).filterNot(_.isCheckpoint)
    t0 = es.head.mtime; t1 = es.last.mtime
    assert(t1 >= t0 + 3, s"commits not separated: $t0 / $t1")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fmt(ms: Long): String =
    new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
      .format(new java.sql.Timestamp(ms))

  private def snapshotCount(ms: Long): Long =
    spark.read.format("graft-snapshots")
      .option("warehouse", wh).option("table", "t")
      .option("timestampAsOf", fmt(ms)).load().count()

  private def cdfIds(opts: (String, String)*): Set[Long] = {
    val r = opts.foldLeft(spark.read.format("graft-snapshots")
        .option("warehouse", wh).option("table", "t")
        .option("readChangeFeed", "true")) {
      case (rd, (k, v)) => rd.option(k, v) }
    r.load().select("id").collect().map(_.getLong(0)).toSet
  }

  private val c0 = (0L until 10L).toSet
  private val c1 = (10L until 20L).toSet

  test("timestampAsOf: state AT the instant — t1-1/t1/t1+1") {
    assert(snapshotCount(t1 - 1) == 10L) // C1 not yet committed
    assert(snapshotCount(t1) == 20L)     // a commit AT ts is included
    assert(snapshotCount(t1 + 1) == 20L)
    assert(snapshotCount(t0) == 10L)     // C0's own instant includes C0
    // SQL twin (SNAPSHOT OF … TIMESTAMP AS OF) resolves identically.
    assert(spark.sql(
      s"SNAPSHOT OF t TIMESTAMP AS OF '${fmt(t1 - 1)}'").count() == 10L)
    assert(spark.sql(
      s"SNAPSHOT OF t TIMESTAMP AS OF '${fmt(t1)}'").count() == 20L)
  }

  test("CDF startingTimestamp: at-or-after, exactly") {
    assert(cdfIds("startingTimestamp" -> fmt(t0)) == c0 ++ c1) // C0 at its own instant counts
    assert(cdfIds("startingTimestamp" -> fmt(t1 - 1)) == c1)   // C0 strictly before
    assert(cdfIds("startingTimestamp" -> fmt(t1)) == c1)       // C1 exactly at ts counts
    assert(cdfIds("startingTimestamp" -> fmt(t1 + 1)) == Set.empty[Long])
  }

  test("CDF endingTimestamp: everything committed BY the instant") {
    assert(cdfIds("startingVersion" -> "-1",
      "endingTimestamp" -> fmt(t1 - 1)) == c0)
    assert(cdfIds("startingVersion" -> "-1",
      "endingTimestamp" -> fmt(t1)) == c0 ++ c1)
    assert(cdfIds("startingVersion" -> "-1",
      "endingTimestamp" -> fmt(t1 + 1)) == c0 ++ c1)
  }

  test("table_changes FROM: exclusive by default, Delta-inclusive under the flag") {
    def tvf(from: String): Long = spark.sql(
      s"SELECT count(*) FROM table_changes('t', '$from')").head().getLong(0)
    // Default (exclusive): "the version current at ts is already seen".
    assert(tvf(fmt(t0)) == 10L)     // C0 current at t0 → only C1 follows
    assert(tvf(fmt(t1 - 1)) == 10L) // still C0 current
    assert(tvf(fmt(t1)) == 0L)      // C1 current at t1 → nothing after
    spark.conf.set("graft.cdf.inclusiveFromTimestamp", "true")
    try {
      assert(tvf(fmt(t0)) == 20L)     // C0 at its own instant included
      assert(tvf(fmt(t1 - 1)) == 10L) // C0 strictly before stays excluded
      assert(tvf(fmt(t1)) == 10L)     // C1 at ts included
      assert(tvf(fmt(t1 + 1)) == 0L)
    } finally spark.conf.unset("graft.cdf.inclusiveFromTimestamp")
    // TO bound is inclusive regardless of the flag.
    def tvfTo(to: String): Long = spark.sql(
      s"SELECT count(*) FROM table_changes('t', -1, '$to')").head().getLong(0)
    assert(tvfTo(fmt(t1 - 1)) == 10L)
    assert(tvfTo(fmt(t1)) == 20L)
  }

  test("streaming startingTimestamp: at-or-after, exactly") {
    def streamIds(ms: Long): Set[Long] = {
      val out = Files.createTempDirectory("tsb-out").toString
      val ckpt = Files.createTempDirectory("tsb-ckpt").toString
      val q = spark.readStream.format("graft-snapshots")
        .option("warehouse", wh).option("table", "t")
        .option("startingTimestamp", fmt(ms)).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val files = new java.io.File(out).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      if (files.isEmpty) Set.empty
      else spark.read.parquet(out).select("id").collect()
        .map(_.getLong(0)).toSet
    }
    assert(streamIds(t1 - 1) == c1)
    assert(streamIds(t1) == c1)
    assert(streamIds(t0) == c0 ++ c1)
  }

  test("RESTORE TO TIMESTAMP AS OF: state AT the instant") {
    // Mutating — runs LAST (suite order is declaration order). The
    // restore commits land with later mtimes, so t0/t1 resolution is
    // untouched.
    spark.sql(s"RESTORE t TO TIMESTAMP AS OF '${fmt(t1 - 1)}'")
    assert(Snapshots.read(spark, wh, "t").count() == 10L)
    spark.sql(s"RESTORE t TO TIMESTAMP AS OF '${fmt(t1)}'")
    assert(Snapshots.read(spark, wh, "t").count() == 20L)
    spark.sql(s"RESTORE t TO TIMESTAMP AS OF '${fmt(t1 + 1)}'")
    assert(Snapshots.read(spark, wh, "t").count() == 20L)
  }
}
