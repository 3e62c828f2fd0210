package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{Compaction, Merge, Snapshots, TxnCommit}

/** Streaming reads of the snapshot log (`format("graft-snapshots")`):
  * offsets are log versions, each micro-batch serves exactly the files the
  * in-range append commits added, rewrites are skipped, and Spark's own
  * checkpoint gives exactly-once delivery across restarts. */
class SnapshotStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val dir = Files.createTempDirectory("graft-snapstream")
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

  private def publishKv(w: String, rows: Seq[(Long, String)],
                        partitionBy: Option[String] = None): Unit = {
    val cid = java.util.UUID.randomUUID().toString
    val s0 = spark
    import s0.implicits._
    val df = rows.toDF("id", "val").coalesce(1)
    val writer = df.write
    partitionBy.fold(writer)(c => writer.partitionBy(c))
      .parquet(s"${TxnCommit.stagingDir(w, cid)}/t")
    val moves = TxnCommit.movesFor(fs, w, cid, "t")
    TxnCommit.commit(fs, w, cid, moves)
    TxnCommit.publish(fs, w, cid, moves)
  }

  /** Drain the log to its current end with Trigger.AvailableNow into a
    * parquet sink; restartable via the shared checkpoint. */
  private def drain(w: String, out: String, ckpt: String,
                    extraOpts: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft-snapshots")
      .option("warehouse", w).option("table", "t")
    val q = extraOpts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("a new stream serves initial-defaults for pre-add-era commits") {
    val w = wh("whStreamDfl")
    val s0 = spark
    import s0.implicits._
    publishKv(w, Seq(1L -> "a", 2L -> "b")) // pre-add era
    graft.ingest.SchemaEvolution.addColumn(spark, w, "t", "tag",
      default = Some("'old'"))
    // Post-add era with the column present (typed; one explicit NULL).
    val cid = java.util.UUID.randomUUID().toString
    Seq((3L, "c", Some("new")), (4L, "d", None: Option[String]))
      .toDF("id", "val", "tag").coalesce(1)
      .write.parquet(s"${TxnCommit.stagingDir(w, cid)}/t")
    val mv = TxnCommit.movesFor(fs, w, cid, "t")
    TxnCommit.commit(fs, w, cid, mv)
    TxnCommit.publish(fs, w, cid, mv)
    val out = wh("whStreamDflOut")
    drain(w, out, wh("whStreamDflCkpt"))
    val got = spark.read.parquet(out).select("id", "tag").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map(1L -> "old", 2L -> "old", 3L -> "new", 4L -> null),
      s"got $got")
  }

  test("startingTimestamp resolves the stream's initial offset (Delta parity)") {
    val w = wh("whStartTs")
    val s0 = spark
    import s0.implicits._
    publishKv(w, (0 until 10).map(i => i.toLong -> s"a$i"))   // v0
    Thread.sleep(20) // distinct entry mtimes
    publishKv(w, (10 until 15).map(i => i.toLong -> s"b$i"))  // v1
    val v1ts = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
      .find(_.version == 1L).get.mtime
    // INCLUSIVE of v1: a start at v1's own instant serves v1's rows.
    val ts = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
      .format(new java.sql.Timestamp(v1ts))
    val out = wh("whStartTsOut")
    drain(w, out, wh("whStartTsCkpt"),
      Map("startingTimestamp" -> ts))
    assert(spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.toSeq == (10L until 15L))
  }

  test("exactly-once across restarts; compaction rewrites never re-delivered") {
    val w = wh("whEo")
    val out = wh("whEoOut"); val ckpt = wh("whEoCkpt")
    val s0 = spark
    import s0.implicits._
    publishKv(w, (0 until 10).map(i => i.toLong -> s"a$i"))   // v0
    publishKv(w, (10 until 20).map(i => i.toLong -> s"b$i"))  // v1
    drain(w, out, ckpt)
    val first = spark.read.parquet(out)
    assert(first.count() == 20)
    assert(first.select("id").as[Long].collect().sorted.sameElements(0L until 20L))

    // New appends + a compaction land while the stream is down; the restart
    // resumes from the committed version offset: the appended rows arrive
    // exactly once and the compaction's rewritten copies never do.
    Compaction.compact(spark, w, "t")                          // v2 (rewrite)
    publishKv(w, (20 until 25).map(i => i.toLong -> s"c$i"))   // v3
    drain(w, out, ckpt)
    val second = spark.read.parquet(out)
    assert(second.count() == 25, "restart must deliver only the new append")
    assert(second.select("id").as[Long].collect().sorted.sameElements(0L until 25L))

    // Nothing new → a third drain adds nothing.
    drain(w, out, ckpt)
    assert(spark.read.parquet(out).count() == 25)
  }

  test("merge commits fail the stream by default; skipChangeCommits skips them") {
    val w = wh("whMerge")
    val out = wh("whMergeOut"); val ckpt = wh("whMergeCkpt")
    val s0 = spark
    import s0.implicits._
    publishKv(w, Seq(1L -> "a", 2L -> "b"))                    // v0
    Merge.upsert(spark, w, "t", Seq(2L -> "B").toDF("id", "val"), Seq("id")) // v1
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(w, out, ckpt)
    }
    assert(err.getMessage.contains("merge") ||
      Option(err.getCause).exists(_.getMessage.contains("merge")))
    // With skipChangeCommits the stream serves the appends only.
    drain(w, out + "2", ckpt + "2", Map("skipChangeCommits" -> "true"))
    val got = spark.read.parquet(out + "2")
    assert(got.select("id").as[Long].collect().sorted.sameElements(Array(1L, 2L)))
    assert(got.filter($"val" === "B").count() == 0) // rewrite skipped, by contract
  }

  test("partitioned table: dt served from the log's recorded tuples") {
    val w = wh("whPart")
    val out = wh("whPartOut"); val ckpt = wh("whPartCkpt")
    val s0 = spark
    import s0.implicits._
    def pub(rows: Seq[(Long, String)]): Unit = {
      val cid = java.util.UUID.randomUUID().toString
      rows.toDF("id", "dt").coalesce(1).write.partitionBy("dt")
        .parquet(s"${TxnCommit.stagingDir(w, cid)}/t")
      val moves = TxnCommit.movesFor(fs, w, cid, "t")
      TxnCommit.commit(fs, w, cid, moves)
      TxnCommit.publish(fs, w, cid, moves)
    }
    pub(Seq(1L -> "2024-01-01", 2L -> "2024-01-02"))
    pub(Seq(3L -> "2024-01-02"))
    drain(w, out, ckpt)
    val got = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(got == Set(1L -> "2024-01-01", 2L -> "2024-01-02", 3L -> "2024-01-02"))
  }

  test("readChangeFeed streams the same row-level feed as batch changes()") {
    val w = wh("whCdfStream")
    val out = wh("whCdfOut"); val ckpt = wh("whCdfCkpt")
    val s0 = spark
    import s0.implicits._
    publishKv(w, Seq(1L -> "a", 2L -> "b"))                          // v0
    Merge.upsert(spark, w, "t",
      Seq(2L -> "B", 3L -> "c").toDF("id", "val"), Seq("id"))        // v1
    Merge.deleteKeys(spark, w, "t", Seq(1L).toDF("id"), Seq("id"))   // v2
    drain(w, out, ckpt, Map("readChangeFeed" -> "true"))
    val streamed = spark.read.parquet(out)
      .select("id", "val", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    val batch = Snapshots.changes(spark, w, "t", fromExclusive = -1L)
      .select("id", "val", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.map(_._3) ==
      Set("insert", "update_preimage", "update_postimage", "delete"))
    // Restart with nothing new appends nothing.
    drain(w, out, ckpt, Map("readChangeFeed" -> "true"))
    assert(spark.read.parquet(out).count() == streamed.size)
  }

  test("readChangeFeed serves deletion-vector DML like any merge commit") {
    val w = wh("whDvStream")
    val out = wh("whDvOut"); val ckpt = wh("whDvCkpt")
    val s0 = spark
    import s0.implicits._
    publishKv(w, Seq(1L -> "a", 2L -> "b", 3L -> "c"))                 // v0
    Merge.deleteWhereDv(spark, w, "t",
      org.apache.spark.sql.functions.col("id") === 2L)                 // v1
    drain(w, out, ckpt, Map("readChangeFeed" -> "true"))
    val streamed = spark.read.parquet(out)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed ==
      Set((1L, "insert", 0L), (2L, "insert", 0L), (3L, "insert", 0L),
        (2L, "delete", 1L)))
    // The plain-append stream treats the DV commit as a change commit:
    // fail by default, skipped with skipChangeCommits.
    val out2 = wh("whDvOut2"); val ckpt2 = wh("whDvCkpt2")
    intercept[Exception](drain(w, out2, ckpt2))
    drain(w, out2, wh("whDvCkpt3"), Map("skipChangeCommits" -> "true"))
    assert(spark.read.parquet(out2)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("a restore re-ADD carrying a deletion vector streams DV-subtracted") {
    val w = wh("whDvReAdd")
    val s0 = spark
    import s0.implicits._
    publishKv(w, Seq(1L -> "a", 2L -> "b", 3L -> "c"))                 // v0
    Merge.deleteWhereDv(spark, w, "t",
      org.apache.spark.sql.functions.col("id") === 2L)                 // v1
    Merge.deleteWhereDv(spark, w, "t",
      org.apache.spark.sql.functions.col("id") === 3L)                 // v2
    Snapshots.restore(spark, w, "t", 1L)                               // v3: re-ADD w/ v1 DV
    // Default mode, streaming only the restore version: the reader
    // subtracts the re-ADD's deletion vector — exact row parity with
    // batch changes() over the same range ({1,3}: v1's DV deletes id=2).
    val out0 = wh("whDvReAddOut0")
    drain(w, out0, wh("whDvReAddCkpt0"), Map("startingVersion" -> "2"))
    val streamed = spark.read.parquet(out0)
      .select("id").as[Long].collect().sorted.toSeq
    val batch = Snapshots.changes(spark, w, "t", fromExclusive = 2L)
      .filter($"_change_type" === "insert")
      .select("id").as[Long].collect().sorted.toSeq
    assert(streamed == batch && streamed == Seq(1L, 3L),
      s"streamed=$streamed batch=$batch")
    // skipChangeCommits (skipping the v1/v2 merge commits) serves the
    // re-ADD identically — a restore is an append of surviving rows, not
    // a rewrite, so the escape hatch no longer drops it.
    val out = wh("whDvReAddOut")
    drain(w, out, wh("whDvReAddCkpt"), Map("skipChangeCommits" -> "true"))
    assert(spark.read.parquet(out)
      .select("id").as[Long].collect().sorted.toSeq ==
        Seq(1L, 1L, 2L, 3L, 3L)) // v0's {1,2,3} + v3's DV-subtracted {1,3}
  }

  test("readChangeFeed fails on a drop commit instead of swallowing it") {
    val w = wh("whCdfDrop")
    val s0 = spark
    import s0.implicits._
    publishKv(w, Seq(1L -> "a", 2L -> "b"))        // v0
    Snapshots.dropTable(fs, w, "t")                // v1: REMOVEs only, no CDF
    publishKv(w, Seq(3L -> "c"))                   // v2: re-create
    // A drop writes bare REMOVEs (no CDF files): its deletions cannot be
    // represented as change rows, so the CDF stream must fail fast — NOT
    // serve v2's inserts on top of never-deleted v0 rows.
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(w, wh("whCdfDropOut"), wh("whCdfDropCkpt"),
        Map("readChangeFeed" -> "true"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("drop")))
    // Starting PAST the drop, the CDF stream serves the re-created rows.
    val out = wh("whCdfDropOut2")
    drain(w, out, wh("whCdfDropCkpt2"),
      Map("readChangeFeed" -> "true", "startingVersion" -> "1"))
    assert(spark.read.parquet(out)
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("a rewrite of ANOTHER table does not fail this table's stream") {
    val w = wh("whMulti")
    val s0 = spark
    import s0.implicits._
    publishKv(w, Seq(1L -> "a"))                                  // v0: t
    // An overwrite and a merge land on a SIBLING table of the warehouse.
    Seq((100L, "x")).toDF("id", "val").write.format("graft-snapshots")
      .option("warehouse", w).option("table", "other").save()     // v1
    Seq((101L, "y")).toDF("id", "val").write.format("graft-snapshots")
      .option("warehouse", w).option("table", "other")
      .mode("overwrite").save()                                   // v2: overwrite(other)
    Merge.upsert(spark, w, "other",
      Seq(101L -> "Y").toDF("id", "val"), Seq("id"))              // v3: merge(other)
    publishKv(w, Seq(2L -> "b"))                                  // v4: t
    // Default mode (no skipChangeCommits): the stream of t must sail past
    // the sibling's rewrite commits and serve exactly t's appends.
    val out = wh("whMultiOut")
    drain(w, out, wh("whMultiCkpt"))
    assert(spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("offsets below the vacuumed log fail fast instead of under-serving") {
    val w = wh("whVac")
    (0 until 4).foreach(i =>
      publishKv(w, Seq(i.toLong -> s"v$i")))                 // v0..v3
    Compaction.compact(spark, w, "t")                        // v4
    Snapshots.vacuum(fs, w, keepVersions = 1, minAgeMs = 0L) // truncates < 4
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(w, wh("whVacOut"), wh("whVacCkpt")) // fresh stream, full history
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("vacuumed")))
    // From the current snapshot's version forward, streaming resumes fine.
    val latest = Snapshots.latestVersion(fs, w).get
    publishKv(w, Seq(100L -> "new"))
    drain(w, wh("whVacOut2"), wh("whVacCkpt2"),
      Map("startingVersion" -> latest.toString))
    val s0 = spark
    import s0.implicits._
    assert(spark.read.parquet(wh("whVacOut2")).select("id").as[Long]
      .collect().sameElements(Array(100L)))
  }

  test("stream over a renamed table serves the logical schema with real values") {
    val s0 = spark
    import s0.implicits._
    val w = wh("whStreamRename")
    publishKv(w, Seq((1L, "a"), (2L, "b")))
    graft.ingest.SchemaEvolution.renameColumn(spark, w, "t", "val", "label")
    // post-rename append staged under the PHYSICAL names (id, val) — the
    // contract for writers feeding a mapped table
    publishKv(w, Seq((3L, "c")))
    val out = Files.createTempDirectory("graft-rename-out").toString
    val ckpt = Files.createTempDirectory("graft-rename-ckpt").toString
    drain(w, out, ckpt)
    val got = spark.read.parquet(out)
    assert(got.columns.toSet == Set("id", "label"))
    // the renamed column carries the FILE's values, not nulls
    assert(got.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  private def publishMulti(w: String, rows: Seq[(Long, String)], nFiles: Int): Unit = {
    val cid = java.util.UUID.randomUUID().toString
    val s0 = spark
    import s0.implicits._
    rows.toDF("id", "val").repartition(nFiles).write
      .parquet(s"${TxnCommit.stagingDir(w, cid)}/t")
    val moves = TxnCommit.movesFor(fs, w, cid, "t")
    TxnCommit.commit(fs, w, cid, moves)
    TxnCommit.publish(fs, w, cid, moves)
  }

  private def newStream(w: String) = {
    import scala.jdk.CollectionConverters._
    new graft.sources.v2.SnapshotMicroBatchStream(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("warehouse" -> w, "table" -> "t").asJava),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("val", "string"))
  }

  /** Drive latestOffset/planInputPartitions by hand the way the engine
    * does — every step roundtrips the offset through json, so each hop IS
    * a restart from a checkpointed offset (mid-version included). Returns
    * (offsets-walked, files-planned-in-order). */
  private def walk(w: String,
                   limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : (Seq[graft.sources.v2.SnapshotVersionOffset], Seq[String]) = {
    val stream = newStream(w)
    val offsets = scala.collection.mutable.ArrayBuffer[graft.sources.v2.SnapshotVersionOffset]()
    val files = scala.collection.mutable.ArrayBuffer[String]()
    var off = stream.initialOffset()
    var steps = 0
    var progressed = true
    while (progressed && steps < 100) {
      val next = stream.latestOffset(off, limit)
      progressed = next != off
      if (progressed) {
        files ++= stream.planInputPartitions(off, next).map(
          _.asInstanceOf[graft.sources.v2.SnapshotInputPartition].file)
        off = stream.deserializeOffset(next.json()) // checkpoint roundtrip
        offsets += off.asInstanceOf[graft.sources.v2.SnapshotVersionOffset]
        steps += 1
      }
    }
    (offsets.toSeq, files.toSeq)
  }

  test("admission control: maxFiles walks (version,index) offsets, each file once") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val w = wh("whAdm")
    publishMulti(w, (0 until 40).map(i => i.toLong -> s"a$i"), 4)  // v0: 4 files
    publishMulti(w, (40 until 60).map(i => i.toLong -> s"b$i"), 2) // v1: 2 files

    val (offsets, files) = walk(w, ReadLimit.maxFiles(1))
    // 6 files → 6 single-file triggers; a fat commit is split mid-version
    // and version boundaries collapse the index back to the legacy form.
    assert(files.size == 6 && files.distinct.size == 6,
      s"every file exactly once, got $files")
    assert(offsets.map(o => (o.version, o.index)) ==
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, -1L), (1L, 1L), (1L, -1L)))

    // A larger cap packs whole versions per trigger but still caps.
    val (off3, files3) = walk(w, ReadLimit.maxFiles(4))
    assert(files3.size == 6 && files3.distinct.size == 6)
    assert(off3.map(o => (o.version, o.index)) == Seq((0L, -1L), (1L, -1L)))

    // Byte limits admit at least one file per trigger (progress guarantee)
    // and composite limits take the most restrictive axis.
    val (offB, filesB) = walk(w, ReadLimit.maxBytes(1L))
    assert(filesB.size == 6 && filesB.distinct.size == 6 && offB.size == 6)
    val (offC, filesC) = walk(w, ReadLimit.compositeLimit(
      Array(ReadLimit.maxFiles(2), ReadLimit.maxBytes(1L))))
    assert(filesC.size == 6 && filesC.distinct.size == 6 && offC.size == 6)

    // Row limits account from the log's stats token — zero file opens.
    // 60 rows over 6 files (~10 each; round-robin repartition may skew a
    // few): maxRows(20) needs ≥3 triggers and packs ≤2 files per step.
    val (offR, filesR) = walk(w, ReadLimit.maxRows(20L))
    assert(filesR.size == 6 && filesR.distinct.size == 6)
    assert(offR.size >= 3 && offR.size <= 6, s"got $offR")
    assert(offR.last == graft.sources.v2.SnapshotVersionOffset(1L))

    // No limit → one trigger drains everything to the plain-version offset.
    val (offAll, filesAll) = walk(w, ReadLimit.allAvailable())
    assert(filesAll.size == 6 && offAll.map(o => (o.version, o.index)) ==
      Seq((1L, -1L)))
  }

  test("two-field offsets survive checkpoint json; legacy form still parses") {
    val stream = newStream(wh("whAdm"))
    val two = graft.sources.v2.SnapshotVersionOffset(5L, 3L)
    assert(stream.deserializeOffset(two.json()) == two) // NOT version 53
    assert(stream.deserializeOffset("""{"version":7}""") ==
      graft.sources.v2.SnapshotVersionOffset(7L, -1L))
    assert(stream.deserializeOffset(
      graft.sources.v2.SnapshotVersionOffset(7L).json()) ==
      graft.sources.v2.SnapshotVersionOffset(7L, -1L))
  }

  test("mid-version offsets fingerprint the split version's unit count") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val w = wh("whFp")
    publishMulti(w, (0 until 40).map(i => i.toLong -> s"a$i"), 4) // v0: 4 files
    val stream = newStream(w)
    // A rate-limited trigger mints the fingerprint into the offset json.
    val first = stream.latestOffset(stream.initialOffset(), ReadLimit.maxFiles(1))
      .asInstanceOf[graft.sources.v2.SnapshotVersionOffset]
    assert(first.index == 1L && first.units == 4L, first)
    assert(stream.deserializeOffset(first.json()) == first)
    // Matching fingerprint: the restart serves the remaining units.
    val end = stream.latestOffset(first, ReadLimit.allAvailable())
    assert(stream.planInputPartitions(first, end).length == 3)
    // A forged/mismatched fingerprint (= the unit list changed under the
    // checkpoint, e.g. toggled admission options) fails fast.
    val forged = graft.sources.v2.SnapshotVersionOffset(0L, 1L, units = 7L)
    val err = intercept[IllegalStateException] {
      stream.planInputPartitions(forged, end)
    }
    assert(err.getMessage.contains("admission options"), err.getMessage)
    val err2 = intercept[IllegalStateException] {
      stream.latestOffset(forged, ReadLimit.maxFiles(1))
    }
    assert(err2.getMessage.contains("admission options"), err2.getMessage)
    // Legacy mid-version offsets (no fingerprint) keep working unchecked.
    val legacy = stream.deserializeOffset("""{"version":0,"index":1}""")
    assert(stream.planInputPartitions(legacy, end).length == 3)
  }

  test("prepareForTriggerAvailableNow pins the drain bound against late commits") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val w = wh("whAvailNow")
    publishMulti(w, Seq(1L -> "a"), 1)                       // v0
    publishMulti(w, Seq(2L -> "b"), 1)                       // v1
    val pinned = newStream(w)
    pinned.prepareForTriggerAvailableNow()
    publishMulti(w, Seq(3L -> "c"), 1)                       // v2, after prepare
    val end = pinned.latestOffset(pinned.initialOffset(), ReadLimit.allAvailable())
    assert(end == graft.sources.v2.SnapshotVersionOffset(1L),
      "AvailableNow run must drain to the prepared bound, not chase v2")
    // An unprepared stream sees v2.
    val live = newStream(w)
    assert(live.latestOffset(live.initialOffset(), ReadLimit.allAvailable()) ==
      graft.sources.v2.SnapshotVersionOffset(2L))
  }

  test("e2e: maxFilesPerTrigger rate-limits AvailableNow without loss or dupes") {
    val s0 = spark
    import s0.implicits._
    val w = wh("whRate")
    publishMulti(w, (0 until 40).map(i => i.toLong -> s"a$i"), 4)  // v0: 4 files
    publishMulti(w, (40 until 50).map(i => i.toLong -> s"b$i"), 2) // v1: 2 files
    val out = wh("whRateOut"); val ckpt = wh("whRateCkpt")
    drain(w, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.sameElements(0L until 50L))
    // One offset file per micro-batch: the 6 files took ≥6 rate-limited
    // triggers, not one fat batch.
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 6, s"expected ≥6 rate-limited batches, got $batches")
    // Restart with new data: still exactly once.
    publishMulti(w, (50 until 55).map(i => i.toLong -> s"c$i"), 1) // v2
    drain(w, out, ckpt, Map("maxFilesPerTrigger" -> "1"))
    assert(spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.sameElements(0L until 55L))
  }

  test("e2e: byte-limited admission accounts from log sizes — zero status RPCs") {
    val s0 = spark
    import s0.implicits._
    val w = wh("whBytes")
    publishMulti(w, (0 until 40).map(i => i.toLong -> s"a$i"), 4)  // v0: 4 files
    publishMulti(w, (40 until 50).map(i => i.toLong -> s"b$i"), 2) // v1: 2 files
    val out = wh("whBytesOut"); val ckpt = wh("whBytesCkpt")
    graft.sources.v2.SnapshotMicroBatchStream.sizeFallbackRpcs.set(0)
    // Limit below any single file's size → one file per trigger via the
    // at-least-one progress rule, sized entirely off the ADD stats tokens.
    drain(w, out, ckpt, Map("maxBytesPerTrigger" -> "1"))
    assert(spark.read.parquet(out).select("id").as[Long]
      .collect().sorted.sameElements(0L until 50L))
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 6, s"expected ≥6 byte-limited batches, got $batches")
    assert(graft.sources.v2.SnapshotMicroBatchStream.sizeFallbackRpcs.get == 0,
      "byte accounting must come from the log's size tokens, not getFileStatus")
  }

  test("e2e: rate-limited change-feed stream preserves per-version integrity") {
    val s0 = spark
    import s0.implicits._
    val w = wh("whRateCdf")
    publishKv(w, Seq(1L -> "a", 2L -> "b"))                          // v0
    Merge.upsert(spark, w, "t",
      Seq(2L -> "B", 3L -> "c").toDF("id", "val"), Seq("id"))        // v1
    Merge.deleteKeys(spark, w, "t", Seq(1L).toDF("id"), Seq("id"))   // v2
    val out = wh("whRateCdfOut"); val ckpt = wh("whRateCdfCkpt")
    drain(w, out, ckpt,
      Map("readChangeFeed" -> "true", "maxFilesPerTrigger" -> "1"))
    val streamed = spark.read.parquet(out)
      .select("id", "val", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    val batch = Snapshots.changes(spark, w, "t", fromExclusive = -1L)
      .select("id", "val", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(streamed == batch,
      "rate-limited CDF must serve the identical feed, versions intact")
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 3, s"expected ≥3 rate-limited CDF batches, got $batches")
  }

  test("projection prunes to the requested columns") {
    val w = wh("whProj")
    publishKv(w, Seq(1L -> "a", 2L -> "b"))
    val out = wh("whProjOut"); val ckpt = wh("whProjCkpt")
    val q = spark.readStream.format("graft-snapshots")
      .option("warehouse", w).option("table", "t").load()
      .select("val")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.columns.sameElements(Array("val")))
    assert(got.collect().map(_.getString(0)).sorted.sameElements(Array("a", "b")))
  }
}
