package graft

import java.net.URI
import java.nio.file.Files
import java.util.UUID
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Snapshots

/** A deliberately object-store-shaped FileSystem: `rename` is a slow
  * copy-then-delete (NOT atomic — a concurrent reader can observe a partial
  * destination), while `create(overwrite = false)` is an honest conditional
  * put (atomic within the JVM), which is exactly the primitive real object
  * stores offer. The snapshot commit protocol must serialize on the
  * conditional put alone. */
class SloppyRenameFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("sloppy:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src)
    val d = pathToFile(dst)
    if (!s.exists()) return false
    if (s.isDirectory) return super.rename(src, dst)
    d.getParentFile.mkdirs()
    val bytes = java.nio.file.Files.readAllBytes(s.toPath)
    val out = new java.io.FileOutputStream(d)
    try {
      var i = 0
      while (i < bytes.length) { // byte-at-a-time: maximally non-atomic
        out.write(bytes(i)); i += 1
        if (i % 64 == 0) Thread.sleep(0, 1000)
      }
    } finally out.close()
    s.delete()
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    if (overwrite) super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    else SloppyRenameFs.createLock.synchronized {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      super.create(f, permission, true, bufferSize, replication, blockSize,
        progress)
    }
}

object SloppyRenameFs { private[graft] val createLock = new Object }

class CommitProtocolSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val dir = Files.createTempDirectory("graft-commitproto")
  private def wh(name: String) = dir.resolve(name).toString
  private def localFs = new Path(dir.toString)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sloppyFs(): FileSystem = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("fs.sloppy.impl", classOf[SloppyRenameFs].getName)
    conf.setBoolean("fs.sloppy.impl.disable.cache", true)
    new Path("sloppy:///").getFileSystem(conf)
  }

  test("racing committers serialize through put-if-absent despite non-atomic rename") {
    val w = wh("whRace")
    val fs = sloppyFs()
    val writers = 4
    val perWriter = 6
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          (0 until perWriter).foreach { i =>
            try Snapshots.append(fs, w, s"w$t-c$i-${UUID.randomUUID()}",
              adds = Seq("t" -> s"$w/t/w$t-f$i.parquet"), removes = Nil)
            catch { case e: Throwable => failures.add(e) }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"append threw: ${failures.peek()}")
    val entries = Snapshots.entries(fs, w)
    val deltas = entries.filterNot(_.isCheckpoint)
    // No version lost, none duplicated: exactly one entry per version,
    // versions dense from 0.
    assert(deltas.map(_.version) == (0L until (writers * perWriter)).toSeq,
      s"versions: ${deltas.map(_.version)}")
    // Every commit's file is reachable in the final state.
    val state = Snapshots.fileSet(fs, w, "t").get
    assert(state.size == writers * perWriter)
  }

  test("a stale claim (claimant died before its entry) is broken, not wedged") {
    val w = wh("whStale")
    val fs = localFs
    Snapshots.append(fs, w, "c0", adds = Seq("t" -> s"$w/t/a.parquet"),
      removes = Nil)
    // Simulate a claimant that died between claim and entry: version 1's
    // lock exists, no entry ever comes.
    val lock = new Path(s"$w/_snapshots/${"%020d".format(1)}.lock")
    val out = fs.create(lock, true)
    out.write("dead-commit".getBytes("UTF-8")); out.close()
    sys.props("graft.test.claimGraceMs") = "300"
    try {
      Snapshots.append(fs, w, "c1", adds = Seq("t" -> s"$w/t/b.parquet"),
        removes = Nil)
    } finally sys.props.remove("graft.test.claimGraceMs")
    val deltas = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
    assert(deltas.map(_.version) == Seq(0L, 1L))
    assert(deltas.last.commitId == "c1")
    assert(Snapshots.fileSet(fs, w, "t").get.toSet ==
      Set(s"$w/t/a.parquet", s"$w/t/b.parquet"))
  }

  test("snapshot reconstruction reads O(CheckpointInterval) log files, not O(history)") {
    val w = wh("whAnchor")
    val fs = localFs
    val n = 40 // checkpoints land at versions 16 and 32
    (0 until n).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    Snapshots.logReads.set(0)
    val files = Snapshots.fileSet(fs, w, "t").get
    assert(files.size == n)
    val reads = Snapshots.logReads.get()
    // Anchor checkpoint (v32) + the 7 deltas after it + the v32 delta
    // re-applied; far below the 40 entries a naive fold would read.
    assert(reads <= Snapshots.CheckpointInterval + 4,
      s"reconstruction read $reads log files for $n commits")
  }
}
