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

  // RawLocalFileSystem's create() is create-then-chmod; a rival deleting
  // the object in that window makes the chmod shell-out fail — an artifact
  // real object stores don't have (no separate metadata op after a PUT).
  // Swallow exactly that case so chaos tests exercise the PROTOCOL's
  // races, not the local double's.
  override def setPermission(p: Path, permission: FsPermission): Unit =
    try super.setPermission(p, permission)
    catch { case _: java.io.IOException if !exists(p) => () }

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

/** Classic-S3A-shaped FileSystem: `create(overwrite = false)` is an
  * UNSYNCHRONIZED exists-then-create — check-then-act, NOT a conditional
  * put (two clients can both pass the exists check). The engine must
  * refuse to run its commit protocol multi-writer on such a store. */
class HeadThenPutFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("s3emu:///")

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      Thread.sleep(1) // widen the HEAD→PUT window
    }
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  }
}

/** HDFS-semantics FileSystem double: `rename` REFUSES an existing
  * destination atomically (namenode arbitration — the primitive the
  * engine's temp+rename promotion rides), and like HDFS there is no
  * cross-client conditional create beyond it. */
class HdfsLikeFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("hdfs://local")

  override def rename(src: Path, dst: Path): Boolean =
    HdfsLikeFs.renameLock.synchronized {
      if (exists(dst)) false else super.rename(src, dst)
    }
}

object HdfsLikeFs { private[graft] val renameLock = new Object }

/** RawLocalFileSystem whose lock-file METADATA reads can be switched to
  * fail persistently — the store-fault class the zombie-resolution
  * deadline exists for (every lock probe erroring, staleness unprovable). */
class FaultableLockFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("faultlock:///")
  // Directory listings (glob expansion stats every child) stay healthy —
  // the fault models DIRECT lock-object metadata probes erroring.
  private val inList = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    inList.set(true)
    try super.listStatus(f) finally inList.set(false)
  }
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    if (!inList.get() && FaultableLockFs.armed.get() &&
        f.getName.endsWith(".lock"))
      throw new java.io.IOException("injected lock metadata fault")
    super.getFileStatus(f)
  }
}
object FaultableLockFs {
  private[graft] val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
}

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
    // The double's create(overwrite=false) IS an honest conditional put
    // (JVM-lock arbitration) — vouch for it, the way an operator vouches
    // for S3 conditional writes.
    conf.setBoolean("graft.commit.atomicConditionalCreate.sloppy", true)
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

  test("graft.commit.claimGraceMs is a real deployment knob (test knob wins)") {
    // The grace was test-only; operators on mtime-fixed stores need to
    // raise it for real. Prove the production key takes effect — a stale
    // claim breaks in ~300ms, not the 60s default — and that the test
    // key keeps precedence when both are set.
    val w = wh("whGraceKnob")
    val fs = localFs
    Snapshots.append(fs, w, "g0", adds = Seq("t" -> s"$w/t/a.parquet"),
      removes = Nil)
    val lock = new Path(s"$w/_snapshots/${"%020d".format(1)}.lock")
    val out = fs.create(lock, true)
    out.write("dead".getBytes("UTF-8")); out.close()
    sys.props("graft.commit.claimGraceMs") = "300"
    try {
      val t0 = System.nanoTime()
      Snapshots.append(fs, w, "g1", adds = Seq("t" -> s"$w/t/b.parquet"),
        removes = Nil)
      val waitedMs = (System.nanoTime() - t0) / 1000000
      assert(waitedMs < 10000, s"production grace ignored (waited ${waitedMs}ms)")
      assert(Snapshots.fileSet(fs, w, "t").get.size == 2)
      // Precedence: the test knob overrides the production one.
      val lock2 = new Path(s"$w/_snapshots/${"%020d".format(2)}.lock")
      val o2 = fs.create(lock2, true)
      o2.write("dead2".getBytes("UTF-8")); o2.close()
      sys.props("graft.test.claimGraceMs") = "100"
      try {
        val t1 = System.nanoTime()
        Snapshots.append(fs, w, "g2", adds = Seq("t" -> s"$w/t/c.parquet"),
          removes = Nil)
        assert((System.nanoTime() - t1) / 1000000 < 5000)
        assert(Snapshots.fileSet(fs, w, "t").get.size == 3)
      } finally sys.props.remove("graft.test.claimGraceMs")
    } finally sys.props.remove("graft.commit.claimGraceMs")
  }

  test("readers and writers tolerate entries vanishing mid-read (zombie sweeps)") {
    // The protocol legitimately DELETES visible .snap files (a loser's
    // self-delete on a broken claim, the winner's same-version sweep): a
    // reader that listed such an entry must re-list and retry, never
    // crash with FileNotFoundException. The chaos thread plants
    // same-version rival entries and sweeps them moments later — the
    // exact lifecycle of a zombie — while readers fold continuously and
    // writers commit under a shrunk claim grace (more stale-claim breaks,
    // more self-deletes).
    val w = wh("whZombie")
    val fs = sloppyFs()
    sys.props("graft.test.claimGraceMs") = "150"
    try {
      Snapshots.append(fs, w, s"seed-${UUID.randomUUID()}",
        adds = Seq("t" -> s"$w/t/seed.parquet"), removes = Nil)
      val writers = 2
      val perWriter = 8
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writersDone = new CountDownLatch(writers)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val pool = Executors.newFixedThreadPool(writers + 3)
      (0 until writers).foreach { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            try (0 until perWriter).foreach { i =>
              try Snapshots.append(fs, w, s"zw$t-c$i-${UUID.randomUUID()}",
                adds = Seq("t" -> s"$w/t/zw$t-f$i.parquet"), removes = Nil)
              catch { case e: Throwable => failures.add(e) }
            } finally writersDone.countDown()
          }
        })
      }
      (0 until 2).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit =
            while (!stop.get()) {
              try assert(Snapshots.fileSet(fs, w, "t").exists(_.nonEmpty))
              catch { case e: Throwable => failures.add(e); stop.set(true) }
            }
        })
      }
      pool.submit(new Runnable {
        override def run(): Unit = {
          var i = 0
          while (!stop.get()) {
            try {
              // Plant a complete rival entry AT an existing version (a
              // zombie that wrote before noticing its broken claim), then
              // sweep it — readers race both transitions. The plant is
              // ATOMIC (temp + hard link, the same promotion the real
              // file:// writer uses): a real zombie's entry is complete —
              // readers must only ever observe it whole or absent, and
              // torn-visibility scenarios belong to the dedicated torn
              // tests, not this vanish-race stress.
              Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
                .lastOption.foreach { last =>
                  val p = new Path(
                    s"$w/_snapshots/${"%020d".format(last.version)}-zz$i.snap")
                  val dest = java.nio.file.Paths.get(p.toUri.getPath)
                  val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmp")
                  java.nio.file.Files.write(tmp,
                    "#OP\tappend\nADD\tzz\t/tmp/zz.parquet\t\t\n#END"
                      .getBytes("UTF-8"))
                  try java.nio.file.Files.createLink(dest, tmp)
                  finally java.nio.file.Files.deleteIfExists(tmp)
                  Thread.sleep(2)
                  fs.delete(p, false)
                }
            } catch { case _: Throwable => () }
            i += 1
            Thread.sleep(3)
          }
        }
      })
      assert(writersDone.await(120, TimeUnit.SECONDS))
      stop.set(true)
      pool.shutdown()
      assert(pool.awaitTermination(30, TimeUnit.SECONDS))
      assert(failures.isEmpty, s"race surfaced: ${failures.peek()}")
      // Cleanup any chaos entry caught mid-lifecycle, then verify the real
      // log: one entry per version, dense, every commit's file live.
      fs.globStatus(new Path(s"$w/_snapshots/*-zz*.snap"))
        .foreach(st => fs.delete(st.getPath, false))
      val deltas = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
      assert(deltas.map(_.version) ==
        (0L until (1 + writers * perWriter)).toSeq,
        s"versions: ${deltas.map(_.version)}")
      assert(Snapshots.fileSet(fs, w, "t").get.size == 1 + writers * perWriter)
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("a torn (footer-less) checkpoint is never an anchor: the fold falls back") {
    val w = wh("whTornCkpt")
    val fs = localFs
    val n = 20 // valid checkpoint lands at version 16
    (0 until n).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    // A writer died mid-checkpoint at version 18: half the state, no #END.
    val torn = new Path(s"$w/_snapshots/${"%020d".format(18)}-torn.ckpt")
    val out = fs.create(torn, true)
    out.write((0 until 9).map(i => s"ADD\tt\t$w/t/f$i.parquet\t\t")
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      // The fold must skip the torn anchor and serve the FULL state from
      // the previous (valid) checkpoint + deltas — not the truncated half.
      assert(Snapshots.fileSet(fs, w, "t").get.size == n)
      // Aged past the grace, the torn checkpoint is also SWEPT (it would
      // block a future writeCheckpoint's put-if-absent at v18 forever).
      assert(!fs.exists(torn), "aged torn checkpoint not swept")
      assert(Snapshots.fileSet(fs, w, "t").get.size == n)
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  private def tornDeltaAt(fs: FileSystem, w: String, version: Int,
                          cid: String): Path = {
    val torn = new Path(s"$w/_snapshots/${"%020d".format(version)}-$cid.snap")
    val out = fs.create(torn, true)
    out.write(s"#OP\tappend\nADD\tt\t$w/t/x$version.parquet\t\t"
      .getBytes("UTF-8"))
    out.close()
    torn
  }

  test("a torn delta: readers wait out a live writer to its completed entry") {
    val w = wh("whTornLive")
    val fs = localFs
    (0 until 3).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    // A SLOW-but-alive writer: the reader WAITS (never fails, never folds
    // the truncated state) and serves the completed entry the moment the
    // footer lands.
    val torn = tornDeltaAt(fs, w, 3, "slow")
    sys.props("graft.test.claimGraceMs") = "5000"
    try {
      val finisher = new Thread(() => {
        Thread.sleep(400)
        val out = fs.create(torn, true)
        out.write(
          s"#OP\tappend\nADD\tt\t$w/t/x3.parquet\t\t\n#END".getBytes("UTF-8"))
        out.close()
      })
      finisher.start()
      assert(Snapshots.fileSet(fs, w, "t").get.size == 4,
        "reader must serve the state the completed entry defines")
      finisher.join()
      assert(fs.exists(torn), "a completed entry must never be swept")
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("a torn delta from a provably dead writer is swept; the version is reusable") {
    val w = wh("whTornDead")
    val fs = localFs
    (0 until 3).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    val torn = tornDeltaAt(fs, w, 3, "dead")
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      Thread.sleep(250)
      assert(Snapshots.fileSet(fs, w, "t").get.size == 3)
      assert(!fs.exists(torn), "aged torn delta not swept")
      // Life goes on: the freed version is claimable again.
      Snapshots.append(fs, w, "c3", adds = Seq("t" -> s"$w/t/f3.parquet"),
        removes = Nil)
      assert(Snapshots.fileSet(fs, w, "t").get.size == 4)
      assert(Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
        .map(_.version) == Seq(0L, 1L, 2L, 3L))
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("a torn delta whose claim a LIVE RIVAL holds is left for the rival's sweep") {
    val w = wh("whTornRival")
    val fs = localFs
    (0 until 2).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    // Dead writer w0's torn residue at v2 — but the claim was already
    // broken and re-taken by live writer w1 (not yet committed).
    val torn = new Path(s"$w/_snapshots/${"%020d".format(2)}-w0.snap")
    val out = fs.create(torn, true)
    out.write(s"#OP\tappend\nADD\tt\t$w/t/x.parquet\t\t".getBytes("UTF-8"))
    out.close()
    val lock = new Path(s"$w/_snapshots/${"%020d".format(2)}.lock")
    val lo = fs.create(lock, true)
    lo.write("w1".getBytes("UTF-8")); lo.close()
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      Thread.sleep(250)
      // Sweeping would delete w1's claim and zombify its in-flight commit
      // (its post-write re-verify would self-delete a valid entry): the
      // read must fail loudly and leave BOTH files for w1's winner-sweep.
      val e = intercept[Snapshots.TornLogEntryException](
        Snapshots.fileSet(fs, w, "t"))
      assert(e.getMessage.contains("torn"), e.getMessage)
      assert(fs.exists(torn), "rival-claimed residue must not be swept")
      assert(fs.exists(lock), "a live rival's claim must never be deleted")
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("a torn residue beside the rival's COMPLETED entry sweeps without touching the claim") {
    // Dead writer w0's torn residue at v2; rival w1 broke the claim,
    // re-took it, COMMITTED its entry at v2 — then crashed in the window
    // before its winner-sweep. The residue must still self-heal (sweep
    // w0's file alone, claim untouched) or every read wedges forever on
    // a state nobody is left to clean.
    val w = wh("whTornRivalDone")
    val fs = localFs
    (0 until 2).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    val torn = tornDeltaAt(fs, w, 2, "w0")
    val done = new Path(s"$w/_snapshots/${"%020d".format(2)}-w1.snap")
    val out = fs.create(done, true)
    out.write(s"#OP\tappend\nADD\tt\t$w/t/win.parquet\t\t\n#END"
      .getBytes("UTF-8"))
    out.close()
    val lock = new Path(s"$w/_snapshots/${"%020d".format(2)}.lock")
    val lo = fs.create(lock, true)
    lo.write("w1".getBytes("UTF-8")); lo.close()
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      Thread.sleep(250)
      val files = Snapshots.fileSet(fs, w, "t").get
      assert(files.size == 3 && files.exists(_.endsWith("win.parquet")),
        files.toString)
      assert(!fs.exists(torn), "committed-rival residue not swept")
      assert(fs.exists(done), "the rival's committed entry must survive")
      assert(fs.exists(lock), "the committed rival's claim must survive")
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("TWO dead writers torn at one version both sweep (holder recursion)") {
    // w0 died mid-write; w1 broke the claim, re-took it, and died
    // mid-write TOO. The fold always trips on the lower-sorted residue
    // (w0) first, whose sweep sees a rival-held claim — it must recurse
    // into the HOLDER's own torn residue (breaking the shared claim)
    // instead of wedging forever on a state nobody is left to clean.
    val w = wh("whTornDouble")
    val fs = localFs
    (0 until 2).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    val torn0 = tornDeltaAt(fs, w, 2, "w0")
    val torn1 = tornDeltaAt(fs, w, 2, "w1")
    val lock = new Path(s"$w/_snapshots/${"%020d".format(2)}.lock")
    val lo = fs.create(lock, true)
    lo.write("w1".getBytes("UTF-8")); lo.close()
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      Thread.sleep(250)
      assert(Snapshots.fileSet(fs, w, "t").get.size == 2)
      assert(!fs.exists(torn0) && !fs.exists(torn1),
        "double-dead residue not fully swept")
      assert(!fs.exists(lock), "the dead holders' claim must break")
      // The version is reusable.
      Snapshots.append(fs, w, "c2", adds = Seq("t" -> s"$w/t/f2.parquet"),
        removes = Nil)
      assert(Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
        .map(_.version) == Seq(0L, 1L, 2L))
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  /** Turn a footer-era warehouse into a faithful pre-footer-era one:
    * strip the footer off every entry AND remove the era marker. */
  private def stripToLegacy(fs: FileSystem, w: String): Unit = {
    Snapshots.entries(fs, w).foreach { e =>
      val in = fs.open(e.path)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toString("UTF-8")
      } finally in.close()
      val stripped = bytes.linesIterator.filterNot(_ == "#END").mkString("\n")
      val out = fs.create(e.path, true)
      out.write(stripped.getBytes("UTF-8")); out.close()
    }
    fs.delete(new Path(s"$w/_snapshots/_footer_era"), false)
  }

  test("an unmigrated pre-footer-era log is NEVER swept: reads fail loudly at migrateFooters") {
    // The legacy trap: every pre-footer-era entry is footer-less and aged
    // far past the claim grace — indistinguishable, by footer alone, from
    // a dead writer's torn residue. The self-heal must refuse to treat
    // footer absence as proof without the era marker; a plain read of an
    // unmigrated warehouse must fail LOUDLY with the migration pointer and
    // delete NOTHING (sweeping here silently destroys committed data —
    // including, after a vacuum, the only anchor checkpoint forever).
    val w = wh("whLegacyTrap")
    val fs = localFs
    (0 until 20).foreach { i => // checkpoint lands at v16
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    stripToLegacy(fs, w)
    val before = Snapshots.entries(fs, w).map(_.path.getName).toSet
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      Thread.sleep(250) // age every entry past the grace
      val e = intercept[Snapshots.TornLogEntryException](
        Snapshots.fileSet(fs, w, "t"))
      assert(e.getMessage.contains("migrateFooters"), e.getMessage)
      assert(Snapshots.entries(fs, w).map(_.path.getName).toSet == before,
        "a read of an unmigrated legacy log must not delete any entry")
      // The prescribed upgrade heals everything, including the sweep gate.
      Snapshots.migrateFooters(fs, w)
      assert(Snapshots.fileSet(fs, w, "t").get.size == 20)
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("migrateFooters upgrades a pre-footer-era log in place") {
    val w = wh("whMigrate")
    val fs = localFs
    (0 until 20).foreach { i => // checkpoint lands at v16
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    val entries = Snapshots.entries(fs, w)
    stripToLegacy(fs, w)
    assert(Snapshots.migrateFooters(fs, w) == entries.size)
    assert(Snapshots.migrateFooters(fs, w) == 0, "must be idempotent")
    assert(Snapshots.fileSet(fs, w, "t").get.size == 20)
    Snapshots.append(fs, w, "post", adds = Seq("t" -> s"$w/t/g.parquet"),
      removes = Nil)
    assert(Snapshots.fileSet(fs, w, "t").get.size == 21)
  }

  test("an already-footer-complete log self-certifies on append (pre-marker or lost marker)") {
    // The r19-built-warehouse shape: every entry carries its #END footer,
    // but the log predates the `_footer_era` marker (or lost it). Without
    // self-certification the torn-residue self-heal stays disabled forever
    // and the FIRST dead writer wedges every read on a quiesced
    // migrateFooters run. A plain append must re-certify automatically.
    val w = wh("whSelfCertify")
    val fs = localFs
    (0 until 5).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    val marker = new Path(s"$w/_snapshots/_footer_era")
    fs.delete(marker, false)
    Snapshots.resetEraMemo() // fresh-JVM view of the certified warehouse
    Snapshots.append(fs, w, "post", adds = Seq("t" -> s"$w/t/g.parquet"),
      removes = Nil)
    assert(fs.exists(marker),
      "append must replant the era marker on a footer-complete log")
    // ...and the self-heal is re-armed: a dead writer's unclaimed torn
    // delta at top-of-log sweeps on read instead of failing at
    // migrateFooters.
    val top = Snapshots.entries(fs, w).map(_.version).max + 1
    val torn = new Path(s"$w/_snapshots/${"%020d".format(top)}-zzdead.snap")
    val out = fs.create(torn, true)
    out.write(s"#OP\tappend\nADD\tt\t$w/t/never.parquet\t\t".getBytes("UTF-8"))
    out.close()
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      Thread.sleep(250) // age the residue past the grace
      assert(Snapshots.fileSet(fs, w, "t").get.size == 6)
      assert(!fs.exists(torn), "aged torn residue must self-heal")
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("a footer-less (legacy) log never self-certifies on append") {
    val w = wh("whNoSelfCertify")
    val fs = localFs
    (0 until 5).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    stripToLegacy(fs, w)
    Snapshots.resetEraMemo()
    val marker = new Path(s"$w/_snapshots/_footer_era")
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      Thread.sleep(250)
      // The refusal branch itself, exercised directly (an append would
      // fail in its fold regardless — that alone would leave this branch
      // untested): footer-less entries must refuse certification.
      Snapshots.certifyFooterEra(fs, w)
      assert(!fs.exists(marker),
        "a legacy log must never self-certify without migrateFooters")
      // And a MIXED log (one footered entry atop legacy ones) must refuse
      // too — certification is all-or-nothing over the FULL listing.
      Snapshots.resetEraMemo()
      val top = Snapshots.entries(fs, w).map(_.version).max + 1
      val footered = new Path(s"$w/_snapshots/${"%020d".format(top)}-mixed.snap")
      val out = fs.create(footered, true)
      out.write(s"#OP\tappend\nADD\tt\t$w/t/m.parquet\t\t\n#END".getBytes("UTF-8"))
      out.close()
      Snapshots.certifyFooterEra(fs, w)
      assert(!fs.exists(marker),
        "a mixed legacy log must never self-certify")
      // The append path composes the same way: certification refuses, the
      // fold then trips on the legacy entries and fails loudly.
      val e = intercept[Snapshots.TornLogEntryException] {
        Snapshots.append(fs, w, "post",
          adds = Seq("t" -> s"$w/t/g.parquet"), removes = Nil)
      }
      assert(e.getMessage.contains("migrateFooters"), e.getMessage)
      assert(!fs.exists(marker),
        "a legacy log must never self-certify without migrateFooters")
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("a torn delta BELOW committed versions is never swept (no log holes)") {
    val w = wh("whTornMid")
    val fs = localFs
    (0 until 3).foreach { i =>
      Snapshots.append(fs, w, s"c$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    // Fabricate the pathological state: a torn entry at v3 with a real
    // commit at v4 stacked above it (only metadata-only commits can do
    // this in practice — adds-bearing appends fold first and trip).
    val torn = new Path(s"$w/_snapshots/${"%020d".format(3)}-torn.snap")
    val out = fs.create(torn, true)
    out.write(s"#OP\tappend\nADD\tt\t$w/t/f3.parquet\t\t".getBytes("UTF-8"))
    out.close()
    val v4 = new Path(s"$w/_snapshots/${"%020d".format(4)}-real.snap")
    val out4 = fs.create(v4, true)
    out4.write(s"#OP\tappend\nADD\tt\t$w/t/f4.parquet\t\t\n#END".getBytes("UTF-8"))
    out4.close()
    sys.props("graft.test.claimGraceMs") = "200"
    try {
      Thread.sleep(250)
      // Sweeping v3 would hide v4 from the dense-version walk — the read
      // must keep failing loudly instead of silently truncating the log.
      val e = intercept[IllegalStateException](Snapshots.fileSet(fs, w, "t"))
      assert(e.getMessage.contains("torn"), e.getMessage)
      assert(fs.exists(torn), "mid-log torn entry must never be swept")
      assert(fs.exists(v4))
    } finally sys.props.remove("graft.test.claimGraceMs")
  }

  test("vacuum, writers, and readers interleave without crashes or lost state") {
    // The maintenance mode a 100 TB warehouse actually runs in: queries
    // fold the log WHILE a vacuum truncates its history and writers keep
    // committing. Truncated entries vanish between a reader's list and
    // open — the re-list retry must serve every read from a consistent
    // post-anchor view, and no committed file may ever drop from the
    // latest state.
    val w = wh("whVacRace")
    val fs = localFs
    (0 until 40).foreach { i =>
      Snapshots.append(fs, w, s"v$i", adds = Seq("t" -> s"$w/t/f$i.parquet"),
        removes = Nil)
    }
    val writerAppends = 20
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writerDone = new CountDownLatch(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = Executors.newFixedThreadPool(4)
    pool.submit(new Runnable {
      override def run(): Unit = {
        try (0 until writerAppends).foreach { i =>
          try Snapshots.append(fs, w, s"w$i",
            adds = Seq("t" -> s"$w/t/g$i.parquet"), removes = Nil)
          catch { case e: Throwable => failures.add(e) }
        } finally writerDone.countDown()
      }
    })
    (0 until 2).foreach { _ =>
      pool.submit(new Runnable {
        override def run(): Unit =
          while (!stop.get()) {
            try assert(Snapshots.fileSet(fs, w, "t").exists(_.size >= 40))
            catch { case e: Throwable => failures.add(e); stop.set(true) }
          }
      })
    }
    pool.submit(new Runnable {
      override def run(): Unit =
        while (!stop.get()) {
          // Aggressive retention: truncate everything but the last 8
          // versions with no age shield — maximal entry-vanish pressure.
          try Snapshots.vacuum(fs, w, keepVersions = 8, minAgeMs = 0L)
          catch { case e: Throwable => failures.add(e); stop.set(true) }
          Thread.sleep(5)
        }
    })
    assert(writerDone.await(120, TimeUnit.SECONDS))
    Thread.sleep(100) // let readers/vacuum race the final tail once more
    stop.set(true)
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"race surfaced: ${failures.peek()}")
    // Every commit's file survives truncation (vacuum reaps history, not
    // live state), and the log tail still reconstructs.
    assert(Snapshots.fileSet(fs, w, "t").get.size == 40 + writerAppends)
  }

  test("schemes without a proven conditional put are refused multi-writer") {
    // Emulated classic S3A: create(overwrite=false) is HEAD-then-PUT with
    // no cross-client arbitration. The engine must refuse to commit on it
    // rather than corrupt quietly — unless the operator either vouches
    // for the store's conditional-write support or declares single-writer
    // deployment.
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("fs.s3emu.impl", classOf[HeadThenPutFs].getName)
    conf.setBoolean("fs.s3emu.impl.disable.cache", true)
    val fs = new Path("s3emu:///").getFileSystem(conf)
    val w = wh("whCondPut")
    val e = intercept[UnsupportedOperationException](
      Snapshots.append(fs, w, "c0", adds = Seq("t" -> s"$w/t/a.parquet"),
        removes = Nil))
    assert(e.getMessage.contains("s3emu"), e.getMessage)
    assert(e.getMessage.contains("singleWriter"), e.getMessage)

    // Operator vouches (the S3-conditional-writes / GCS-preconditions
    // case): multi-writer commits proceed.
    val vouchConf = new Configuration(conf)
    vouchConf.setBoolean("graft.commit.atomicConditionalCreate.s3emu", true)
    val vouched = new Path("s3emu:///").getFileSystem(vouchConf)
    Snapshots.append(vouched, w, "c1",
      adds = Seq("t" -> s"$w/t/a.parquet"), removes = Nil)

    // Single-writer declaration: the primitive's atomicity is not needed.
    val swConf = new Configuration(conf)
    swConf.setBoolean("graft.commit.singleWriter", true)
    val single = new Path("s3emu:///").getFileSystem(swConf)
    Snapshots.append(single, w, "c2",
      adds = Seq("t" -> s"$w/t/b.parquet"), removes = Nil)
    assert(Snapshots.fileSet(single, w, "t").get.size == 2)
  }

  test("HDFS binding: racing committers serialize via temp+rename and in-flight entries are never visible") {
    // The hdfs/viewfs ConditionalPut binding writes a temp name and
    // promotes by no-overwrite rename: the namenode arbitrates the race,
    // AND a reader can never open a partially-written entry under its
    // final name — so a checkpoint whose write outlives the claim grace
    // cannot be mistaken for torn residue (the mtime-fixed-at-close
    // store class). The scanner thread enforces the visibility half: any
    // readable .snap/.ckpt must already carry its #END footer.
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("fs.hdfs.impl", classOf[HdfsLikeFs].getName)
    conf.setBoolean("fs.hdfs.impl.disable.cache", true)
    val fs = new Path("hdfs://local/").getFileSystem(conf)
    val w = wh("whHdfsLike")
    val writers = 4
    val perWriter = 6
    val start = new CountDownLatch(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = Executors.newFixedThreadPool(writers + 1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    pool.submit(new Runnable {
      override def run(): Unit = while (!stop.get()) {
        try {
          fs.globStatus(new Path(s"$w/_snapshots/*.snap")).foreach { st =>
            val in = try Some(fs.open(st.getPath))
                     catch { case _: java.io.IOException => None }
            in.foreach { s =>
              val text = try {
                val buf = new java.io.ByteArrayOutputStream()
                val chunk = new Array[Byte](8192)
                var n = s.read(chunk)
                while (n >= 0) { buf.write(chunk, 0, n); n = s.read(chunk) }
                buf.toString("UTF-8")
              } finally s.close()
              if (text.nonEmpty &&
                  !text.split("\n").filter(_.nonEmpty).lastOption.contains("#END"))
                failures.add(new AssertionError(
                  s"in-flight content visible under ${st.getPath}"))
            }
          }
        } catch { case _: java.io.IOException => () } // vanished mid-scan
      }
    })
    (0 until writers).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          (0 until perWriter).foreach { i =>
            try Snapshots.append(fs, w, s"h$t-c$i-${UUID.randomUUID()}",
              adds = Seq("t" -> s"$w/t/h$t-f$i.parquet"), removes = Nil)
            catch { case e: Throwable => failures.add(e) }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    Thread.sleep(50)
    stop.set(true)
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"hdfs-binding race surfaced: ${failures.peek()}")
    val deltas = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
    assert(deltas.map(_.version) == (0L until (writers * perWriter)).toSeq,
      s"versions: ${deltas.map(_.version)}")
    assert(Snapshots.fileSet(fs, w, "t").get.size == writers * perWriter)
    // No temp residue leaks into the log dir's entry namespace.
    assert(fs.globStatus(new Path(s"$w/_snapshots/*.tmp")).isEmpty)
  }

  test("a registered ConditionalPut adapter makes a HEAD-then-PUT store commit-safe") {
    // The per-store seam: the raw store's create(overwrite=false) is
    // check-then-act (refused multi-writer, see the refusal test), but an
    // operator who registers the store's NATIVE conditional-create (S3
    // If-None-Match, GCS x-goog-if-generation-match) routes every log
    // write through it — registration itself counts as the vouch, and
    // racing committers serialize without any flag.
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("fs.s3emu.impl", classOf[HeadThenPutFs].getName)
    conf.setBoolean("fs.s3emu.impl.disable.cache", true)
    val fs = new Path("s3emu:///").getFileSystem(conf)
    val w = wh("whAdapter")
    // Emulates the service-side conditional PUT: atomic arbitration the
    // STORE provides (here a JVM lock standing in for If-None-Match).
    val adapterLock = new Object
    Snapshots.registerConditionalPut("s3emu", new Snapshots.ConditionalPut {
      def create(fs: FileSystem, dest: Path,
                 pour: java.io.OutputStream => Unit): Boolean =
        adapterLock.synchronized {
          if (fs.exists(dest)) false
          else {
            val out = fs.create(dest, true)
            try pour(out) finally out.close()
            true
          }
        }
    })
    try {
      val writers = 4
      val perWriter = 5
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(writers)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until writers).foreach { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            (0 until perWriter).foreach { i =>
              try Snapshots.append(fs, w, s"a$t-c$i-${UUID.randomUUID()}",
                adds = Seq("t" -> s"$w/t/a$t-f$i.parquet"), removes = Nil)
              catch { case e: Throwable => failures.add(e) }
            }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      assert(failures.isEmpty, s"adapter race surfaced: ${failures.peek()}")
      val deltas = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
      assert(deltas.map(_.version) == (0L until (writers * perWriter)).toSeq,
        s"versions: ${deltas.map(_.version)}")
      assert(Snapshots.fileSet(fs, w, "t").get.size == writers * perWriter)
    } finally Snapshots.unregisterConditionalPut("s3emu")
    // With the adapter gone the raw store is refused again — registration
    // was the vouch, not a permanent whitelist.
    intercept[UnsupportedOperationException](
      Snapshots.append(fs, w, "post", adds = Seq("t" -> s"$w/t/z.parquet"),
        removes = Nil))
  }

  test("zombie resolution: a lost claim re-takes and keeps the entry — no version hole") {
    // The decision table, driven deterministically through the
    // post-entry-write hook (the exact window a stale break hits).
    val w = wh("whResolve")
    val fs = localFs
    Snapshots.append(fs, w, "c0", adds = Seq("t" -> s"$w/t/a.parquet"),
      removes = Nil)
    def lockOf(v: Long) = new Path(s"$w/_snapshots/${"%020d".format(v)}.lock")
    def entryAt(v: Long, cid: String, file: String): Unit = {
      val p = new Path(s"$w/_snapshots/${"%020d".format(v)}-$cid.snap")
      val out = fs.create(p, true)
      out.write(s"#OP\tappend\nADD\tt\t$file\t\t\n#END".getBytes("UTF-8"))
      out.close()
    }
    // Case 1 — claim broken, nobody re-took it, a SUCCESSOR already
    // stacked on our late-visible entry: we must RE-TAKE and keep (the
    // old unconditional self-delete punched a permanent hole here).
    val fired1 = new java.util.concurrent.atomic.AtomicBoolean(false)
    Snapshots.testPostEntryWrite = Some { (cid, v) =>
      if (cid == "A" && fired1.compareAndSet(false, true)) {
        fs.delete(lockOf(v), false) // the out-of-band/stale break
        entryAt(v + 1, "succ", s"$w/t/succ.parquet") // successor stacked
      }
    }
    try Snapshots.append(fs, w, "A", adds = Seq("t" -> s"$w/t/A.parquet"),
      removes = Nil)
    finally Snapshots.testPostEntryWrite = None
    val after1 = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
    assert(after1.map(_.version) == Seq(0L, 1L, 2L),
      s"hole or duplicate: ${after1.map(e => (e.version, e.commitId))}")
    assert(after1.exists(e => e.version == 1L && e.commitId == "A"),
      "A must keep its entry at the contested version")
    assert(Snapshots.fileSet(fs, w, "t").get.toSet ==
      Set(s"$w/t/a.parquet", s"$w/t/A.parquet", s"$w/t/succ.parquet"))

    // Case 2 — a rival re-took the claim AND committed at our version:
    // we lose, delete our entry, and retry at a fresh version (dense).
    val fired2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    Snapshots.testPostEntryWrite = Some { (cid, v) =>
      if (cid == "B" && fired2.compareAndSet(false, true)) {
        fs.delete(lockOf(v), false)
        val out = fs.create(lockOf(v), true)
        out.write("rival".getBytes("UTF-8")); out.close()
        entryAt(v, "rival", s"$w/t/rival.parquet")
      }
    }
    try Snapshots.append(fs, w, "B", adds = Seq("t" -> s"$w/t/B.parquet"),
      removes = Nil)
    finally Snapshots.testPostEntryWrite = None
    val after2 = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
    assert(after2.map(_.version) == Seq(0L, 1L, 2L, 3L, 4L),
      s"versions: ${after2.map(e => (e.version, e.commitId))}")
    assert(after2.count(_.version == 3L) == 1 &&
      after2.find(_.version == 3L).get.commitId == "rival")
    assert(after2.find(_.version == 4L).get.commitId == "B",
      "B must retry and land above the rival")
    assert(Snapshots.fileSet(fs, w, "t").get.size == 5)

    // Case 3 — mutual zombies (both claims broken, rival entry present,
    // claim free): deterministic name tiebreak — our "C" sorts before
    // "zzz", so we re-take, win, and the winner sweep clears the rival.
    val fired3 = new java.util.concurrent.atomic.AtomicBoolean(false)
    Snapshots.testPostEntryWrite = Some { (cid, v) =>
      if (cid == "C" && fired3.compareAndSet(false, true)) {
        fs.delete(lockOf(v), false)
        entryAt(v, "zzz", s"$w/t/zzz.parquet")
      }
    }
    try Snapshots.append(fs, w, "C", adds = Seq("t" -> s"$w/t/C.parquet"),
      removes = Nil)
    finally Snapshots.testPostEntryWrite = None
    val after3 = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
    assert(after3.count(_.version == 5L) == 1 &&
      after3.find(_.version == 5L).get.commitId == "C",
      s"tiebreak winner: ${after3.map(e => (e.version, e.commitId))}")
    assert(Snapshots.fileSet(fs, w, "t").get.size == 6)
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

  test("a claim won on a stale listing never overwrites a committed version") {
    // The lost-row shape the 2000-schedule chaos soak found: A commits at
    // v and RETURNS (it owned the claim at return); the claim is then
    // broken out-of-band; B — whose listing predates A's entry becoming
    // visible — wins the freed claim for v. Without the pre-write guard B
    // writes a second entry at v and its winner sweep DELETES A's
    // returned commit. The guard must make B back off and stack above.
    val w = wh("whStaleClaim")
    val fs = localFs
    Snapshots.append(fs, w, "c0", adds = Seq("t" -> s"$w/t/a.parquet"),
      removes = Nil)
    def lockOf(v: Long) = new Path(s"$w/_snapshots/${"%020d".format(v)}.lock")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    Snapshots.testPostClaim = Some { (cid, v) =>
      if (cid == "B" && fired.compareAndSet(false, true)) {
        // Simulate A's full lifecycle landing in B's stale-listing blind
        // spot: complete entry at B's claimed version, claim broken after
        // A's return (B now holds it).
        val p = new Path(s"$w/_snapshots/${"%020d".format(v)}-A.snap")
        val out = fs.create(p, true)
        out.write(s"#OP\tappend\nADD\tt\t$w/t/A.parquet\t\t\n#END"
          .getBytes("UTF-8"))
        out.close()
      }
    }
    try Snapshots.append(fs, w, "B", adds = Seq("t" -> s"$w/t/B.parquet"),
      removes = Nil)
    finally Snapshots.testPostClaim = None
    val deltas = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
    assert(deltas.map(e => (e.version, e.commitId)) ==
      Seq((0L, "c0"), (1L, "A"), (2L, "B")),
      s"B must stack above A's committed version: " +
        s"${deltas.map(e => (e.version, e.commitId))}")
    assert(Snapshots.fileSet(fs, w, "t").get.toSet ==
      Set(s"$w/t/a.parquet", s"$w/t/A.parquet", s"$w/t/B.parquet"),
      "A's returned commit must survive B's stale claim")
    assert(!fs.exists(lockOf(1L)),
      "B must release the claim it won for the committed version")
  }

  test("persistent lock-read faults fail the commit loudly (outcome UNKNOWN), never hang") {
    // The store-fault class the zombie-resolution deadline exists for:
    // every lock metadata probe erroring after the entry write, so
    // ownership can never be proven NOR disproven. The loop must fail
    // within its progress budget with the outcome explicitly unknown —
    // not spin forever at 5 ms — and the protocol must resolve the
    // residue once the store heals.
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("fs.faultlock.impl", classOf[FaultableLockFs].getName)
    conf.setBoolean("fs.faultlock.impl.disable.cache", true)
    conf.setBoolean("graft.commit.atomicConditionalCreate.faultlock", true)
    val fs = new Path("faultlock:///").getFileSystem(conf)
    val w = wh("whLockFault")
    Snapshots.append(fs, w, "c0", adds = Seq("t" -> s"$w/t/a.parquet"),
      removes = Nil)
    sys.props("graft.test.claimGraceMs") = "100"
    Snapshots.testPostEntryWrite = Some { (cid, _) =>
      if (cid == "F") FaultableLockFs.armed.set(true)
    }
    try {
      val t0 = System.currentTimeMillis()
      val e = intercept[java.io.IOException] {
        Snapshots.append(fs, w, "F", adds = Seq("t" -> s"$w/t/f.parquet"),
          removes = Nil)
      }
      assert(e.getMessage.contains("outcome UNKNOWN"), e.getMessage)
      // Budget = 2×grace + 10 s floor, no progress to reset it: loud and
      // bounded, with generous headroom against scheduler noise.
      assert(System.currentTimeMillis() - t0 < 30000L, "deadline too slow")
    } finally {
      FaultableLockFs.armed.set(false)
      Snapshots.testPostEntryWrite = None
      sys.props.remove("graft.test.claimGraceMs")
    }
    // Store healed: the ambiguous commit in fact LANDED (entry complete,
    // claim intact — exactly why the error says unknown, not failed); the
    // next committer stacks above it and nothing wedges.
    Snapshots.append(fs, w, "post", adds = Seq("t" -> s"$w/t/b.parquet"),
      removes = Nil)
    val deltas = Snapshots.entries(fs, w).filterNot(_.isCheckpoint)
    assert(deltas.map(_.version) == Seq(0L, 1L, 2L),
      s"versions: ${deltas.map(e => (e.version, e.commitId))}")
    assert(Snapshots.fileSet(fs, w, "t").get.toSet ==
      Set(s"$w/t/a.parquet", s"$w/t/f.parquet", s"$w/t/b.parquet"))
  }
}

