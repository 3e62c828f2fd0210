package graft.ingest

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only snapshot log over [[TxnCommit]] — the read-side dual of the
  * manifest commit (minimal Delta/Iceberg-style, no extra jars).
  *
  * Every published transaction appends ONE log entry
  * `warehouse/_snapshots/<version>-<commitId>.snap` whose lines are
  * `ADD\t<table>\t<path>` / `REMOVE\t<table>\t<path>`. The entry lands via
  * tmp-write + atomic rename, so a snapshot version flips into existence
  * all-or-nothing; the table state at version V is fold(adds − removes) over
  * entries with version ≤ V.
  *
  * This closes the reader race the live-directory `read.parquet(dir)` has: a
  * reader that resolved version N keeps seeing exactly N's file set while any
  * number of later commits land (the file list is pinned at plan time), and
  * `asOf = N` time-travels back as long as N's files haven't been vacuumed.
  * The reference sidesteps all of this with a single-writer DuckDB file
  * (huckli-db/src/lib.rs:8-30); at 100 TB the log is the standard answer.
  *
  * Scale notes: one tiny log file per commit (no O(files) rewrite), state
  * reconstruction is a driver-side fold over log entries (bounded by commit
  * count, compactable the Delta-checkpoint way if ever needed), and the read
  * plans from an explicit file list — no directory listing at all.
  */
object Snapshots {

  case class Entry(version: Long, commitId: String, path: Path)
  case class Action(add: Boolean, table: String, file: String)

  private def snapDir(warehouse: String) = new Path(s"$warehouse/_snapshots")

  private val SnapRe = raw"(\d{20})-(.+)\.snap".r

  /** All log entries, oldest first ((version, commitId) order keeps two
    * racing writers that picked the same version deterministic). */
  def entries(fs: FileSystem, warehouse: String): Seq[Entry] = {
    val dir = snapDir(warehouse)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case SnapRe(v, cid) => Some(Entry(v.toLong, cid, st.getPath))
        case _ => None
      }
    }.sortBy(e => (e.version, e.commitId))
  }

  def latestVersion(fs: FileSystem, warehouse: String): Option[Long] =
    entries(fs, warehouse).lastOption.map(_.version)

  private def readActions(fs: FileSystem, p: Path): Seq[Action] = {
    val in = fs.open(p)
    val text =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    text.split("\n").toSeq.filter(_.nonEmpty).map { line =>
      val Array(op, table, file) = line.split("\t", 3)
      Action(op == "ADD", table, file)
    }
  }

  /** Append the log entry for a published commit. Idempotent by commitId
    * (recovery re-runs publish): an existing `*-<commitId>.snap` wins. The
    * version is max+1; two concurrent writers landing the same version is
    * tolerated — the commitId suffix keeps the filenames (and rename
    * atomicity) distinct and replay order deterministic. */
  def append(fs: FileSystem, warehouse: String, commitId: String,
             adds: Seq[(String, String)], removes: Seq[(String, String)]): Unit = {
    val existing = entries(fs, warehouse)
    if (existing.exists(_.commitId == commitId)) return
    val version = existing.lastOption.map(_.version + 1).getOrElse(0L)
    val dir = snapDir(warehouse)
    fs.mkdirs(dir)
    val name = f"$version%020d-$commitId.snap"
    val tmp = new Path(dir, name + ".tmp")
    val fin = new Path(dir, name)
    val lines =
      adds.map { case (t, f) => s"ADD\t$t\t$f" } ++
        removes.map { case (t, f) => s"REMOVE\t$t\t$f" }
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, fin))
      throw new IllegalStateException(s"snapshot append failed for $commitId")
  }

  /** The exact committed file set of `table` at `asOf` (default: latest).
    * None when the warehouse has no snapshot log at all. */
  def fileSet(fs: FileSystem, warehouse: String, table: String,
              asOf: Option[Long] = None): Option[Seq[String]] = {
    val all = entries(fs, warehouse)
    if (all.isEmpty) return None
    val visible = asOf.fold(all)(v => all.filter(_.version <= v))
    val files = scala.collection.mutable.LinkedHashSet.empty[String]
    visible.foreach { e =>
      readActions(fs, e.path).foreach { a =>
        if (a.table == table) { if (a.add) files += a.file else files -= a.file }
      }
    }
    Some(files.toSeq)
  }

  /** Snapshot-isolated read: plan from the pinned file list of the resolved
    * version — concurrent publishes (and compactions) are invisible, and
    * `asOf` reads any retained historical version. Throws if the table has no
    * committed files at that version (schema would be unknowable). */
  def read(spark: SparkSession, warehouse: String, table: String,
           asOf: Option[Long] = None): DataFrame = {
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fileSet(fs, warehouse, table, asOf)
      .getOrElse(throw new IllegalStateException(
        s"no snapshot log under $warehouse — was this table committed via TxnCommit?"))
    require(files.nonEmpty,
      s"table '$table' has no committed files at version ${asOf.getOrElse("latest")}")
    spark.read.parquet(files: _*)
  }
}
