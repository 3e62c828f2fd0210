package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** File discovery + pruning (S1–S5).
  *
  * The reference lists S3 objects with pagination and a server-side
  * `StartAfter` key synthesized from the last processed timestamp
  * (huckli-s3/src/lib.rs:78-144); filenames are `{prefix}.{epoch_millis}[.gz]`
  * parsed with the regex `([a-z,\d,_]+)\.(\d+)(\.gz)?` (lib.rs:16), the
  * upper bound is a client-side `timestamp <= before` filter (lib.rs:140).
  *
  * Spark-first: listing happens once on the driver through the Hadoop
  * FileSystem API (works for file://, hdfs://, s3a:// — s3a paginates
  * internally, the S1 analog), pruning is a plain filter on the parsed
  * timestamp before any byte is read — the same pushdown the reference gets
  * from StartAfter, expressed as file pruning.
  */
object FileCatalog {

  /** key + parsed metadata; timestamp is epoch millis (S2). `size_bytes`
    * rides along from the listing (free — the FileStatus is in hand) and
    * feeds size-aware task packing; -1 when unknown (bare parse). */
  case class FileInfo(key: String, prefix: String, timestamp_ms: Long,
                      size_bytes: Long = -1L)

  // Same character-class quirk as the reference: commas are literal members.
  private val FileNameRe = raw"([a-z,\d,_]+)\.(\d+)(\.gz)?".r

  /** Parse a key (S2). Like the reference's Regex::captures this is a
    * *search*, not an anchored match — the first matching span wins. */
  def parse(key: String): Option[FileInfo] =
    FileNameRe.findFirstMatchIn(key).flatMap { m =>
      scala.util.Try(m.group(2).toLong).toOption
        .map(ts => FileInfo(key, m.group(1), ts))
    }

  /** Directory-name date for date-partitioned layouts (`dt=2024-01-31`,
    * `date=2024-01-31`, or bare `2024-01-31`): the UTC day's millis range. */
  private val DirDateRe = raw"(?:dt=|date=)?(\d{4})-(\d{2})-(\d{2})".r
  private[graft] def dirDayRange(name: String): Option[(Long, Long)] = name match {
    case DirDateRe(y, m, d) =>
      scala.util.Try {
        val start = java.time.LocalDate.of(y.toInt, m.toInt, d.toInt)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
        (start, start + 86400000L - 1)
      }.toOption
    case _ => None
  }

  /** List + prune: prefix match, `after` exclusive (S3 — StartAfter skips
    * the last processed file itself), `before` inclusive (S4).
    *
    * Scale shape for million-key prefixes (the StartAfter analog,
    * huckli-s3/src/lib.rs:90-100):
    *  - the listing is streamed via `listStatusIterator` (S3A pages lazily
    *    through it) instead of materializing the whole directory on the
    *    driver;
    *  - date-partitioned subdirectories (`dt=yyyy-MM-dd` and friends) are
    *    pruned at the *directory* level — days wholly outside
    *    (after, before] are never listed at all;
    *  - when the store returns keys in lexicographic order (S3, HDFS) we
    *    stop as soon as the listing moves past the `{prefix}.` block, and —
    *    when the bound and the observed keys carry equal-width epoch-millis
    *    — as soon as the key exceeds `{prefix}.{before}` (skipped keys are
    *    never even returned). An unordered FS (e.g. local) silently falls
    *    back to the full scan, still streamed.
    */
  def list(spark: SparkSession, dirUri: String, prefix: String,
           afterMs: Option[Long] = None, beforeMs: Option[Long] = None): Seq[FileInfo] = {
    val root = new Path(dirUri)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[FileInfo]
    val beforeStr = beforeMs.map(_.toString)
    // Early exit is only sound when the store contractually lists keys in
    // lexicographic order; a local directory merely *happening* to look
    // sorted so far must not be trusted (the next entry can sort earlier).
    // graft.test.assumeOrdered lets tests exercise the ordered paths on a
    // local FS (where the scheme whitelist would otherwise mask them).
    val assumeOrdered = sys.props.get("graft.test.assumeOrdered").map(_.toBoolean)
      .getOrElse(
        Set("s3a", "s3", "s3n", "hdfs", "abfs", "abfss", "gs", "wasb", "wasbs")
          .contains(fs.getScheme))
    // No entry sorting after this key can be interesting: neither a
    // `{prefix}.…` file (the \uffff bound caps the block) nor a date-named
    // subdirectory (`dt=`/`date=`/bare `yyyy-MM-dd`). Only past THIS key may
    // an ordered scan stop entirely — a file-block early exit alone must
    // keep the scan alive, because in a mixed flat+partitioned layout `dt=…`
    // dirs can sort after the prefix block (e.g. prefix `coverage_object`)
    // and their in-range files would otherwise be silently dropped.
    val scanStopKey = Seq(prefix + ".\uffff", "date=9999-99-99",
      "dt=9999-99-99", "9999-99-99").max

    def scanDir(dir: Path): Unit = {
      val it = fs.listStatusIterator(dir)
      var sortedSoFar = assumeOrdered
      var prevName: String = null
      var pastFileBlock = false // no more *files* here can match the prefix
      var done = false
      while (it.hasNext && !done) {
        val st = it.next()
        val name = st.getPath.getName
        if (prevName != null && name.compareTo(prevName) < 0) sortedSoFar = false
        prevName = name
        if (st.isDirectory) {
          // Only date-named subdirectories are entered (predictable layout);
          // a day disjoint with (after, before] is pruned without listing.
          dirDayRange(name).foreach { case (dayLo, dayHi) =>
            val live = afterMs.forall(_ < dayHi) && beforeMs.forall(_ >= dayLo)
            if (live) scanDir(st.getPath)
          }
        } else if (!(sortedSoFar && pastFileBlock)) {
          parse(name).filter(_.prefix == prefix) match {
            case Some(f) =>
              if (afterMs.forall(f.timestamp_ms > _) && beforeMs.forall(f.timestamp_ms <= _))
                out += f.copy(key = st.getPath.toString, size_bytes = st.getLen)
              // Upper-bound early stop (files only): valid while the listing
              // is ordered and the widths match (lexicographic == numeric).
              beforeStr.foreach { b =>
                if (f.timestamp_ms.toString.length == b.length && f.timestamp_ms > beforeMs.get)
                  pastFileBlock = true
              }
            case None =>
              // Ordered listings put the whole `{prefix}.` block contiguously:
              // once past it, no later *file* can match.
              if (name.compareTo(prefix + ".") > 0 && !name.startsWith(prefix + "."))
                pastFileBlock = true
          }
        }
        if (sortedSoFar && name.compareTo(scanStopKey) > 0) done = true
      }
    }
    scanDir(root)
    out.sortBy(_.timestamp_ms).toSeq
  }

  /** Explicit single-file selection (S5, huckli-import/src/lib.rs:272-275).
    * The key is fully qualified through the filesystem so it matches the
    * form `list()` records in the checkpoint — otherwise the idempotent-
    * replay guard would miss `--file` re-runs of processed files. */
  def single(spark: SparkSession, key: String): Seq[FileInfo] = {
    val path = new Path(key)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(path).toString
    val size = scala.util.Try(fs.getFileStatus(path).getLen).getOrElse(-1L)
    parse(path.getName).map(_.copy(key = qualified, size_bytes = size)).toSeq
  }
}
