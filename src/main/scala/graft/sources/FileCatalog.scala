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

  /** key + parsed metadata; timestamp is epoch millis (S2). */
  case class FileInfo(key: String, prefix: String, timestamp_ms: Long)

  // Same character-class quirk as the reference: commas are literal members.
  private val FileNameRe = raw"([a-z,\d,_]+)\.(\d+)(\.gz)?".r

  /** Parse a key (S2). Like the reference's Regex::captures this is a
    * *search*, not an anchored match — the first matching span wins. */
  def parse(key: String): Option[FileInfo] =
    FileNameRe.findFirstMatchIn(key).flatMap { m =>
      scala.util.Try(m.group(2).toLong).toOption
        .map(ts => FileInfo(key, m.group(1), ts))
    }

  /** List + prune: prefix match, `after` exclusive (S3 — StartAfter skips
    * the last processed file itself), `before` inclusive (S4). */
  def list(spark: SparkSession, dirUri: String, prefix: String,
           afterMs: Option[Long] = None, beforeMs: Option[Long] = None): Seq[FileInfo] = {
    val path = new Path(dirUri)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    fs.listStatus(path).toSeq
      .filter(_.isFile)
      .flatMap(st => parse(st.getPath.getName).map(_.copy(key = st.getPath.toString)))
      .filter(_.prefix == prefix)
      .filter(f => afterMs.forall(f.timestamp_ms > _))
      .filter(f => beforeMs.forall(f.timestamp_ms <= _))
      .sortBy(_.timestamp_ms)
  }

  /** Explicit single-file selection (S5, huckli-import/src/lib.rs:272-275).
    * The key is fully qualified through the filesystem so it matches the
    * form `list()` records in the checkpoint — otherwise the idempotent-
    * replay guard would miss `--file` re-runs of processed files. */
  def single(spark: SparkSession, key: String): Seq[FileInfo] = {
    val path = new Path(key)
    val qualified = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(path).toString
    parse(path.getName).map(_.copy(key = qualified)).toSeq
  }
}
