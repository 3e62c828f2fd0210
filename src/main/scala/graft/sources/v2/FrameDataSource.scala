package graft.sources.v2

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import graft.codec.Framing
import graft.sources.FileCatalog

/** DataSource V2 for the reference's on-bucket format: `{prefix}.{millis}.gz`
  * objects of gzip-compressed u32-BE length-delimited protobuf frames.
  *
  * {{{
  * spark.read.format("huckli-frames")
  *   .option("path", dir).option("prefix", "verified_speedtest")
  *   .option("afterMs", "...").option("beforeMs", "...")
  *   .load()   // → (file_source, prefix, file_timestamp_ms, frame_index, bytes)
  * }}}
  *
  * One input partition per file; readers stream (gunzip → frame) without
  * materializing objects. Listing + after/before pruning happen at planning
  * time on the driver (the S3 `StartAfter` analog), so pruned files cost
  * nothing. This is the cleaner packaging of FrameSource.frames that also
  * plugs into Structured Streaming's source discovery later (SURVEY §4).
  */
class FrameDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "huckli-frames"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FrameTable(properties)
}

object FrameDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("file_source", StringType, nullable = false),
    StructField("prefix", StringType, nullable = false),
    StructField("file_timestamp_ms", LongType, nullable = false),
    StructField("frame_index", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))
}

class FrameTable(properties: util.Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"huckli-frames(${properties.get("path")})"
  override def schema(): StructType = FrameDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FrameScanBuilder(options)
}

class FrameScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder
  with Scan with Batch with SupportsPushDownRequiredColumns {

  // Column pruning: a metadata-only query (e.g. frames-per-file counts) must
  // not materialize `bytes` into rows — the readers still stream the frame
  // boundaries (the row cardinality needs them) but ship only the projected
  // columns. Spark calls pruneColumns before build().
  private var requiredSchema: StructType = FrameDataSource.Schema
  override def pruneColumns(required: StructType): Unit = {
    // Preserve source field order; tolerate an empty projection (count(*)).
    val keep = required.fieldNames.toSet
    val pruned = StructType(FrameDataSource.Schema.fields.filter(f => keep(f.name)))
    requiredSchema = pruned
  }

  override def build(): Scan = this
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("option 'path' is required"))
    val prefix = Option(options.get("prefix"))
      .getOrElse(throw new IllegalArgumentException("option 'prefix' is required"))
    val after = Option(options.get("afterMs")).map(_.toLong)
    val before = Option(options.get("beforeMs")).map(_.toLong)
    FileCatalog.list(spark, path, prefix, after, before)
      .map(f => FrameInputPartition(f.key, f.prefix, f.timestamp_ms): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    FrameReaderFactory(conf, requiredSchema)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FrameMicroBatchStream(options, requiredSchema)
}

/** Offset = high-water file timestamp (epoch millis): the same monotone key
  * the reference's StartAfter checkpoint uses (huckli-s3/src/lib.rs:90-100).
  * A micro-batch is exactly the files with timestamp in (start, end]. */
case class FrameOffset(ts: Long) extends Offset {
  override def json(): String = s"""{"ts":$ts}"""
}

/** Streaming half of the `huckli-frames` source: each trigger lists only
  * keys past the stream's high-water mark (FileCatalog prunes listing
  * server-side where the store supports it) and plans one partition per new
  * file — no whole-object materialization, same streaming frame readers as
  * the batch path. Spark's own checkpointLocation persists the offset, so
  * restarts resume exactly-once without a files_processed table.
  *
  * The mark advances in-memory with every latestOffset/commit/restore, so
  * per-trigger listing cost is O(new files), not O(file history) — the first
  * trigger after a cold start (before any offset is restored) is the only
  * full listing. Caveat inherent to timestamp offsets: a file that lands
  * with a timestamp ≤ the committed mark is never picked up (the reference's
  * StartAfter checkpoint has the identical blind spot — late writers must
  * carry fresh timestamps). */
class FrameMicroBatchStream(options: CaseInsensitiveStringMap,
                            schema: StructType) extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles}
  private val spark = SparkSession.active
  private val path = Option(options.get("path"))
    .getOrElse(throw new IllegalArgumentException("option 'path' is required"))
  private val prefix = Option(options.get("prefix"))
    .getOrElse(throw new IllegalArgumentException("option 'prefix' is required"))
  private val startAfter = Option(options.get("afterMs")).map(_.toLong).getOrElse(-1L)
  // High-water mark of everything already returned/committed/restored; only
  // keys past it are listed on the next trigger.
  @volatile private var lastSeenMs: Long = startAfter

  override def initialOffset(): Offset = FrameOffset(startAfter)

  override def latestOffset(): Offset = {
    val files = FileCatalog.list(spark, path, prefix,
      afterMs = Some(lastSeenMs).filter(_ >= 0))
    files.lastOption.foreach(f => lastSeenMs = math.max(lastSeenMs, f.timestamp_ms))
    FrameOffset(lastSeenMs)
  }

  /** Delta-style per-trigger admission: `maxFilesPerTrigger` /
    * `maxBytesPerTrigger` options (both → composite; neither → all
    * available). A 100 TB bucket backfill then ingests in bounded batches
    * instead of planning its entire history as trigger one — the streaming
    * dual of the reference's bounded ingest batches. */
  override def getDefaultReadLimit: ReadLimit = {
    val mf = Option(options.get("maxFilesPerTrigger")).map(_.toInt)
    val mb = Option(options.get("maxBytesPerTrigger")).map(_.toLong)
    (mf, mb) match {
      case (Some(f), Some(b)) =>
        ReadLimit.compositeLimit(Array(ReadLimit.maxFiles(f), ReadLimit.maxBytes(b)))
      case (Some(f), None) => ReadLimit.maxFiles(f)
      case (None, Some(b)) => ReadLimit.maxBytes(b)
      case _ => ReadLimit.allAvailable()
    }
  }

  // Trigger.AvailableNow: the listing end captured ONCE at start; the run
  // drains files present then and stops, even while uploads continue.
  private var availableNowBoundMs: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    val files = FileCatalog.list(spark, path, prefix,
      afterMs = Some(lastSeenMs).filter(_ >= 0))
    availableNowBoundMs =
      Some(files.lastOption.map(_.timestamp_ms).getOrElse(lastSeenMs))
  }

  /** Rate-limited advance. The offset is a timestamp, so admission works in
    * whole SAME-MILLISECOND groups: the cut lands on the ts of the last
    * admitted file and every file sharing that ts rides along (an offset
    * cannot split a millisecond — overshoot is bounded by files-per-ms).
    * At least one group is always admitted (progress guarantee). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FrameOffset].ts
    val (maxFiles, maxBytes) = flattenLimit(limit)
    if (maxFiles.isEmpty && maxBytes.isEmpty) {
      // Unlimited: the in-memory mark keeps per-trigger listing O(new).
      val from = math.max(s, lastSeenMs)
      val files = FileCatalog.list(spark, path, prefix,
        afterMs = Some(from).filter(_ >= 0))
      var end = files.lastOption.map(_.timestamp_ms).getOrElse(from)
      availableNowBoundMs.foreach(b => end = math.min(end, b))
      end = math.max(end, s)
      lastSeenMs = math.max(lastSeenMs, end)
      FrameOffset(end)
    } else {
      // Rate-limited: list from the CONSUMED offset (pending files must be
      // re-seen to pick the next batch) — O(pending + new) per trigger,
      // shrinking as the backlog drains.
      val all = FileCatalog.list(spark, path, prefix,
        afterMs = Some(s).filter(_ >= 0))
      val bounded = availableNowBoundMs.fold(all)(b => all.filter(_.timestamp_ms <= b))
      if (bounded.isEmpty)
        FrameOffset(math.max(s, availableNowBoundMs.getOrElse(s)))
      else {
        var files = 0L; var bytes = 0L; var cut = -1L
        var done = false
        val it = bounded.iterator
        while (!done && it.hasNext) {
          val f = it.next()
          val fits = maxFiles.forall(files + 1 <= _) &&
            maxBytes.forall(bytes + f.size_bytes <= _)
          if (files == 0 || fits || f.timestamp_ms == cut) {
            files += 1; bytes += f.size_bytes; cut = f.timestamp_ms
          } else done = true
        }
        FrameOffset(cut)
      }
    }
  }

  override def reportLatestOffset(): Offset = {
    val files = FileCatalog.list(spark, path, prefix,
      afterMs = Some(lastSeenMs).filter(_ >= 0))
    FrameOffset(files.lastOption.map(_.timestamp_ms).getOrElse(lastSeenMs))
  }

  private def flattenLimit(limit: ReadLimit): (Option[Long], Option[Long]) =
    limit match {
      case c: CompositeReadLimit =>
        c.getReadLimits.map(flattenLimit).foldLeft(
          (Option.empty[Long], Option.empty[Long])) { case ((f1, b1), (f2, b2)) =>
          (Seq(f1, f2).flatten.minOption, Seq(b1, b2).flatten.minOption)
        }
      case f: ReadMaxFiles => (Some(f.maxFiles().toLong), None)
      case b: ReadMaxBytes => (None, Some(b.maxBytes()))
      case _: ReadAllAvailable => (None, None)
      case _ => (None, None)
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].ts
    val e = end.asInstanceOf[FrameOffset].ts
    FileCatalog.list(spark, path, prefix,
        afterMs = Some(s).filter(_ >= 0), beforeMs = Some(e))
      .map(f => FrameInputPartition(f.key, f.prefix, f.timestamp_ms): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    FrameReaderFactory(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()), schema)

  override def deserializeOffset(json: String): Offset = {
    val o = FrameOffset(json.filter(c => c.isDigit || c == '-').toLong)
    // Restart: seed the mark from the restored offset so the first trigger
    // doesn't relist from startAfter.
    lastSeenMs = math.max(lastSeenMs, o.ts)
    o
  }

  override def commit(end: Offset): Unit =
    lastSeenMs = math.max(lastSeenMs, end.asInstanceOf[FrameOffset].ts)

  override def stop(): Unit = ()
}

case class FrameInputPartition(key: String, prefix: String, timestampMs: Long)
  extends InputPartition

case class FrameReaderFactory(conf: SerializableConfiguration,
                              schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FramePartitionReader(partition.asInstanceOf[FrameInputPartition], conf, schema)
}

/** Emits one row per frame in the pruned column order. Frame boundaries are
  * always streamed (the row cardinality needs them) but `bytes` is only
  * referenced when projected — a pruned scan ships a few scalars per frame,
  * not the payload. */
class FramePartitionReader(p: FrameInputPartition, conf: SerializableConfiguration,
                           schema: StructType)
  extends PartitionReader[InternalRow] {

  private val stream = {
    val path = new Path(p.key)
    path.getFileSystem(conf.value).open(path)
  }
  private val frames =
    if (p.key.endsWith(".gz")) Framing.gzipFrames(stream) else Framing.frames(stream)
  private var idx = -1L
  private var current: Array[Byte] = _

  // Per-column getters resolved once (not per row / per field name).
  private val getters: Array[() => Any] = schema.fieldNames.map {
    case "file_source" => () => UTF8String.fromString(p.key)
    case "prefix" => () => UTF8String.fromString(p.prefix)
    case "file_timestamp_ms" => () => p.timestampMs
    case "frame_index" => () => idx
    case "bytes" => () => current
    case other => throw new IllegalArgumentException(s"unknown column: $other")
  }

  override def next(): Boolean =
    if (frames.hasNext) { current = frames.next(); idx += 1; true } else false

  override def get(): InternalRow =
    new GenericInternalRow(getters.map(_.apply()))

  override def close(): Unit = stream.close()
}
