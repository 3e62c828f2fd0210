package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import graft.ingest.{Snapshots, TxnCommit}

/** Native Structured Streaming SINK for the snapshot log — the write-side
  * dual of [[SnapshotMicroBatchStream]]:
  *
  * {{{
  * df.writeStream.format("graft-snapshots")
  *   .option("warehouse", wh).option("table", "t")
  *   .option("checkpointLocation", ckpt)
  *   .start()
  * }}}
  *
  * Exactly-once without foreachBatch: executors stage one parquet file per
  * task under the commit's staging dir, and the driver-side `commit(epoch)`
  * publishes them through [[TxnCommit]] under a commitId derived from
  * (queryId, table, epochId). A crash-replayed epoch re-stages, finds its
  * commitId already in the log, and drops the restaged files — the same
  * idempotence contract as `StreamingOps.commitBatch`, now wired into the
  * engine so user code never sees a batchId.
  *
  * Only moves listed in the WriterCommitMessages are published: a failed or
  * speculative task attempt's orphan file is never moved (publish drops the
  * whole staging dir afterwards), so at-most-one attempt's output lands —
  * message-based moves, not directory listing.
  *
  * Scale shape: writers stream rows straight into parquet (row-group
  * buffering only), the commit is O(files-in-epoch) driver work, and
  * readers flip to the new version atomically via the log. Schema and
  * constraint enforcement ride `TxnCommit.commit` like every other writer,
  * so a stream cannot drift a table's schema. Flat primitive schemas only —
  * the same surface the streaming reader serves. Append output mode only
  * (a log is append-only; complete/update modes are rejected by Spark
  * because this sink does not implement truncate).
  */
class SnapshotWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite = {
      SnapshotDataSource.validate(info.schema())
      new SnapshotStreamingWrite(info.queryId(), info.schema(), info.options())
    }
  }
}

private[v2] object SnapshotStreamingWrite {
  /** The epoch's idempotence key: stable across crash-replays of the same
    * checkpoint (queryId persists in checkpoint metadata), distinct across
    * sinks feeding different tables of one warehouse. */
  def commitId(queryId: String, table: String, epochId: Long): String =
    s"stream-$queryId-$table-$epochId"
}

class SnapshotStreamingWrite(queryId: String, schema: StructType,
                             options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
  extends StreamingWrite {

  private val warehouse = SnapshotDataSource.required(options, "warehouse")
  private val table = SnapshotDataSource.required(options, "table")
  private def spark = SparkSession.active
  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    SnapshotWriterFactory(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()),
      schema, warehouse, table, queryId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val cid = SnapshotStreamingWrite.commitId(queryId, table, epochId)
    TxnCommit.recover(fs, warehouse) // finish any crashed publish first
    if (Snapshots.entries(fs, warehouse).exists(_.commitId == cid)) {
      // Crash-replayed epoch: already published — drop the restaged files.
      fs.delete(new Path(TxnCommit.stagingDir(warehouse, cid)), true)
      return
    }
    val staged = messages.collect {
      case m: SnapshotWriteMessage if m.path != null => m.path }
    if (staged.isEmpty) { // empty micro-batch: no version, no log noise
      fs.delete(new Path(TxnCommit.stagingDir(warehouse, cid)), true)
      return
    }
    val moves = staged.toSeq.map(src => TxnCommit.Move(src,
      s"$warehouse/$table/$cid-${new Path(src).getName}"))
    TxnCommit.commit(fs, warehouse, cid, moves)
    TxnCommit.publish(fs, warehouse, cid, moves)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    // Pre-manifest staging is dead state (the commit point never passed);
    // recovery would also sweep it, but clean up eagerly.
    fs.delete(new Path(TxnCommit.stagingDir(warehouse,
      SnapshotStreamingWrite.commitId(queryId, table, epochId))), true)
}

case class SnapshotWriterFactory(conf: SerializableConfiguration,
                                 schema: StructType, warehouse: String,
                                 table: String, queryId: String)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val cid = SnapshotStreamingWrite.commitId(queryId, table, epochId)
    // taskId in the name keeps retried attempts collision-free; only the
    // committed attempt's message reaches the driver.
    new SnapshotDataWriter(conf.value, schema,
      s"${TxnCommit.stagingDir(warehouse, cid)}/$table/" +
        s"part-$partitionId-$taskId.parquet")
  }
}

/** The committed file's staging path (null for a zero-row writer — nothing
  * to publish) plus its row count, for observability. */
case class SnapshotWriteMessage(path: String, rows: Long)
  extends WriterCommitMessage

/** Streams InternalRows into one staged parquet file via the parquet-mr
  * Group API (no Spark datasource re-entry inside a DSv2 writer) — the
  * exact write-side mirror of [[SnapshotPartitionReader]]'s decode table. */
class SnapshotDataWriter(conf: Configuration, schema: StructType, path: String)
  extends DataWriter[InternalRow] {

  private val messageType: MessageType = SnapshotDataWriter.parquetType(schema)
  private val writer = ExampleParquetWriter
    .builder(HadoopOutputFile.fromPath(new Path(path), conf))
    .withType(messageType)
    .withConf(conf)
    .withCompressionCodec(CompressionCodecName.SNAPPY)
    .build()
  private val factory = new SimpleGroupFactory(messageType)
  private var rows = 0L

  // One setter per column, resolved once (mirrors the reader's getters).
  private val setters: Array[(Group, InternalRow) => Unit] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val set: (Group, InternalRow) => Unit = f.dataType match {
        case LongType => (g, r) => g.add(i, r.getLong(i))
        case IntegerType => (g, r) => g.add(i, r.getInt(i))
        case DoubleType => (g, r) => g.add(i, r.getDouble(i))
        case FloatType => (g, r) => g.add(i, r.getFloat(i))
        case BooleanType => (g, r) => g.add(i, r.getBoolean(i))
        case StringType => (g, r) =>
          g.add(i, Binary.fromConstantByteArray(r.getUTF8String(i).getBytes))
        case BinaryType => (g, r) =>
          g.add(i, Binary.fromConstantByteArray(r.getBinary(i)))
        case DateType => (g, r) => g.add(i, r.getInt(i))       // days
        case TimestampType => (g, r) => g.add(i, r.getLong(i)) // micros
        case dt => throw new UnsupportedOperationException(
          s"column '${f.name}': cannot encode Spark $dt to parquet")
      }
      set
    }

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < setters.length) {
      if (!row.isNullAt(i)) setters(i)(g, row)
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    // A zero-row file has nothing to publish; it dies with the staging dir.
    SnapshotWriteMessage(if (rows == 0) null else path, rows)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    try {
      val p = new Path(path)
      p.getFileSystem(conf).delete(p, false)
    } catch { case _: Throwable => () }
  }

  override def close(): Unit = ()
}

private[v2] object SnapshotDataWriter {
  /** Flat primitive Spark schema → parquet MessageType, matching the types
    * [[SnapshotPartitionReader]] and Spark's own vectorized reader decode. */
  def parquetType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val fb = f.dataType match {
        case LongType => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType =>
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(BINARY)
        case DateType =>
          Types.optional(INT32).as(LogicalTypeAnnotation.dateType())
        case TimestampType => Types.optional(INT64).as(
          LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case dt => throw new UnsupportedOperationException(
          s"column '${f.name}': unsupported sink type $dt")
      }
      b.addField(fb.named(f.name))
    }
    b.named("spark_schema")
  }
}
