package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.util.SerializableConfiguration
import graft.codec.Framing

/** Distributed frame extraction (S6–S8, S10).
  *
  * The reference streams each object, gunzips, splits into u32-BE
  * length-delimited frames, and buffers 10 files in flight
  * (huckli-s3/src/lib.rs:146-193, huckli-import/src/lib.rs:198-200).
  *
  * Spark-first: the file list becomes a Dataset partitioned across
  * executors; each task opens its files through the Hadoop FileSystem
  * (streaming — never materializing whole objects, unlike
  * `format("binaryFile")`), and yields frames lazily into the downstream
  * iterator. Parallelism is the cluster's task scheduler — the 10-files
  * `buffered` knob generalizes to #cores. Corrupt frames increment an
  * accumulator and are dropped (records fail, jobs don't).
  */
object FrameSource {

  /** One length-delimited frame + lineage (K3 file_source) and its ordinal
    * within the file (input to deterministic surrogate keys, D4). */
  case class RawFrame(file_source: String, prefix: String, file_timestamp_ms: Long,
                      frame_index: Long, bytes: Array[Byte])

  /** LPT (longest-processing-time) bin-packing: files sorted by size desc,
    * each assigned to the currently lightest of `n` buckets. Gzip objects
    * are unsplittable, so without this a couple of giant files land in one
    * task and straggle the whole stage; LPT bounds the heaviest task at
    * ≤ (ideal + largest single file). Unknown sizes (-1) count as 1 byte —
    * they degrade to round-robin-ish spread, never to one bucket. */
  private[graft] def packLpt(files: Seq[FileCatalog.FileInfo],
                             n: Int): Seq[(Int, FileCatalog.FileInfo)] = {
    val load = Array.fill(n)(0L)
    files.sortBy(f => -math.max(f.size_bytes, 1L)).map { f =>
      var best = 0
      var i = 1
      while (i < n) { if (load(i) < load(best)) best = i; i += 1 }
      load(best) += math.max(f.size_bytes, 1L)
      (best, f)
    }
  }

  def frames(spark: SparkSession, files: Seq[FileCatalog.FileInfo],
             parallelism: Int = 0): Dataset[RawFrame] = {
    implicit val enc = Encoders.product[RawFrame]
    implicit val fiEnc = Encoders.product[FileCatalog.FileInfo]
    val corrupt = spark.sparkContext.longAccumulator("graft.corrupt_frames")
    val hadoopConf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val n = if (parallelism > 0) parallelism
      else math.min(math.max(files.size, 1), spark.sparkContext.defaultParallelism)
    // Exact bucket placement needs a real partitioner (a hash repartition on
    // the bucket id would collide buckets back together).
    val packed = spark.sparkContext
      .parallelize(packLpt(files, n), math.max(1, math.min(files.size, n)))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    spark.createDataset(packed)
      .mapPartitions { it =>
        val open = new scala.collection.mutable.ArrayBuffer[java.io.Closeable]()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            open.foreach(s => scala.util.Try(s.close()))))
        it.flatMap { fi =>
          val path = new Path(fi.key)
          val fs = path.getFileSystem(hadoopConf.value)
          val raw = fs.open(path)
          open += raw
          val frameIt =
            if (fi.key.endsWith(".gz")) Framing.gzipFrames(raw, _ => corrupt.add(1))
            else Framing.frames(raw, _ => corrupt.add(1))
          var idx = -1L
          frameIt.map { b =>
            idx += 1
            RawFrame(fi.key, fi.prefix, fi.timestamp_ms, idx, b)
          } // frames are pulled lazily; streams closed by the task listener
        }
      }
  }

  /** Decode frames with per-record error tolerance (S9/S10): a throwing
    * decoder drops the record and bumps the accumulator — mirrors the
    * reference's filter_map + stderr log (huckli-import/src/lib.rs:227-235). */
  def decoded[T: org.apache.spark.sql.Encoder](frames: Dataset[RawFrame],
      decode: RawFrame => T): Dataset[T] = {
    val dropped = frames.sparkSession.sparkContext.longAccumulator("graft.decode_errors")
    frames.mapPartitions { it =>
      it.flatMap { f =>
        try Some(decode(f))
        catch {
          case e: Exception =>
            System.err.println(s"error in decoding record: ${e.getMessage}")
            dropped.add(1)
            None
        }
      }
    }
  }
}
