package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ingest.Flatten
import graft.ingest.Tables.VerifiedSpeedtestReport
import graft.sources.FrameSource.RawFrame

/** Structured Streaming operators: watermarked windowed aggregation,
  * sessionization, custom keyed state, and a streaming variant of the
  * reference's file ingest (the natural replacement for its `--continue`
  * checkpoint loop — SURVEY §3.3: the file source + checkpointLocation give
  * exactly-once ingestion natively).
  */
object StreamingOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Tumbling-window aggregate with a watermark: late events beyond the
    * delay are dropped, windows finalize in append mode. */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding-window variant. */
  def slidingCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
                    windowLen: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))

  /** Session windows (gap-based) per user with watermark. */
  def sessionCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
                    gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("sess_start"), col("cnt"))

  case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: a running per-user counter
    * that survives across micro-batches (the arbitrary-state upgrade path
    * for logic window functions can't express). */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStat] = {
    implicit val statEnc = Encoders.product[UserStat]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(userId, 0L, 0.0))
          val (n, v) = batch.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val updated = UserStat(userId, n, math.rint(v * 100) / 100)
          state.update(updated)
          updated
      }
  }

  /** Streaming ingest of reference-format files through the `huckli-frames`
    * DSv2 source (MICRO_BATCH_READ): each trigger lists only keys past the
    * committed high-water file timestamp (the StartAfter analog), plans one
    * partition per new file, and the readers stream gunzip→frame — no
    * whole-object materialization, identical to the batch path. The stream's
    * checkpointLocation replaces the files_processed table with exactly-once
    * semantics. */
  def speedtestStream(spark: SparkSession, dir: String,
                      prefix: String = "verified_speedtest"): Dataset[VerifiedSpeedtestReport] = {
    implicit val enc = Encoders.product[VerifiedSpeedtestReport]
    implicit val rawEnc = Encoders.product[RawFrame]
    spark.readStream
      .format("huckli-frames")
      .option("path", dir)
      .option("prefix", prefix)
      .load()
      .as[RawFrame]
      .mapPartitions { it =>
        it.flatMap { raw =>
          try Some(Flatten.speedtest(raw))
          catch { case _: Exception => None } // S10: drop record, continue
        }
      }
  }
}
