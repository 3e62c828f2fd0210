package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet sinks: the 100 TB layout for time-series tables.
  *
  * Writing `.partitionBy(dateCol)` turns time-range predicates into
  * partition pruning — a `WHERE day BETWEEN a AND b` query lists only the
  * matching directories and never opens the rest (PartitionFilters in the
  * scan, verified in PartitionedSinkSpec). This is the engine-side analog of
  * the reference's S3 `StartAfter` key pruning, applied to the sink instead
  * of the source.
  */
object PartitionedSink {

  /** Append `df` partitioned by the DATE of `tsCol` (directory column
    * `p_date`). */
  def appendDaily(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Append)
      .partitionBy("p_date")
      .parquet(path)
}
