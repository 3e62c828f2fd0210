package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for exchange-free equi-joins.
  *
  * For repeated large-fact joins on the same key (orders ⋈ lineitem at
  * 100 TB), paying one bucketed write amortizes every subsequent join: both
  * sides hash-cluster into the same bucket count on the join key, so the
  * sort-merge join reads co-located buckets and the per-query shuffle
  * disappears (verified in BucketingSpec: no Exchange under the join).
  */
object Bucketing {

  /** Write `df` as a bucketed + sorted catalog table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
