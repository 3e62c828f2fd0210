package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join/aggregation keys.
  *
  * AQE's skew-join split handles most runtime skew; salting is the plan-time
  * tool for the pathological case (one key ≫ everything, e.g. a null-ish
  * default key across 100 TB): the skewed side gets a random-ish salt in
  * [0, buckets), the other side is replicated across all salt values, and
  * the join key becomes (key, salt) — the hot key fans out over `buckets`
  * reducers instead of one.
  */
object Salting {

  /** Deterministic pseudo-salt (hash of the whole row against a counter
    * column would break joins; hashing stable row identity keeps replays
    * deterministic — pass the row's natural id). */
  def salt(idCol: Column, buckets: Int): Column =
    pmod(xxhash64(idCol), lit(buckets.toLong))

  /** Salted equi-join: `big` (skewed on keyCol) ⋈ `small` on keyCol.
    * big gets salt from idCol; small is exploded ×buckets. Result columns =
    * big.* ++ small.* (minus the duplicate key). */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 idCol: String, buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(col(idCol), buckets))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for a skewed groupBy:
    * count/sum-style aggregates only (they re-aggregate losslessly). */
  def saltedCountSum(df: DataFrame, keyCol: String, idCol: String,
                     valueCol: String, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(idCol), buckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
      .groupBy(keyCol)
      .agg(sum("__cnt").cast("long").as("cnt"), sum("__sum").as("sum_value"))
}
