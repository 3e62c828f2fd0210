package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Spread a CPU-heavy per-row pipeline beyond its input's split count.
  *
  * Parquet splits at row-group boundaries, so a single-row-group file scans
  * as ONE task no matter how many cores the session has — and every per-row
  * stage fused above that scan (regex scrubbing, JSON parsing, shingling,
  * signature hashing) inherits parallelism 1. At 100 TB inputs carry
  * splits ≥ cores and this is a provable NO-OP; only the starved case pays
  * one (cheap, narrow) exchange before the expensive per-row work.
  *
  * Hash-repartitioning by a high-cardinality key is deterministic under
  * task retry (unlike round-robin, which also pays a local sort —
  * `spark.sql.execution.sortBeforeRepartition`) and row-set-preserving, so
  * results are unchanged. Generalized out of `MinHash.spread` (r21), where
  * the pattern was proven on the dedup family's signature pass.
  */
object Spread {

  /** `df` repartitioned by `key` to the session's default parallelism when
    * (and only when) its current split count is lower. */
  def toCores(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }
}
