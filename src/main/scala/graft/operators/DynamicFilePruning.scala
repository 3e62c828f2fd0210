package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import graft.ingest.{FileStats, Snapshots}

/** Dynamic file pruning for joins over snapshot-log tables — the dynamic
  * partition pruning analog without Hive partitions.
  *
  * Spark's own DPP prunes partition DIRECTORIES from a broadcast side's
  * values; a snapshot table's pruning unit is the FILE, keyed by the
  * per-file [min,max] stats on its ADD line. Here the broadcast (dim)
  * side's join keys are collected — they are dim-sized by definition, and
  * capped at `maxKeys` exact values with a bounds-only fallback — and
  * turned into a [[FileStats]] predicate that drops every fact file whose
  * recorded range cannot contain ANY dim key, before a single fact byte is
  * read. On a key-clustered fact table (sorted compaction / zorder) a
  * selective dim filter then plans a handful of files instead of the
  * table — at 100 TB the difference between a seek and a scan.
  *
  * Soundness: pruning only ever DROPS files that provably contain no
  * matching key (null keys never equality-join, so ignoring them is
  * exact); files without stats are conservatively kept. Results are
  * byte-identical to the unpruned join.
  */
object DynamicFilePruning {

  /** Read `factTable` pruned to files that may contain a `dimKey` value of
    * `dim`, then join (dim broadcast). `maxKeys` bounds driver traffic:
    * beyond it, pruning degrades to the keys' [min,max] envelope (one
    * range predicate) instead of the exact per-key OR. */
  def joinPruned(spark: SparkSession, warehouse: String, factTable: String,
                 factKey: String, dim: DataFrame, dimKey: String,
                 joinType: String = "inner", maxKeys: Int = 1024,
                 asOf: Option[Long] = None): DataFrame = {
    // Pruning drops UNMATCHED fact rows from the plan — only join types
    // that drop them from the RESULT too are sound (a left/full join would
    // silently lose the pruned files' outer rows).
    val factDropping = Set("inner", "leftsemi", "semi", "right", "rightouter")
    require(factDropping(joinType.toLowerCase.replace("_", "")),
      s"joinPruned is unsound for fact-preserving join type '$joinType' — " +
        "pruned files' unmatched rows would vanish from the result")
    val fact = readForKeys(spark, warehouse, factTable, factKey,
      dim.select(col(dimKey)), maxKeys, asOf)
    fact.join(broadcast(dim), fact.col(factKey) === dim.col(dimKey), joinType)
  }

  /** The pruned-read half (composable with any downstream plan): the fact
    * table with files that cannot contain any of `keys` dropped from the
    * plan via log-side stats — no footer read, no task for a pruned file. */
  def readForKeys(spark: SparkSession, warehouse: String, factTable: String,
                  factKey: String, keys: DataFrame, maxKeys: Int = 1024,
                  asOf: Option[Long] = None): DataFrame = {
    val keyCol = keys.columns.head
    val distinctKeys = keys.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .distinct()
    // Dim-sized by contract; the +1 probe detects overflow without a count.
    val head = distinctKeys.limit(maxKeys + 1).collect().map(_.get(0))
    if (head.isEmpty)
      // No keys at all: no file can match — an empty frame with the
      // table's schema (sound for every fact-dropping join type).
      Snapshots.read(spark, warehouse, factTable, asOf).limit(0)
    else {
      val pred =
        if (head.length <= maxKeys)
          head.map(v => FileStats.eq(factKey, v)).reduce(_ or _)
        else {
          val b = distinctKeys.agg(org.apache.spark.sql.functions.min(keyCol),
            org.apache.spark.sql.functions.max(keyCol)).head()
          FileStats.between(factKey, b.get(0), b.get(1))
        }
      Snapshots.read(spark, warehouse, factTable, asOf, dataFilter = pred)
    }
  }
}
