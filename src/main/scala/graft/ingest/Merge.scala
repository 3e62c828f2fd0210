package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, input_file_name, lit, max, min}

/** Copy-on-write MERGE (upsert / delete-by-key) for TxnCommit tables — the
  * Delta `MERGE INTO` analog over the [[Snapshots]] log.
  *
  * Only files that actually contain a matching key are rewritten: a
  * broadcast semi-join of the pinned snapshot against the (small) update
  * key set yields the affected-file list, those files are rewritten with
  * matched rows replaced, and everything lands through the same
  * stage/commit/publish protocol as ingest — snapshot readers see the old
  * version or the new one, never a half-merged table, and the swapped-out
  * originals stay on disk for `asOf` time travel until [[Snapshots.vacuum]].
  *
  * Scale shape: the update side is broadcast (merges are dim-sized against
  * fact-sized tables); the table side is never shuffled — affected files are
  * read once, anti-joined, and written back with narrow tasks. Unaffected
  * files move zero bytes. Driver state is O(affected files), not O(rows).
  */
object Merge {

  /** `rowsMatched`: rows of the table whose key matched the source —
    * replaced on upsert, removed on delete. */
  case class Result(filesRewritten: Int, filesAdded: Int, rowsMatched: Long)

  /** Upsert `updates` into `table` by `keyCols`: rows whose key matches are
    * replaced, the rest of `updates` is inserted. `updates` must carry the
    * table's full schema. */
  def upsert(spark: SparkSession, warehouse: String, table: String,
             updates: DataFrame, keyCols: Seq[String]): Result =
    merge(spark, warehouse, table, updates, keyCols, insertSource = true)

  /** Delete every row of `table` whose `keyCols` tuple appears in `keys`. */
  def deleteKeys(spark: SparkSession, warehouse: String, table: String,
                 keys: DataFrame, keyCols: Seq[String]): Result =
    merge(spark, warehouse, table, keys, keyCols, insertSource = false)

  private def merge(spark: SparkSession, warehouse: String, table: String,
                    source: DataFrame, keyCols: Seq[String],
                    insertSource: Boolean): Result = {
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // OCC guard: a merge is stale the moment ANY commit touches the table
    // after this read (an intervening append may carry matching keys).
    val base = Snapshots.latestVersion(fs, warehouse)
    val pfiles = Snapshots.partitionedFiles(fs, warehouse, table).getOrElse(
      throw new IllegalStateException(
        s"no snapshot log under $warehouse — merge needs a TxnCommit table"))
    val files = pfiles.map(_._1)
    // Partitioned tables: read with basePath so the partition column stays
    // in the schema (a partition-blind rewrite would drop it), and write
    // the rewrite back through the same partition layout.
    val partCols = Snapshots.partitionColumns(pfiles.map(_._2))
    def readFiles(fl: Seq[String]): DataFrame =
      if (partCols.isEmpty) spark.read.parquet(fl: _*)
      else spark.read.option("basePath", s"$warehouse/$table").parquet(fl: _*)
    val srcKeys = source.select(keyCols.map(col): _*).distinct()

    // Affected files: commitId-prefixed part names are unique within the
    // table dir, so the name alone identifies a snapshot file (and sidesteps
    // scheme/slash differences between input_file_name() URIs and log paths).
    // The [min,max] bounds of the leading key are pushed as a scan predicate
    // first: it can't change the semi-join's answer, but it reaches the
    // parquet reader as a row-group/file stats filter — after a sorted
    // compaction on the key, a narrow merge reads only the files it could
    // possibly rewrite instead of scanning the whole table.
    val bounds = source.agg(min(col(keyCols.head)), max(col(keyCols.head))).head
    val affectedNames: Set[String] =
      if (files.isEmpty || bounds.isNullAt(0)) Set.empty
      else readFiles(files)
        .filter(col(keyCols.head).between(lit(bounds.get(0)), lit(bounds.get(1))))
        .withColumn("_src_file", input_file_name())
        .join(broadcast(srcKeys), keyCols, "left_semi")
        .select("_src_file").distinct()
        .collect().map(r => new Path(r.getString(0)).getName).toSet
    val affected = files.filter(f => affectedNames(new Path(f).getName))

    val commitId = java.util.UUID.randomUUID().toString
    val staging = s"${TxnCommit.stagingDir(warehouse, commitId)}/$table"
    var matched = 0L
    val out =
      if (affected.isEmpty) { if (insertSource) Some(source) else None }
      else {
        val hit = readFiles(affected)
        matched = hit.join(broadcast(srcKeys), keyCols, "left_semi").count()
        val survivors = hit.join(broadcast(srcKeys), keyCols, "left_anti")
        Some(if (insertSource) survivors.unionByName(source) else survivors)
      }
    out match {
      case None => Result(0, 0, 0L) // delete with no matches: no-op
      case Some(df) =>
        val writer = df.coalesce(math.max(1, affected.size)).write
        (if (partCols.isEmpty) writer else writer.partitionBy(partCols: _*))
          .parquet(staging)
        val moves = TxnCommit.movesFor(fs, warehouse, commitId, table)
        TxnCommit.commit(fs, warehouse, commitId, moves, retained = affected,
          op = "merge", baseVersion = base)
        TxnCommit.publish(fs, warehouse, commitId, moves, retained = affected,
          op = "merge", baseVersion = base)
        Result(affected.size, moves.size, matched)
    }
  }
}
