package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, input_file_name, lit, max, min}

/** Copy-on-write MERGE (upsert / delete-by-key) for TxnCommit tables — the
  * Delta `MERGE INTO` analog over the [[Snapshots]] log.
  *
  * Only files that actually contain a matching key are rewritten, and only
  * files that COULD are read: candidate files come from intersecting the
  * update keys' [min,max] with each file's log-side stats
  * ([[FileStats]] on the ADD line) — on a key-clustered table a narrow
  * merge opens a handful of files, not the table; files without stats are
  * conservatively candidates. A broadcast semi-join over just the
  * candidates then yields the affected-file list, those files are
  * rewritten with matched rows replaced, and everything lands through the
  * same stage/commit/publish protocol as ingest — snapshot readers see the
  * old version or the new one, never a half-merged table, and the
  * swapped-out originals stay on disk for `asOf` time travel until
  * [[Snapshots.vacuum]].
  *
  * Alongside the rewrite the merge stages row-level change files
  * (`_change_type` ∈ insert | update_preimage | update_postimage | delete,
  * the Delta CDF convention) under `warehouse/_changes/<table>/`; they ride
  * the same manifest (crash-safe, exactly-once) and are recorded as CDF
  * lines in the log entry, which is how [[Snapshots.changes]] serves an
  * upserted table incrementally instead of refusing.
  *
  * Scale shape: the update side is broadcast (merges are dim-sized against
  * fact-sized tables); the table side is never shuffled — candidate files
  * are read once, anti-joined, and written back with narrow tasks.
  * Unaffected files move zero bytes. Driver state is O(affected files),
  * not O(rows).
  */
object Merge {

  // Encoded-path comparison keys — the one shared contract lives in
  // [[Snapshots.pathKey]]/[[Snapshots.srcFileKey]].
  private def pathKey(file: String): String = Snapshots.pathKey(file)
  private def srcFileKey(uri: String): String = Snapshots.srcFileKey(uri)

  /** `rowsMatched`: rows of the table whose key matched the source —
    * replaced on upsert, removed on delete. `filesScanned`: stats-surviving
    * candidate files actually opened to find matches (≤ table file count;
    * the log-side skipping win is `filesScanned` ≪ total on a clustered
    * table). */
  case class Result(filesRewritten: Int, filesAdded: Int, rowsMatched: Long,
                    filesScanned: Int = 0)

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

  /** Predicate DML (`DELETE FROM t WHERE …`): rewrite only the files that
    * contain a matching row, dropping those rows; change files record the
    * deletions. Candidate files come from log-side stats intersection with
    * the predicate (same skipping as [[Snapshots.readWhere]]). */
  def deleteWhere(spark: SparkSession, warehouse: String, table: String,
                  condition: org.apache.spark.sql.Column): Result =
    rewriteWhere(spark, warehouse, table, condition, Map.empty)

  /** Predicate DML (`UPDATE t SET c = expr WHERE …`): matched rows are
    * rewritten with `assignments` applied (each value may reference the
    * row's current columns); unmatched rows and untouched files move zero
    * bytes. Change files record pre/post images. */
  def updateWhere(spark: SparkSession, warehouse: String, table: String,
                  condition: org.apache.spark.sql.Column,
                  assignments: Map[String, org.apache.spark.sql.Column]): Result = {
    require(assignments.nonEmpty, "updateWhere needs at least one assignment")
    rewriteWhere(spark, warehouse, table, condition, assignments)
  }

  /** Shared copy-on-write core for predicate delete/update. Empty
    * `assignments` = delete. */
  private def rewriteWhere(spark: SparkSession, warehouse: String, table: String,
                           condition: org.apache.spark.sql.Column,
                           assignments: Map[String, org.apache.spark.sql.Column])
      : Result = {
    import org.apache.spark.sql.functions.{coalesce => cl, not}
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = Snapshots.latestVersion(fs, warehouse)
    val meta = Snapshots.fileMeta(fs, warehouse, table).getOrElse(
      throw new IllegalStateException(
        s"no snapshot log under $warehouse — DML needs a TxnCommit table"))
    val partCols = Snapshots.partitionColumns(meta.map(_.partition))
    assignments.keys.foreach(c => require(!partCols.contains(c),
      s"updateWhere cannot reassign partition column '$c' (rows would " +
        "land in the wrong directory) — delete + append instead"))
    // Condition/assignments are expressed in LOGICAL names; files store
    // physical ones. Read through the mapping, rewrite back to physical.
    val mapping = Snapshots.columnMapping(fs, warehouse, table)
    def readFiles(fl: Seq[String]): DataFrame = {
      val df =
        if (partCols.isEmpty) spark.read.parquet(fl: _*)
        else spark.read.option("basePath", s"$warehouse/$table").parquet(fl: _*)
      mapping.fold(df)(_.applyTo(df))
    }
    // Candidates by log-side stats; affected = candidates that truly match.
    val resolved = Snapshots.read(spark, warehouse, table).filter(condition)
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
    val pred = resolved.flatMap(FileStats.fromExpression)
    def logicalStats(a: Snapshots.Action) = {
      val s = FileStats.decode(a.stats)
      mapping.fold(s)(_.statsToLogical(s))
    }
    val candidates = meta.filter(a => pred.forall(p =>
      FileStats.mayMatch(logicalStats(a), p))).map(_.file)
    // Scheme-less FULL paths, not basenames: one dynamic-partition write
    // emits the same basename into every partition dir, so a basename
    // match would drag every sibling partition's file into the rewrite.
    // Both sides compare in URL-ENCODED form (see [[pathKey]]).
    val affectedNames: Set[String] =
      if (candidates.isEmpty) Set.empty
      else readFiles(candidates).filter(condition)
        .withColumn("_src_file", input_file_name())
        .select("_src_file").distinct()
        .collect().map(r => srcFileKey(r.getString(0))).toSet
    val affected = meta.map(_.file).filter(f => affectedNames(pathKey(f)))
    if (affected.isEmpty) return Result(0, 0, 0L, candidates.size)

    val hit = readFiles(affected)
    // SQL three-valued logic: DELETE/UPDATE act only on rows where the
    // condition is TRUE; rows where it evaluates NULL (e.g. a NULL in the
    // predicate column) must SURVIVE the rewrite — `not(condition)` alone
    // is NULL for them and would silently drop them from the table.
    val matchedRows = hit.filter(condition)
    val survivors = hit.filter(cl(not(condition), lit(true)))
    val (out, changes) =
      if (assignments.isEmpty)
        (survivors, matchedRows.withColumn("_change_type", lit("delete")))
      else {
        val updated = assignments.foldLeft(matchedRows) {
          case (df, (c, e)) => df.withColumn(c, e) }
        (survivors.unionByName(updated),
          matchedRows.withColumn("_change_type", lit("update_preimage"))
            .unionByName(updated.withColumn("_change_type", lit("update_postimage"))))
      }
    commitRewrite(fs, warehouse, table, partCols, out, changes,
      affected, base, candidates.size, mapping)
  }

  /** Shared commit tail for the key-merge and predicate-DML paths: stage
    * the rewrite (+ CDF change files), observe the matched count on the
    * CDF write, and drive stage→commit→publish. The matched-row count
    * rides the CDF write as an Observation (one pre-image/delete row per
    * matched row) instead of a separate pass over the affected files;
    * both writes coalesce to the affected-file count — a predicate
    * hitting 10% of a 100 TB table must not funnel every row through one
    * writer task. */
  private def commitRewrite(fs: org.apache.hadoop.fs.FileSystem,
                            warehouse: String, table: String,
                            partCols: Seq[String], out: DataFrame,
                            changes: DataFrame, affected: Seq[String],
                            base: Option[Long], candidates: Int,
                            mapping: Option[ColumnMapping] = None): Result = {
    import org.apache.spark.sql.functions.{count, when}
    val commitId = java.util.UUID.randomUUID().toString
    val staging = s"${TxnCommit.stagingDir(warehouse, commitId)}/$table"
    val cdfStaging =
      s"${TxnCommit.stagingDir(warehouse, commitId)}/_changes/$table"
    // Rewritten data (and CDF rows) land under PHYSICAL names — renames
    // never fork the files' schema; only the META mapping moves.
    val outPhys = mapping.fold(out)(_.toPhysicalDf(out))
    val changesPhys = mapping.fold(changes)(_.toPhysicalDf(changes))
    val writer = outPhys.coalesce(math.max(1, affected.size)).write
    (if (partCols.isEmpty) writer else writer.partitionBy(partCols: _*))
      .parquet(staging)
    val obs = new org.apache.spark.sql.Observation()
    changesPhys
      .observe(obs, count(when(
        col("_change_type").isin("delete", "update_preimage"), 1))
        .as("matched"))
      .coalesce(math.max(1, affected.size)).write.parquet(cdfStaging)
    val matched = obs.get.apply("matched").asInstanceOf[Long]
    val dataMoves = TxnCommit.movesFor(fs, warehouse, commitId, table)
    val moves = dataMoves ++
      TxnCommit.movesFor(fs, warehouse, commitId, s"_changes/$table")
    TxnCommit.commit(fs, warehouse, commitId, moves, retained = affected,
      op = "merge", baseVersion = base)
    TxnCommit.publish(fs, warehouse, commitId, moves, retained = affected,
      op = "merge", baseVersion = base)
    Result(affected.size, dataMoves.size, matched, candidates)
  }

  private def merge(spark: SparkSession, warehouse: String, table: String,
                    source: DataFrame, keyCols: Seq[String],
                    insertSource: Boolean): Result = {
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // OCC guard: a merge is stale the moment ANY commit touches the table
    // after this read (an intervening append may carry matching keys).
    val base = Snapshots.latestVersion(fs, warehouse)
    val meta = Snapshots.fileMeta(fs, warehouse, table).getOrElse(
      throw new IllegalStateException(
        s"no snapshot log under $warehouse — merge needs a TxnCommit table"))
    val files = meta.map(_.file)
    // Partitioned tables: read with basePath so the partition column stays
    // in the schema (a partition-blind rewrite would drop it), and write
    // the rewrite back through the same partition layout.
    val partCols = Snapshots.partitionColumns(meta.map(_.partition))
    // Source and keyCols are LOGICAL; files are physical. Read through the
    // mapping so the join/union see one schema; the commit tail restores
    // physical names on write.
    val mapping = Snapshots.columnMapping(fs, warehouse, table)
    def readFiles(fl: Seq[String]): DataFrame = {
      val df =
        if (partCols.isEmpty) spark.read.parquet(fl: _*)
        else spark.read.option("basePath", s"$warehouse/$table").parquet(fl: _*)
      mapping.fold(df)(_.applyTo(df))
    }
    val srcKeys = source.select(keyCols.map(col): _*).distinct()

    // Candidate files by LOG-SIDE stats intersection: a file whose recorded
    // [min,max] on the leading key cannot overlap the update keys' bounds
    // cannot contain a match — skip it without opening anything. Files
    // without stats (pre-stats commits, non-leading layouts) stay
    // candidates; the residual scan below still pushes the bounds to the
    // parquet reader for row-group skipping.
    val bounds = source.agg(min(col(keyCols.head)), max(col(keyCols.head))).head
    val candidates: Seq[String] =
      if (files.isEmpty || bounds.isNullAt(0)) Nil
      else {
        val pred = FileStats.between(keyCols.head, bounds.get(0), bounds.get(1))
        meta.filter { a =>
          val s = FileStats.decode(a.stats)
          FileStats.mayMatch(mapping.fold(s)(_.statsToLogical(s)), pred)
        }.map(_.file)
      }
    // Affected files by scheme-less FULL path — basenames are NOT unique
    // across a commit's partition dirs, so a name match would rewrite
    // every sibling partition's file. Encoded-form keys (see [[pathKey]]).
    val affectedNames: Set[String] =
      if (candidates.isEmpty) Set.empty
      else readFiles(candidates)
        .filter(col(keyCols.head).between(lit(bounds.get(0)), lit(bounds.get(1))))
        .withColumn("_src_file", input_file_name())
        .join(broadcast(srcKeys), keyCols, "left_semi")
        .select("_src_file").distinct()
        .collect().map(r => srcFileKey(r.getString(0))).toSet
    val affected = files.filter(f => affectedNames(pathKey(f)))

    // Delta MERGE errors when several source rows share a key (the same
    // target row would be updated twice, nondeterministically); enforce the
    // same contract up front. Merges are dim-sized by design, so the extra
    // aggregation over the source is cheap.
    if (insertSource) {
      val dup = source.groupBy(keyCols.map(col): _*)
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("_n"))
        .filter(col("_n") > 1).limit(1).collect()
      require(dup.isEmpty, s"merge source has duplicate keys on " +
        s"(${keyCols.mkString(", ")}), e.g. ${dup.head.mkString("[", ",", "]")}" +
        " — deduplicate the source first")
    }
    // Nothing matched and nothing to insert: no commit, no empty data file.
    if (affected.isEmpty && (!insertSource || source.isEmpty))
      return Result(0, 0, 0L, candidates.size)

    // CDF volume is O(source) for key merges; the commit tail still scales
    // its write with the rewrite, and the partition columns travel as
    // ordinary data columns in CDF rows.
    val (out, changes) =
      if (affected.isEmpty) {
        (source, source.withColumn("_change_type", lit("insert")))
      } else {
        val hit = readFiles(affected)
        val preimage = hit.join(broadcast(srcKeys), keyCols, "left_semi")
        val survivors = hit.join(broadcast(srcKeys), keyCols, "left_anti")
        if (insertSource) {
          val hitKeys = preimage.select(keyCols.map(col): _*).distinct()
          val srcMatched = source.join(broadcast(hitKeys), keyCols, "left_semi")
          val srcNew = source.join(broadcast(hitKeys), keyCols, "left_anti")
          (survivors.unionByName(source),
            preimage.withColumn("_change_type", lit("update_preimage"))
              .unionByName(srcMatched.withColumn("_change_type", lit("update_postimage")))
              .unionByName(srcNew.withColumn("_change_type", lit("insert"))))
        } else
          (survivors, preimage.withColumn("_change_type", lit("delete")))
      }
    commitRewrite(fs, warehouse, table, partCols, out, changes,
      affected, base, candidates.size, mapping)
  }
}
