package graft

import java.time.{LocalDateTime, ZoneOffset}
import org.apache.spark.sql.SparkSession
import graft.ingest.{FileSelection, IngestJob, IngestSpecs}

/** CLI entry — the reference's `huckli-import` surface (main.rs:5-31)
  * re-expressed over Spark:
  *
  * {{{
  * graft.Main --input <dirOrBucketUri> --warehouse <dir> --file-type <type>
  *            [--after yyyy-MM-ddTHH:mm:ss] [--before ...] [--continue]
  *            [--file <key>] [--force] [--cpus N]
  * // warehouse maintenance (no ingest):
  * graft.Main --warehouse <dir> --compact <table> [--target-bytes N] [--sort-by c1,c2 | --zorder c1,c2]
  * graft.Main --warehouse <dir> --vacuum <keepVersions> [--retention-hours H] [--dry-run]
  * graft.Main --warehouse <dir> --restore <table> --to-version <n>
  * }}}
  *
  * `--continue` ∧ `--after` and `--file` ∧ `--before` are rejected (O4,
  * huckli-import/src/lib.rs:253-263). Timestamps are UTC.
  */
object Main {

  private def parseTs(s: String): Long =
    LocalDateTime.parse(s).toInstant(ZoneOffset.UTC).toEpochMilli

  def main(args: Array[String]): Unit = {
    val opts = scala.collection.mutable.Map[String, String]()
    var continueFlag = false
    var forceFlag = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--continue" => continueFlag = true; i += 1
        case "--force" => forceFlag = true; i += 1
        case "--dry-run" => opts("dry-run") = "true"; i += 1
        case flag if flag.startsWith("--") && i + 1 < args.length =>
          opts(flag.drop(2)) = args(i + 1); i += 2
        case flag if flag.startsWith("--") =>
          System.err.println(s"missing value for $flag"); sys.exit(2)
        case other =>
          System.err.println(s"unexpected argument: $other"); sys.exit(2)
      }
    }
    val warehouse = opts.getOrElse("warehouse", { System.err.println("--warehouse required"); sys.exit(2) })

    // Warehouse maintenance path: compaction / snapshot-log vacuum / restore.
    if (opts.contains("compact") || opts.contains("vacuum") ||
        opts.contains("restore")) {
      val cpusM = opts.getOrElse("cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      val spark = SparkSession.builder()
        .master(s"local[$cpusM]")
        .config("spark.sql.shuffle.partitions", cpusM)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        opts.get("compact").foreach { table =>
          val target = opts.get("target-bytes").map(_.toLong)
            .getOrElse(128L * 1024 * 1024)
          val sortBy = opts.get("sort-by")
            .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
          val zorderBy = opts.get("zorder")
            .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
          (if (zorderBy.nonEmpty)
             graft.ingest.Compaction.zorder(spark, warehouse, table, zorderBy, target)
           else graft.ingest.Compaction.compact(spark, warehouse, table, target,
             sortBy = sortBy)) match {
            case Some(r) =>
              println(s"compacted $table: ${r.filesBefore} -> ${r.filesAfter} files (${r.bytes} bytes)")
            case None => println(s"$table already at target granularity — no-op")
          }
        }
        opts.get("restore").foreach { table =>
          val v = opts.getOrElse("to-version",
            { System.err.println("--to-version required with --restore"); sys.exit(2) })
          val (a, r) =
            graft.ingest.Snapshots.restore(spark, warehouse, table, v.toLong)
          println(s"restored $table to version $v: +$a/-$r files")
        }
        opts.get("vacuum").foreach { keep =>
          // Default 7-day reader-retention window (Delta's default); an
          // operator who wants immediate reclaim passes --retention-hours 0.
          val minAgeMs = opts.get("retention-hours").map(_.toLong)
            .getOrElse(168L) * 3600L * 1000L
          // Distributed sweep: listing and deletion run as Spark jobs.
          // `--dry-run` previews the exact reap set, deleting nothing —
          // at scale vacuum is the most dangerous command in the surface.
          val dryRun = opts.contains("dry-run")
          val st = graft.ingest.Snapshots.vacuumStats(spark, warehouse,
            keep.toInt, minAgeMs, dryRun = dryRun)
          if (dryRun) {
            st.files.foreach { case (f, sz) => println(s"would reap: $f ($sz bytes)") }
            println(s"DRY RUN: would remove ${st.entriesRemoved} log entries, " +
              s"${st.filesDeleted} files, ${st.bytesDeleted} bytes " +
              s"(kept last $keep versions)")
          } else
            println(s"vacuumed ${st.entriesRemoved} snapshot log entries " +
              s"(kept last $keep versions; ${st.filesDeleted} files, " +
              s"${st.bytesDeleted} bytes reaped)")
        }
      } finally spark.stop()
      return
    }

    val input = opts.getOrElse("input", { System.err.println("--input required"); sys.exit(2) })
    val fileType = opts.getOrElse("file-type", { System.err.println("--file-type required"); sys.exit(2) })
    if (!IngestSpecs.registry.contains(fileType)) {
      System.err.println(s"unknown --file-type '$fileType'. Known: " +
        IngestSpecs.registry.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val selection = FileSelection(
      afterMs = opts.get("after").map(parseTs),
      beforeMs = opts.get("before").map(parseTs),
      continue = continueFlag,
      file = opts.get("file"),
      force = forceFlag)
    try selection.validate()
    catch { case e: IllegalArgumentException =>
      System.err.println(e.getMessage); sys.exit(2)
    }

    val cpus = opts.getOrElse("cpus", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // Honor a cluster master from spark-submit (`--master yarn|k8s://…`);
    // only default to local[] when none was configured — otherwise this CLI
    // could never run on the 1000-executor cluster it is designed for.
    val builder0 = SparkSession.builder()
    val builder =
      if (sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER"))
        builder0
      else builder0.master(s"local[$cpus]")
    val spark = builder
      .appName(s"graft-ingest-$fileType")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    try {
      val res = IngestJob.run(spark, input, warehouse, fileType, selection)
      println(s"processed ${res.files.size} files")
      res.rowCounts.toSeq.sorted.foreach { case (t, n) => println(f"  $t%-42s $n%d rows") }
      // single-artifact interop: refresh the DuckDB view catalog (--db analog)
      graft.types.Schemas.writeDuckDbCatalog(spark, warehouse)
    } catch {
      case e: IllegalStateException => System.err.println(e.getMessage); sys.exit(1)
    } finally spark.stop()
  }
}
