package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round probe: per query, 1 untimed warm-up + `reps` timed
  * runs (median + min), same checksum materializer as Bench. Optionally
  * dumps `explain("formatted")` to plans/<tag>/<query>_<tag2>.txt.
  *
  * Usage: sbt "Test/runMain graft.OptProbe [sfDir] [-reps N]
  *   [-plans <dir> <suffix>] q1 q2 ..."
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var d = "/root/testdata/sf0.1"
    var reps = 5
    var plansDir: Option[(String, String)] = None
    var stages = false
    val names = scala.collection.mutable.Buffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case a if a.startsWith("/") => d = a
        case "-reps" => reps = args(i + 1).toInt; i += 1
        case "-plans" => plansDir = Some((args(i + 1), args(i + 2))); i += 2
        case "-stages" => stages = true
        case q => names += q
      }
      i += 1
    }
    if (stages) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val ms = (for (s <- si.submissionTime; c <- si.completionTime)
            yield c - s).getOrElse(-1L)
          // RDD scope names (operator attribution) — the stage name alone is
          // an anonymous future callsite for every AQE-materialized stage.
          val ops = si.rddInfos.flatMap(_.scope)
            .map(_.name).distinct.mkString(",").take(90)
          println(f"STAGE ${si.stageId}%4d ${ms}%6dms tasks=${si.numTasks}%3d " +
            si.name.linesIterator.next().take(60) + " ops=" + ops)
        }
      })
    def mat(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, d)
      df.select(org.apache.spark.sql.functions
          .xxhash64(df.columns.map(org.apache.spark.sql.functions.col): _*).as("__h"))
        .agg(org.apache.spark.sql.functions.expr("bit_xor(__h)")).collect()
    }
    // Session-wide warm-up so the first probed query doesn't absorb startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- names) {
      try mat(name) catch { case e: Throwable =>
        System.err.println(s"OPTPROBE $name warmup FAILED: ${e.getMessage}")
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mat(name)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"OPTPROBE $name median=${times(reps / 2)}%.3f min=${times.head}%.3f " +
        times.map(t => f"$t%.2f").mkString("[", ",", "]"))
      plansDir.foreach { case (dir, suffix) =>
        val df = SparkEntry.queries(name)(spark, d)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.writeString(p.resolve(s"${name}_$suffix.txt"), txt)
      }
    }
    spark.stop()
  }
}
