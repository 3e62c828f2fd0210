package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run a single SparkEntry query by name and show a sample.
  * Usage: sbt "Test/runMain graft.Probe <queryName> [sfDir]" */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    df.show(10, false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
