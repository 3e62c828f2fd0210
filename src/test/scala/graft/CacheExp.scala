package graft

import org.apache.spark.sql.SparkSession

/** One-off experiment: does repeated invocation of a query accumulate
  * storage (fresh cache entries per call)? */
object CacheExp {
  def main(args: Array[String]): Unit = {
    val b0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    val spark = (if (args.contains("-ext"))
      b0.config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
    else b0).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val name = args.filterNot(_.startsWith("-"))
      .headOption.getOrElse("llm_dedup_minhash")
    def mat(): Unit = {
      val df = SparkEntry.queries(name)(spark, d)
      df.select(org.apache.spark.sql.functions
          .xxhash64(df.columns.map(org.apache.spark.sql.functions.col): _*).as("__h"))
        .agg(org.apache.spark.sql.functions.expr("bit_xor(__h)")).collect()
    }
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var t = 0L; gcBeans.forEach(b => t += b.getCollectionTime); t
    }
    for (i <- 1 to 8) {
      val g0 = gcMs
      val t0 = System.nanoTime()
      mat()
      val dt = (System.nanoTime() - t0) / 1e9
      val rdds = spark.sparkContext.getRDDStorageInfo
      val mem = rdds.map(_.memSize).sum / 1024 / 1024
      println(f"CACHEEXP rep=$i t=$dt%.2f gc=${gcMs - g0}ms cachedRdds=${rdds.length} memMB=$mem")
    }
    spark.stop()
  }
}
