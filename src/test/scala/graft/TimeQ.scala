package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.allowHashOnMapType", "true")
    // Any absolute-path argument overrides the fixture dir (sf1 probes).
    val d = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    // Same checksum materializer as Bench — count() lets Catalyst prune
    // column work and under-times projection-shaped queries.
    def mat(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, d)
      df.select(org.apache.spark.sql.functions
          .xxhash64(df.columns.map(org.apache.spark.sql.functions.col): _*).as("__h"))
        .agg(org.apache.spark.sql.functions.expr("bit_xor(__h)")).collect()
    }
    for (name <- args.filterNot(_.startsWith("/"))) {
      val t0 = System.nanoTime()
      mat(name)
      val t1 = System.nanoTime()
      mat(name)
      val t2 = System.nanoTime()
      println(f"TIMEQ $name cold=${(t1-t0)/1e9}%.2f warm=${(t2-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
