package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (name <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      val t2 = System.nanoTime()
      println(f"TIMEQ $name cold=${(t1-t0)/1e9}%.2f warm=${(t2-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
