package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MinHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
    val docs = base.union(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), concat(col("text"), lit(" zz")).as("text")))
    val sh = graft.llmops.MinHash.withShingles(docs, "doc_id", "text").cache()
    println("docs=" + sh.count())
    val bands = graft.llmops.MinHash.bands(graft.llmops.MinHash.signatures(sh, 32), 32, 8)
    val sizes = bands.groupBy("band", "bh").count()
    sizes.agg(max("count"), avg("count"), count(lit(1))).show(false)
    val cand = graft.llmops.MinHash.candidates(bands)
    println("candidates=" + cand.count())
    spark.stop()
  }
}
