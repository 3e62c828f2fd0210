package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** sf0.1 recall audit for the r22 signature change: exact all-pairs
  * Jaccard >= 0.6 ground truth (brute force over hashed shingle sets)
  * vs the LSH pipeline's output — any missing pair = lost recall. */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
    val docs = base.union(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text")))
    val sh = graft.llmops.MinHash.withShingleHashes(docs, "doc_id", "text")
      .localCheckpoint(true)
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val truth = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("j", graft.functions.ShingleExprs.jaccardSortedCol(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.6)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val got = graft.llmops.MinHash.nearDupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b")
    val missed = truth.except(got).count()
    val extra = got.except(truth).count()
    println(s"RECALL truth=${truth.count()} got=${got.count()} missed=$missed extra=$extra")
    spark.stop()
  }
}
