package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, xxhash64}
object Bench {
  /** Materialize every output column: checksum-aggregate instead of count()
    * so Catalyst cannot prune the projection work out of projection-shaped
    * queries (count() lets it drop every column expression). XOR-folded —
    * ANSI mode makes sum() throw on long overflow. */
  private def materialize(df: DataFrame): Unit =
    df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
      .agg(expr("bit_xor(__h)")).collect()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // The bench contract is local[32]; 4 cores quietly octuples CPU-bound
    // queries (minhash measured 64s at 4 cores vs 2.4s at 32).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // SQL statement surface (SNAPSHOT/OPTIMIZE/MERGE INTO/...): pure
      // addition — unmatched statements fall through to Spark's parser.
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      // xxhash64 over map-typed output columns (q21_json) needs the legacy
      // allowance; ordering inside the hash is irrelevant for a checksum.
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/file-index paths so the first measured query
    // doesn't absorb session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }
    // Median AND min of 3 runs per query: the median absorbs one bad run,
    // the min is the standard noise-robust estimator when co-tenant load
    // (observed up to 3× in past rounds) inflates even two of three. A
    // failed query records -1.0 (visible in the JSON) instead of a
    // plausible-looking elapsed time.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // One UNTIMED warm-up run first: identical plans re-hit Spark's
      // whole-stage-codegen source cache and the JIT'd generated classes,
      // so the timed runs measure the plan, not first-run compilation
      // (cold simhash measured ~8s vs 1.7s warm on byte-identical code).
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { materialize(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      }
      if (times.contains(-1.0)) (name, -1.0, -1.0)
      else (name, times.sorted.apply(1), times.min)
    }
    def obj(f: ((String, Double, Double)) => Double): String =
      results.map(r => s"\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalMin = results.map(_._3).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec"""" +
      s""","value_min":$totalMin,"queries":${obj(_._2)}""" +
      s""","queries_min":${obj(_._3)},"sf":"$sfDir"}"""
    println(json)
    // The stdout line drowns in sbt [info] noise (BENCH_r5/r6 both landed
    // "parsed": null) — a plain file is the parseable artifact.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json)
    spark.stop()
  }
}
