package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generates a `copies`× replica of a driver fixture directory (default
  * 10× of sf0.1 ≈ sf1) for the scale-proof bench run: fact tables
  * replicate with key shifts that PRESERVE join relationships
  * (lineitem↔orders↔customer, part/supplier keys), dimension tables copy
  * verbatim, and document text is vowel-rotated per copy so the near-dup
  * pair count stays O(n) — verbatim copies would make every replica a
  * near-dup of its original and the LSH buckets quadratic, which is a
  * corpus-shape change, not a scale-up.
  *
  * Usage: Test/runMain graft.GenScale <srcSfDir> <outDir> [copies]
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // Dimensions: verbatim (a 10× fact scale keeps the dim cardinality —
    // the realistic growth shape, and what keeps q05/q07 broadcastable).
    Seq("region", "nation").foreach(t => write(read(t), t))

    /** Union `copies` shifted replicas: each `keyCol` shifts by
      * i × (its max + 1) so replica keys never collide and every
      * foreign-key relationship shifted by the SAME base stays joined. */
    def replicate(df: DataFrame, shifts: Map[String, Long],
                  extra: (DataFrame, Int) => DataFrame = (d, _) => d)
        : DataFrame =
      (0 until copies).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, base)) =>
          d.withColumn(c, col(c) + lit(base * i)) }
        extra(shifted, i)
      }.reduce(_ unionByName _)

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val orders = read("orders")
    val customer = read("customer")
    val part = read("part")
    val supplier = read("supplier")
    val lineitem = read("lineitem")
    val okBase = maxOf(orders, "o_orderkey")
    val ckBase = maxOf(customer, "c_custkey")
    val pkBase = maxOf(part, "p_partkey")
    val skBase = maxOf(supplier, "s_suppkey")

    write(replicate(customer, Map("c_custkey" -> ckBase)), "customer")
    write(replicate(part, Map("p_partkey" -> pkBase)), "part")
    write(replicate(supplier, Map("s_suppkey" -> skBase)), "supplier")
    write(replicate(orders,
      Map("o_orderkey" -> okBase, "o_custkey" -> ckBase)), "orders")
    write(replicate(lineitem, Map("l_orderkey" -> okBase,
      "l_partkey" -> pkBase, "l_suppkey" -> skBase)), "lineitem")

    // Events: new event ids AND user ids per replica — the "more users"
    // growth model. Keeping user_id would instead grow per-user density
    // 10×, which makes the user-keyed self-joins' OUTPUT quadratic in the
    // copy count (first measured run: q10_range_join 13× at 10× data) —
    // a corpus-shape change masquerading as an engine scale problem.
    val events = read("events")
    write(replicate(events, Map("event_id" -> maxOf(events, "event_id"),
      "user_id" -> maxOf(events, "user_id"))), "events")

    // Documents: fresh ids + per-copy vowel rotation so replicas are NOT
    // near-dups of their originals (shingle overlap drops far below the
    // 0.6 Jaccard threshold) — pair counts scale with the injected-dup
    // design, not quadratically with copies.
    val docs = read("documents")
    val vowelTargets = Array("aeiou", "eioua", "iouae", "ouaei", "uaeio")
    write(replicate(docs, Map("doc_id" -> maxOf(docs, "doc_id")),
      extra = (d, i) => if (i == 0) d
        else d.withColumn("text",
          translate(col("text"), "aeiou", vowelTargets(i % 5)))), "documents")

    // Embeddings: fresh vector ids, vectors verbatim (duplicate vectors
    // are fine for ANN/similarity throughput — distance work is O(n)).
    val emb = read("embeddings")
    write(replicate(emb, Map("vec_id" -> maxOf(emb, "vec_id"))),
      "embeddings")

    println(s"[genscale] wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
