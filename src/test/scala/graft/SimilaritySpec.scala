package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.Similarity

/** Skew-guard and recall behavior of the bucketed similarity joins. */
class SimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** N copies of the same unit vector — every row lands in the same LSH
    * bucket in every table: the worst-case skew input. */
  private def degenerate(n: Int) = {
    val s0 = spark
    import s0.implicits._
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    (0 until n).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
  }

  test("cosineNearDupPairs: maxBucket drops the degenerate bucket (bounded work)") {
    val df = degenerate(500)
    // guard triggers: the single 500-row bucket exceeds maxBucket=100, so the
    // O(bucket²)=125k-pair self-join never runs — 0 candidates, fast finish.
    val guarded = Similarity.cosineNearDupPairs(df, dim = 8, threshold = 0.9,
      numPlanes = 4, numTables = 2, maxBucket = 100)
    assert(guarded.count() == 0)
    // guard not triggered: same corpus under the limit yields all C(50,2) pairs
    val small = Similarity.cosineNearDupPairs(degenerate(50), dim = 8,
      threshold = 0.9, numPlanes = 4, numTables = 2, maxBucket = 100)
    assert(small.count() == 50L * 49 / 2)
  }

  test("lshTopK: oversized corpus buckets are dropped, query still completes") {
    val df = degenerate(300)
    val res = Similarity.lshTopK(df.filter(col("vec_id") < 2), df,
      dim = 8, k = 5, numPlanes = 4, maxBucket = 100)
    assert(res.count() == 0) // bucket of 300 > 100 → no candidates, no blowup
    val ok = Similarity.lshTopK(df.filter(col("vec_id") < 2), df,
      dim = 8, k = 5, numPlanes = 4, maxBucket = 1000)
    assert(ok.count() == 10) // 2 queries × k
  }

  test("multi-table banded-OR only adds recall; table 0 reproduces legacy buckets") {
    val s0 = spark
    import s0.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val one = Similarity.cosineNearDupPairs(
      corpus, dim = 64, threshold = 0.9, numPlanes = 6, numTables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = Similarity.cosineNearDupPairs(
      corpus, dim = 64, threshold = 0.9, numPlanes = 6, numTables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one.subsetOf(two)) // OR-construction: extra table can only add pairs
  }

  test("lshTopK probeAll scans every bucket — result identical to brute force") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 5)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val exact = asSet(Similarity.bruteForceTopK(queries, corpus, 10))
    val probed = asSet(Similarity.lshTopK(queries, corpus, dim = 64, k = 10,
      numPlanes = 4, probeAll = true))
    assert(probed == exact)
  }

  test("lshTopK approximate recall@10 >= 0.9 on a near-neighbor corpus") {
    val s0 = spark
    import s0.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = base.filter(col("vec_id") < 5)
    // Plant 10 deterministic jittered copies of each query in the corpus:
    // their cosine to the query is ~0.9999, so the true top-10 per query is
    // exactly its plants — the realistic ANN regime (neighbors genuinely
    // close, not arbitrary mid-similarity corpus rows).
    def jitter(q: Long, j: Int, i: Int): Float = {
      var z = q * 1469598103934665603L + j * 40503L + i * 31L + 17L
      z = (z ^ (z >>> 33)) * 0xFF51AFD7ED558CCDL
      ((z ^ (z >>> 33)).toDouble / Long.MaxValue.toDouble * 0.005).toFloat
    }
    val planted = queries.collect().flatMap { r =>
      val q = r.getLong(0)
      val v = r.getSeq[Float](1).toArray
      (0 until 10).map { j =>
        (2000000L + q * 100 + j, v.indices.map(i => v(i) + jitter(q, j, i)).toArray)
      }
    }.toSeq.toDF("vec_id", "embedding")
    val corpus = base.union(planted)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, corpus, 10))
    val approx = pairs(Similarity.lshTopK(queries, corpus, dim = 64, k = 10,
      numPlanes = 8, multiProbe = true))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 was $recall")
  }

  test("skew guard drops are observable, not silent") {
    val (b0, r0) = Similarity.skewGuardDropped(spark)
    val df = degenerate(300)
    val res = Similarity.lshTopK(df.filter(col("vec_id") < 2), df,
      dim = 8, k = 5, numPlanes = 4, maxBucket = 100)
    res.collect()
    val (b1, r1) = Similarity.skewGuardDropped(spark)
    assert(b1 - b0 >= 1L, s"dropped_buckets delta was ${b1 - b0}")
    assert(r1 - r0 >= 300L, s"dropped_rows delta was ${r1 - r0}")
  }

  test("autoPlanes scales with corpus size and clamps") {
    assert(Similarity.autoPlanes(100) == 4)
    assert(Similarity.autoPlanes(1024L * 1024, targetBucket = 1024) == 10)
    assert(Similarity.autoPlanes(Long.MaxValue / 4) == 24)
  }

  test("semanticDedup: NOT-EXISTS drop rule, cluster-scoped") {
    val s0 = spark
    import s0.implicits._
    // Cluster 0: ids 1,2,3 all identical (a chain) + an orthogonal id 4.
    // Cluster 1: id 5 identical to id 1 — but in another cluster, so kept.
    val u = Array(1.0f, 0.0f)
    val w = Array(0.0f, 1.0f)
    val vecs = Seq(
      (1L, u, 0L), (2L, u, 0L), (3L, u, 0L), (4L, w, 0L), (5L, u, 1L))
      .toDF("vec_id", "embedding", "cluster")
    val kept = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        "cluster", 0.95)
      .select("vec_id").as[Long].collect().sorted
    // 2 and 3 each have a smaller-id near-dup (1) → dropped, even though 2
    // is itself dropped (NOT-EXISTS, not iterative survivor matching).
    assert(kept.sameElements(Array(1L, 4L, 5L)))
  }

  test("spanDedup keeps the first (doc, span) occurrence of each span hash") {
    val s0 = spark
    import s0.implicits._
    val docs = Seq(
      1L -> "a b c d e f g h i j k l m n o p q r s t", // spans A,B
      2L -> "a b c d e f g h i j z z z z z z z z z z", // span A dup + C
      3L -> "k l m n o p q r s t").toDF("doc_id", "text") // = doc1's span B
    val res = graft.llmops.TextOps.spanDedup(docs, "doc_id", "text")
      .select("doc_id", "span_idx", "keep").as[(Long, Long, Boolean)]
      .collect().toSet
    assert(res == Set((1L, 0L, true), (1L, 1L, true),
      (2L, 0L, false), (2L, 1L, true), (3L, 0L, false)))
  }
}
