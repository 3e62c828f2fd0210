package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k with the (small) query side broadcast —
  * one pass over the corpus, no corpus shuffle, per-partition partial top-k
  * via the ranking window. Scale path: hyperplane-LSH bucketing so each query
  * only scores its bucket's candidates (corpus shuffled once by bucket id,
  * reusable across query batches).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, accumulated in double in
    * index order — a native one-pass expression
    * ([[graft.functions.VectorExprs.CosineSim]]); bit-identical to the
    * dot/sqrt(dot·dot) formula the DuckDB oracle uses. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  // One accumulator pair per session, shared by every guard: shows up in the
  // Spark UI as graft.skew_guard.* and is queryable via [[skewGuardDropped]].
  // (A CollectMetrics observation was tried first, but AQE's empty-relation
  // propagation prunes the observed subtree from the final plan exactly when
  // every bucket is dropped — the case the signal exists for.)
  private val guardAcc = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.SparkSession,
    (org.apache.spark.util.LongAccumulator, org.apache.spark.util.LongAccumulator)]
  private def guards(s: org.apache.spark.sql.SparkSession) =
    guardAcc.computeIfAbsent(s, s => (
      s.sparkContext.longAccumulator("graft.skew_guard.dropped_buckets"),
      s.sparkContext.longAccumulator("graft.skew_guard.dropped_rows")))

  /** Session-cumulative (bucket, row) counts the skew guards discarded —
    * monotone across actions (and, like any accumulator in a transformation,
    * can over-count under task retries: a diagnostic, not an exact ledger).
    * Non-zero growth means recall was traded for bounded work. */
  def skewGuardDropped(s: org.apache.spark.sql.SparkSession): (Long, Long) = {
    val g = guards(s)
    (g._1.value, g._2.value)
  }

  /** Skew guard shared by every bucketed candidate join: drop buckets larger
    * than maxBucket before the per-bucket join goes quadratic. Sizes come
    * from a map-side-combinable groupBy (cheaper than a count window over the
    * same key — no per-partition sort) joined back on the bucket key, which
    * co-partitions with the downstream bucket join so the exchange is reused.
    *
    * The drop is never silent: the filter on the (tiny — one row per bucket)
    * size aggregate routes through a counting predicate that feeds the
    * session's `graft.skew_guard.*` accumulators. */
  private[llmops] def dropLargeBuckets(df: DataFrame, keys: Seq[String],
                                       maxBucket: Int): DataFrame = {
    val small = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__bsz"))
      .filter(bucketKeep(df, maxBucket)(col("__bsz"))).drop("__bsz")
    df.join(small, keys)
  }

  /** The guard predicate alone, for callers that already hold the bucket
    * GROUPED (one row per bucket with a size column) and so need neither
    * the size aggregate nor the join back — same accumulator accounting. */
  private[llmops] def bucketKeep(
      df: DataFrame, maxBucket: Int): org.apache.spark.sql.expressions
        .UserDefinedFunction = {
    val (dropB, dropR) = guards(df.sparkSession)
    udf { bsz: Long =>
      val ok = bsz <= maxBucket
      if (!ok) { dropB.add(1L); dropR.add(bsz) }
      ok
    }
  }

  /** Corpus-size-aware plane count: enough hyperplanes that the *expected*
    * bucket holds ~targetBucket vectors (2^planes buckets), clamped to
    * [4, 24]. At 10^11 rows and targetBucket=1024 this yields 24 planes —
    * combine with `numTables` (banded-OR) to buy the recall back. */
  def autoPlanes(corpusRows: Long, targetBucket: Int = 1024): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, corpusRows.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(4, needed))
  }

  /** Brute-force cosine top-k: broadcast the query set against the corpus,
    * score every (query, candidate) pair, keep k per query. Ties broken by
    * candidate id after 4-dp rounding so results are engine-portable. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec")))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val scored = c.join(q, col("q_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("embedding")), 4))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "sim", "rnk")
  }

  /** Deterministic pseudo-random hyperplanes (hash-derived, no RNG state):
    * component j of plane p is a value in [-1, 1). */
  private def planeComponent(p: Int, j: Int): Double = {
    // splitmix64-style integer mix — public-domain bit mixer.
    var z = p.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-of-dot-product LSH bucket id from numPlanes hyperplanes (native
    * one-pass kernel; planes flattened row-major). `planeOffset` selects a
    * disjoint plane family so multiple independent hash tables (banded-OR)
    * can be built from the same deterministic stream; offset 0 reproduces
    * the original single-table buckets. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int, planeOffset: Int = 0): Column = {
    val planes = for (p <- planeOffset until planeOffset + numPlanes; j <- 0 until dim)
      yield planeComponent(p, j)
    graft.functions.VectorExprs.lshBucketCol(vec, planes, dim)
  }

  /** LSH-bucketed ANN top-k: corpus and queries bucketed by hyperplane
    * signs; candidates are same-bucket only (plus optional 1-bit probes).
    * Approximate — recall depends on numPlanes; rows-only checked.
    *
    * `probeAll` exhaustively probes every one of the 2^numPlanes buckets
    * (and disables the skew guard, since no candidate may be lost): the
    * probe-everything configuration is ≡ brute force — the CORRECTNESS
    * anchor for this path, exactly as nprobe=k is for IVF. Only sane with
    * small numPlanes (broadcast side is |Q|·2^numPlanes rows). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
              numPlanes: Int = 8, multiProbe: Boolean = true,
              maxBucket: Int = 100000, probeAll: Boolean = false): DataFrame = {
    // Skew guard: a degenerate corpus bucket (e.g. all-zero embeddings) would
    // otherwise make the query×bucket join O(|Q|·bucket) on one task.
    val bucketed = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), dim, numPlanes).as("bucket"))
    val cb = if (probeAll) bucketed else dropLargeBuckets(bucketed, Seq("bucket"), maxBucket)
    val qBase = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
      lshBucket(col("embedding"), dim, numPlanes).as("b0"))
    // Multi-probe: also search the numPlanes buckets at hamming distance 1.
    val qb = if (probeAll)
      qBase.select(col("q_id"), col("q_vec"),
        explode(sequence(lit(0L), lit((1L << numPlanes) - 1L))).as("bucket"))
    else if (multiProbe)
      qBase.select(col("q_id"), col("q_vec"), explode(expr(
        s"array_union(array(b0), transform(sequence(0, ${numPlanes - 1}), " +
          "i -> CAST(b0 AS BIGINT) ^ shiftleft(CAST(1 AS BIGINT), i)))")).as("bucket"))
    else qBase.select(col("q_id"), col("q_vec"), col("b0").as("bucket"))
    val scored = broadcast(qb).join(cb, Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("embedding")), 4))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "sim", "rnk")
  }

  /** Embedding-cosine near-duplicate pairs: bucketed join (same LSH bucket in
    * any of `numTables` independent hash tables — banded-OR, so more planes
    * per table can be bought back with more tables), verified by exact cosine
    * ≥ threshold. Never all-pairs; buckets larger than maxBucket are dropped
    * (skew guard — the per-bucket self-join is O(bucket²)). Size numPlanes
    * with [[autoPlanes]] for the corpus at hand. */
  def cosineNearDupPairs(df: DataFrame, dim: Int, threshold: Double,
                         numPlanes: Int = 6, numTables: Int = 2,
                         maxBucket: Int = 1000): DataFrame = {
    val tableBuckets = array((0 until numTables).map(t =>
      lshBucket(col("embedding"), dim, numPlanes, planeOffset = t * numPlanes)): _*)
    val b = df.select(col("vec_id"), col("embedding"),
        posexplode(tableBuckets).as(Seq("tbl", "bucket")))
    // Join-based pair scoring, DELIBERATELY (r21): the grouped in-row pair
    // expansion that won for MinHash/SimHash (ids and 8-byte sigs) was
    // tried here and REVERTED — with embedding payloads the per-bucket
    // pair array materializes O(bucket² · dim) floats through an
    // interpreted higher-order function, losing whole-stage codegen
    // exactly where the cosine work grows quadratically: fine at sf0.1
    // (0.64 s → 0.45 s) but 1.34 s → 3.0 s at the 10× sf1 gate, inverting
    // with scale. The self-join streams each pair's cosine inside codegen
    // and spills gracefully; it shares the bucket exchange with the guard's
    // size-aggregate join.
    val guarded = dropLargeBuckets(b, Seq("tbl", "bucket"), maxBucket)
    val l = guarded.select(col("tbl"), col("bucket"),
      col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val r = guarded.select(col("tbl"), col("bucket"),
      col("vec_id").as("id_b"), col("embedding").as("v_b"))
    l.join(r, Seq("tbl", "bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("v_a"), col("v_b")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim").distinct()
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): DROP every
    * vector that has a same-cluster neighbor with cosine ≥ `threshold` and
    * a smaller id; survivors are returned. The pairing is scoped to the
    * cluster column — at 100 TB that's a k-means cell id (e.g. from
    * [[Ivf]]'s assignment) sized so per-cell populations are bounded, and
    * the self-join is an equi-join on the cluster key: pair cost is
    * Σ cell², never corpus², and the exchange partitions by cell. The
    * drop rule is a pure NOT-EXISTS (no iteration): a vector is dropped
    * whenever ANY smaller-id near-duplicate exists, kept otherwise —
    * deterministic and oracle-checkable. */
  def semanticDedup(vecs: DataFrame, idCol: String, vecCol: String,
                    clusterCol: String, threshold: Double): DataFrame = {
    val a = vecs.select(col(clusterCol).as("_c"), col(idCol).as("_id_a"),
      col(vecCol).as("_v_a"))
    val b = vecs.select(col(clusterCol).as("_c"), col(idCol).as("_id_b"),
      col(vecCol).as("_v_b"))
    val dropped = a.join(b, "_c").filter(col("_id_b") < col("_id_a"))
      .filter(cosine(col("_v_a"), col("_v_b")) >= threshold)
      .select(col("_id_a").as(idCol)).distinct()
    vecs.join(dropped, Seq(idCol), "left_anti")
  }
}
