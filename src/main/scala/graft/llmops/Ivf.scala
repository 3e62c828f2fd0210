package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorExprs

/** IVF (inverted-file) approximate nearest neighbour: a coarse k-means
  * quantizer partitions the corpus into k cells; a query scores only the
  * `nprobe` nearest cells' members (nprobe = k degenerates to exact search —
  * the oracle-checkable configuration).
  *
  * Scale shape: training collects only the k×dim centroid model to the
  * driver (model parameters, not data); assignment is a native one-pass
  * argmax-cosine kernel ([[VectorExprs.NearestCells]]) over the broadcast
  * flattened centroid matrix — O(k·dim) machine ops per row, viable at the
  * k≈4096 a 100 TB corpus needs; search is an equi-join on cell id — the
  * corpus is shuffled once by cell and reusable across query batches.
  * Everything else stays distributed.
  */
object Ivf {

  case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
    def dim: Int = centroids.head.length
    /** Row-major flattening for the native kernel (broadcast once per plan). */
    lazy val flat: Array[Float] = {
      val out = new Array[Float](k * dim)
      var i = 0
      while (i < k) { System.arraycopy(centroids(i), 0, out, i * dim, dim); i += 1 }
      out
    }
  }

  /** Nearest-centroid id (argmax cosine, deterministic tie-break on id). */
  private[llmops] def cellCol(vec: Column, model: Model): Column =
    element_at(VectorExprs.nearestCellsCol(vec, model.flat, model.dim, 1), 1)

  /** Tag each row with its nearest-centroid cell id — assignment only, no
    * repartition (callers that persist the assignment choose their own file
    * clustering, e.g. [[IvfStore]]'s range-by-cell layout). */
  def assign(df: DataFrame, model: Model, vecCol: String = "embedding"): DataFrame =
    df.withColumn("cell", cellCol(col(vecCol), model))

  /** Deterministic k-means: seeds are the k corpus vectors with the
    * smallest xxhash64(id) (reproducible, no RNG), refined by `iters` Lloyd
    * steps. Each step is ONE shuffle-free treeAggregate over the corpus
    * (assignment via the native kernel, per-cell (sum, count) folded
    * map-side, merged in a tree) — the earlier per-dimension posexplode
    * mean shuffled corpus×dim rows per iteration; only the k×dim model
    * statistics ever reach the driver. */
  def train(corpus: DataFrame, dim: Int, k: Int, iters: Int = 2): Model = {
    val seeds = corpus
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy("__h").limit(k)
      .select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    var model = Model(seeds)
    for (_ <- 0 until iters) {
      val assigned = corpus
        .select(cellCol(col("embedding"), model).as("__cell"), col("embedding"))
      val (sums, counts) = assigned.rdd
        .map(r => (r.getInt(0), r.getAs[scala.collection.Seq[Float]](1)))
        .treeAggregate((Array.ofDim[Double](k, dim), new Array[Long](k)))(
          { case ((s, c), (cell, vec)) =>
            val row = s(cell)
            val n = math.min(dim, vec.length)
            var j = 0
            while (j < n) { row(j) += vec(j); j += 1 }
            c(cell) += 1
            (s, c)
          },
          { case ((s1, c1), (s2, c2)) =>
            var i = 0
            while (i < k) {
              val a = s1(i); val b = s2(i)
              var j = 0
              while (j < dim) { a(j) += b(j); j += 1 }
              c1(i) += c2(i); i += 1
            }
            (s1, c1)
          })
      val next = model.centroids.zipWithIndex.map { case (old, i) =>
        if (counts(i) == 0) old.clone() // empty cell keeps its centroid
        else {
          val m = new Array[Float](dim)
          var j = 0
          while (j < dim) { m(j) = (sums(i)(j) / counts(i)).toFloat; j += 1 }
          m
        }
      }
      model = Model(next)
    }
    model
  }

  /** Train-once cache keyed by the caller (e.g. data dir + k): repeated
    * query/bench invocations reuse the centroid model instead of re-running
    * Lloyd iterations — the model is parameters, not data, so caching it on
    * the driver is safe at any corpus scale. */
  private val modelCache = new java.util.concurrent.ConcurrentHashMap[String, Model]()
  def trainCached(corpus: DataFrame, cacheKey: String, dim: Int, k: Int,
                  iters: Int = 2): Model =
    modelCache.computeIfAbsent(s"$cacheKey#d=$dim#k=$k#i=$iters",
      _ => train(corpus, dim, k, iters))

  /** Index the corpus: one shuffle by cell id; persist/reuse across query
    * batches. */
  def index(corpus: DataFrame, model: Model): DataFrame =
    corpus.withColumn("cell", cellCol(col("embedding"), model))
      .repartition(col("cell"))

  /** ANN top-k: each query probes its `nprobe` nearest cells; candidates are
    * same-cell corpus rows only. nprobe = model.k scans every cell → exact. */
  def topK(queries: DataFrame, indexed: DataFrame, model: Model,
           k: Int, nprobe: Int = 2): DataFrame = {
    val qb = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("cell",
        explode(VectorExprs.nearestCellsCol(col("q_vec"), model.flat, model.dim, nprobe)))
    val scored = broadcast(qb).join(indexed, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim", round(VectorExprs.cosineSim(col("q_vec"), col("embedding")), 4))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "vec_id", "sim", "rnk")
  }
}
