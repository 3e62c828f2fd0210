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
  private def cellCol(vec: Column, model: Model): Column =
    element_at(VectorExprs.nearestCellsCol(vec, model.flat, model.dim, 1), 1)

  /** Deterministic k-means: seeds are the k corpus vectors with the
    * smallest xxhash64(id) (reproducible, no RNG), refined by `iters`
    * Lloyd steps (assign → per-dimension mean via posexplode). */
  def train(corpus: DataFrame, dim: Int, k: Int, iters: Int = 2): Model = {
    val seeds = corpus
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy("__h").limit(k)
      .select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    var model = Model(seeds)
    for (_ <- 0 until iters) {
      val assigned = corpus.withColumn("__cell", cellCol(col("embedding"), model))
      val means = assigned
        .select(col("__cell"), posexplode(col("embedding")).as(Seq("__pos", "__v")))
        .groupBy("__cell", "__pos").agg(avg("__v").as("__m"))
        .collect()
      val next = model.centroids.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("__cell"))(r.getAs[Int]("__pos")) =
          r.getAs[Double]("__m").toFloat
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
