package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Product quantization (PQ): each vector is split into `m` contiguous
  * subspaces and every subspace quantized to one of `ksub` learned
  * sub-centroids — a dim-float embedding becomes `m` BYTES (dim=64,
  * m=8 → 8 bytes vs 256, a 32× posting-table shrink). Composed with the
  * IVF coarse quantizer ([[IvfStore]]'s PQ tables) this is the classic
  * IVF-PQ layout: the memory/IO path that keeps a 100 TB corpus's index
  * scannable — candidates are scored from codes alone
  * ([[VectorExprs.PqCosine]], query full-precision, candidate
  * reconstructed on the fly), and only the per-query shortlist is
  * re-ranked against true vectors.
  *
  * This implementation quantizes RAW vectors (not per-cell residuals):
  * residual encoding buys recall at equal code size but couples every
  * code to its coarse cell (a centroid rebuild invalidates all codes and
  * cross-cell probes must re-encode per cell); with the exact re-rank
  * pass downstream, raw-vector codes only have to get the SHORTLIST
  * right, which the recall gate (PqSpec) pins.
  *
  * Scale shape mirrors [[Ivf]]: training moves only the m×ksub×dsub
  * codebook to the driver (parameters, not data) via one shuffle-free
  * treeAggregate per Lloyd step; encode/score are single-pass native
  * kernels inside whole-stage codegen.
  */
object Pq {

  /** `codebooks` row-major [subspace][code][component], the layout
    * [[VectorExprs.pqEncode]]/[[VectorExprs.pqCosine]] consume. */
  case class Model(dim: Int, m: Int, ksub: Int, codebooks: Array[Float]) {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub <= 256, s"ksub=$ksub must fit one byte per subspace")
    def dsub: Int = dim / m
    /** Squared norm of every sub-centroid — a model constant the O(m)
      * LUT scorer folds in instead of re-deriving per candidate. */
    lazy val subNorms: Array[Double] = {
      val out = new Array[Double](m * ksub)
      var cell = 0
      while (cell < m * ksub) {
        val off = cell * dsub
        var s = 0.0
        var i = 0
        while (i < dsub) { val y = codebooks(off + i).toDouble; s += y * y; i += 1 }
        out(cell) = s
        cell += 1
      }
      out
    }
  }

  def encodeCol(vec: Column, model: Model): Column =
    VectorExprs.pqEncodeCol(vec, model.codebooks, model.m, model.ksub, model.dsub)

  def adcCosineCol(qVec: Column, code: Column, model: Model): Column =
    VectorExprs.pqCosineCol(qVec, code, model.codebooks, model.m, model.ksub,
      model.dsub)

  /** Per-query ADC table: compute once on the (small) query side, score
    * candidates with [[lutScoreCol]] in O(m) lookups each. */
  def lutCol(qVec: Column, model: Model): Column =
    VectorExprs.pqLutCol(qVec, model.codebooks, model.m, model.ksub, model.dsub)

  def lutScoreCol(lut: Column, code: Column, model: Model): Column =
    VectorExprs.pqLutScoreCol(lut, code, model.subNorms, model.m, model.ksub)

  /** Deterministic per-subspace k-means, all `m` subspaces in one
    * aggregate: seeds are the ksub corpus vectors with the smallest
    * xxhash64(id) (each contributing its slice to every subspace's
    * codebook — reproducible, no RNG), refined by `iters` Lloyd steps.
    * Each step encodes rows against the current codebooks with the native
    * kernel and folds per-(subspace, code) (sum, count) map-side; only
    * m×ksub×dsub statistics reach the driver. */
  def train(corpus: DataFrame, dim: Int, m: Int, ksub: Int,
            iters: Int = 3): Model = {
    val dsub = dim / m
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val seeds = corpus
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy("__h").limit(ksub)
      .select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    require(seeds.length == ksub,
      s"PQ training needs at least ksub=$ksub corpus vectors, got ${seeds.length}")
    val init = new Array[Float](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var k0 = 0
      while (k0 < ksub) {
        val v = seeds(k0)
        var i = 0
        while (i < dsub) {
          val idx = j * dsub + i
          init((j * ksub + k0) * dsub + i) = if (idx < v.length) v(idx) else 0f
          i += 1
        }
        k0 += 1
      }
      j += 1
    }
    var model = Model(dim, m, ksub, init)
    for (_ <- 0 until iters) {
      val cb = model.codebooks
      val encoded = corpus.select(
        encodeCol(col("embedding"), model).as("__code"), col("embedding"))
      val (sums, counts) = encoded.rdd
        .map(r => (r.getAs[Array[Byte]](0),
          r.getAs[scala.collection.Seq[Float]](1)))
        .treeAggregate((new Array[Double](m * ksub * dsub),
          new Array[Long](m * ksub)))(
          { case ((s, c), (code, vec)) =>
            var jj = 0
            while (jj < m) {
              val k0 = code(jj) & 0xff
              val off = (jj * ksub + k0) * dsub
              var i = 0
              while (i < dsub) {
                val idx = jj * dsub + i
                s(off + i) += (if (idx < vec.length) vec(idx).toDouble else 0.0)
                i += 1
              }
              c(jj * ksub + k0) += 1
              jj += 1
            }
            (s, c)
          },
          { case ((s1, c1), (s2, c2)) =>
            var i = 0
            while (i < s1.length) { s1(i) += s2(i); i += 1 }
            i = 0
            while (i < c1.length) { c1(i) += c2(i); i += 1 }
            (s1, c1)
          })
      val next = new Array[Float](m * ksub * dsub)
      var cell = 0
      while (cell < m * ksub) {
        val off = cell * dsub
        var i = 0
        while (i < dsub) {
          next(off + i) =
            if (counts(cell) == 0) cb(off + i) // empty code keeps its centroid
            else (sums(off + i) / counts(cell)).toFloat
          i += 1
        }
        cell += 1
      }
      model = Model(dim, m, ksub, next)
    }
    model
  }
}
