package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{Snapshots, TxnCommit}
import graft.llmops.{LshStore, Similarity}

/** Persisted LSH ANN index: bucket rows are a snapshot table range-
  * clustered by bucket, so a query reads only the index files overlapping
  * its probed buckets — and the corpus table none. */
class LshStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val dir = Files.createTempDirectory("graft-lshstore")
  private def wh(name: String) = dir.resolve(name).toString
  private def fs = new Path(dir.toString)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val Dim = 8

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic spread-out vectors (axis clusters + jitter). */
  private def vec(i: Int): Seq[Float] = {
    val v = Array.fill(Dim)(0.01f * ((i * 7 + 3) % 5))
    v(i % 4) = (if (i % 8 < 4) 1f else -1f) + 0.001f * (i % 9)
    v.toSeq
  }

  private def embDf(ids: Range): DataFrame = {
    val s0 = spark
    import s0.implicits._
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def pubEmb(w: String, ids: Range): Unit = {
    val cid = java.util.UUID.randomUUID().toString
    embDf(ids).coalesce(1)
      .write.parquet(s"${TxnCommit.stagingDir(w, cid)}/embeddings")
    val moves = TxnCommit.movesFor(fs, w, cid, "embeddings")
    TxnCommit.commit(fs, w, cid, moves)
    TxnCommit.publish(fs, w, cid, moves)
  }

  test("warm-store query plans zero corpus files and skips unprobed buckets") {
    val w = wh("whPrune")
    pubEmb(w, 0 until 64)
    LshStore.buildIndex(spark, w,
      Snapshots.read(spark, w, "embeddings"), Dim, numPlanes = 6, targetFiles = 4)
    val res = LshStore.topK(spark, w, embDf(0 until 1), k = 3)
    assert(res.count() == 3)
    val planned = res.inputFiles.toSet
    assert(planned.nonEmpty && !planned.exists(_.contains("/embeddings/")),
      s"corpus files in the search plan: $planned")
    // Multi-probe touches 7 of 64 possible buckets: the range-by-bucket
    // layout must let the log stats skip at least one index file.
    val total =
      Snapshots.read(spark, w, LshStore.BucketTable).inputFiles.length
    val plannedIdx = planned.count(_.contains(s"/${LshStore.BucketTable}/"))
    assert(total >= 3, s"layout produced $total files")
    assert(plannedIdx < total,
      s"probed 7/64 buckets but planned $plannedIdx/$total index files")
  }

  test("probeAll through the warm store is exact (matches brute force)") {
    val w = wh("whExact")
    pubEmb(w, 0 until 48)
    LshStore.buildIndex(spark, w,
      Snapshots.read(spark, w, "embeddings"), Dim, numPlanes = 6, targetFiles = 2)
    val queries = embDf(0 until 3)
    val got = LshStore.topK(spark, w, queries, k = 7, probeAll = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val want = Similarity.bruteForceTopK(queries, embDf(0 until 48), 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("appendBatch under persisted params; multi-probe recall vs brute force") {
    val w = wh("whInc")
    pubEmb(w, 0 until 32)
    LshStore.buildIndex(spark, w,
      Snapshots.read(spark, w, "embeddings"), Dim, numPlanes = 5, targetFiles = 2)
    val vIndexed = Snapshots.latestVersion(fs, w).get
    pubEmb(w, 32 until 48)
    val p = LshStore.appendBatch(spark, w,
      Snapshots.changes(spark, w, "embeddings", fromExclusive = vIndexed)
        .select("vec_id", "embedding"))
    assert(p == LshStore.Params(Dim, 5)) // build-time scheme, not a default
    val b = Snapshots.read(spark, w, LshStore.BucketTable)
    assert(b.count() == 48 && b.select("vec_id").distinct().count() == 48)
    // exact mode over the completed index still equals brute force
    val queries = embDf(0 until 2)
    val got = LshStore.topK(spark, w, queries, k = 10, probeAll = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val want = Similarity.bruteForceTopK(queries, embDf(0 until 48), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
    // approximate multi-probe: every hit it returns is a true vector with
    // the true similarity, and recall against brute-force top-5 is >= 0.6
    val approx = LshStore.topK(spark, w, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Similarity.bruteForceTopK(queries, embDf(0 until 48), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.intersect(truth).size >= (truth.size * 6) / 10)
  }

  test("syncFromChanges: a deleted vector never surfaces through the bucket table") {
    val w = wh("whSync")
    pubEmb(w, 0 until 48)
    LshStore.buildIndex(spark, w,
      Snapshots.read(spark, w, "embeddings"), Dim, numPlanes = 5, targetFiles = 2)
    val vIndexed = Snapshots.latestVersion(fs, w).get
    graft.ingest.Merge.deleteWhereDv(spark, w, "embeddings",
      col("vec_id") >= 40)
    LshStore.syncFromChanges(spark, w, "embeddings", fromExclusive = vIndexed)
    val b = Snapshots.read(spark, w, LshStore.BucketTable)
    assert(b.filter(col("vec_id") >= 40).count() == 0,
      "deleted vectors still have bucket rows")
    val queries = embDf(0 until 3)
    val got = LshStore.topK(spark, w, queries, k = 10, probeAll = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val want = Similarity.bruteForceTopK(queries,
      Snapshots.read(spark, w, "embeddings"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
    assert(!got.exists(_._2 >= 40), "a deleted vector surfaced in top-k")
  }
}
