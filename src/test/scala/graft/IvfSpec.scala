package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("IVF finds exact duplicates and agrees with brute force on its probes") {
    val s0 = spark
    import s0.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // inject exact duplicates of the query vectors under new ids
    val dups = corpus.filter($"vec_id" < 5)
      .select(($"vec_id" + 1000000).as("vec_id"), $"embedding", $"label")
    val all = corpus.union(dups)
    val model = graft.llmops.Ivf.train(all, dim = 64, k = 8, iters = 2)
    assert(model.k == 8)
    val indexed = graft.llmops.Ivf.index(all, model).cache()
    // every corpus row lands in exactly one of k cells
    assert(indexed.count() == all.count())
    assert(indexed.select("cell").distinct().count() <= 8)
    val res = graft.llmops.Ivf.topK(all.filter($"vec_id" < 5), indexed, model,
      k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // the duplicate (cos = 1.0) must be each query's rank-1 hit: identical
    // vectors share a cell by construction
    (0L until 5L).foreach { q =>
      val top = res.filter(t => t._1 == q && t._4 == 1L)
      assert(top.length == 1)
      assert(top.head._2 == q + 1000000)
      assert(top.head._3 == 1.0)
    }
    // training is deterministic: same seeds → same model
    val model2 = graft.llmops.Ivf.train(all, dim = 64, k = 8, iters = 2)
    assert(model.centroids.map(_.toSeq).toSeq == model2.centroids.map(_.toSeq).toSeq)
  }

  test("nprobe = k is exact: IVF top-k equals brute-force top-k") {
    val s0 = spark
    import s0.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val model = graft.llmops.Ivf.train(corpus, dim = 64, k = 8, iters = 2)
    val ivf = graft.llmops.Ivf.topK(corpus.filter($"vec_id" < 5),
        graft.llmops.Ivf.index(corpus, model), model, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val brute = graft.llmops.Similarity.bruteForceTopK(
        corpus.filter($"vec_id" < 5), corpus, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(ivf == brute)
  }

  test("k=256 coarse quantizer stays cheap with the native argmax kernel") {
    val s0 = spark
    import s0.implicits._
    val corpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val model = graft.llmops.Ivf.train(corpus, dim = 64, k = 256, iters = 1)
    assert(model.k == 256)
    val indexed = graft.llmops.Ivf.index(corpus, model)
    assert(indexed.count() == corpus.count())
    // a 256-cell assignment is a single native expression, not a 256-element
    // struct tree — the plan must contain exactly one NearestCells call
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("nearestcells") || plan.toLowerCase.contains("nearestcells"))
    // every query's rank-1 self-duplicate survives at nprobe=4
    val dups = corpus.filter($"vec_id" < 3)
      .select(($"vec_id" + 1000000).as("vec_id"), $"embedding", $"label")
    val all = corpus.union(dups)
    val m2 = graft.llmops.Ivf.train(all, dim = 64, k = 256, iters = 1)
    val res = graft.llmops.Ivf.topK(all.filter($"vec_id" < 3),
      graft.llmops.Ivf.index(all, m2), m2, k = 1, nprobe = 4).collect()
    res.foreach(r => assert(r.getDouble(2) == 1.0))
  }
}
