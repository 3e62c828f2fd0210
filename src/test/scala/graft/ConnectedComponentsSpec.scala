package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("chain, triangle, and isolated pair resolve to min-id components") {
    val s0 = spark
    import s0.implicits._
    // chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("maxIter caps pathological chains without diverging") {
    val s0 = spark
    import s0.implicits._
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
    // full convergence on a diameter-30 chain
    val full = ConnectedComponents.run(chain, maxIter = 40)
      .collect().map(r => r.getLong(1)).toSet
    assert(full == Set(0L))
  }

  test("exhausting maxIter before convergence throws instead of splitting clusters") {
    val s0 = spark
    import s0.implicits._
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.run(chain, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
