package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = Files.createTempDirectory("graft-bucketing")
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed join runs without a shuffle exchange and matches plain join") {
    val d = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val lineitem = spark.read.parquet(s"$d/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    graft.operators.Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    graft.operators.Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 8)

    val joined = graft.operators.Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b",
      "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")

    val plain = orders.join(lineitem, Seq("o_orderkey"))
    assert(joined.count() == plain.count())
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange hashpartitioning")) // the cost we removed
  }
}
