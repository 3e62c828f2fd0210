package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class PartitionedSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("daily-partitioned sink prunes partitions for time-range predicates") {
    val events = graft.queries.Fixtures.events(spark, "/root/testdata/sf0.001")
    val out = Files.createTempDirectory("graft-part").resolve("events_daily").toString
    graft.operators.PartitionedSink.appendDaily(events, out, "ts")

    // directory layout is one dir per day
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("p_date=")).sorted
    assert(dirs.length >= 25) // a month of synthetic data

    val back = spark.read.parquet(out)
    val pruned = back.filter(col("p_date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_date"),
      s"expected partition pruning in:\n$plan")
    // row-for-row agreement with an unpartitioned filter
    val expected = events.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(pruned.count() == expected && expected > 0)
  }
}
