package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, least, greatest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.MinHash

/** Focused check for the r21 restructure of incremental candidate
  * generation: [[MinHash.incrementalCandidates]] (ONE grouped exchange with
  * an in-row freshness flag) must emit exactly the pair set of the naive
  * topology it replaced — bucket skew guard + new-side join + new×all
  * bucket join — on every structural case: new-old pairs, new-new pairs,
  * old-only buckets (no output), oversized buckets (dropped whole), and
  * cross-band dedup. */
class IncrementalCandidatesSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** The pre-r21 reference topology, kept verbatim as the oracle. */
  private def naive(banded: org.apache.spark.sql.DataFrame,
                    fresh: org.apache.spark.sql.DataFrame,
                    maxBucket: Int) = {
    val sized = banded.groupBy("band", "bh")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("__bsz"))
      .filter(col("__bsz") <= maxBucket).drop("__bsz")
    val guarded = banded.join(sized, Seq("band", "bh"))
    val newSide = guarded.join(fresh, "doc_id")
      .select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val allSide = guarded
      .select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    newSide.join(allSide, Seq("band", "bh"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
  }

  test("grouped expansion ≡ naive join topology on all structural cases") {
    val s = spark; import s.implicits._
    // band 0 bucket 10: old {1,2} + new {100}      → (1,100), (2,100)
    // band 0 bucket 11: old only {3,4}             → nothing
    // band 0 bucket 12: new only {101,102}         → (101,102)
    // band 1 bucket 10: {1,100} again (cross-band) → (1,100) deduped
    // band 1 bucket 13: oversized {5,6,7,103}, maxBucket=3 → dropped whole
    val banded = Seq(
      (1L, 0, 10L), (2L, 0, 10L), (100L, 0, 10L),
      (3L, 0, 11L), (4L, 0, 11L),
      (101L, 0, 12L), (102L, 0, 12L),
      (1L, 1, 10L), (100L, 1, 10L),
      (5L, 1, 13L), (6L, 1, 13L), (7L, 1, 13L), (103L, 1, 13L)
    ).toDF("doc_id", "band", "bh")
    val fresh = Seq(100L, 101L, 102L, 103L).toDF("doc_id")

    val got = MinHash.incrementalCandidates(banded, fresh, maxBucket = 3)
      .as[(Long, Long)].collect().toSet
    val want = naive(banded, fresh, maxBucket = 3)
      .as[(Long, Long)].collect().toSet

    assert(want === Set((1L, 100L), (2L, 100L), (101L, 102L)))
    assert(got === want)
  }

  test("no fresh docs → empty; everything fresh → full pair set") {
    val s = spark; import s.implicits._
    val banded = Seq((1L, 0, 10L), (2L, 0, 10L), (3L, 0, 10L))
      .toDF("doc_id", "band", "bh")
    val none = s.emptyDataset[Long].toDF("doc_id")
    assert(MinHash.incrementalCandidates(banded, none, 100).isEmpty)
    val all = Seq(1L, 2L, 3L).toDF("doc_id")
    val got = MinHash.incrementalCandidates(banded, all, 100)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
