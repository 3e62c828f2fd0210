package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan properties the 100 TB design depends on — a plan
  * regression (lost pushdown, a broadcast flipping to shuffle, a top-k
  * becoming a global sort, a range join going cartesian) fails here even
  * while results stay correct. */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

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

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicates and projection reach the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("IsNotNull(l_shipdate"), p)
    // only the 5 projected columns are read, not all 11
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_tax"), read)
  }

  test("q05: dimension join broadcasts (no shuffle of the fact side)") {
    assert(plan("q05_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q06: merge hint pins the sort-merge join (the 100TB fact-fact plan)") {
    assert(plan("q06_join_shuffle").contains("SortMergeJoin"))
  }

  test("q10: range pair-count is one window pass — no join, one exchange") {
    // r21: the user-keyed range self-join (pair materialization — output
    // quadratic in per-user density) became one range-frame window + a
    // same-key aggregate that reuses the window's partitioning.
    val p = plan("q10_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("q16: top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("q16_topk").contains("TakeOrderedAndProject"))
  }

  test("llm_mix_sources: hash-gate filter reads only doc_id") {
    val p = plan("llm_mix_sources")
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text"), read)
  }

  test("llm_pack_sequences: exactly one exchange (shard window, no global sort)") {
    val p = plan("llm_pack_sequences")
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("llm_decontaminate: eval shingle set broadcasts against the train side") {
    val p = plan("llm_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("llm_dedup_spans: one exchange (window over span hash), no self-join") {
    val p = plan("llm_dedup_spans")
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("llm_dedup_semantic: cluster-scoped equi-join, never a cartesian") {
    val p = plan("llm_dedup_semantic")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("llm_dedup_minhash: grouped-bucket candidates + equi verify joins") {
    // MinHash+LSH: shingle → signature → band → ONE grouped aggregate per
    // bucket with in-row (a < b) pair expansion (r21: replaced the bucket
    // self-join — one exchange instead of size-agg + join-back + join),
    // then equi-joins attach shingle sets for the exact-Jaccard verify. A
    // cartesian or nested-loop fallback is the regression this pin exists
    // to catch. (Pinned after the r17 bench drift: driver tails showed the
    // dedup family 1.5–1.7× slower on UNTOUCHED code, the same co-tenant
    // signature BENCH_NOTES.md root-caused for llm_repetition in r16 —
    // with the plan pinned, the next drift is provably environmental.)
    val p = plan("llm_dedup_minhash")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the verify joins (pairs ⋈ shingles on doc_a / doc_b) stay equi
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("llm_dedup_simhash: banded equi self-join, never a cartesian") {
    // r21 (late): the grouped in-row expansion tried mid-round was
    // reverted on sf1 evidence — 14-bit buckets are mostly singletons, so
    // the codegen'd bucket self-join beats collect_list + interpreted
    // higher-order expansion at every measured scale. The pin guards what
    // actually matters: equi join on the bucket key, no cartesian /
    // nested-loop fallback.
    val p = plan("llm_dedup_simhash")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("llm_repetition: per-row projection — at most the starved-scan spread") {
    // r21: the per-row gram/sort pipeline is spread to the session's cores
    // when the input has fewer splits (Spread.toCores — a no-op at scale,
    // where splits ≥ cores; measured 0.82 s → 0.41 s at sf0.1). The pin
    // allows exactly that one pre-compute exchange and nothing else: a
    // SECOND exchange (an accidental aggregation or join) is the
    // regression this test exists to catch.
    val p = plan("llm_repetition")
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
  }

  test("q26_pivot: hash-agg pivot lowering — two shuffles, no sort fallback") {
    // Spark's pivot with pinned values lowers to sum-by-(ls,rf) then
    // pivotfirst-by-ls: two partial+final HashAggregate pairs, exactly
    // two exchanges, map-side combine before each. A SortAggregate
    // fallback or a third shuffle is a plan regression. (Pinned after the
    // r16 bench drift: the plan was NOT the cause — both this entry and
    // llm_repetition regressed 1.4–1.8× on untouched code under
    // co-tenant machine load and recovered with the suite unchanged; see
    // BENCH_NOTES.md.)
    val p = plan("q26_pivot")
    assert("Exchange".r.findAllIn(p).size == 2, p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }
}
