package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The r22 hashed-shingle kernels vs the r21 string pipeline they replace:
  * [[graft.functions.ShingleExprs.ShingleHashes]] must emit exactly the
  * sorted-distinct xxhash64(seed 42) set of [[graft.llmops.MinHash
  * .withShingles]]'s string shingles (that identity is what keeps
  * decontaminate byte-identical and the Jaccard values equal), and
  * [[graft.functions.ShingleExprs.JaccardSorted]] must reproduce the
  * string-set `size(array_intersect)/size(array_union)` division. */
class ShingleExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // The boundary zoo: short docs (whole-text fallback), empty string,
  // consecutive/leading/trailing spaces (empty tokens), repeated shingles
  // (distinct), mixed case (lowering), and multi-byte UTF-8.
  private val docs = Seq(
    "",
    "one",
    "one two",
    "one two three",
    "one two three four five",
    "a a a a a a",
    "The Quick brown FOX jumps",
    "a  b   c d",
    " leading and trailing ",
    "héllo wörld ünïcode tökens",
    "x y z x y z x y z")

  test("shingleHashes == sorted-distinct xxhash64 of the string shingles") {
    val s0 = spark
    import s0.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val strings = graft.llmops.MinHash.withShingles(df, "doc_id", "text")
      .select(col("doc_id"),
        expr("array_sort(array_distinct(transform(shingles, s -> xxhash64(s))))")
          .as("want"))
    val hashed = graft.llmops.MinHash.withShingleHashes(df, "doc_id", "text")
      .select(col("doc_id"), col("sh").as("got"))
    val joined = strings.join(hashed, "doc_id").collect()
    assert(joined.length == docs.length)
    joined.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: ${r.getSeq[Long](1)} != ${r.getSeq[Long](2)}")
    }
  }

  test("JaccardSorted == string-set intersect/union Jaccard on every doc pair") {
    val s0 = spark
    import s0.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val st = graft.llmops.MinHash.withShingles(df, "doc_id", "text")
    val sa = st.select(col("doc_id").as("doc_a"), col("shingles").as("st_a"))
    val sb = st.select(col("doc_id").as("doc_b"), col("shingles").as("st_b"))
    val want = sa.join(sb, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("st_a"), col("st_b"))).cast("double") /
          size(array_union(col("st_a"), col("st_b")))).as("want"))
    val hd = graft.llmops.MinHash.withShingleHashes(df, "doc_id", "text")
    val pairs = want.select("doc_a", "doc_b")
    val got = graft.llmops.MinHash.jaccard(pairs, hd)
    val cmp = want.join(got, Seq("doc_a", "doc_b")).collect()
    assert(cmp.length == docs.length * (docs.length - 1) / 2)
    cmp.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}): " +
          s"${r.getDouble(2)} != ${r.getDouble(3)}")
    }
  }

  test("minhashSigFromHashes: adding a shingle can only lower per-perm minima") {
    val s0 = spark
    import s0.implicits._
    val base = Seq(Seq(11L, 22L, 33L)).toDF("sh")
    val more = Seq(Seq(11L, 22L, 33L, 44L)).toDF("sh")
    def sig(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(graft.functions.VectorExprs
          .minhashSigFromHashesCol(col("sh"), 16).as("s"))
        .collect().head.getAs[scala.collection.Seq[Long]]("s").toSeq
    val (s1, s2) = (sig(base), sig(more))
    assert(s1.size == 16 && s2.size == 16)
    s1.zip(s2).foreach { case (a, b) => assert(b <= a) }
  }
}
