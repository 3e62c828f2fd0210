package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native-kernel expressions: correctness vs straightforward Scala
  * re-computation, plus the registered SQL function surface. */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cosine_sim matches double-precision reference formula") {
    val s0 = spark
    import s0.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS s").collect().head.getDouble(0)
    def dot(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val want = dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    assert(got == want)
    // identical vectors → 1.0 after 4-dp rounding
    val self = Seq((a, a)).toDF("a", "b")
      .selectExpr("round(cosine_sim(a, b), 4) AS s").collect().head.getDouble(0)
    assert(self == 1.0)
  }

  test("simhash64 is deterministic and order-insensitive over a token bag") {
    val s0 = spark
    import s0.implicits._
    val df = Seq("the quick brown fox", "fox brown quick the", "completely different words here")
      .toDF("text")
      .selectExpr("simhash64(transform(split(text, ' '), t -> xxhash64(t))) AS sig")
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1)) // bag-of-words: order does not matter
    assert(sigs(0) != sigs(2))
  }

  test("minhash signature: adding a shingle can only lower the per-perm minimum") {
    import org.apache.spark.sql.functions.col
    val s0 = spark
    import s0.implicits._
    val base = Seq(Seq("aa bb cc", "bb cc dd")).toDF("sh")
    val more = Seq(Seq("aa bb cc", "bb cc dd", "cc dd ee")).toDF("sh")
    def sig(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(graft.functions.VectorExprs.minhashSigCol(col("sh"), 16).as("s"))
        .collect().head.getAs[scala.collection.Seq[Long]]("s").toSeq
    val (s1, s2) = (sig(base), sig(more))
    assert(s1.size == 16 && s2.size == 16)
    s1.zip(s2).foreach { case (a, b) => assert(b <= a) }
  }

  test("md5_prefix56 native kernel == the SQL conv/substr chain, token by token") {
    import org.apache.spark.sql.functions._
    val s0 = spark
    import s0.implicits._
    val df = Seq("the quick brown fox", "héllo wörld ünïcode", "a  b", "")
      .toDF("text")
      .select(
        graft.functions.Md5Prefix56Expr.hashArray(
          split(lower(col("text")), " ")).as("native"),
        expr("transform(split(lower(text), ' '), " +
          "t -> cast(conv(substr(md5(t), 1, 14), 16, 10) as bigint))").as("sql"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("simhashPairs banding is complete at hamming <= 3 (matches all-pairs truth)") {
    import org.apache.spark.sql.functions._
    val s0 = spark
    import s0.implicits._
    // A seed corpus plus single-word perturbations of each seed: enough
    // near-identical token bags that many pairs land within hamming 3, and
    // enough distinct ones that most don't.
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "mu", "nu", "xi", "omicron", "pi", "rho")
    val docs = (0 until 40).map { i =>
      val base = (0 until 12).map(j => words((i * 7 + j * 3) % words.size))
      val txt = if (i % 2 == 1) (base.dropRight(1) :+ words(i % words.size)) else base
      (i.toLong, txt.mkString(" "))
    }.toDF("doc_id", "text")
    val banded = graft.llmops.MinHash.simhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force all-pairs hamming over the same signatures
    val sigs = graft.llmops.MinHash.simhash(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(truth.nonEmpty, "fixture should produce at least one near-dup pair")
    assert(banded == truth)
    // signatures use only the low 56 bits (md5-derived token hashes)
    assert(sigs.forall { case (_, s) => (s >>> 56) == 0L })
  }

  test("registered reference UDFs: base58check, uuid_from_bytes, ts_auto, proto_decimal") {
    val row = spark.sql(
      """SELECT base58check(CAST('' AS BINARY)) AS b58,
        | uuid_from_bytes(unhex('000102030405060708090a0b0c0d0e0f')) AS uid,
        | ts_auto(1700000000) AS t_sec, ts_auto(1700000000123) AS t_ms,
        | proto_decimal('2.5') AS d_ok, proto_decimal('garbage') AS d_bad""".stripMargin)
      .collect().head
    assert(row.getAs[String]("b58") == graft.codec.Base58Check.encodePubKey(Array.empty))
    assert(row.getAs[String]("uid") == "00010203-0405-0607-0809-0a0b0c0d0e0f")
    assert(row.getAs[java.sql.Timestamp]("t_sec").getTime == 1700000000000L)
    assert(row.getAs[java.sql.Timestamp]("t_ms").getTime == 1700000000123L)
    assert(row.getAs[Double]("d_ok") == 2.5 && row.getAs[Double]("d_bad") == 0.0)
  }

  test("lsh bucket: identical vectors share a bucket, deterministic across runs") {
    import org.apache.spark.sql.functions.col
    val s0 = spark
    import s0.implicits._
    val planes = for (p <- 0 until 8; j <- 0 until 4) yield (p * 31 + j * 17 % 7 - 3).toDouble
    val df = Seq(Array(1f, 2f, 3f, 4f), Array(1f, 2f, 3f, 4f), Array(-9f, 1f, -2f, 0.5f))
      .toDF("v")
      .select(graft.functions.VectorExprs.lshBucketCol(col("v"), planes, 4).as("b"))
    val buckets = df.collect().map(_.getLong(0))
    assert(buckets(0) == buckets(1))
    assert(buckets.forall(b => b >= 0 && b < 256))
  }
}
