package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("null payloads come from the matched row, never back-filled (no chimera rows)") {
    val s0 = spark
    import s0.implicits._
    val left = Seq((1L, 10L, "L1"), (1L, 6L, "L2"), (2L, 4L, "L3"))
      .toDF("user_id", "lts", "tag")
    val right = Seq(
      (1L, 5L, Option("x"), Option("b5")),
      (1L, 8L, Option.empty[String], Option("b8")), // latest match for lts=10: a IS NULL
      (2L, 4L, Option("y"), Option.empty[String]))  // equal-ts: inclusive match
      .toDF("user_id", "rts", "a", "b")
    val out = AsOfJoin.backward(left, right, "user_id", "lts", "rts",
      payloads = Seq("a", "b"))
      .collect().map(r => (r.getAs[String]("tag"),
        Option(r.get(r.fieldIndex("asof_ts"))).map(_.asInstanceOf[Long]),
        Option(r.getAs[String]("a")), Option(r.getAs[String]("b")))).toSet
    assert(out == Set(
      // lts=10 matches rts=8: a must be null FROM THAT ROW (not "x" from rts=5)
      ("L1", Some(8L), None, Some("b8")),
      ("L2", Some(5L), Some("x"), Some("b5")),
      ("L3", Some(4L), Some("y"), None)))
  }

  test("forward: earliest right at-or-after, inclusive; unmatched tail is null") {
    val s0 = spark
    import s0.implicits._
    val left = Seq((1L, 4L, "L1"), (1L, 5L, "L2"), (1L, 9L, "L3"))
      .toDF("user_id", "lts", "tag")
    val right = Seq((1L, 5L, "r5"), (1L, 8L, "r8"))
      .toDF("user_id", "rts", "v")
    val out = AsOfJoin.forward(left, right, "user_id", "lts", "rts", Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"),
        Option(r.get(r.fieldIndex("asof_ts"))).map(_.asInstanceOf[Long]),
        Option(r.getAs[String]("v")))).toSet
    assert(out == Set(
      ("L1", Some(5L), Some("r5")), // next right after 4 is 5
      ("L2", Some(5L), Some("r5")), // equal ts matches (inclusive)
      ("L3", None, None)))          // nothing at-or-after 9
  }

  test("left rows before any right match carry all-null payload and timestamp") {
    val s0 = spark
    import s0.implicits._
    val left = Seq((7L, 1L)).toDF("user_id", "lts")
    val right = Seq((7L, 5L, 42.0)).toDF("user_id", "rts", "v")
    val row = AsOfJoin.backward(left, right, "user_id", "lts", "rts", Seq("v"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("asof_ts")))
    assert(row.isNullAt(row.fieldIndex("v")))
  }
}
