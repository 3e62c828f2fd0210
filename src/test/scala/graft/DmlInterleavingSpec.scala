package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{Compaction, Merge, Snapshots, TxnCommit}

/** Whole-format invariant checks under interleaving: a deterministic
  * random chain of appends / DV deletes / CoW updates / compactions must
  * always read back exactly the model's rows, and genuinely concurrent
  * appenders + compactors (file-granular OCC, retry on conflict) must
  * neither lose nor duplicate a row. */
class DmlInterleavingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val dir = Files.createTempDirectory("graft-interleave")
  private def wh(name: String) = dir.resolve(name).toString
  private def fs = new Path(dir.toString)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def append(w: String, ids: Seq[Long]): Unit = {
    val cid = java.util.UUID.randomUUID().toString
    val s0 = spark
    import s0.implicits._
    ids.map(i => (i, i * 10)).toDF("id", "v").coalesce(1)
      .write.parquet(s"${TxnCommit.stagingDir(w, cid)}/t")
    val moves = TxnCommit.movesFor(fs, w, cid, "t")
    TxnCommit.commit(fs, w, cid, moves)
    TxnCommit.publish(fs, w, cid, moves)
  }

  test("random append/delete/update/compact chain always equals the model") {
    val w = wh("chain")
    val rng = new scala.util.Random(42)
    val model = scala.collection.mutable.Map.empty[Long, Long] // id -> v
    var nextId = 0L
    def freshBatch(n: Int): Seq[Long] = {
      val ids = (nextId until nextId + n); nextId += n
      ids.foreach(i => model(i) = i * 10)
      ids
    }
    append(w, freshBatch(20))
    (1 to 24).foreach { step =>
      rng.nextInt(6) match {
        case 0 => append(w, freshBatch(5 + rng.nextInt(10)))
        case 1 => // DV delete of a residue class among live ids
          val k = 2 + rng.nextInt(4); val r = rng.nextInt(k)
          Merge.deleteWhereDv(spark, w, "t", col("id") % k === r,
            rewriteFraction = if (rng.nextBoolean()) 1.0 else 0.5)
          model.keys.filter(_ % k == r).toSeq.foreach(model.remove)
        case 2 => // CoW update of a narrow range
          val lo = rng.nextLong(math.max(1L, nextId))
          val cond = col("id").between(lo, lo + 7)
          Merge.updateWhere(spark, w, "t", cond, Map("v" -> (col("v") + 1)))
          model.keys.filter(i => i >= lo && i <= lo + 7)
            .toSeq.foreach(i => model(i) = model(i) + 1)
        case 3 => Compaction.compact(spark, w, "t")
        case 4 => // MoR update through the vector path
          val k = 3 + rng.nextInt(3)
          Merge.updateWhereDv(spark, w, "t", col("id") % k === 1,
            Map("v" -> (col("v") - 1)))
          model.keys.filter(_ % k == 1).toSeq.foreach(i => model(i) = model(i) - 1)
        case 5 => // vacuum mid-chain: latest state must be untouched
          Snapshots.vacuum(fs, w, keepVersions = 8, minAgeMs = 0L)
      }
      val got = Snapshots.read(spark, w, "t").select("id", "v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model.toMap, s"divergence after step $step")
    }
  }

  test("concurrent appenders and compactors: no row lost, none duplicated") {
    val w = wh("race")
    append(w, 0L until 10L)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appended = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val idGen = new java.util.concurrent.atomic.AtomicLong(100L)
    val appenders = (1 to 3).map { _ =>
      new Thread(() => {
        try (1 to 5).foreach { _ =>
          val base = idGen.getAndAdd(10L)
          val ids = base until base + 10
          append(w, ids)
          ids.foreach(appended.add)
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    val compactor = new Thread(() => {
      try (1 to 4).foreach { _ =>
        // File-granular OCC: an append landing mid-compaction no longer
        // aborts it; a genuine input overlap (rival compaction) would.
        try Compaction.compact(spark, w, "t")
        catch { case _: Snapshots.ConcurrentCommitException => () }
        Thread.sleep(50)
      } catch { case t: Throwable => failures.add(t) }
    })
    (appenders :+ compactor).foreach(_.start())
    (appenders :+ compactor).foreach(_.join(120000))
    assert(failures.isEmpty, s"worker failed: ${Option(failures.peek())}")
    val got = Snapshots.read(spark, w, "t").select("id")
      .collect().map(_.getLong(0)).toSeq
    val expected = (0L until 10L) ++ appended.toArray(Array.empty[java.lang.Long])
      .map(_.longValue()).toSeq
    assert(got.sorted == expected.sorted,
      s"expected ${expected.size} rows exactly once, got ${got.size}")
  }
}
