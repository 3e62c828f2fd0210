package graft.functions

import org.apache.spark.sql.SparkSession
import graft.codec.{Base58Check, Scalars}

/** User-facing function registration: the reference's custom scalar
  * transforms (T2 base58check, T3 uuid-from-bytes, T4 sec/ms heuristic,
  * T5 decimal-with-default) as session functions, plus the native
  * similarity/dedup kernels, callable from SQL and the Column API.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    // T2 (huckli-import/src/lib.rs:139-156)
    spark.udf.register("base58check",
      (bytes: Array[Byte]) => Base58Check.encodePubKey(bytes))
    // T3 (mobile_rewards.rs:223)
    spark.udf.register("uuid_from_bytes",
      (bytes: Array[Byte]) => Scalars.uuidFromBytes(bytes))
    // T4 (huckli-import/src/lib.rs:158-175)
    spark.udf.register("ts_auto",
      (epoch: Long) => Scalars.timestampAuto(epoch))
    // T5 (huckli-import/src/lib.rs:307-313)
    spark.udf.register("proto_decimal",
      (s: String) => Scalars.protoDecimal(Option(s)))

    // Native kernels as SQL functions.
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64Expr(exprs.head), "built-in")
    registry.createOrReplaceTempFunction("cosine_sim",
      exprs => VectorExprs.CosineSim(exprs(0), exprs(1)), "built-in")
  }
}
