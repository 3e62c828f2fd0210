package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single latest right row with
  * the same key and `right.ts <= left.ts` (inclusive) — the standard
  * time-series enrichment join Spark has no built-in operator for.
  *
  * Scale shape: NOT a range join. A range join materializes every
  * (left, right) candidate pair inside the window before keeping one —
  * quadratic per key as history grows. Instead both sides are tagged and
  * unioned, and ONE running `last(…, ignoreNulls)` window ordered by
  * (ts, side) per key carries the latest right payload forward: a single
  * shuffle on the key, a single per-partition sort, linear in rows, zero
  * pair blowup. Right rows order before left rows at equal ts, which makes
  * the match inclusive. All carried payloads share the same Window frame, so
  * Catalyst plans them in one Window node.
  *
  * Determinism: callers must ensure the right side is unique per (key, ts)
  * (e.g. pre-aggregate) — otherwise "the" latest right row is ambiguous.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, payloads: Seq[String],
               asOfTsName: String = "asof_ts"): DataFrame = {
    val lCols = left.columns.toSeq
    val rTsType = right.schema(rightTs).dataType
    val lSide = left.select(
      lCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rTsType).as("__r_ts")) ++
        payloads.map(p => lit(null).cast(right.schema(p).dataType).as(s"__p_$p")): _*)
    val rSide = right.select(
      lCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(rightTs).as("__r_ts")) ++
        payloads.map(p => col(p).as(s"__p_$p")): _*)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloads.foldLeft(
      lSide.unionByName(rSide)
        .withColumn(asOfTsName, last(col("__r_ts"), ignoreNulls = true).over(w))) {
      (df, p) => df.withColumn(p, last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++ (asOfTsName +: payloads).map(col): _*)
  }
}
