package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single nearest right row with the
  * same key — latest `right.ts <= left.ts` ([[backward]], the standard
  * time-series enrichment) or earliest `right.ts >= left.ts` ([[forward]],
  * "next event after") — joins Spark has no built-in operator for.
  *
  * Scale shape: NOT a range join. A range join materializes every
  * (left, right) candidate pair inside the window before keeping one —
  * quadratic per key as history grows. Instead both sides are tagged and
  * unioned, and ONE running `last(…, ignoreNulls)` window ordered by
  * (ts, side) per key carries the latest right row forward: a single
  * shuffle on the key, a single per-partition sort, linear in rows, zero
  * pair blowup. Right rows order before left rows at equal ts, which makes
  * the match inclusive.
  *
  * The timestamp AND every payload travel in ONE struct carried by ONE
  * `last(ignoreNulls)` — per-column carries would mix columns from different
  * right rows whenever the latest match holds a null payload (a chimera row
  * no real as-of join can produce). A right row's struct is non-null even
  * when all its payload fields are null, so nulls from the matched row are
  * carried faithfully rather than back-filled from older rows.
  *
  * Determinism: callers must ensure the right side is unique per (key, ts)
  * (e.g. pre-aggregate) — otherwise "the" latest right row is ambiguous.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, payloads: Seq[String],
               asOfTsName: String = "asof_ts"): DataFrame =
    joinAsOf(left, right, key, leftTs, rightTs, payloads, asOfTsName,
      forwardDir = false)

  /** Forward variant: earliest right row with `right.ts >= left.ts`
    * (inclusive) — same single-shuffle union+window shape, with the frame
    * flipped to [current, following] and a `first(ignoreNulls)` carry. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String, payloads: Seq[String],
              asOfTsName: String = "asof_ts"): DataFrame =
    joinAsOf(left, right, key, leftTs, rightTs, payloads, asOfTsName,
      forwardDir = true)

  private def joinAsOf(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String, payloads: Seq[String],
                       asOfTsName: String, forwardDir: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val lCols = left.columns.toSeq
    val packType = StructType(
      StructField("__r_ts", right.schema(rightTs).dataType) +:
        payloads.map(p => StructField(p, right.schema(p).dataType)))
    // At equal ts the right row must fall inside the left row's frame:
    // backward looks over (unboundedPreceding, current] so right sorts
    // BEFORE left (side 0 < 1); forward looks over [current,
    // unboundedFollowing) so right sorts AFTER left.
    val (lTag, rTag) = if (forwardDir) (0, 1) else (1, 0)
    val lSide = left.select(
      lCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(lTag).as("__side"),
        lit(null).cast(packType).as("__pack")): _*)
    val rSide = right.select(
      lCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(rightTs).as("__ts"), lit(rTag).as("__side"),
        struct(col(rightTs).as("__r_ts") +: payloads.map(col): _*)
          .cast(packType).as("__pack")): _*)
    val w0 = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
    val w =
      if (forwardDir) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry =
      if (forwardDir) first(col("__pack"), ignoreNulls = true)
      else last(col("__pack"), ignoreNulls = true)
    val carried = lSide.unionByName(rSide)
      .withColumn("__pack", carry.over(w))
    carried.filter(col("__side") === lTag)
      .select(lCols.map(col) ++
        (col("__pack.__r_ts").as(asOfTsName) +:
          payloads.map(p => col(s"__pack.$p").as(p))): _*)
  }
}
