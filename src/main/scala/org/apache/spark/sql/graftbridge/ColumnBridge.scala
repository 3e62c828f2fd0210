package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression adapter. Spark 4 moved this conversion behind
  * `private[sql] ExpressionUtils`; extension libraries conventionally bridge
  * it from inside the org.apache.spark.sql namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Materialize an (analyzed) logical plan as a DataFrame — Spark 4 keeps
    * `Dataset.ofRows` behind `private[sql] classic`. */
  def ofRows(session: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
