package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ↔ Expression converters
  * (Spark 4 wraps Columns in ColumnNodes; `ExpressionUtils` is the
  * sanctioned classic-backend converter but is package-private). This is
  * the standard extension-library pattern: one tiny object inside the
  * sql namespace, everything else lives in our own packages.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function on an existing session (the
    * FunctionRegistry hangs off `sessionState`, which is private[sql]).
    * For new sessions prefer `spark.sql.extensions` +
    * [[graft.ext.GraftExtensions]], which needs no bridge.
    */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
                           name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** DataFrame from a custom LogicalPlan (classic `Dataset.ofRows` is
    * private[sql]).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently attach a planner strategy + optimizer rule to an
    * existing session via the public experimental hooks (new sessions
    * should use `spark.sql.extensions`).
    */
  def attachStrategy(spark: org.apache.spark.sql.SparkSession,
                     strategy: org.apache.spark.sql.execution.SparkStrategy,
                     rule: org.apache.spark.sql.catalyst.rules.Rule[
                       org.apache.spark.sql.catalyst.plans.logical.LogicalPlan])
      : Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraStrategies.contains(strategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ strategy
    if (!s.experimental.extraOptimizations.contains(rule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ rule
  }
}
