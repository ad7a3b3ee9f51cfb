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
}
