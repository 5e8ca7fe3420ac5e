package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters so
  * graft's native Catalyst expressions (e.g.
  * [[graft.functions.CosineSimilarity]]) can surface as plain
  * `Column`s. Spark 4 moved `new Column(expr)` behind the ColumnNode
  * API; `classic.ExpressionUtils` is the supported internal shim, and
  * this object is the single place the library touches it.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp SQL function backed by a raw Expression builder
    * (FunctionRegistry is `private[sql]`; this is the one sanctioned
    * crossing point, same as the Column shim above). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
