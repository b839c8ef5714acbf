package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * supported bridge lives behind private[sql] in
  * org.apache.spark.sql.classic.ExpressionUtils (columnNodeSupport.scala
  * in the Apache Spark source). This shim package re-exports exactly
  * that pair of conversions for graft's custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
