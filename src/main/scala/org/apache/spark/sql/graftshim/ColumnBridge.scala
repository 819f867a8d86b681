package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the blessed
  * converter (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`. This shim lives under the sql package to re-export the
  * two conversions custom Catalyst expressions need — the standard extension
  * pattern for pre-SPARK-49699 APIs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
