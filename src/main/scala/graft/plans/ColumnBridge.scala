package org.apache.spark.sql.graftbridge
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column constructor for expressions
  * that carry non-literal Scala parameters (e.g. boundary arrays) and
  * so cannot route through the function registry. Public Spark API
  * offers call_function only for registry-constructible expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
