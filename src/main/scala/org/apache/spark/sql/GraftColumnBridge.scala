package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4.x). Custom
  * Catalyst expressions need a Column wrapper; Spark 4 moved the public
  * `new Column(expr)` constructor behind the classic module, so this shim
  * is the one sanctioned touch-point (same trick the Spark ecosystem
  * libraries use post-4.0).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
