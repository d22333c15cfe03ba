package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the standard pattern for libraries that ship custom Catalyst
  * expressions without forking Spark (Spark 4 made `new Column(expr)`
  * internal). Only the two conversions are exposed; everything else in
  * this repo lives under the `graft` package.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
