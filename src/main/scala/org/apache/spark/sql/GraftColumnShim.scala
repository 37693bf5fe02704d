package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for Column <-> catalyst Expression, needed because Spark 4's
  * `classic.ExpressionUtils` is `private[sql]`. Lives in the spark
  * package for access only; no Spark internals are modified.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
