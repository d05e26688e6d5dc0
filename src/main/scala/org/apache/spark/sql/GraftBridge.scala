package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` access bridge (the standard pattern for third-party
  * Catalyst extensions): Column <-> Expression conversion is not public API
  * in Spark 4, so this one-file shim lives in the sql package. Nothing else
  * in this repo compiles into Spark's namespace. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
