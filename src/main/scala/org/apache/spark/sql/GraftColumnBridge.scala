package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column ↔ Catalyst Expression converters, which
  * are `private[sql]` in Spark 4's unified API. Standard extension-library
  * pattern: a shim in the org.apache.spark.sql package grants compile-time
  * access to members that are public in bytecode.
  */
object GraftColumnBridge {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
