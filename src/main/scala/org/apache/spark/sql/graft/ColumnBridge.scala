package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's custom Catalyst expressions.
  * Spark 4 made the conversion helpers `private[sql]`; this shim lives in
  * the sql package purely to re-export them (the classic pattern for
  * libraries shipping native expressions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
