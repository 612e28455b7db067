package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 scopes these conversions
  * `private[sql]` (the public Column API wraps ColumnNodes for Connect
  * compatibility); this two-liner in the sql package namespace is the
  * sanctioned classic-mode escape hatch for libraries that ship native
  * Catalyst expressions without registering them per-session. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
