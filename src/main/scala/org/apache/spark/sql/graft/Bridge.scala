package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression and Dataset ⇄ LogicalPlan bridges. Spark 4 scopes
  * these conversions `private[sql]` (the public Column API wraps
  * ColumnNodes for Connect compatibility); this file in the sql package
  * namespace is the sanctioned classic-mode escape hatch for libraries
  * that ship native Catalyst expressions and custom logical operators
  * without forking Spark. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a (possibly custom) logical plan. */
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame (resolved attributes,
    * usable as the child of a custom logical node). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
