package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for the private[sql] Column↔Expression bridge (Spark 4 moved
  * the Expression-taking Column constructor behind
  * org.apache.spark.sql.classic.ExpressionUtils). Lives in the spark.sql
  * package purely to reach it; contains no Spark-internal logic.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
