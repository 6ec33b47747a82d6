package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors needed to surface a
  * custom LogicalPlan as a public DataFrame (the standard pattern for
  * out-of-tree Spark operators; only public-API types cross this
  * boundary). */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** What `spark.udf.register(name, udaf)` builds internally, exposed
    * so a FunctionRegistry BUILDER can construct the aggregate from
    * its argument expressions — the only way to give one SQL name an
    * optional (literal-switched) argument, which udf.register's fixed
    * arity cannot express. */
  def scalaAggregator(
      agg: expressions.UserDefinedFunction,
      children: Seq[Expression]): Expression =
    execution.aggregate.ScalaAggregator(
      // udaf() always returns a UserDefinedAggregator; the class is
      // private[sql], so the downcast lives here in the bridge
      agg.asInstanceOf[expressions.UserDefinedAggregator[_, _, _]],
      children).toAggregateExpression()
}
