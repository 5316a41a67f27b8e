package org.apache.spark.sql.graftops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, ExpressionUtils, SparkSession => CSparkSession}

/** Bridge into the `private[sql]` plan constructor so custom logical
  * plans (graft.plans.AsOfJoin) can surface as DataFrames. Lives under
  * `org.apache.spark.sql` for access; contains no logic. */
object PlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test access to the private[sql] extension builders. */
  def plannerStrategiesOf(e: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[Any] =
    e.buildPlannerStrategies(spark.asInstanceOf[CSparkSession])
  def optimizerRulesOf(e: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[Any] =
    e.buildOptimizerRules(spark.asInstanceOf[CSparkSession])
}
