package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one internal hop a custom LogicalPlan needs: turn it into a
  * DataFrame (classic.Dataset.ofRows is private[sql], so this lives
  * under the org.apache.spark.sql namespace — the standard pattern for
  * Spark extension libraries). */
object DataFrameBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.logical
}
