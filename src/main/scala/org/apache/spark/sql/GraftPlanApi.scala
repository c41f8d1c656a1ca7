package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset => CDataset, SparkSession => CSparkSession}

/** Bridge into `Dataset.ofRows` (package-private in Spark) so
  * graft's custom logical operators ([[graft.plans.AsOfJoinPlan]])
  * can be wrapped back into a public DataFrame — the standard
  * extension-library pattern for plan-level operators.
  */
object GraftPlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
