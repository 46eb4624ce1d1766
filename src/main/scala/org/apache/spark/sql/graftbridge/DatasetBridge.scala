package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Private-API shim: build a DataFrame from a hand-assembled
  * LogicalPlan. Used by the dialect's subquery translation to bind
  * catalog frames straight into a parsed plan — no temp views, no
  * session-global catalog mutation, no CacheManager traffic. (Spark 4
  * keeps `Dataset.ofRows` on the classic implementation module;
  * sessions here are always classic ones.)
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
