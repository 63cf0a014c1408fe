package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the classic API's private[sql] Dataset.ofRows —
  * the one hook a third-party whole-operator extension needs to hand a
  * custom LogicalPlan back to the session (standard practice for Spark
  * extension libraries; nothing else in graft lives in Spark's
  * namespace).
  */
object GraftDatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
