package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Bridge into `private[sql]` Dataset construction: wrapping an existing
  * `LogicalPlan` subtree back into a `DataFrame` (Spark's own
  * `Dataset.ofRows`, module-private in the classic package since Spark 4).
  * The plan auditor uses it to MEASURE a join child it found inside an
  * optimized plan — rows and key-NDV probes on the exact subtree the join
  * will consume — without reconstructing the query from source. */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
