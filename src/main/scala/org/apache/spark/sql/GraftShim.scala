package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-private bridge: `Dataset.ofRows` is `private[sql]`, and a
  * library injecting its own logical operators (graft.plans.AsOfJoin)
  * needs to wrap a constructed plan back into a DataFrame. Standard
  * extension-library technique (same approach as Delta et al.). */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
