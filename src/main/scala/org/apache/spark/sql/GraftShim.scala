package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-private bridge: `Dataset.ofRows` is `private[sql]`, and a
  * library injecting its own logical operators (graft.plans.AsOfJoin)
  * needs to wrap a constructed plan back into a DataFrame. Standard
  * extension-library technique (same approach as Delta et al.). */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Release the storage blocks behind an (eager local) checkpointed
    * Dataset. `Dataset.localCheckpoint` persists the physical plan's RDD
    * and wraps it in a LogicalRDD — there is no public API to unpersist
    * it again, so long loops of checkpoints (iterative graph algorithms)
    * or long sessions (the 78-query bench) accumulate dead blocks until
    * the block manager thrashes. Safe ONLY once nothing live derives from
    * the checkpoint: a localCheckpoint has no lineage, so dropped blocks
    * are gone, not recomputable. No-op for non-checkpoint frames. */
  def unpersistCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
