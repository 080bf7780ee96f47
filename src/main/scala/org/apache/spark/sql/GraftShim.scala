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

  /** Rebuild a (local)checkpointed Dataset's LogicalRDD leaf WITHOUT its
    * origin constraints. A checkpoint that appears MULTIPLE times in one
    * consuming plan (e.g. an iteration level feeding both an output
    * union branch and the next iteration's join) gets deduplicated by
    * Catalyst via `newInstance`, which re-ids the leaf's output
    * attributes but leaves `originConstraints` referencing the ORIGINAL
    * ids — Union's constraint rewrite then dies with `key not found:
    * <attr>`. Origin constraints only feed optional filter inference, so
    * dropping them is always sound; origin stats are preserved (read
    * reflectively — they drive broadcast decisions, and losing them
    * would silently flip small frames to sort-merge joins). No-op for
    * non-checkpoint frames. */
  def dropOriginConstraints(ds: Dataset[_]): DataFrame = {
    val spark = ds.sparkSession.asInstanceOf[classic.SparkSession]
    ds.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val stats =
          try {
            val f = classOf[execution.LogicalRDD].getDeclaredField("originStats")
            f.setAccessible(true)
            f.get(lr).asInstanceOf[Option[catalyst.plans.logical.Statistics]]
          } catch { case _: Throwable => None }
        ofRows(spark, execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(spark, stats, None))
      case _ => ds.toDF()
    }
  }

  /** Unload every loaded StateStoreProvider and stop the state-store
    * maintenance thread. A stopped streaming query does NOT release its
    * state: HDFSBackedStateStoreProvider keeps the latest state-map
    * versions of every partition in executor memory, and the shared
    * maintenance task keeps waking up to snapshot/clean providers whose
    * (temp) checkpoint dirs are already gone. Across a 12-query streaming
    * family that residue degrades every query that runs after it —
    * in-sequence measurements stop matching isolated ones (VERDICT r05
    * item 1). Calling this after each completed streaming run restores
    * the session to its pre-streaming state; the maintenance task
    * restarts lazily on the next StateStore.get, so later streaming
    * queries are unaffected. */
  def unloadStreamingState(): Unit =
    execution.streaming.state.StateStore.stop()

  /** Loaded state-store provider count (bench diagnostic; -1 if the
    * private field moved — reflection only, nothing depends on it). */
  def loadedStateStores(): Int =
    try {
      val m = execution.streaming.state.StateStore.getClass
        .getDeclaredMethod("loadedProviders")
      m.setAccessible(true)
      m.invoke(execution.streaming.state.StateStore)
        .asInstanceOf[scala.collection.mutable.Map[_, _]].size
    } catch { case _: Throwable => -1 }
}
