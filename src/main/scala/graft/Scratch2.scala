package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_nationkey").as("d"))
    // "ue": heavy invariant frame, pre-partitioned at 32
    val ue = Ckpt.eagerPartitioned(
      base.select(col("id").as("src"), col("d").as("dst")).repartition(32, col("src")))
    println("ue leaf: " + ue.queryExecution.optimizedPlan.collectLeaves().map {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning.toString
      case other => other.getClass.getSimpleName
    }.mkString(" | "))
    // now flip shuffle partitions down to 4 (loop-local)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // spine at 4 partitions
    val spine = Ckpt.eagerPartitioned(
      base.select(col("id"), when(col("id") === 1L, 0L).as("dd")).repartition(4, col("id")))
    println("spine leaf: " + spine.queryExecution.optimizedPlan.collectLeaves().map {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning.toString
      case other => other.getClass.getSimpleName
    }.mkString(" | "))
    // frontier (lazy projection of spine), join against ue(32): which side shuffles?
    val frontier = spine.filter(col("dd").isNotNull)
    val cand = ue.join(frontier, ue("src") === frontier("id"))
      .select(ue("dst").as("id"), (col("dd") + 1).as("cand"))
      .groupBy("id").agg(min("cand").as("cand"))
    val rawJoin = spine.join(cand, Seq("id"), "left")
    // plan WITH AQE OFF (what the checkpoint mark compiles)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println("=== superstep plan (AQE off, shuffle=4) ===")
    println(rawJoin.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(150))
      .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("HashAggregate") || l.contains("Scan ExistingRDD")).mkString("\n"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val joined = Ckpt.deferredPartitioned(rawJoin)
    joined.count()
    println("joined leaf: " + joined.queryExecution.optimizedPlan.collectLeaves().map {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning.toString
      case other => other.getClass.getSimpleName
    }.mkString(" | "))
    println("joined rdd partitions: " + joined.rdd.getNumPartitions)
    spark.stop()
  }
}
