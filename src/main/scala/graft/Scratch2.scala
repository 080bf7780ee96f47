package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_nationkey").as("d"))
    val dists = Ckpt.eagerPartitioned(base.groupBy("id").agg(min("d").as("d")))
    val cand = base.filter(col("d") > 2).groupBy("id").agg(min(col("d") + 1).as("cand"))
    // full-outer merge, then checkpoint with AQE off: what partitioning
    // does the checkpoint leaf report, and does the NEXT join re-shuffle it?
    val joined = Ckpt.deferredPartitioned(dists.join(cand, Seq("id"), "left"))
    val n = joined.filter(col("d").isNull).count()
    println(s"new rows: $n")
    println("joined leaf partitioning: " +
      joined.queryExecution.optimizedPlan.collectLeaves().map {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning.toString
        case other => other.getClass.getSimpleName
      }.mkString(" | "))
    // consume: another keyed join against it
    val dists2 = joined.select(col("id"), coalesce(col("d"), col("cand")).as("d"))
    val probe = base.groupBy("id").agg(max("d").as("x"))
    val merged2 = dists2.join(probe, Seq("id"), "left")
    merged2.count()
    val p = merged2.queryExecution.executedPlan.toString
    println("exchanges in consumer: " + "Exchange".r.findAllIn(p).size)
    println(p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
