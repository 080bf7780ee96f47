package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Co-located join via bucketed tables: both sides bucketed+sorted on the
  * join key produce a sort-merge join with NO exchange on either side —
  * the layout a 100 TB deployment uses for recurring fact-dim joins
  * (GraphStore's repartition-by-key parquet is the file-level analogue;
  * bucketed catalog tables add the metadata that lets the planner skip
  * the shuffle). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("join of co-bucketed tables plans without exchanges") {
    val dir = "/root/testdata/sf0.001"
    // explicit table paths — warehouse.dir is a static conf
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")

    // the test tables are broadcast-sized, which would bypass bucketing
    // entirely — force the sort-merge path to show the bucketed layout
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")

      // and it computes the same thing as the shuffled join
      val plain = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
