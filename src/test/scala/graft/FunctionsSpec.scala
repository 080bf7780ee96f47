package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Differential tests for the native codegen'd expressions against their
  * composed built-in equivalents — same inputs, bit-equal outputs.
  * Inputs are seeded-random (deterministic) and include adversarial
  * shapes: empty arrays, disjoint/identical sets, length mismatches. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("array_dot_long equals aggregate(zip_with(*)) on random vectors") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)(
      (Seq.fill(16)(rnd.nextLong() % 4000000L),
        Seq.fill(16)(rnd.nextLong() % 4000000L))) ++
      Seq((Seq.empty[Long], Seq.empty[Long]), (Seq(5L), Seq.empty[Long]))
    val got = pairs.toDF("a", "b").select(
      expr("array_dot_long(a, b)").as("native"),
      expr("coalesce(aggregate(zip_with(a, b, (x, y) -> coalesce(x * y, 0L)), " +
        "0L, (acc, v) -> acc + v), 0L)").as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("array_intersect_count equals size(array_intersect) on random string sets") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(500)(
      (Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(40)}").distinct,
        Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(40)}").distinct)) ++
      Seq((Seq.empty[String], Seq("x")), (Seq("x"), Seq.empty[String]),
        (Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b")))
    val got = pairs.toDF("a", "b").select(
      expr("array_intersect_count(a, b)").as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != builtin ${r.getLong(1)}"))
  }

  test("array_intersect_count dedups duplicate elements like the builtin") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // NON-distinct arrays: remove-on-match must count each common
    // element once, exactly as array_intersect's dedup does
    val pairs = Seq.fill(500)(
      (Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(10)}"),
        Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(10)}"))) ++
      Seq((Seq("a", "a", "b"), Seq("a")), (Seq("a"), Seq("a", "a")))
    val got = pairs.toDF("a", "b").select(
      expr("array_intersect_count(a, b)").as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0)} != builtin ${r.getLong(1)}"))
  }

  test("optimizer rewrites size(array_intersect) to the native kernel") {
    graft.functions.GraftFunctions.register(spark)
    // parquet-backed source so constant folding can't evaluate the
    // whole expression away; split() yields the containsNull=false
    // arrays the rewrite's soundness guard requires
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.limit(50).select(col("doc_id"),
      expr("size(array_intersect(split(text, ' '), split(lang, ' ')))").as("c"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("array_intersect_count"),
      s"rewrite did not fire in:\n$plan")
    // semantic check vs the un-rewritten form: casting to array<string>
    // re-marks containsNull=true, so the soundness guard blocks the rule
    val want = docs.limit(50).select(col("doc_id"),
      expr("size(array_intersect(cast(split(text, ' ') as array<string>), " +
        "cast(split(lang, ' ') as array<string>)))").as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
  }

  test("array_intersect_count ignores null elements and handles empties") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT array_intersect_count(array('x', cast(null as string), 'y'),
        |                             array('y', 'z', cast(null as string))) AS c,
        |       array_intersect_count(cast(array() as array<string>), array('y')) AS e""".stripMargin)
    val r = df.collect()(0)
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 0L)
  }
}
