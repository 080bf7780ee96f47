package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.plans.AsOf

/** Edge-case tests for the custom as-of join operator, against an
  * in-memory replay: boundary equality (t_r == t_l matches), lefts
  * before any right (drop), key groups with no rights at all, and
  * multi-partition execution. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    val sp = spark
    import sp.implicits._
    // fresh attribute ids per side by construction
    val l = left.toDF("lid", "k", "t").repartition(5)
    val r = right.toDF("rid", "rk", "rt").repartition(3)
    AsOf.join(l, r, "k", "t", "rk", "rt")
      .select(col("lid"), col("rid")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  private def expected(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) =
    left.flatMap { case (lid, k, t) =>
      val cands = right.filter(r => r._2 == k && r._3 <= t)
      if (cands.isEmpty) None
      else Some(lid -> cands.maxBy(r => (r._3, r._1))._1)
    }.toSet

  test("boundary equality matches; earlier lefts drop; empty key groups drop") {
    val left = Seq(
      (1L, 10L, 100L), // exact-boundary: right at t=100 matches
      (2L, 10L, 99L),  // before the only candidate -> drop... except t=50 exists
      (3L, 10L, 49L),  // before every right of key 10 -> drop
      (4L, 20L, 500L), // key with no rights at all -> drop
      (5L, 30L, 7L))   // matches its key's single right at t=7
    val right = Seq(
      (101L, 10L, 50L),
      (102L, 10L, 100L),
      (103L, 30L, 7L))
    assert(run(left, right) == Set((1L, 102L), (2L, 101L), (5L, 103L)))
    assert(run(left, right) == expected(left, right))
  }

  test("declared output partitioning: no exchange between as-of join and a key groupBy") {
    val sp = spark
    import sp.implicits._
    val l = Seq.tabulate(100)(i => (i.toLong, (i % 7).toLong, i.toLong)).toDF("lid", "k", "t")
    val r = Seq.tabulate(50)(i => (i.toLong, (i % 7).toLong, i.toLong)).toDF("rid", "rk", "rt")
    val agg = AsOf.join(l, r, "k", "t", "rk", "rt").groupBy("k").count()
    val plan = agg.queryExecution.executedPlan.toString
    // the join output is already clustered on k (left.outputPartitioning
    // is declared), so the downstream groupBy must NOT re-shuffle: the
    // only exchanges are the two feeding the join's children
    val joinPos = plan.indexOf("AsOfJoin")
    val abovePlan = plan.substring(0, joinPos max 0)
    assert(joinPos >= 0, s"no AsOfJoinExec in:\n$plan")
    assert(!abovePlan.contains("Exchange"),
      s"redundant exchange above AsOfJoinExec:\n$plan")
  }

  test("randomized multi-partition agreement with the in-memory replay") {
    val rnd = new scala.util.Random(7)
    // distinct times within a key so the arg-max is unique (the operator
    // picks the last in sort order among exact ties; the replay breaks
    // ties by id, which only coincides when times are distinct)
    val left = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(5000).toLong * 2))
    val right = scala.util.Random.shuffle(
      (for (k <- 0 until 12; j <- 0 until 40) yield
        ((k * 1000 + j).toLong, k.toLong, (j * 117 % 4999).toLong * 2 + 1)).toSeq)
    assert(run(left, right) == expected(left, right))
  }
}
