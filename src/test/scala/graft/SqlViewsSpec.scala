package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraphLoader

/** The spark.sql entry point over the graph projection: registered temp
  * views answer the same 2-hop query the MiniGQL engine executes. */
class SqlViewsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("spark.sql over graph views matches the MiniGQL result") {
    GraphLoader.registerViews(spark, dir)
    val sql = spark.sql(
      """SELECT s.src AS s, s.dst AS n, r.dst AS r
        |FROM edge_snation s
        |JOIN edge_nregion r ON s.dst = r.src
        |JOIN node_region reg ON r.dst = reg.id
        |WHERE reg.name = 'EUROPE'""".stripMargin)
      .collect().map(_.toSeq).toSet
    val gql = SparkEntry.queries("gql_match_2hop")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(sql == gql)
    assert(sql.nonEmpty)
  }
}
