package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Engine
import graft.sources.GraphStore

/** Round-trip: execute a program, persist the resulting graph, reload it,
  * and run a further query against the reloaded graph. */
class StoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("save/load round-trips graph, schema, and supports further queries") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/graphDB/test/entreprise.q")))
    val r = Engine.runSource(spark, src)
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    GraphStore.save(r.graph, dir, partitions = 2)

    val g2 = GraphStore.load(spark, dir)
    assert(g2.schema == r.graph.schema)
    for (l <- r.graph.schema.nodeAttrs.keys) {
      val a = r.graph.nodes(l).collect().map(_.toSeq).toSet
      val b = g2.nodes(l).collect().map(_.toSeq).toSet
      assert(a == b, s"nodes($l)")
    }
    for (k <- r.graph.schema.relTypes) {
      assert(r.graph.edges(k).collect().map(_.toSeq).toSet ==
        g2.edges(k).collect().map(_.toSeq).toSet, s"edges($k)")
    }

    // run a fresh query over the persisted graph (ids continue from 4)
    val q = "match (p:P) -[:emp]-> (e:E) where p.age >= 25 return p, e"
    val r2 = Engine.runSourceOn(spark, GraphStore.schemaGql(g2.schema) + q, g2, 100L)
    assert(r2.bindings.collect().map(_.toSeq).toSeq == Seq(Seq(0L, 1L)))
  }

  test("bucketed save/load round-trips and answers the same queries") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/graphDB/test/entreprise.q")))
    val r = Engine.runSource(spark, src)
    GraphStore.saveBucketed(r.graph, spark, "storespec_bkt", buckets = 2)

    val g2 = GraphStore.loadBucketed(spark, "storespec_bkt")
    assert(g2.schema == r.graph.schema)
    for (l <- r.graph.schema.nodeAttrs.keys)
      assert(r.graph.nodes(l).collect().map(_.toSeq).toSet ==
        g2.nodes(l).collect().map(_.toSeq).toSet, s"nodes($l)")
    for (k <- r.graph.schema.relTypes)
      assert(r.graph.edges(k).collect().map(_.toSeq).toSet ==
        g2.edges(k).collect().map(_.toSeq).toSet, s"edges($k)")

    val q = "match (p:P) -[:emp]-> (e:E) where p.age >= 25 return p, e"
    val r2 = Engine.runSourceOn(spark, GraphStore.schemaGql(g2.schema) + q, g2, 100L)
    assert(r2.bindings.collect().map(_.toSeq).toSeq == Seq(Seq(0L, 1L)))

    // overwriting the same store name is clean (fresh managed tables)
    GraphStore.saveBucketed(r.graph, spark, "storespec_bkt", buckets = 2)
    assert(GraphStore.loadBucketed(spark, "storespec_bkt")
      .nodes("P").count() == r.graph.nodes("P").count())
  }
}
