package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout proof for p_io_zorder: the Morton-key clustering must bound
  * BOTH dimensions inside every output file — that is the property a
  * single-axis sort cannot have (a partkey sort leaves every file's
  * suppkey range at 100% of the domain), and the property that turns
  * parquet footer min/max stats into 2-D file skipping. The correctness
  * hash can't see this: a broken z computation that degenerated to a
  * 1-D sort would still return the right box aggregate.
  */
class ZorderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("z-ordered files each cover a bounded box in BOTH dimensions") {
    // run the operator (writes the layout, returns the box aggregate)
    SparkEntry.queries("p_io_zorder")(spark, dir).collect()
    val out = graft.operators.IoOps.scratch("zorder", dir)
    val files = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      .collect()
    assert(files.length >= 4, s"expected a multi-file layout, got ${files.length}")
    val (gp0, gp1) = (files.map(_.getLong(1)).min, files.map(_.getLong(2)).max)
    val (gs0, gs1) = (files.map(_.getLong(3)).min, files.map(_.getLong(4)).max)
    def med(xs: Array[Double]) = xs.sorted.apply(xs.length / 2)
    val pFrac = files.map(r => (r.getLong(2) - r.getLong(1)).toDouble / (gp1 - gp0))
    val sFrac = files.map(r => (r.getLong(4) - r.getLong(3)).toDouble / (gs1 - gs0))
    // Morton arcs over 8 equal-count cuts cover ~1/2 x ~1/4 boxes; a 1-D
    // sort would put one dimension's median fraction at ~1.0. Margin for
    // range-partitioner sampling noise.
    assert(med(pFrac) < 0.9, s"partkey not bounded per file: ${pFrac.sorted.mkString(",")}")
    assert(med(sFrac) < 0.9, s"suppkey not bounded per file: ${sFrac.sorted.mkString(",")}")
    // 2-D skipping is real: at least one file's box misses the
    // operator's own query box (partkey 40..90, suppkey 2..4), so a
    // stats-aware reader opens strictly fewer files than exist
    val pruned = files.count(r => r.getLong(2) < 40 || r.getLong(1) > 90 ||
      r.getLong(4) < 2 || r.getLong(3) > 4)
    assert(pruned >= 1, "no file is skippable for the 2-D box query:\n" +
      files.map(r => s"  ${r.getString(0).split('/').last}: " +
        s"p[${r.getLong(1)},${r.getLong(2)}] s[${r.getLong(3)},${r.getLong(4)}]").mkString("\n"))
  }

  test("both box predicates push down to the z-ordered parquet scan") {
    // formatted mode prints PushedFilters untruncated (the plain plan
    // string elides the list past ~100 chars)
    val p = SparkEntry.queries("p_io_zorder")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GreaterThanOrEqual(l_partkey,40") &&
      p.contains("LessThanOrEqual(l_suppkey,4"),
      s"box predicates not pushed to the scan in:\n$p")
  }
}
