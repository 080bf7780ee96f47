package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The salting pattern for skewed aggregation keys: l_returnflag has 3
  * values over 600k rows (sf0.1) — a direct groupBy puts each key's
  * entire volume through one reducer. Two-phase salted aggregation
  * (groupBy(key, salt) partial, then groupBy(key) final) spreads phase 1
  * across `salt` reducers per key and must be value-identical. (Spark's
  * hash aggregates already do map-side partial aggregation, which
  * resolves most count/sum skew; explicit salting is the pattern for
  * high-cardinality state per key — collect_set, exact distinct — and
  * for skewed JOIN keys, where AQE's skew-join split is the built-in
  * alternative.) */
class SaltingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("two-phase salted aggregation equals the direct aggregation") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("k"),
        expr("cast(round(l_extendedprice * 100, 0) as bigint)").as("cents"))

    val direct = li.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val salted = li
      .withColumn("salt", pmod(hash(monotonically_increasing_id()), lit(16)))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pn"), sum("cents").as("ps"))
      .groupBy("k")
      .agg(sum("pn").as("n"), sum("ps").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(salted == direct)
  }
}
