package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation over a testdata
  * directory plus (when SQL-expressible) the equivalent DuckDB oracle over
  * the same parquet tables. Column names must match between the two — the
  * driver's comparator sorts columns by name before hashing. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
