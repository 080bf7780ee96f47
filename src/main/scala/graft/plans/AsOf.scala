package graft.plans

import org.apache.spark.sql.{DataFrame, GraftShim}

/** Public API for the as-of join operator.
  *
  * `AsOf.join(trades, quotes, "sym", "t", "sym", "t")` — for each left
  * row, the right row with the greatest time <= the left's time in the
  * same key group (inner). Key and time columns must be LongType (wrap
  * timestamps with unix_micros first) and are referenced BY NAME against
  * each side's analyzed output, so the constructed plan is fully
  * resolved. Left and right must not share attribute ids (derive them
  * from separate reads, or alias one side) — the node concatenates both
  * outputs verbatim.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    def attr(df: DataFrame, n: String) =
      df.queryExecution.analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${df.queryExecution.analyzed.output.map(_.name)}"))
    GraftShim.ofRows(spark, AsOfJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(left, leftTime),
      attr(right, rightKey), attr(right, rightTime)))
  }
}
