package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join — the canonical operator Spark's built-ins cannot express
  * as a single relational node (SURVEY.md §4.2 preference (c): custom
  * LogicalPlan + Strategy + SparkPlan). For each left row, attach the
  * right row with the greatest `rightTime <= leftTime` within the same
  * key group (inner semantics: lefts with no candidate drop). The
  * training-pipeline use is point-in-time-correct feature attachment —
  * "the latest signal known at event time", with no future leakage.
  *
  * Physical contract: both children hash-clustered on the key and sorted
  * by (key, time) — declared via requiredChildDistribution/Ordering, so
  * EnsureRequirements plans the exchanges and sorts (co-partitioned like
  * a sort-merge join; AQE-compatible). Execution is then a single-pass
  * two-pointer merge per partition pair: O(|L|+|R|), no buffering beyond
  * one candidate row. Keys and times are LongType expressions (wrap
  * timestamps with unix_micros).
  */
final case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // The merge is a per-partition pass over the left child: output rows
  // stay in the left's partitioning and (key, time) order. Declaring that
  // (as sort-merge join does) lets a downstream key-partitioned operator
  // reuse this layout instead of inserting a redundant exchange/sort
  // (ADVICE r02: UnknownPartitioning forced a re-shuffle).
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(schema, schema)
      // NULL key/time rows never match, like any SQL join predicate —
      // filter both sides up front instead of letting a null eval coerce
      // to 0L and silently join the wrong group. (Nulls sort first under
      // Ascending, so dropping them preserves the merge's sort contract.)
      def nonNull(keyE: Expression, timeE: Expression)(row: InternalRow): Boolean =
        keyE.eval(row) != null && timeE.eval(row) != null
      val rBuf = rIter.filter(nonNull(rk, rt)).buffered
      // best candidate so far for the current key (right rows are reused
      // by the scan, so retain a copy)
      var bestKey = 0L
      var best: InternalRow = null
      lIter.filter(nonNull(lk, lt)).flatMap { lRow =>
        val k = lk.eval(lRow).asInstanceOf[Long]
        val t = lt.eval(lRow).asInstanceOf[Long]
        // drop right rows from earlier key groups
        while (rBuf.hasNext && rk.eval(rBuf.head).asInstanceOf[Long] < k) rBuf.next()
        // absorb candidates: same key, time <= left time (sorted, so the
        // last absorbed is the greatest admissible)
        while (rBuf.hasNext && rk.eval(rBuf.head).asInstanceOf[Long] == k &&
               rt.eval(rBuf.head).asInstanceOf[Long] <= t) {
          best = rBuf.next().copy()
          bestKey = k
        }
        if (best != null && bestKey == k) Some(toUnsafe(joined(lRow, best)))
        else None
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
