package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class planner operator — the (c)-tier custom
  * operator path (logical node → Strategy → physical exec) for a
  * semantics Spark has no native join type for: match each left row
  * to the LAST right row of the same key that sorts strictly before
  * it in `(time...)` lexicographic order, null-padding left rows with
  * no prior match (left-outer as-of; the point-in-time join of
  * feature stores and market data, cf. pandas `merge_asof` and
  * QuestDB/kdb ASOF JOIN).
  *
  * Physical algorithm ([[AsOfJoinExec]]): both sides hash-partitioned
  * on their keys and sorted by (keys, time) — the distribution and
  * ordering are DECLARED ([[AsOfJoinExec.requiredChildDistribution]]
  * / [[AsOfJoinExec.requiredChildOrdering]]), so Catalyst's
  * EnsureRequirements plants the exchanges and sorts and can elide
  * them when the child is already co-partitioned (a bucketed history
  * table pays no shuffle, exactly like SMJ). Each co-partition pair
  * then streams ONE forward merge: O(|L|+|R|) per partition, one
  * buffered right row, no per-row search, no window materialization.
  *
  * Contrast with the union+window as-of (q38), which this engine
  * keeps as the default: that form is one shuffle of the UNION —
  * ideal when both sides are event slices of the same table. The
  * planner operator wins when the sides are separate relations
  * (different schemas/sources, a bucketed right side, or a right
  * side far larger than the left) — and it is the load-bearing demo
  * that this library can extend Spark at the PLAN level, not only
  * the expression level.
  */
case class AsOfJoinPlan(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Seq[Expression], rightTime: Seq[Expression],
    left: LogicalPlan, right: LogicalPlan,
    tolerance: Option[Long] = None) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty key lists")
  require(leftTime.length == rightTime.length && leftTime.nonEmpty,
    "as-of join needs matching, non-empty time lists")
  require(tolerance.isEmpty ||
    leftTime.head.dataType == org.apache.spark.sql.types.LongType,
    "tolerance needs a LongType leading time column")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * `spark.experimental.extraStrategies` by
  * [[graft.functions.GraftFunctions.ensureRegistered]] and via
  * `SparkSessionExtensions.injectPlannerStrategy` by
  * [[graft.functions.GraftExtensions]]. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, l, r, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Seq[Expression], rightTime: Seq[Expression],
    left: SparkPlan, right: SparkPlan,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightTime).map(SortOrder(_, Ascending)))

  // rows stream out in the left child's (keys, time) order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys; val rk = rightKeys; val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyL = UnsafeProjection.create(lk, leftOut)
      val keyR = UnsafeProjection.create(rk, rightOut)
      val timeL = UnsafeProjection.create(lt, leftOut)
      val timeR = UnsafeProjection.create(rt, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(lt.map(_.dataType))
      // bind against NULLABLE right attributes: binding by the child's
      // original non-nullable flags would elide the null checks and
      // read 0s out of the null-padded row
      val resultProj = UnsafeProjection.create(output,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      val tol = tolerance
      // the last right row consumed whose key we are still inside
      var matchKey: InternalRow = null
      var matchRow: InternalRow = null
      var matchT1: Long = 0L
      lIter.map { l =>
        val lKey = keyL(l).copy()
        val lTime = timeL(l).copy()
        // consume every right row sorting strictly before (lKey, lTime);
        // left is sorted too, so the pointer only ever moves forward
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rKeyCmp = keyOrd.compare(keyR(rBuf.head), lKey)
          if (rKeyCmp < 0 ||
              (rKeyCmp == 0 && timeOrd.compare(timeR(rBuf.head), lTime) < 0)) {
            val r = rBuf.next()
            if (rKeyCmp == 0) {
              matchKey = lKey; matchT1 = timeR(r).getLong(0); matchRow = r.copy()
            } else { matchKey = null; matchRow = null }
          } else advancing = false
        }
        val m =
          if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0 &&
              tol.forall(t => lTime.getLong(0) - matchT1 <= t)) matchRow
          else nullRight
        resultProj(joined(l, m))
      }
    }
  }
}
