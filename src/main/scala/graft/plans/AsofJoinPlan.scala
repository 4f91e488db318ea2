package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** The full custom-operator vertical the extension API exists for
  * (SURVEY §2 preference order (c)): a whole-operator semantic Spark lacks
  * — the backward as-of join — as a first-class LogicalPlan node, planned
  * by its own Strategy into a sort-merge physical operator.
  *
  * Contrast with `Joins.asofJoin` (the union+window REWRITE of the same
  * semantics): the rewrite doubles the row stream through one window; this
  * native operator sorts each side once and streams a single forward merge
  * pass per co-partition — no union row inflation, no window state, and
  * downstream operators see the left side's partitioning and ordering
  * unchanged (`outputPartitioning`/`outputOrdering` pass through), so a
  * following aggregate on the same key needs NO new exchange.
  *
  * Semantics (matches `Joins.asofJoin` and DuckDB `ASOF LEFT JOIN`):
  * for every left row, the right row with the greatest rightTime ≤
  * leftTime (inclusive) within the same key; unmatched left rows keep
  * NULL payload. Right rows tied on (key, time) resolve to the greatest
  * payload tuple (the required child ordering appends the payload columns,
  * so "last consumed" is deterministic). NULL right times sort first and
  * are consumed without ever matching; NULL keys never match.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], outAttrs: Seq[Attribute])
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outAttrs
  // outAttrs are PRODUCED here, not referenced from the children — without
  // this, CheckAnalysis flags them as missing inputs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, p, out) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p, out) :: Nil
    case _ => Nil
  }
}

/** Sort-merge backward as-of join: children hash-clustered on their keys
  * (EnsureRequirements co-partitions them exactly as for a sort-merge
  * join) and sorted by (key, time) — the merge is then one forward pass
  * per partition holding ONE candidate row of state, never a buffer. */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], outAttrs: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    // payload columns appended on the right: deterministic "last wins"
    // among rows tied on (key, time)
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      payload.map(p => SortOrder(p, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lkIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rkIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0,
      "as-of join key/time attributes must come from the child outputs")
    val payloadExprs = payload
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // projections are NOT serializable plan state — build per partition
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val keyProj = UnsafeProjection.create(Seq(rightKey), rOut)
      val nullPayload = new GenericInternalRow(payloadExprs.length)
      val joined = new JoinedRow
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      // one row of merge state: the best-so-far right row's key + payload
      // (copied — the child iterator reuses its row buffer)
      var lastKeyRow: InternalRow = null
      var lastPayload: InternalRow = null
      lIter.map { lrow =>
        val lk = lrow.get(lkIdx, keyDt)
        val lt = lrow.get(ltIdx, timeDt)
        var halt = false
        while (!halt && rRow != null) {
          val rk = rRow.get(rkIdx, keyDt)
          val cmpK =
            if (rk == null) -1 // nulls-first: consumable, never matches
            else if (lk == null) 1
            else keyOrd.compare(rk, lk)
          val consumable = cmpK < 0 || (cmpK == 0 && {
            val rt = rRow.get(rtIdx, timeDt)
            rt == null || (lt != null && timeOrd.compare(rt, lt) <= 0)
          })
          if (consumable) {
            val rt = rRow.get(rtIdx, timeDt)
            if (rk != null && rt != null) {
              lastKeyRow = keyProj(rRow).copy()
              lastPayload = payloadProj(rRow).copy()
            }
            rRow = if (rIter.hasNext) rIter.next() else null
          } else halt = true
        }
        val matched = lk != null && lastKeyRow != null && {
          val sk = lastKeyRow.get(0, keyDt)
          sk != null && keyOrd.compare(sk, lk) == 0
        }
        joined(lrow, if (matched) lastPayload else nullPayload)
      }
    }
  }
}
