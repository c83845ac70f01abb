package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical sorted-merge AS-OF join (see GraftAsOfJoin for semantics).
  *
  * Catalyst contract: both children require `ClusteredDistribution` on
  * the join keys (EnsureRequirements co-partitions them with one
  * exchange per side, exactly like a shuffled equi-join) and a
  * per-partition sort by (keys, ts[, tiebreak]). `doExecute` then zips
  * partition pairs and merges in a single forward pass: the right
  * cursor only ever advances, and the operator state is ONE buffered
  * right row — O(|L|+|R|) time, O(1) memory, no candidate
  * materialization, no spill surface. The 100 TB version is therefore
  * bounded by the two exchanges, the same floor as any shuffled join.
  */
case class GraftAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def asc(e: Expression): SortOrder = SortOrder(e, Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftKeys.map(asc) :+ asc(leftTs),
      (rightKeys.map(asc) :+ asc(rightTs)) ++ rightTiebreak.map(asc))

  // left rows pass through in order, one output row per input row
  override def outputOrdering: Seq[SortOrder] = leftKeys.map(asc) :+ asc(leftTs)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): GraftAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      // bind by ordinal with the RIGHT side forced nullable: binding
      // `output` against the children's attributes would inherit the
      // children's non-null flags, and codegen would then skip the null
      // check and read 0 from the all-null unmatched row
      val outProj = UnsafeProjection.create(
        lOut.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable) } ++
        rOut.zipWithIndex.map { case (a, i) =>
          BoundReference(lOut.length + i, a.dataType, true) })
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered
      // O(1) merge state: the latest right row (and its key) not after
      // the current left timestamp. Projections reuse their row object,
      // so buffered values are copies.
      var lastRight: InternalRow = null
      var lastRightKey: UnsafeRow = null
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsRow = lTsProj(l)
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val c = keyOrd.compare(rKeyProj(head), lKey)
            if (c < 0 || (c == 0 && tsOrd.compare(rTsProj(head), lTsRow) <= 0)) {
              val r = rBuf.next()
              if (c == 0) {
                lastRight = r.copy()
                lastRightKey = rKeyProj(r).copy()
              }
            } else advance = false
          }
          val matched = lastRightKey != null &&
            keyOrd.compare(lastRightKey, lKey) == 0
          if (matched) numMatched += 1
          numOutputRows += 1
          outProj(joined(l, if (matched) lastRight else nullRight))
        }
      }
    }
  }
}

/** Planner strategy translating the logical node (injected via
  * `GraftExtensions.injectPlannerStrategy`). */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftAsOfJoin(l, r, lk, rk, lt, rt, tb) =>
      GraftAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}
