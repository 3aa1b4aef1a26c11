package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: graft's fourth physical strategy for the
  * reference's flagship operator (store.py:261-334), this one as a
  * first-class Catalyst operator — a custom `LogicalPlan` node planned
  * by [[AsOfJoinStrategy]] into [[AsOfJoinExec]], a single streaming
  * merge pass per co-partitioned, co-sorted partition pair.
  *
  * Semantics (identical to `PointInTime.asOfJoin`, same DuckDB oracle):
  * for each spine row (e, t) emit the feature row with entity e and the
  * greatest (timestamp, tieBreak...) <= (t, ∞); no match → no row
  * (inner as-of); duplicate spine rows emit duplicate outputs.
  *
  * Physical shape vs the window formulation: the union+window plan
  * shuffles spine+features together, sorts, and materializes a running
  * whole-row struct through a window buffer. This exec instead declares
  * `ClusteredDistribution(entity)` + per-partition `(entity, ts)`
  * ordering for both children and lets EnsureRequirements plan the
  * minimal exchanges/sorts (reusing existing layout when the feature
  * table is already bucketed or sorted — e.g. graft's registration-time
  * layout), then merges the two sorted streams with O(1) state: the
  * latest qualifying feature row. No window buffer, no struct packing,
  * no second shuffle.
  *
  * Null ordering matches the window formulation exactly: null entities
  * group together; a null feature ts sorts first and thus qualifies for
  * every probe of its entity; a null spine ts admits only null-ts
  * feature rows.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftEntity: Attribute,
    leftTs: Attribute,
    rightEntity: Attribute,
    rightTs: Attribute,
    rightTieBreak: Seq[Attribute])
    extends BinaryNode {

  override def output: Seq[Attribute] = right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]]; register via `GraftExtensions` (config
  * `spark.sql.extensions=graft.GraftExtensions`) or the programmatic
  * `spark.experimental.extraStrategies` path in `PointInTime`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, le, lt, re, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), le, lt, re, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftEntity: Expression,
    leftTs: Expression,
    rightEntity: Expression,
    rightTs: Expression,
    rightTieBreak: Seq[Expression])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = right.output

  /** Both sides cluster on entity — HashPartitioning hashes key *values*,
    * so equal entities land in the same partition index on both sides
    * (the same co-partitioning contract SortMergeJoinExec relies on).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftEntity)) ::
      ClusteredDistribution(Seq(rightEntity)) :: Nil

  /** Spine in (entity, ts) order; features in (entity, ts, tieBreak...)
    * order so "last qualifying row in sort order" IS the as-of winner.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftEntity, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightEntity, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    val lEnt = BindReferences.bindReference(leftEntity, left.output)
    val lTs = BindReferences.bindReference(leftTs, left.output)
    val rEnt = BindReferences.bindReference(rightEntity, right.output)
    val rTs = BindReferences.bindReference(rightTs, right.output)
    val entOrd = TypeUtils.getInterpretedOrdering(leftEntity.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)

    left.execute().zipPartitions(right.execute()) { (spineIter, featIter) =>
      // nulls-first comparison, mirroring SortOrder(Ascending)'s default
      // NullsFirst — entity null==null groups; ts null sorts lowest
      def cmp(ord: Ordering[Any], a: Any, b: Any): Int =
        if (a == null) { if (b == null) 0 else -1 }
        else if (b == null) 1
        else ord.compare(a, b)

      new Iterator[InternalRow] {
        private var featBuf: InternalRow =
          if (featIter.hasNext) featIter.next() else null
        // latest qualifying feature row (stable copy) + its entity,
        // extracted from the copy so references outlive buffer reuse
        private var curFeat: InternalRow = null
        private var curFeatEntity: Any = null
        private var nextOut: InternalRow = null

        private def advanceFeat(e: Any, t: Any): Unit = {
          // discard feature entities sorted before the probe's
          while (featBuf != null && cmp(entOrd, rEnt.eval(featBuf), e) < 0)
            featBuf = if (featIter.hasNext) featIter.next() else null
          // consume qualifying rows (same entity, ts <= t); the last one
          // consumed is the as-of winner thanks to the sort order
          while (featBuf != null && cmp(entOrd, rEnt.eval(featBuf), e) == 0 &&
              cmp(tsOrd, rTs.eval(featBuf), t) <= 0) {
            curFeat = featBuf.copy()
            curFeatEntity = rEnt.eval(curFeat)
            featBuf = if (featIter.hasNext) featIter.next() else null
          }
        }

        private def computeNext(): Unit = {
          while (nextOut == null && spineIter.hasNext) {
            val probe = spineIter.next()
            val e = lEnt.eval(probe)
            val t = lTs.eval(probe)
            advanceFeat(e, t)
            if (curFeat != null && cmp(entOrd, curFeatEntity, e) == 0)
              nextOut = curFeat
          }
        }

        override def hasNext: Boolean = { computeNext(); nextOut != null }

        override def next(): InternalRow = {
          computeNext()
          if (nextOut == null) throw new NoSuchElementException("empty iterator")
          val r = nextOut
          nextOut = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
