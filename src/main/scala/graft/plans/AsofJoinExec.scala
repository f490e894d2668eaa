package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Sort-merge backward-inclusive INNER as-of join (see [[AsofNative]]).
  *
  * Scale contract — this is the 100 TB shape of the operator:
  *   - `requiredChildDistribution` clusters BOTH sides on the join keys,
  *     so EnsureRequirements co-partitions them (one shuffle per side,
  *     same machinery as SortMergeJoin — no union relation, no padded
  *     null columns through the wire);
  *   - `requiredChildOrdering` demands (keys, ts) ascending per side, so
  *     the planner's SortExec does the only sorting and this operator is
  *     a pure streaming merge;
  *   - per partition the merge holds O(1) state: the build-side cursor
  *     plus ONE carried build row (the newest with ts <= the current
  *     probe ts for the current key). No hash table, no buffered window
  *     partition, nothing proportional to key group size — a hot key
  *     streams instead of materializing.
  *
  * NULL keys / NULL timestamps never match and are skipped on both
  * sides (inner semantics drop the probe row). Both inputs arrive
  * NULLS FIRST (Ascending default), so null-keyed rows cluster at the
  * front of each partition and are consumed before any comparable key.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // one output row per surviving probe row, in probe order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val lAttrs = left.output
    val rAttrs = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val lKeyProj = UnsafeProjection.create(lKeyExprs, lAttrs)
        private val rKeyProj = UnsafeProjection.create(rKeyExprs, rAttrs)
        private val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lAttrs)
        private val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rAttrs)
        private val keyOrd =
          RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
        private val tsOrd =
          RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
        private val joined = new JoinedRow
        private val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

        // build cursor: next unconsumed build row (copied — the child
        // iterator reuses its UnsafeRow buffer)
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var rHeadTs: UnsafeRow = _
        // carried match: newest build row whose ts <= current probe ts,
        // valid while the probe key equals candKey
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _

        private var nextOut: InternalRow = _
        private var exhausted = false

        private def loadRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val t = rTsProj(r)
            if (!k.anyNull && !t.isNullAt(0)) {
              rHead = r.copy()
              rHeadKey = k.copy()
              rHeadTs = t.copy()
            }
          }
        }

        private def advance(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lTs = lTsProj(lRow)
            if (!lKey.anyNull && !lTs.isNullAt(0)) {
              // the carried match is only valid within its key group
              if (cand != null && keyOrd.compare(candKey, lKey) != 0) cand = null
              var scanning = true
              while (scanning) {
                if (rHead == null) loadRight()
                if (rHead == null) scanning = false // build side drained
                else {
                  val kc = keyOrd.compare(rHeadKey, lKey)
                  if (kc < 0) {
                    // probe keys only ascend: this build key can never
                    // match a future probe — drop it
                    rHead = null
                  } else if (kc == 0 && tsOrd.compare(rHeadTs, lTs) <= 0) {
                    // newer qualifying build row supersedes the carry
                    cand = rHead
                    candKey = rHeadKey
                    rHead = null
                  } else {
                    scanning = false // cursor is ahead; keep for later probes
                  }
                }
              }
              if (cand != null && keyOrd.compare(candKey, lKey) == 0) {
                nextOut = resultProj(joined(lRow, cand))
              }
            }
          }
          exhausted = nextOut == null
        }

        override def hasNext: Boolean = {
          if (nextOut == null && !exhausted) advance()
          nextOut != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          val r = nextOut
          nextOut = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
