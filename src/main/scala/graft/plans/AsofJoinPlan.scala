package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, ExpressionInfo, PredicateHelper, Unevaluable}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native as-of join, end to end through Catalyst (SURVEY.md §2.3 —
  * the one relational operator here that Spark's logical algebra cannot
  * express as a single node). Where [[graft.ops.AsOfJoin]] EMULATES the
  * operator by composing built-ins (union both sides + one window pass),
  * this module gives the engine a first-class operator:
  *
  *   - [[AsofMarker]]: an unevaluable boolean carrier, registered as the
  *     SQL function `asof_marker`, so the PUBLIC `Dataset.join(right,
  *     cond, "inner")` API can transport the as-of spec through the
  *     analyzer without touching any private[sql] constructor;
  *   - [[AsofJoinRewrite]]: an optimizer rule that rewrites
  *     `Join(l, r, Inner, asof_marker(..))` into the [[AsofJoin]]
  *     logical node (any residual conjuncts become a post-join Filter);
  *   - [[AsofJoinStrategy]]: a planner strategy mapping the logical node
  *     to [[AsofJoinExec]], the sort-merge physical operator.
  *
  * All three are registered by [[graft.functions.GraftExtensions]] via
  * `injectFunction` / `injectOptimizerRule` / `injectPlannerStrategy`
  * (with a `spark.experimental.*` fallback for sessions built without
  * the extensions).
  *
  * Why a custom physical operator when the window emulation is already
  * single-shuffle: the emulation pays for generality — it unions probe
  * and build rows into ONE relation (padding each side with the other
  * side's null columns), sorts that union, and runs a window whose
  * running-`last` state is materialized per row. The native exec
  * shuffles/sorts each side SEPARATELY (narrower rows, smaller sort
  * keys), then streams both sorted iterators with O(1) state — one
  * carried build row — per key, emitting matches directly. Same
  * asymptotics, strictly less data through the shuffle and sort, and
  * the operator shows up in EXPLAIN as itself (`AsofJoinExec`), not as
  * an opaque union+window idiom.
  *
  * Semantics: backward INNER as-of — for each probe row the build row
  * with the greatest `rightTs <= leftTs` among equal keys; probes with
  * no qualifying build row are DROPPED (DuckDB `ASOF JOIN` semantics;
  * the left-outer variant is [[graft.ops.AsOfJoin.asof]]). NULL keys and
  * NULL timestamps never match, on either side (equality/ordering
  * predicates are NULL-rejecting). The build side must be unique per
  * (keys, rightTs): equal-timestamp build rows have no defined winner in
  * any as-of engine — pre-aggregate (e.g. max_by) to make the winner
  * explicit.
  */
object AsofNative {

  /** Backward-inclusive INNER as-of join through the native operator.
    *
    * @param left    probe side
    * @param right   build side; must be unique per (keys, rightTs)
    * @param keys    equi-join key column names (present on both sides)
    * @param leftTs  probe timestamp column name
    * @param rightTs build timestamp column name
    * @return left.* ++ right.* for each matched probe row
    */
  def asofInner(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    ensureRegistered(left.sparkSession)
    val args: Seq[Column] =
      keys.map(left(_)) ++ keys.map(right(_)) ++
        Seq(left(leftTs), right(rightTs))
    left.join(right, call_function("asof_marker", args: _*), "inner")
  }

  /** Idempotently installs the marker function, rewrite rule and
    * strategy into a session that was NOT built with GraftExtensions
    * (the extensions path is preferred; this uses the public
    * `spark.experimental` escape hatch so the operator works anywhere).
    */
  private def ensureRegistered(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val ident = new FunctionIdentifier("asof_marker")
    if (!reg.functionExists(ident)) {
      reg.registerFunction(ident, AsofMarker.info, AsofMarker.builder)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofJoinRewrite(spark)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy(spark)
    }
  }
}

/** Boolean-typed carrier for the as-of spec inside a join condition.
  * Child layout: `[lk1..lkn, rk1..rkn, leftTs, rightTs]`. Never
  * evaluated — [[AsofJoinRewrite]] consumes it during optimization.
  */
case class AsofMarker(children: Seq[Expression])
    extends Expression with Unevaluable {
  require(children.size >= 2 && children.size % 2 == 0,
    s"asof_marker expects [lk*, rk*, lts, rts]; got ${children.size} args")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "asof_marker"

  def numKeys: Int = (children.size - 2) / 2
  def leftKeys: Seq[Expression] = children.take(numKeys)
  def rightKeys: Seq[Expression] = children.slice(numKeys, 2 * numKeys)
  def leftTs: Expression = children(2 * numKeys)
  def rightTs: Expression = children(2 * numKeys + 1)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsofMarker =
    copy(children = newChildren)
}

object AsofMarker {
  private[plans] val info =
    new ExpressionInfo(classOf[AsofMarker].getName, "asof_marker")
  private[plans] val builder: Seq[Expression] => Expression =
    (children: Seq[Expression]) => AsofMarker(children)
}

/** Registration bundle consumed by [[graft.functions.GraftExtensions]]. */
object AsofJoinRegistration {
  val markerFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (new FunctionIdentifier("asof_marker"), AsofMarker.info, AsofMarker.builder)
}

/** Logical as-of join. Inner semantics keep the output attributes (and
  * their nullability) identical to the `Join(Inner)` this node replaces,
  * so the rewrite is schema-preserving — safe inside the optimizer.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  // at most one match per probe row
  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Rewrites `Join(l, r, Inner, cond)` whose condition carries an
  * [[AsofMarker]] into the [[AsofJoin]] node. Residual conjuncts (extra
  * predicates the optimizer merged into the join condition) are legal
  * under inner semantics as a post-join Filter. Runs inside the operator
  * optimization fixpoint (injectOptimizerRule), i.e. strictly before
  * planning, so the unevaluable marker never reaches execution.
  */
case class AsofJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Join(l, r, Inner, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsofMarker]) =>
      val (markers, rest) =
        splitConjunctivePredicates(cond).partition(_.isInstanceOf[AsofMarker])
      require(markers.size == 1,
        s"expected exactly one asof_marker in the join condition, got ${markers.size}")
      val m = markers.head.asInstanceOf[AsofMarker]
      require(m.leftKeys.zip(m.rightKeys).forall {
        case (lk, rk) => lk.dataType == rk.dataType
      } && m.leftTs.dataType == m.rightTs.dataType,
        "asof_marker key/timestamp types must match across sides " +
          "(cast explicitly before joining)")
      require(
        (m.leftKeys :+ m.leftTs).forall(_.references.subsetOf(l.outputSet)) &&
          (m.rightKeys :+ m.rightTs).forall(_.references.subsetOf(r.outputSet)),
        "asof_marker args must be [left keys, right keys, left ts, right ts]")
      val asof = AsofJoin(l, r, m.leftKeys, m.rightKeys, m.leftTs, m.rightTs)
      if (rest.isEmpty) asof else Filter(rest.reduce(And), asof)
  }
}

/** Plans the logical [[AsofJoin]] as [[AsofJoinExec]]. */
case class AsofJoinStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts) =>
      AsofJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
