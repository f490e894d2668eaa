package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `bucket_idx(v, boundaries)` — the number of boundaries strictly less
  * than `v`, i.e. the index of v's value-range bucket given the sorted
  * ascending boundary array. Monotone in `v` by construction.
  *
  * The boundary argument must be FOLDABLE (a literal array) — the
  * sampled per-group boundaries of the ranged-rank core
  * ([[graft.queries.Relational]]) are collected driver-side exactly the
  * way Spark's own RangePartitioner collects its sampled range bounds,
  * then baked in here. A native expression because the two declarative
  * encodings both fail at this size: a higher-order
  * `size(filter(bs, b -> b < v))` drops the whole stage out of codegen
  * (interpreted lambda per row), and an unrolled literal
  * comparison-sum CASE chain (~64 nodes per group) blows up Catalyst
  * constraint propagation — measured 3x slower END-TO-END than the HOF
  * it replaced. Here the plan node count is O(groups), the per-row cost
  * is a codegen'd binary search over a JVM double[] reference
  * (log2(64) = 6 comparisons), and whole-stage codegen stays intact.
  */
case class BucketIdx(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_idx"

  // explicit validation instead of ClassCastException / unbound-
  // attribute errors deep in eval: the value must be a DOUBLE, the
  // boundaries a foldable ARRAY<DOUBLE> literal (an array<int> literal
  // would be silently misread by toDoubleArray; a non-foldable
  // boundary child cannot be baked into the codegen reference object)
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"bucket_idx value must be DOUBLE, got ${left.dataType.sql}")
    else if (right.dataType != ArrayType(DoubleType, containsNull = false) &&
        right.dataType != ArrayType(DoubleType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"bucket_idx boundaries must be ARRAY<DOUBLE>, got " +
          right.dataType.sql)
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bucket_idx boundaries must be a literal (foldable) array")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val bounds: Array[Double] =
    right.eval(null) match {
      case a: ArrayData => a.toDoubleArray()
      case null         => Array.emptyDoubleArray
    }

  override def nullSafeEval(v: Any, ignored: Any): Any =
    BucketIdx.search(bounds, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketBounds", bounds, "double[]")
    // the boundary child is foldable; only the value child is evaluated
    defineCodeGen(ctx, ev, (v, _) => s"graft.functions.BucketIdx.search($ref, $v)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketIdx =
    copy(left = newLeft, right = newRight)
}

object BucketIdx {
  private[functions] val info =
    new ExpressionInfo(classOf[BucketIdx].getName, "bucket_idx")

  private[functions] val builder =
    (children: Seq[Expression]) => BucketIdx(children(0), children(1))

  /** |{i : bs(i) < v}| for ascending bs — lower-bound binary search. */
  def search(bs: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (bs(m) < v) lo = m + 1 else hi = m
    }
    lo
  }

  /** Column-API entry point; self-registers like [[HtmlToText.apply]]
    * so the function resolves in sessions built without
    * [[GraftExtensions]].
    */
  def apply(v: Column, boundaries: Array[Double]): Column = {
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val ident = new FunctionIdentifier("bucket_idx")
    if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    call_function("bucket_idx", v, lit(boundaries))
  }
}
