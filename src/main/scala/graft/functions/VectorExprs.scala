package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels for the similarity/ANN/near-dup hot paths
  * (SURVEY.md §2.11 E3).
  *
  * The HOF formulation (`aggregate(zip_with(a,b,(x,y)->x*y),0D,(s,x)->s+x)`)
  * is semantically right but executes INTERPRETED: Spark's higher-order
  * functions evaluate their lambda per element outside whole-stage codegen,
  * and `zip_with` materializes an intermediate array per row. At 100 TB of
  * embeddings that per-element interpreter dispatch dominates the scan.
  * These expressions generate a single fused primitive loop (no
  * intermediate array, no boxing) inside whole-stage codegen.
  *
  * Determinism contract: accumulation is strict left-to-right in element
  * order — the SAME float-op order as the HOF fold — so results are
  * bit-identical to the previous formulation and to the DuckDB oracle's
  * `list_dot_product` over `DOUBLE[]`. Null semantics also match the HOF
  * shape: null array, length mismatch, or any null element → null.
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // ExpectsInputTypes is not implementable outside org.apache.spark.sql
  // (AbstractDataType is private[sql]); check the two children directly.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** `dot_product(array<double>, array<double>)` — Σ a(i)·b(i), left to right. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, s, bad) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("s"), ctx.freshName("bad"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) ${ev.isNull} = true; else ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `cosine_sim(array<double>, array<double>)` — dot/(‖a‖·‖b‖) in ONE pass
  * (three accumulators, each strictly in element order, so each sum is
  * bit-identical to its standalone fold).
  */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // zero-norm vector: cosine is undefined -> null (the composed
    // Divide would THROW under ANSI mode; 0-vectors shouldn't kill a job)
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, bad) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("bad"))
      val (dot, na, nb, x, y) = (ctx.freshName("dot"), ctx.freshName("na"),
        ctx.freshName("nb"), ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($bad || $na == 0.0 || $nb == 0.0) ${ev.isNull} = true;
         |  else ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  private[functions] val dotInfo =
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product")
  private[functions] val cosInfo =
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim")

  private def ensure(name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val ident = new FunctionIdentifier(name)
    if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
  }

  /** Column-API entry points (same registry-backed pattern as
    * [[HtmlToText.apply]] — Column-from-Expression is private[sql] in
    * Spark 4, so resolution goes through the function registry).
    */
  def dotProduct(a: Column, b: Column): Column = {
    ensure("dot_product", dotInfo, c => DotProduct(c(0), c(1)))
    call_function("dot_product", a, b)
  }

  def cosineSim(a: Column, b: Column): Column = {
    ensure("cosine_sim", cosInfo, c => CosineSim(c(0), c(1)))
    call_function("cosine_sim", a, b)
  }
}
