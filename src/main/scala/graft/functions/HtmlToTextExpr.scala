package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** `html_to_text` as a native Catalyst expression (SURVEY.md §2.8 F3).
  *
  * The reference strips HTML with BeautifulSoup
  * (resources/gmail_functions.py:294-295); the engine specifies the
  * deterministic transform in [[graft.ops.HtmlText]]. A Scala UDF could
  * wrap it, but a UDF is an optimizer black box (no codegen splicing,
  * catalyst<->scala row conversion per call, opaque nullability). This
  * expression participates in whole-stage codegen — the generated code
  * calls the static cleaner directly on the UTF8String, the same shape
  * Spark's own md5/base64 use for their library calls — and declares
  * null-intolerance so null-propagation rules apply.
  */
case class HtmlToText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.ops.HtmlText.clean(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.ops.HtmlText.clean($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}

object HtmlToText {
  private[functions] val info =
    new ExpressionInfo(classOf[HtmlToText].getName, "html_to_text")

  /** Column-API entry point. Resolves through the session's function
    * registry (the Column-from-Expression constructors are private[sql]
    * in Spark 4); if the active session was not built with
    * [[GraftExtensions]], the function is registered on first use so
    * the Column API works in any session.
    */
  def apply(c: Column): Column = {
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val ident = new FunctionIdentifier("html_to_text")
    if (!reg.functionExists(ident)) {
      reg.registerFunction(ident, info,
        (children: Seq[Expression]) => HtmlToText(children.head))
    }
    call_function("html_to_text", c)
  }
}

/** Session extensions: registers the engine's native functions in the
  * SQL function registry, so `spark.sql("SELECT html_to_text(c) ...")`
  * works wherever the session is built `.withExtensions(new
  * GraftExtensions)` (Verify, Bench, tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("html_to_text"),
      HtmlToText.info,
      (children: Seq[Expression]) => HtmlToText(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      VectorExprs.dotInfo,
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      VectorExprs.cosInfo,
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash16"),
      SimHash16.info,
      (children: Seq[Expression]) => SimHash16(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      MinHashSig.info, MinHashSig.builder))
    ext.injectFunction((
      new FunctionIdentifier("bucket_idx"),
      BucketIdx.info, BucketIdx.builder))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      SimHash64.info,
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      BloomExprs.aggInfo, BloomExprs.aggBuilder))
    ext.injectFunction((
      new FunctionIdentifier("bloom_contains"),
      BloomExprs.mightInfo, BloomExprs.mightBuilder))
    ext.injectOptimizerRule(GraftOptimizations)
    // native as-of join: marker function -> logical rewrite -> strategy
    ext.injectFunction(graft.plans.AsofJoinRegistration.markerFunction)
    ext.injectOptimizerRule(graft.plans.AsofJoinRewrite)
    ext.injectPlannerStrategy(graft.plans.AsofJoinStrategy)
  }
}
