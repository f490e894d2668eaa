package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Lower}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule teaching Catalyst the algebraic identities of the
  * engine's native functions — properties only the function author can
  * declare (SURVEY.md §4; the built-in optimizer simplifies its own
  * expressions this way, e.g. double-negation, but is rightly blind to
  * user function semantics):
  *
  *  - `simhash16(lower(c))`       == `simhash16(c)`     (lowercases internally)
  *  - `html_to_text(html_to_text(c))` == `html_to_text(c)` (idempotent)
  *
  * Each elision removes a full per-row string materialization from the
  * hot path of a scan — at 100 TB the redundant lower() alone is a
  * second pass over every document. Registered by [[GraftExtensions]]
  * via `injectOptimizerRule`, so it runs inside the normal optimizer
  * fixpoint in every session built with the extensions.
  */
case class GraftOptimizations(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case SimHash16(Lower(child)) => SimHash16(child)
      case SimHash64(Lower(child)) => SimHash64(child)
      case e: MinHashSig => e.child match {
        case Lower(inner) => e.withNewChildren(Seq(inner)).asInstanceOf[MinHashSig]
        case _ => e
      }
      case HtmlToText(inner @ HtmlToText(_)) => inner
    }
}
