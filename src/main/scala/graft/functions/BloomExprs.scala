package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL registration for Spark's bloom-filter sketch expressions
  * (SURVEY.md §2.3 J1 at scale).
  *
  * Spark ships `BloomFilterAggregate` / `BloomFilterMightContain` for its
  * runtime row-level filtering but does not put them in the public
  * function registry. The engine registers them as `bloom_agg` /
  * `bloom_contains` so a pipeline can do EXPLICIT semi-join pruning: build
  * a bloom over the small side's join keys (distributed agg, only the
  * final KB-scale sketch leaves the executors), pass it as a scalar
  * subquery, and prefilter the 100 TB side BEFORE the shuffle. The exact
  * join afterwards removes false positives, so results are identical to
  * the plain join — the bloom only cuts shuffle volume.
  *
  * The reference's only join is the seen-id dedup probe
  * (resources/gmail_functions.py:173-178); this is its scale form when
  * the state table is too big to broadcast.
  */
object BloomExprs {
  private[functions] val aggInfo =
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg")
  private[functions] val mightInfo =
    new ExpressionInfo(classOf[BloomFilterMightContain].getName,
      "bloom_contains")

  private[functions] val aggBuilder =
    (children: Seq[Expression]) =>
      new BloomFilterAggregate(children(0), children(1), children(2))
  private[functions] val mightBuilder =
    (children: Seq[Expression]) =>
      BloomFilterMightContain(children(0), children(1))

  /** Registers both functions on the active session if missing (for
    * sessions not built with [[GraftExtensions]]).
    */
  def ensureRegistered(): Unit = {
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val agg = new FunctionIdentifier("bloom_agg")
    if (!reg.functionExists(agg)) reg.registerFunction(agg, aggInfo, aggBuilder)
    val might = new FunctionIdentifier("bloom_contains")
    if (!reg.functionExists(might))
      reg.registerFunction(might, mightInfo, mightBuilder)
  }
}
