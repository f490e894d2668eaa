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

  // support the same 1/2/3-arg forms as Spark's internal
  // bloom_filter_agg (defaults for expected items / bits) instead of
  // an IndexOutOfBoundsException on the natural short calls
  private[functions] val aggBuilder =
    (children: Seq[Expression]) => children match {
      case Seq(c)       => new BloomFilterAggregate(c)
      case Seq(c, n)    => new BloomFilterAggregate(c, n)
      case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
      case cs => throw new IllegalArgumentException(
        s"bloom_agg expects 1 to 3 arguments, got ${cs.length}")
    }
  private[functions] val mightBuilder =
    (children: Seq[Expression]) => children match {
      case Seq(b, v) => BloomFilterMightContain(b, v)
      case cs => throw new IllegalArgumentException(
        s"bloom_contains expects 2 arguments, got ${cs.length}")
    }

  /** Registers both functions on the active session if missing (for
    * sessions not built with [[GraftExtensions]]).
    */
  def ensureRegistered(): Unit =
    ensureRegistered(org.apache.spark.sql.classic.SparkSession.active)

  /** Same, on an EXPLICIT session — for driver-side callers (the
    * snapshot table's manifest-bloom stat pass) that cannot assume
    * their DataFrame's session is the thread's active one.
    */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    val agg = new FunctionIdentifier("bloom_agg")
    if (!reg.functionExists(agg)) reg.registerFunction(agg, aggInfo, aggBuilder)
    val might = new FunctionIdentifier("bloom_contains")
    if (!reg.functionExists(might))
      reg.registerFunction(might, mightInfo, mightBuilder)
  }
}
