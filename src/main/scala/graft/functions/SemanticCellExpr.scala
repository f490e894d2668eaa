package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Quantizer cell assignment against a BROADCAST rep set — the
  * [[PqEncodeCodes]] move applied to the semantic index's cell argmax
  * (queries.Ext semanticBandifyLiteral): the literal form bakes every
  * rep vector into the expression tree as `typedLit` arrays, which at a
  * production cell count (thousands of cells x 1024 dims) is the same
  * megabytes-in-every-task-binary hazard the PQ encode had. Here the
  * reps ride a torrent-broadcast handle; the expression returns the
  * best cell's rep id.
  *
  * Determinism contract (SemanticDedupSpec pins the agreement): per rep
  * the score is dot(v, rv) (strict element order) divided by
  * (norm(v) * rep_norm) — the literal path's exact float-op order —
  * and selection replicates `array_max` over struct(s, -rid, rid):
  * Spark's nan-safe double ordering (NaN greatest, NaN == NaN,
  * -0.0 < 0.0 via Double.compare) with ties to the SMALLER rep id.
  */
case class SemanticCellArgmax(child: Expression,
    bc: Broadcast[Array[(Long, Array[Double], Double)]])
    extends UnaryExpression {

  override def prettyName: String = "semantic_cell_bc"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  @transient private lazy val rids: Array[Long] = bc.value.map(_._1)
  @transient private lazy val rvs: Array[Array[Double]] = bc.value.map(_._2)
  @transient private lazy val rns: Array[Double] = bc.value.map(_._3)

  // Spark's nan-safe double ordering (the struct-comparison rule the
  // literal array_max applies): NaN > any non-NaN, NaN == NaN,
  // otherwise java.lang.Double.compare (so -0.0 < 0.0)
  private def cmp(a: Double, b: Double): Int =
    if (a.isNaN && b.isNaN) 0
    else if (a.isNaN) 1
    else if (b.isNaN) -1
    else java.lang.Double.compare(a, b)

  /** Best cell id for one vector; boxed null on a rep/vector width
    * mismatch or null element. Public for the codegen callback.
    */
  def assign(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var p = 0
    while (p < n) {
      if (arr.isNullAt(p)) return null
      p += 1
    }
    val v = new Array[Double](n)
    p = 0
    while (p < n) { v(p) = arr.getDouble(p); p += 1 }
    var nr2 = 0.0
    p = 0
    while (p < n) { nr2 += v(p) * v(p); p += 1 }
    val nrm = math.sqrt(nr2)
    var bestS = Double.NegativeInfinity
    var bestRid = Long.MaxValue
    var first = true
    var k = 0
    while (k < rids.length) {
      val rv = rvs(k)
      if (rv.length != n) return null
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v(i) * rv(i); i += 1 }
      val s = dot / (nrm * rns(k))
      val c = if (first) 1 else cmp(s, bestS)
      if (c > 0 || (c == 0 && rids(k) < bestRid)) {
        bestS = s; bestRid = rids(k)
      }
      first = false
      k += 1
    }
    if (rids.isEmpty) null else java.lang.Long.valueOf(bestRid)
  }

  override def nullSafeEval(v: Any): Any = {
    val r = assign(v.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("cellAssigner", this,
        classOf[SemanticCellArgmax].getName)
      val boxed = ctx.freshName("cell")
      s"""
         |java.lang.Long $boxed = $ref.assign($a);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SemanticCellArgmax = copy(child = newChild)
}

object SemanticCellExpr {

  /** Column of the argmax-cosine cell id of `v` against the broadcast
    * reps (rid, rep vector, rep norm). Registered per-broadcast, the
    * [[PqEncodeExpr.codes]] pattern.
    */
  def cell(v: Column,
      bc: Broadcast[Array[(Long, Array[Double], Double)]]): Column = {
    val name = s"semantic_cell_bc_${bc.id}"
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val ident = new FunctionIdentifier(name)
    if (!reg.functionExists(ident))
      reg.registerFunction(ident,
        new ExpressionInfo(classOf[SemanticCellArgmax].getName, name),
        c => SemanticCellArgmax(c(0), bc))
    call_function(name, v)
  }
}
