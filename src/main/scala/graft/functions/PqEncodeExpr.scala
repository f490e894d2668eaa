package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** PQ encode against a BROADCAST codebook — the scale-safe form of the
  * streaming index upkeep's map-only encode (queries.Ext
  * q_stream_pq_index_maintain).
  *
  * The literal formulation (per-subspace `array_min` over K
  * struct(dist, cid) candidates with the codewords inlined as
  * literals) is map-only but bakes the K x M x dim book into the
  * expression tree: at a production K=256, M=16, dim=1024 that is a
  * ~16 MB literal serialized into EVERY task binary and a
  * codegen-size hazard. Here the book rides a `Broadcast` handle —
  * bytes in the serialized plan, fetched once per executor by the
  * torrent broadcast machinery — and the expression's generated code
  * calls back into [[PqEncodeCodes.encode]], a primitive-array argmin
  * loop primed lazily from the broadcast value on first use per task.
  *
  * Determinism contract (PqTrainedSpec pins the three-way agreement):
  * per candidate the squared distance accumulates strictly in
  * element order (the literal path's left-associated `reduce(_ + _)`
  * over diff*diff terms), and ties break toward the smaller codeword
  * id (the literal path's struct(d, cid) min) — codes are
  * bit-identical to both the literal expression and the batch
  * join-aggregate encode.
  */
case class PqEncodeCodes(child: Expression,
    bc: Broadcast[Array[Array[(Long, Array[Double])]]])
    extends UnaryExpression {

  override def prettyName: String = "pq_encode_bc"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.catalogString}")
  }

  // primed once per task from the broadcast value: flat primitive
  // arrays, no tuple unboxing in the per-row loop
  @transient private lazy val cids: Array[Array[Long]] =
    bc.value.map(_.map(_._1))
  @transient private lazy val words: Array[Array[Array[Double]]] =
    bc.value.map(_.map(_._2))
  @transient private lazy val subDim: Int = words.head.head.length

  /** argmin codes for one vector; null on width mismatch or null
    * element (the literal path's null-propagation shape). Public only
    * because generated code calls it through a plan reference.
    */
  def encode(arr: ArrayData): ArrayData = {
    val m = cids.length
    val sub = subDim
    if (arr.numElements() != m * sub) return null
    var p = 0
    while (p < m * sub) { // null element => null codes row
      if (arr.isNullAt(p)) return null
      p += 1
    }
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val jc = cids(j)
      val jw = words(j)
      var bestD = Double.PositiveInfinity
      var bestC = Long.MaxValue
      var k = 0
      while (k < jc.length) {
        val w = jw(k)
        var s = 0.0
        var i = 0
        while (i < sub) {
          val diff = arr.getDouble(j * sub + i) - w(i)
          s += diff * diff
          i += 1
        }
        if (s < bestD || (s == bestD && jc(k) < bestC)) {
          bestD = s; bestC = jc(k)
        }
        k += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqEncoder", this,
        classOf[PqEncodeCodes].getName)
      s"""
         |${ev.value} = $ref.encode($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeCodes = copy(child = newChild)
}

object PqEncodeExpr {

  /** Column of the PqM argmin codes of `v` against the broadcast book
    * (j-indexed outer array). Registered under a per-broadcast function
    * name (Column-from-Expression is private[sql] in Spark 4, so
    * construction goes through the registry — the [[VectorExprs]]
    * pattern — and the name carries the broadcast id so two books
    * never collide in one session).
    */
  def codes(v: Column,
      bc: Broadcast[Array[Array[(Long, Array[Double])]]]): Column = {
    val name = s"pq_encode_bc_${bc.id}"
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val ident = new FunctionIdentifier(name)
    if (!reg.functionExists(ident))
      reg.registerFunction(ident,
        new ExpressionInfo(classOf[PqEncodeCodes].getName, name),
        c => PqEncodeCodes(c(0), bc))
    call_function(name, v)
  }
}
