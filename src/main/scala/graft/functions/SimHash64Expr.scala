package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash64(text)` — the 64-bit SimHash of the whitespace-tokenized,
  * lowercased document as a 64-char binary string, the
  * production-width twin of [[SimHash16]].
  *
  * Why it exists: the 100x ScaleStress run measured the 16-bit hamming
  * pipeline crossing linear (exponent 1.05) because 2^16 distinct
  * signatures SATURATE near 10^5 documents and the band buckets
  * densify. 2^64 signatures defer that saturation past any realistic
  * corpus, and 16-bit bands keep the same pigeonhole guarantee
  * (hamming <= bands-1 pairs always collide in >= 1 band) with
  * 65536-value band keys. Same tokenization and same digest as
  * SimHash16 — bit i is the sign of the vote sum over tokens of bit i
  * of md5(token) (the first 64 digest bits, MSB first), which is what
  * the DuckDB oracle recomputes nibble-wise.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private[functions] val info =
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64")

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Same tokenization contract as [[SimHash16.compute]] (split on
    * single spaces, empty tokens kept); votes cover the first 8 digest
    * bytes bit-by-bit, MSB first, so oracle SQL reading the hex digest
    * nibble-wise ((nibble >> (3 - i%4)) & 1) sees identical bits.
    */
  def compute(s: String): UTF8String = {
    val votes = new Array[Int](64)
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val md = mdLocal.get()
    val n = lower.length
    var start = 0
    var done = false
    while (!done) {
      val idx = lower.indexOf(' ', start)
      val end = if (idx < 0) n else idx
      val digest = md.digest(
        lower.substring(start, end).getBytes(StandardCharsets.UTF_8))
      var i = 0
      while (i < 64) {
        val bit = (digest(i >> 3) >>> (7 - (i & 7))) & 1
        if (bit == 1) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      if (idx < 0) done = true else start = idx + 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (votes(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column-API entry point (registry-backed, same pattern as
    * [[HtmlToText.apply]]).
    */
  def apply(c: Column): Column = {
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val ident = new FunctionIdentifier("simhash64")
    if (!reg.functionExists(ident)) {
      reg.registerFunction(ident, info,
        (children: Seq[Expression]) => SimHash64(children.head))
    }
    call_function("simhash64", c)
  }
}
