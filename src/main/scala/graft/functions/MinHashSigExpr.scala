package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(text)` — the K-shingle MinHash signature of the
  * whitespace-tokenized, lowercased document as ONE native expression.
  *
  * Semantics are EXACTLY the composed pipeline the DuckDB oracle
  * recomputes (tokens → k-gram shingles → one md5 per shingle → 31-bit
  * value → per-seed universal hash mins, constants
  * [[graft.ext.TextOps.hashA]]/[[graft.ext.TextOps.hashB]]):
  * `MinHashSigSpec` asserts bit-equality against both the HOF
  * formulation and the aggregation-shaped plan. The previous plan
  * exploded ~L shingles per document through a 16-way min aggregation —
  * correct, map-side-combined, but still an exchange keyed by doc plus
  * an interpreted explode. This expression computes the signature in
  * one fused per-row loop (shingle = contiguous substring, since
  * single-space joins reconstruct the original text; one md5 each; 16
  * modular mins) inside whole-stage codegen — SIGNING IS NOW MAP-ONLY,
  * the same scan shape as `simhash16`, and the LSH pipeline's first
  * shuffle moves 16 longs per doc instead of the shingle explosion.
  *
  * Duplicate shingles need no dedup here: the signature is a MIN, and
  * min over a multiset equals min over its support.
  */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  // fail at construction (plan time), not per-row at execution: an
  // oversized numHashes would otherwise die mid-job with an
  // ArrayIndexOutOfBoundsException inside the seed tables
  require(k >= 1, s"minhash_sig: k must be >= 1, got $k")
  require(numHashes >= 1 && numHashes <= graft.ext.TextOps.MaxHashes,
    s"minhash_sig: numHashes must be in [1, " +
      s"${graft.ext.TextOps.MaxHashes}], got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String].toString, k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c.toString(), $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private[functions] val info =
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig")

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val A = graft.ext.TextOps.hashA.toArray
  private val B = graft.ext.TextOps.hashB.toArray
  private val M = graft.ext.TextOps.MersennePrime

  /** Tokenization replicates `split(lower(c), " ")` with limit -1:
    * single-space separators, empty tokens kept. A k-token shingle
    * joined with " " is exactly the contiguous substring from its first
    * token's start to its last token's end, so no per-shingle string is
    * built — just a substring digest.
    */
  def compute(s: String, k: Int, numHashes: Int): GenericArrayData = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val n = lower.length
    // token boundaries
    var nTok = 1
    var i = 0
    while (i < n) { if (lower.charAt(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (lower.charAt(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val md = mdLocal.get()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    def visit(from: Int, to: Int): Unit = {
      val digest = md.digest(
        lower.substring(from, to).getBytes(StandardCharsets.UTF_8))
      // first 15 hex chars = top 60 bits of the digest, then mask to 31
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (digest(j) & 0xffL); j += 1 }
      v = (v >>> 4) & M
      var h = 0
      while (h < numHashes) {
        val x = (A(h) * v + B(h)) % M
        if (x < mins(h)) mins(h) = x
        h += 1
      }
    }
    if (nTok >= k) {
      var p = 0
      while (p <= nTok - k) { visit(starts(p), ends(p + k - 1)); p += 1 }
    } else visit(0, n) // short doc: one whole-doc shingle
    new GenericArrayData(mins)
  }

  /** Column-API entry point (registry-backed, same pattern as
    * [[SimHash16.apply]]).
    */
  def apply(c: Column, k: Int, numHashes: Int): Column = {
    val reg = org.apache.spark.sql.classic.SparkSession.active
      .sessionState.functionRegistry
    val ident = new FunctionIdentifier("minhash_sig")
    if (!reg.functionExists(ident)) {
      reg.registerFunction(ident, info, builder)
    }
    call_function("minhash_sig", c,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(numHashes))
  }

  private[functions] val builder = (children: Seq[Expression]) =>
    MinHashSig(children(0),
      children(1).eval(null).asInstanceOf[Int],
      children(2).eval(null).asInstanceOf[Int])
}
