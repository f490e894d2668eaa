package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for similarity search and near-dup
  * detection over an `array<float>` column (FIXTURES.md §1 `embeddings`).
  *
  * All math is done in DOUBLE with a strict left-to-right fold so the
  * result is bit-identical to the DuckDB oracle (`list_dot_product` over
  * `DOUBLE[]`), and every function is a pure per-row `Column` expression:
  * no UDF, no shuffle, embarrassingly parallel at 100 TB.
  *
  * Scale design: brute-force cosine top-k broadcasts the (small) query
  * batch against a partitioned candidate scan — the big side never
  * shuffles. The LSH sign-bucket variant turns ANN into an equi-join on
  * the bucket key, so candidate generation is a hash join that scales
  * with data size, not with |queries| x |candidates|.
  */
object VectorOps {

  /** array<float> -> array<double>, the canonical compute type. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product — native codegen'd kernel ([[graft.functions.DotProduct]]):
    * one fused primitive loop inside whole-stage codegen, strict
    * left-to-right accumulation (bit-identical to the HOF fold it
    * replaced; [[dotHof]] remains as the executable spec).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotProduct(a, b)

  /** The original higher-order-function formulation: semantically the
    * executable specification of [[dot]], but interpreted per element —
    * kept for property tests (native == HOF) and as documentation.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays — single-pass native kernel
    * ([[graft.functions.CosineSim]]); same float-op order as
    * dot/(norm·norm) composed from folds.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  /** HOF twin of [[cosine]] for property tests. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Random-hyperplane-style LSH bucket for cosine ANN, using the first
    * `bits` axis-aligned hyperplanes (sign of the leading coordinates).
    * Vectors in the same bucket are ANN candidates; the bucket key turns
    * ANN candidate generation into a plain equi-join.
    */
  /** Dynamic-width band key for adaptive-occupancy semantic dedup:
    * sign bits of `len` coordinates starting after `offset` (0-based).
    * `len` is a Column so the key WIDTH can grow with the corpus —
    * the knob that keeps expected bucket occupancy constant as n
    * scales (bits = ceil(log2(ceil(n/target)))).
    */
  def signBucketAt(v: Column, offset: Int, len: Column): Column =
    array_join(
      transform(slice(v, lit(offset + 1), len),
        x => when(x >= 0, lit("1")).otherwise(lit("0"))), "")

  def signBucket(v: Column, bits: Int = 4): Column =
    array_join(
      transform(slice(v, 1, bits),
        x => when(x >= 0, lit("1")).otherwise(lit("0"))), "")
}
