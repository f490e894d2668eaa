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

  /** Dot product: strict sequential fold, same order as the oracle. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane-style LSH bucket for cosine ANN, using the first
    * `bits` axis-aligned hyperplanes (sign of the leading coordinates).
    * Vectors in the same bucket are ANN candidates; the bucket key turns
    * ANN candidate generation into a plain equi-join.
    */
  def signBucket(v: Column, bits: Int = 4): Column =
    array_join(
      transform(slice(v, 1, bits),
        x => when(x >= 0, lit("1")).otherwise(lit("0"))), "")
}
