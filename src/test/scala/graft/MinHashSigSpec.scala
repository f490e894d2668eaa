package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Three-way agreement for the native fused minhash expression: the
  * codegen'd `minhash_sig` must produce bit-identical signatures to
  * (a) the HOF formulation over distinct shingles and (b) the
  * aggregation-shaped explode + 16-way-min plan — on the driver docs
  * corpus AND on synthetic edge cases (empty doc, short doc, repeated
  * shingles, multiple consecutive spaces, trailing space).
  */
class MinHashSigSpec extends SparkSpec {

  private val K = 3
  private val N = 16

  private def hofSig(c: org.apache.spark.sql.Column) =
    TextOps.minhashSignature(TextOps.distinctShingles(c, K), N)

  test("native == HOF on the sf0.001 documents corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mismatches = docs.select(
        graft.functions.MinHashSig(col("text"), K, N).as("native"),
        hofSig(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("native == aggregation-shaped plan on the corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val native = graft.queries.Ext.sigOfForSpec(docs)
    val agg = graft.queries.Ext.sigOfAggForSpec(docs)
    val joined = native.select(col("doc_id"), col("sig").as("a"))
      .join(agg.select(col("doc_id"), col("sig").as("b")), "doc_id")
    assert(joined.filter(col("a") =!= col("b")).count() == 0)
    assert(joined.count() == docs.count())
  }

  test("sketch merge: positionwise min of doc sigs == sig of the union shingle set") {
    // the mergeability property q_source_similarity's per-source union
    // sketch rests on: min-merging per-doc signatures must equal the
    // signature computed directly over the UNION of the docs' shingle
    // sets. Pinned here so a future drift between the native
    // expression's K/N and the merge-side arithmetic fails loudly.
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), (col("doc_id") % 4).as("grp"))
    val merged = docs
      .select(col("grp"), graft.functions.MinHashSig(col("text"), K, N).as("sig"))
      .select(col("grp"), posexplode(col("sig")))
      .groupBy(col("grp"), col("pos")).agg(min(col("col")).as("m"))
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
      .select(col("grp"), transform(col("ps"), p => p("m")).as("merged_sig"))
    val direct = docs
      .select(col("grp"), TextOps.distinctShingles(col("text"), K).as("sh"))
      .groupBy(col("grp"))
      .agg(array_distinct(flatten(collect_list(col("sh")))).as("union_sh"))
      .select(col("grp"),
        TextOps.minhashSignature(col("union_sh"), N).as("direct_sig"))
    val joined = merged.join(direct, "grp")
    assert(joined.count() == 4)
    assert(joined.filter(col("merged_sig") =!= col("direct_sig")).count() == 0)
  }

  test("edge cases: empty, short, repeated, multi-space, trailing space") {
    import spark.implicits._
    val edge = Seq("", "one", "one two", "a b c a b c a b c",
      "a  b   c", "ends with space ", " leads", "a b c d e")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val bad = edge.select(
        graft.functions.MinHashSig(col("text"), K, N).as("native"),
        hofSig(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(bad == 0)
  }
}
