package graft

import org.apache.spark.sql.functions._
import graft.ext.{TextOps, VectorOps}

/** Unit tests for the training-data extension ops (SURVEY.md §2.11):
  * known-value checks on tiny inline data, independent of the driver
  * tables, pinning the exact signature definitions the DuckDB oracles
  * replicate.
  */
class ExtOpsSpec extends SparkSpec {

  private def textDf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  private def one(df: org.apache.spark.sql.DataFrame,
                  c: org.apache.spark.sql.Column): Any =
    df.select(c.as("x")).collect()(0).get(0)

  test("shingles: k-grams over tokens; short doc collapses to whole doc") {
    val df = textDf("a b c d")
    assert(one(df, TextOps.shingles(col("text"), 3)) ==
      Seq("a b c", "b c d"))
    val short = textDf("a b")
    assert(one(short, TextOps.shingles(col("text"), 3)) == Seq("a b"))
  }

  test("truncTail2: DuckDB slice/array_to_string parity on edge lengths") {
    // Expected values measured in DuckDB (the oracle's
    // array_to_string(t[1:len(t)-2], ' ') over string_split tokens):
    // a 1-token list stays whole (negative end index counts from the
    // end), an empty slice renders NULL (array_to_string([]) is NULL,
    // where Spark's array_join would give ''), and '' tokenizes to
    // [''] — one token, so it survives whole. Spark's slice() throws
    // on negative lengths, so without the clamp these inputs would
    // abort the near-dup family instead of matching the oracle.
    val df = textDf("", "one", "one two", "a b c", "a b c d e", "x  y")
    val got = df.orderBy(col("id"))
      .select(graft.queries.Ext.truncTail2(col("text")).as("t"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some(""), Some("one"), None, Some("a"),
      Some("a b c"), Some("x")))
  }

  test("minhash: permutation-invariant, content-sensitive") {
    val df = textDf("w x y z q r s t")
    val perm = textDf("q r s t w x y z")  // same token set, diff shingles
    val sig = TextOps.minhashSignature(TextOps.distinctTokens(col("text")), 8)
    assert(one(df, sig) == one(perm, sig)) // token-set minhash: order-free
    val other = textDf("totally different words here now ok")
    assert(one(df, sig) != one(other, sig))
    assert(one(df, sig).asInstanceOf[scala.collection.Seq[_]].size == 8)
  }

  test("lsh bands: identical docs share all bands; bands are band-indexed") {
    val sig = TextOps.minhashSignature(
      TextOps.distinctShingles(col("text"), 3), 16)
    val bands = TextOps.lshBands(sig, 4, 4)
    val a = one(textDf("the quick brown fox jumps over the lazy dog"), bands)
    val b = one(textDf("the quick brown fox jumps over the lazy dog"), bands)
    assert(a == b)
    val bs = a.asInstanceOf[scala.collection.Seq[String]]
    assert(bs.size == 4 && bs.distinct.size == 4) // band index baked in
  }

  test("simhash16: deterministic 0/1 string, length 16") {
    val h = one(textDf("some sample text tokens"),
      TextOps.simhash16(col("text"))).asInstanceOf[String]
    assert(h.length == 16 && h.forall(c => c == '0' || c == '1'))
    // frequency weighting, pinned sharply: with "tokens" repeated 13x
    // against 3 singleton tokens, every bit's vote is decided by the
    // dominant token (13 > 3), so the signature must equal
    // simhash16("tokens") exactly — and must differ from the
    // unrepeated mix. A regression that deduplicates tokens before
    // voting (losing frequency weighting) fails both assertions.
    val h2 = one(textDf("some sample text tokens tokens tokens tokens " +
      "tokens tokens tokens tokens tokens tokens tokens tokens tokens"),
      TextOps.simhash16(col("text"))).asInstanceOf[String]
    val hDom = one(textDf("tokens"),
      TextOps.simhash16(col("text"))).asInstanceOf[String]
    assert(h2 == hDom)
    assert(h2 != h)
  }

  test("fingerprint: equal iff same distinct token set") {
    val fp = TextOps.fingerprint(col("text"))
    assert(one(textDf("b a a b"), fp) == one(textDf("a b"), fp))
    assert(one(textDf("a b"), fp) != one(textDf("a c"), fp))
  }

  test("langId: marker argmax with priority; und when no markers") {
    val lid = TextOps.langId(col("text"))
    assert(one(textDf("the cat and the dog of a house"), lid) == "en")
    assert(one(textDf("el perro y la casa de los gatos"), lid) == "es")
    assert(one(textDf("xyzzy plugh quux"), lid) == "und")
  }

  test("quality metrics: exact values on a known string") {
    // "ab cd!" -> alpha 4/6; tokens ["ab","cd!"]; mean len 5/2; bpe: ab,cd,!
    val df = textDf("ab cd!")
    assert(one(df, TextOps.alphaRatio(col("text"))) == 4.0 / 6.0)
    assert(one(df, TextOps.meanTokenLen(col("text"))) == 2.5)
    assert(one(df, TextOps.bpeTokenCount(col("text"))) == 3L)
    assert(one(textDf("the foo"), TextOps.stopwordRatio(col("text"))) == 0.5)
  }

  test("vector ops: dot/norm/cosine exact on known vectors") {
    import spark.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f)))
      .toDF("a", "b")
      .select(VectorOps.toDouble(col("a")).as("a"),
        VectorOps.toDouble(col("b")).as("b"))
    assert(one(df, VectorOps.dot(col("a"), col("b"))) == 24.0)
    assert(one(df, VectorOps.norm(col("a"))) == 5.0)
    assert(one(df, VectorOps.cosine(col("a"), col("b"))) == 24.0 / 25.0)
    assert(one(df, VectorOps.signBucket(col("a"), 2)) == "11")
  }

  test("signBucket: negative coords flip bits") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(-1.0f, 2.0f, -3.0f, 4.0f))).toDF("v")
      .select(VectorOps.toDouble(col("v")).as("v"))
    assert(one(df, VectorOps.signBucket(col("v"), 4)) == "0101")
  }

  test("ext queries run end-to-end on sf0.001 and are non-empty") {
    val d = "/root/testdata/sf0.001"
    for (n <- Seq("q_dedup_minhash", "q_sim_topk", "q_ann_lsh",
        "q_text_stats", "q_dedup_jaccard")) {
      assert(graft.queries.Ext.queries(n)(spark, d).count() > 0, n)
    }
  }
}
