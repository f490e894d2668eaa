package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.EmailOps

/** Property tests (SURVEY.md §5.4): engine column ops vs a direct Scala
  * model of the reference's Python semantics. Uses scalacheck Gens with
  * deterministic sampling (no scalatestplus bridge in the offline cache).
  */
class PropertySpec extends SparkSpec {

  /** Fixed-seed draw: Gen.sample would seed from Seed.random() per run,
    * so a generator-found failure could never be reproduced — every run
    * here draws the SAME inputs, making the file's "deterministic
    * sampling" header actually true.
    */
  private def sampled[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Scala model of gmail_functions.py:281-283:
    * split('<') → last → replace('>','') → strip().
    */
  private def fromAddrModel(s: String): String =
    s.split("<", -1).last.replace(">", "").trim

  private val addrGen: Gen[String] = for {
    name <- Gen.alphaNumStr.map(_.take(12))
    user <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    host <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    form <- Gen.oneOf(0, 1, 2, 3)
  } yield form match {
    case 0 => s"$name <$user@$host.com>"
    case 1 => s"$user@$host.com"
    case 2 => s""""$name <x>" <$user@$host.com>"""
    case 3 => s"  $name  <$user@$host.com>  "
  }

  test("fromAddr column op == Python-semantics model") {
    val inputs = sampled(Gen.listOfN(200, addrGen), 11L)
    import spark.implicits._
    val got = inputs.toDF("s")
      .select(EmailOps.fromAddr(col("s")).as("x"))
      .collect().map(_.getString(0)).toSeq
    assert(got == inputs.map(fromAddrModel))
  }

  test("native simhash16 == HOF spec on random token streams") {
    // random doc shapes: empty tokens, repeated spaces, mixed case,
    // unicode; the native expression must stay bit-compatible with the
    // interpreted HOF spec on all of them
    val tokGen = Gen.frequency(
      6 -> Gen.alphaNumStr.map(_.take(6)),
      1 -> Gen.const(""),
      1 -> Gen.oneOf("É", "中文", "a-b", "X_Y"))
    val docGen = Gen.chooseNum(0, 30)
      .flatMap(n => Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    val inputs = sampled(Gen.listOfN(150, docGen), 12L)
    import spark.implicits._
    val rows = inputs.toDF("text")
      .select(graft.functions.SimHash16(col("text")).as("native"),
        graft.ext.TextOps.simhash16(col("text")).as("hof"))
      .collect()
    rows.foreach(r =>
      assert(r.getString(0) == r.getString(1)))
  }

  test("urlsafe base64 roundtrip over arbitrary unicode") {
    val strGen = Gen.listOfN(24, Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('é', 'þ', 'ÿ', '中', ' ', '>', '<', '-', '_')))
      .map(_.mkString)
    val inputs = sampled(Gen.listOfN(100, strGen), 13L)
    val encoded = inputs.map(Fixtures.b64url)
    import spark.implicits._
    val got = encoded.toDF("e")
      .select(EmailOps.decodeB64Utf8(col("e")).as("x"))
      .collect().map(_.getString(0)).toSeq
    assert(got == inputs)
  }

  test("date format list: zone-strip never throws, roundtrip on RFC-2822") {
    val gen = for {
      d <- Gen.choose(1, 28); mo <- Gen.choose(1, 12)
      y <- Gen.choose(1990, 2030); h <- Gen.choose(0, 23)
      mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
      off <- Gen.oneOf("-0800", "+0000", "+0530", "")
      dow <- Gen.oneOf("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
    } yield {
      val mon = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
        "Sep", "Oct", "Nov", "Dec")(mo - 1)
      (f"$dow, $d $mon $y $h%02d:$mi%02d:$s%02d $off".trim,
        f"$mo%02d/$d%02d/${y % 100}%02d $h%02d:$mi%02d:$s%02d")
    }
    val cases = sampled(Gen.listOfN(120, gen), 14L)
    import spark.implicits._
    val got = cases.map(_._1).toDF("s")
      .select(EmailOps.formatDateString(col("s")).as("x"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  // ---- extension-op properties (SURVEY.md §2.11) ------------------------

  private val tokenSetGen: Gen[Seq[String]] =
    Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.identifier.map(_.take(6)).suchThat(_.nonEmpty)))

  test("minhash union law: sig(A ∪ B) == elementwise min(sig(A), sig(B))") {
    import graft.ext.TextOps
    import spark.implicits._
    val pairs = sampled(Gen.listOfN(40, Gen.zip(tokenSetGen, tokenSetGen)), 15L)
    val df = pairs.toDF("a", "b")
      .select(
        TextOps.minhashSignature(col("a"), 8).as("sa"),
        TextOps.minhashSignature(col("b"), 8).as("sb"),
        TextOps.minhashSignature(array_union(col("a"), col("b")), 8)
          .as("su"))
      .select(zip_with(col("sa"), col("sb"), (x, y) => least(x, y)).as("mn"),
        col("su"))
    assert(df.collect().forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("fingerprint is permutation- and duplication-invariant") {
    import graft.ext.TextOps
    import spark.implicits._
    val sets = sampled(Gen.listOfN(40, tokenSetGen), 16L)
    val texts = sets.map(_.mkString(" "))
    val permuted = sets.map(s => (new scala.util.Random(7L + s.length).shuffle(s) ++ s.take(1))
      .mkString(" "))
    val fp = texts.zip(permuted).toDF("a", "b")
      .select(TextOps.fingerprint(lower(col("a"))).as("fa"),
        TextOps.fingerprint(lower(col("b"))).as("fb"))
    assert(fp.collect().forall(r => r.getString(0) == r.getString(1)))
  }

  test("cosine: reflexive 1, symmetric, bounded") {
    import graft.ext.VectorOps
    import spark.implicits._
    val vecGen = Gen.listOfN(16,
      Gen.chooseNum(-100, 100).map(_.toFloat / 10f))
      .suchThat(_.exists(_ != 0f)).map(_.toArray)
    val pairs = sampled(Gen.listOfN(40, Gen.zip(vecGen, vecGen)), 17L)
    val df = pairs.toDF("a", "b")
      .select(VectorOps.toDouble(col("a")).as("a"),
        VectorOps.toDouble(col("b")).as("b"))
      .select(
        VectorOps.cosine(col("a"), col("a")).as("aa"),
        VectorOps.cosine(col("a"), col("b")).as("ab"),
        VectorOps.cosine(col("b"), col("a")).as("ba"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(r.getDouble(1) == r.getDouble(2)) // exact: same fold order
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-12)
    }
  }

  test("jaccard of shingle sets: bounded, reflexive 1") {
    import graft.ext.TextOps
    import spark.implicits._
    val texts = Gen.listOfN(30, tokenSetGen).sample.get.map(_.mkString(" "))
    val df = texts.toDF("t")
      .select(TextOps.distinctShingles(lower(col("t")), 3).as("sh"))
      .select(
        (size(array_intersect(col("sh"), col("sh"))).cast("double") /
          size(array_union(col("sh"), col("sh"))).cast("double")).as("self"))
    assert(df.collect().forall(_.getDouble(0) == 1.0))
  }
}
