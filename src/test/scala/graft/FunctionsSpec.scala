package graft

import org.apache.spark.sql.functions._
import graft.ops.HtmlText

/** Tests for the native Catalyst expressions in graft.functions:
  * value parity with the spec'd cleaner, null propagation, codegen
  * participation (no UDF black box in the plan), and SQL registration
  * via GraftExtensions.
  */
class FunctionsSpec extends SparkSpec {

  private val html =
    "<html><head><style>p{color:red}</style></head><body>" +
      "<p> Hello &amp; <b>world</b></p><!-- note --><script>x&lt;1</script>" +
      "<div>caf&#233;</div></body></html>"

  test("html_to_text expression matches the spec'd cleaner") {
    import spark.implicits._
    val got = Seq(html).toDF("h")
      .select(graft.functions.HtmlToText($"h").as("t"))
      .collect()(0).getString(0)
    assert(got == HtmlText.clean(html))
    assert(got == "Hello &worldcafé")
  }

  test("html_to_text propagates nulls") {
    import spark.implicits._
    val got = Seq[Option[String]](None).toDF("h")
      .select(graft.functions.HtmlToText($"h"))
      .collect()(0)
    assert(got.isNullAt(0))
  }

  test("html_to_text is not a UDF black box in the plan") {
    import spark.implicits._
    val plan = Seq(html).toDF("h")
      .select(graft.functions.HtmlToText($"h"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(plan.contains("html_to_text"), plan)
  }

  test("GraftExtensions registers html_to_text for SQL") {
    import spark.implicits._
    Seq((1L, html)).toDF("id", "h").createOrReplaceTempView("html_docs")
    val got = spark.sql("SELECT html_to_text(h) AS t FROM html_docs")
      .collect()(0).getString(0)
    assert(got == HtmlText.clean(html))
  }

  // -- native vector kernels (graft.functions.VectorExprs) ----------------

  /** Deterministic pseudo-random double arrays, no Math.random. */
  private def vecDf = {
    import graft.ext.VectorOps
    // +0.7 keeps every vector non-zero (id=0 would make `a` the zero
    // vector: native cosine returns null there, the HOF Divide throws
    // under ANSI — covered by its own test below)
    spark.range(64).select(
      col("id"),
      transform(sequence(lit(1), lit(16)),
        i => sin(col("id") * i + 0.7).cast("double")).as("a"),
      transform(sequence(lit(1), lit(16)),
        i => cos(col("id") * i + 1).cast("double")).as("b"))
      .withColumn("dot_native", VectorOps.dot(col("a"), col("b")))
      .withColumn("dot_hof", VectorOps.dotHof(col("a"), col("b")))
      .withColumn("cos_native", VectorOps.cosine(col("a"), col("b")))
      .withColumn("cos_hof", VectorOps.cosineHof(col("a"), col("b")))
  }

  test("dot_product / cosine_sim are BIT-identical to the HOF fold") {
    val rows = vecDf.collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("dot_native")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("dot_hof")))
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("cos_native")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos_hof")))
    }
  }

  test("simhash16 native == HOF spec, incl. empty-token and edge shapes") {
    import graft.ext.TextOps
    import spark.implicits._
    // double spaces / trailing space produce EMPTY tokens that the HOF
    // hashes too; mixed case exercises the lowercase step
    val docs = Seq("the quick brown fox", "The  Quick  fox ", "", " ",
      "solo", "a b c d e f g h i j k l m n o p q r s t")
      .toDF("text")
      .withColumn("native", graft.functions.SimHash16(col("text")))
      .withColumn("hof", TextOps.simhash16(col("text")))
      .collect()
    docs.foreach { r =>
      assert(r.getAs[String]("native") == r.getAs[String]("hof"),
        s"for text='${r.getAs[String]("text")}'")
    }
  }

  test("simhash16 propagates nulls and runs in whole-stage codegen") {
    // range (a real codegen'd source, unlike a LocalTableScan that
    // ConvertToLocalRelation folds away) -> nullable text via when()
    val df = spark.range(4)
      .select(when(col("id") =!= 2, concat(lit("tok "), col("id"))).as("text"))
      .select(graft.functions.SimHash16(col("text")).as("s"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got.count(_.isEmpty) == 1)
    assert(got.flatten.forall(_.length == 16))
    assert(df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty)
  }

  test("optimizer rule elides redundant lower() under simhash16 and double html_to_text") {
    val base = spark.range(8).select(concat(lit("A b C "), col("id")).as("t"))
    val redundant = base.select(
      graft.functions.SimHash16(lower(upper(col("t")))).as("s"),
      graft.functions.HtmlToText(graft.functions.HtmlToText(col("t"))).as("h"))
    val clean = base.select(
      graft.functions.SimHash16(upper(col("t"))).as("s"),
      graft.functions.HtmlToText(col("t")).as("h"))
    // same values...
    assert(redundant.collect().toSeq == clean.collect().toSeq)
    // ...and the optimized plan no longer contains the redundant nodes
    val opt = redundant.queryExecution.optimizedPlan.toString
    assert(!opt.contains("lower("), opt)
    assert("html_to_text\\(".r.findAllIn(opt).size == 1, opt)
  }

  test("lower() elision also covers simhash64 and minhash_sig") {
    val base = spark.range(8).select(concat(lit("A b C d E "), col("id")).as("t"))
    val redundant = base.select(
      graft.functions.SimHash64(lower(col("t"))).as("s64"),
      graft.functions.MinHashSig(lower(col("t")), 3, 16).as("mh"))
    val clean = base.select(
      graft.functions.SimHash64(col("t")).as("s64"),
      graft.functions.MinHashSig(col("t"), 3, 16).as("mh"))
    assert(redundant.collect().toSeq == clean.collect().toSeq)
    val opt = redundant.queryExecution.optimizedPlan.toString
    assert(!opt.contains("lower("), opt)
  }

  test("bucket_idx rejects wrong types at analysis, not mid-execution") {
    import spark.implicits._
    val df = Seq(2.5).toDF("v")
    // array<int> boundaries: must be a type-check error, not a
    // ClassCastException (or silent byte misread) inside eval
    val e = intercept[Exception] {
      df.select(expr("bucket_idx(v, array(1, 2, 3))")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.contains("ARRAY<DOUBLE>"), e.getMessage)
    // the valid form still works
    val ok = df.select(
      graft.functions.BucketIdx(col("v"), Array(1.0, 2.0, 3.0)).as("b"))
      .collect()(0).getInt(0)
    assert(ok == 2)
  }

  test("vector kernels: null array, length mismatch, null element -> null") {
    import graft.ext.VectorOps
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))), // ok
      (None, Some(Seq(1.0))), // null array
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))), // length mismatch
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0))) // ok
    ).toDF("a", "b")
      .select(VectorOps.dot(col("a"), col("b")).as("d"),
        VectorOps.cosine(col("a"), col("b")).as("c"))
      .collect()
    assert(!df(0).isNullAt(0) && df(0).getDouble(0) == 11.0)
    assert(df(1).isNullAt(0) && df(1).isNullAt(1))
    assert(df(2).isNullAt(0) && df(2).isNullAt(1))
    assert(!df(3).isNullAt(1))
    // null ELEMENT inside the array (built via expression to keep the
    // array type nullable)
    val withNullElem = spark.range(1).select(
      array(lit(1.0), lit(null).cast("double")).as("a"),
      array(lit(1.0), lit(2.0)).as("b"))
      .select(VectorOps.dot(col("a"), col("b")).as("d"))
      .collect()(0)
    assert(withNullElem.isNullAt(0))
  }

  test("cosine_sim: zero-norm vector -> null, not an ANSI divide-by-zero") {
    import graft.ext.VectorOps
    val r = spark.range(1).select(
      VectorOps.cosine(array(lit(0.0), lit(0.0)),
        array(lit(1.0), lit(2.0))).as("c")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("vector kernels run inside whole-stage codegen; the HOF shape does not") {
    import graft.ext.VectorOps
    def base = spark.range(64).select(
      transform(sequence(lit(1), lit(16)),
        i => sin(col("id") * i + 0.7).cast("double")).as("a"),
      transform(sequence(lit(1), lit(16)),
        i => cos(col("id") * i + 1).cast("double")).as("b"))
    val native = base.select(VectorOps.cosine(col("a"), col("b")).as("c"),
      VectorOps.dot(col("a"), col("b")).as("d"))
    val nativePlan = native.queryExecution.executedPlan.toString
    assert(!nativePlan.contains("ScalaUDF"), nativePlan)
    assert(nativePlan.contains("cosine_sim"), nativePlan)
    // the native projection stays fused in a WholeStageCodegen stage
    // ("*(n) Project"); the HOF formulation is a CodegenFallback and
    // kicks its ENTIRE projection out of codegen — the reason the
    // native kernel exists.
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(nativePlan).isDefined, nativePlan)
    val hofPlan = base.select(VectorOps.cosineHof(col("a"), col("b")).as("c"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(hofPlan).isEmpty, hofPlan)
  }

  test("simhash64: nibble-MSB cross-check vs simhash16, nulls, codegen") {
    import spark.implicits._
    val docs = Seq("hello world hello", "", "  double  spaces ",
      "Unicode café 世界 tokens", "a").toDF("t")
    val rows = docs.select(
        graft.functions.SimHash16($"t").as("s16"),
        graft.functions.SimHash64($"t").as("s64"))
      .collect()
    rows.foreach { r =>
      val (s16, s64) = (r.getString(0), r.getString(1))
      assert(s64.length == 64 && s64.forall(c => c == '0' || c == '1'))
      // simhash16 bit j votes on the MSB of md5 nibble j — which IS
      // digest bit 4j, i.e. bit 4j of the 64-bit signature. Identical
      // votes, identical signs: an independent cross-implementation
      // check of the bit indexing both the Scala and SQL sides use.
      (0 until 16).foreach(j =>
        assert(s16(j) == s64(4 * j), s"bit $j: s16=$s16 s64=$s64"))
    }
    val n = docs.select(graft.functions.SimHash64(lit(null).cast("string")))
      .collect()(0)
    assert(n.isNullAt(0))
    // whole-stage codegen (non-foldable input via range)
    val plan = spark.range(3)
      .select(graft.functions.SimHash64(concat(lit("x "), col("id"))).as("s"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan)
    // SQL registration through GraftExtensions
    assert(spark.sql("SELECT simhash64('a b c')").collect()(0)
      .getString(0).length == 64)
  }

  test("bucket_idx: lower-bound semantics, edges, codegen participation") {
    import spark.implicits._
    import graft.functions.BucketIdx
    // the raw search: |{b : b < v}| over ascending boundaries
    val bs = Array(1.0, 3.0, 3.0, 7.0)
    assert(BucketIdx.search(bs, 0.5) == 0)
    assert(BucketIdx.search(bs, 1.0) == 0) // boundary value stays below
    assert(BucketIdx.search(bs, 2.0) == 1)
    assert(BucketIdx.search(bs, 3.0) == 1)
    assert(BucketIdx.search(bs, 5.0) == 3)
    assert(BucketIdx.search(bs, 9.0) == 4)
    assert(BucketIdx.search(Array.emptyDoubleArray, 9.0) == 0)
    // expression parity with the search on a real column, and monotone
    // (spark.range, not a local Seq — ConvertToLocalRelation would fold
    // a local relation to a LocalTableScan and skip codegen entirely)
    val df = spark.range(100).select((col("id") * 0.2).as("v"))
      .select(col("v"), BucketIdx(col("v"), Array(2.0, 7.0, 13.0)).as("b"))
    val rows = df.collect().map(r => (r.getDouble(0), r.getInt(1)))
    rows.foreach { case (v, b) =>
      assert(b == BucketIdx.search(Array(2.0, 7.0, 13.0), v))
    }
    assert(rows.sortBy(_._1).map(_._2).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
    // stays inside whole-stage codegen (the point of the native expr)
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan)
  }
}
