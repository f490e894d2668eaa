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
}
