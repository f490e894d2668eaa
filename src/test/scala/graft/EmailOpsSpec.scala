package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{EmailOps, Extractors, HtmlText}
import graft.pipeline.GmailPipeline
import graft.schema.GmailSchema

/** Golden tests for the reference-parity operators (SURVEY.md §5.3),
  * each pinning a behavior cited from /root/reference.
  */
class EmailOpsSpec extends SparkSpec {
  import Fixtures._

  private def parse(msgs: String*): DataFrame = {
    import spark.implicits._
    spark.read.schema(GmailSchema.messageType).json(
      spark.createDataset(msgs.map(_.replaceAll("\n", " "))))
  }

  private def one(df: DataFrame, c: org.apache.spark.sql.Column): Any =
    df.select(c.as("x")).collect()(0).get(0)

  // -- header lookup (gmail_functions.py:271-283) -----------------------
  test("header lookup is case-insensitive and last-wins") {
    val df = parse(message("m1", headers = Seq(
      ("FROM", "First <first@x.com>"),
      ("Subject", "hello"),
      ("from", "Second <second@x.com>"))))
    val hdrs = col("payload.headers")
    assert(one(df, EmailOps.headerValue(hdrs, "subject")) == "hello")
    // the reference overwrites on each match → last wins
    assert(one(df, EmailOps.headerValue(hdrs, "from"))
      == "Second <second@x.com>")
    assert(one(df, EmailOps.headerValue(hdrs, "date")) == null)
  }

  // -- from-address parse (gmail_functions.py:281-283) -------------------
  test("fromAddr: Name <addr>, bare addr, nested '<', stray '>'") {
    val df = spark.range(1).toDF()
    def f(s: String) = one(df, EmailOps.fromAddr(lit(s)))
    assert(f("Indeed Apply <indeedapply@indeed.com>") == "indeedapply@indeed.com")
    assert(f("bare@example.com") == "bare@example.com")
    assert(f("\"x <y>\" <a@b.c>") == "a@b.c")      // last '<' segment
    assert(f("  spaced <s@p.q>  ") == "s@p.q")
    assert(f("weird >> <w@x.y>") == "w@x.y")       // all '>' removed
  }

  // -- date parse + %D %H:%M:%S format (gmail_functions.py:274-278) ------
  test("date parse: RFC-2822 wall-clock, zone stripped, MM/dd/yy output") {
    val df = spark.range(1).toDF()
    def f(s: String) = one(df, EmailOps.formatDateString(lit(s)))
    // reference prints the datetime's own wall time, never converts zones
    assert(f("Thu, 1 Dec 2022 10:15:30 -0800") == "12/01/22 10:15:30")
    assert(f("Thu, 1 Dec 2022 10:15:30 +0000 (UTC)") == "12/01/22 10:15:30")
    assert(f("1 Dec 2022 23:59:59") == "12/01/22 23:59:59")
    assert(f("not a date") == null)
  }

  // -- urlsafe base64 (gmail_functions.py:212,289) ------------------------
  test("urlsafe base64 decode covers - and _ alphabet") {
    val payload = "subject?>>~þÿ" // forces +/ in std, -_ in urlsafe
    val enc = b64url(payload)
    assert(enc.contains("-") || enc.contains("_"))
    val df = spark.range(1).toDF()
    assert(one(df, EmailOps.decodeB64Utf8(lit(enc))) == payload)
  }

  // -- body assembly across depths (gmail_functions.py:195-204,286-291) --
  test("body chunks assemble in document (pre-order) order across 3 depths") {
    val df = parse(deepMessage("d1"))
    assert(one(df, EmailOps.bodyText(col("payload"))) == "A B C D")
  }

  test("body of message with no data keys is empty string") {
    val df = parse(message("m0", bodyData = None))
    assert(one(df, EmailOps.bodyText(col("payload"))) == "")
  }

  // -- html → text (gmail_functions.py:294-295) ---------------------------
  test("htmlToText: strip tags/script, per-node strip, '' join, entities") {
    assert(HtmlText.clean("<p> Hello </p><b>World</b>") == "HelloWorld")
    assert(HtmlText.clean("<script>var x=1;</script>ok") == "ok")
    assert(HtmlText.clean("<style>p{}</style>keep") == "keep")
    assert(HtmlText.clean("A &amp; B &lt;tag&gt; &#65;") == "A & B <tag> A")
    assert(HtmlText.clean("<!-- hidden -->shown") == "shown")
  }

  test("cleanBody: ascii-ignore then CR/LF removal") {
    val df = spark.range(1).toDF()
    assert(one(df, EmailOps.cleanBody(lit("café\r\nline"))) == "cafline")
  }

  // -- Indeed extractor (gmail_functions.py:207-221) ----------------------
  test("indeedExtract: positional a/p picks under dir=rtl") {
    val m = Extractors.indeedExtract(indeedHtml)
    assert(m.role == "Data & Platform Engineer")
    assert(m.org == "Acme Corp")
    assert(m.location == "Remote")
  }

  test("indeedExtract: nested <a> inside <p> yields bs4 document order") {
    // find_all(['a','p']) emits the outer <p> AND its nested <a> (pre-order),
    // so elements = [p, a, a, p] here — role is the nested link's text.
    val html =
      """<div dir="rtl">
        |<p>Hi <a href="#">Data Engineer</a></p>
        |<a href="#">Austin - Remote</a>
        |<p>Acme Corp</p>
        |</div>""".stripMargin
    val m = Extractors.indeedExtract(html)
    assert(m.role == "Data Engineer")
    assert(m.org == "Acme Corp")
    assert(m.location == "Remote")
  }

  test("indeedExtract: malformed → all-null struct (bare except parity)") {
    val m = Extractors.indeedExtract("<div dir=\"rtl\"><p>one</p></div>")
    assert(m.role == null && m.org == null && m.location == null)
    assert(Extractors.indeedExtract("no rtl here").role == null)
    assert(Extractors.indeedExtract(null).role == null)
  }

  // -- LinkedIn extractor (dead code, gmail_functions.py:224-245) ---------
  test("linkedinExtract: gate phrase + ' · ' splits") {
    val html =
      """<h2>Your application was sent to Acme</h2>
        |<td><p>hdr</p><p>Engineer · Austin</p><p>Acme · 100 employees</p></td>
        |""".stripMargin
    val m = Extractors.linkedinExtract(html)
    assert(m.role == "Engineer")
    assert(m.location == "Austin")
    assert(m.org == "Acme")
    assert(Extractors.linkedinExtract("<h2>other</h2>").role == null)
  }

  // -- formatted projection (gmail_functions.py:265-305) ------------------
  test("formatMessages: full record incl. Indeed enrichment; null columns") {
    val df = GmailPipeline.formatMessages(
      parse(indeedMessage("i1"), message("p1",
        headers = Seq(("From", "x <x@y.z>")),
        bodyData = Some(b64url("plain")))))
    val rows = df.orderBy("id").collect()
    val i1 = rows(0)
    assert(i1.getAs[String]("id") == "i1")
    assert(i1.getAs[String]("from") == "indeedapply@indeed.com")
    assert(i1.getAs[String]("role") == "Data & Platform Engineer")
    assert(i1.getAs[String]("org") == "Acme Corp")
    assert(i1.getAs[String]("location") == "Remote")
    assert(i1.getAs[String]("date_string") == "12/01/22 10:15:30")
    assert(i1.getAs[String]("body").contains("Application submitted!"))
    val p1 = rows(1)
    assert(p1.getAs[String]("subject") == null)
    assert(p1.getAs[String]("role") == null)
    assert(p1.getAs[String]("body") == "plain")
  }
}
