package graft.ops

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Per-sender extractors (SURVEY.md §2.9) — the reference's only "UDFs".
  * Both take the decoded, space-joined body text (the output of
  * [[EmailOps.bodyText]]) and return a nullable (role, org, location)
  * struct; any parse failure yields the all-null struct, mirroring the
  * reference's bare `except: {}` (gmail_functions.py:220, 244).
  */
object Extractors {

  case class JobMeta(role: String, org: String, location: String)
  private val empty = JobMeta(null, null, null)

  private val rtlAttr =
    "(?is)<[a-zA-Z][^>]*\\bdir\\s*=\\s*[\"']?rtl[\"']?[^>]*>".r
  private val aOrP = "(?is)<(a|p)\\b[^>]*>(.*?)</\\1\\s*>".r
  private val h2 = "(?is)<h2\\b[^>]*>(.*?)</h2\\s*>".r
  private val td = "(?is)<td\\b[^>]*>(.*?)</td\\s*>".r
  private val p = "(?is)<p\\b[^>]*>(.*?)</p\\s*>".r

  private def innerText(html: String): String =
    HtmlText.clean(html)

  /** All a/p element texts in bs4 document order (pre-order): each outer
    * element is followed by its nested a/p descendants, like
    * `find_all(['a','p'])` — an `<a>` inside a `<p>` yields BOTH the
    * `<p>`'s full text and the `<a>`'s own text, so positional indexing
    * matches the reference on markup with links inside paragraphs.
    * (Same-tag nesting — `<p>` in `<p>` — can't occur: html.parser
    * auto-closes it, and the non-greedy match mirrors that.)
    */
  private def aOrPTexts(html: String): Vector[String] =
    aOrP.findAllMatchIn(html).flatMap { m =>
      innerText(m.group(2)).trim +: aOrPTexts(m.group(2))
    }.toVector

  /** X1: Indeed application mail (gmail_functions.py:207-221).
    * Reference: `soup.find(attrs={'dir':'rtl'}).find_all(['a','p'])`,
    * elements' text stripped; role=elements[1], org=elements[3],
    * location=elements[2].split(' - ')[1]. Engine spec: descendants are
    * approximated as the a/p elements (document order, including nested
    * ones — see [[aOrPTexts]]) appearing after the first dir=rtl tag
    * (Indeed's rtl container wraps the remainder of the document).
    */
  def indeedExtract(body: String): JobMeta = {
    if (body == null) return empty
    try {
      val m = rtlAttr.findFirstMatchIn(body).getOrElse(return empty)
      val scope = body.substring(m.end)
      val elements = aOrPTexts(scope)
      JobMeta(
        role = elements(1),
        org = elements(3),
        location = elements(2).split(" - ")(1))
    } catch { case _: Exception => empty }
  }

  /** X2: LinkedIn mail (gmail_functions.py:225-245) — DEAD CODE in the
    * reference (`BROKEN DO NOT USE`, call site commented out at :301-302).
    * Implemented for completeness behind [[graft.pipeline.GmailPipeline]]'s
    * `linkedinEnabled` flag, default off.
    */
  def linkedinExtract(body: String): JobMeta = {
    if (body == null) return empty
    try {
      val sent = h2.findFirstMatchIn(body)
        .exists(m => innerText(m.group(1)).contains("Your application was sent to"))
      if (!sent) return empty
      val firstTd = td.findFirstMatchIn(body).getOrElse(return empty)
      val elements = p.findAllMatchIn(firstTd.group(1))
        .map(x => innerText(x.group(1))).toVector
      JobMeta(
        role = elements(1).split(" · ")(0),
        org = elements(2).split(" · ")(0),
        location = elements(1).split(" · ")(1))
    } catch { case _: Exception => empty }
  }

  val indeedUdf: UserDefinedFunction = udf(indeedExtract _)
  val linkedinUdf: UserDefinedFunction = udf(linkedinExtract _)
}
