package graft

/** Gmail-shaped JSON fixtures (FIXTURES.md §2-4). Built in code so each
  * test names exactly the behavior it pins; urlsafe base64 payloads
  * include '-' and '_' bytes where noted.
  */
object Fixtures {

  def b64url(s: String): String =
    java.util.Base64.getUrlEncoder.encodeToString(s.getBytes("UTF-8"))

  /** Minimal message with given headers/parts JSON snippets. */
  def message(id: String, mimeType: String = "multipart/alternative",
      headers: Seq[(String, String)] = Nil,
      bodyData: Option[String] = None,
      partsJson: String = ""): String = {
    val hdrs = headers
      .map { case (n, v) => s"""{"name": ${q(n)}, "value": ${q(v)}}""" }
      .mkString("[", ", ", "]")
    val body = bodyData match {
      case Some(d) => s"""{"size": 1, "data": ${q(d)}}"""
      case None => """{"size": 0}"""
    }
    val parts = if (partsJson.isEmpty) "" else s""", "parts": $partsJson"""
    s"""{
       |  "id": ${q(id)}, "threadId": ${q(id)}, "labelIds": ["INBOX"],
       |  "snippet": "s",
       |  "payload": {
       |    "mimeType": ${q(mimeType)},
       |    "headers": $hdrs,
       |    "body": $body$parts
       |  }
       |}""".stripMargin
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c => c.toString
    } + "\""

  /** Depth-3 multipart message: chunks must assemble in document
    * (pre-order) order A B C D (FIXTURES.md §2 "body chunks at ≥3 depths").
    */
  def deepMessage(id: String): String = message(
    id = id,
    headers = Seq(("From", "Deep Sender <deep@example.com>"),
      ("Date", "Thu, 1 Dec 2022 10:15:30 -0800"),
      ("Subject", "deep")),
    bodyData = Some(b64url("A")),
    partsJson =
      s"""[
         |  {"mimeType": "text/plain", "body": {"size": 1, "data": ${q(b64url("B"))}}},
         |  {"mimeType": "multipart/related",
         |   "body": {"size": 0},
         |   "parts": [
         |     {"mimeType": "multipart/alternative",
         |      "body": {"size": 1, "data": ${q(b64url("C"))}},
         |      "parts": [
         |        {"mimeType": "text/html", "body": {"size": 1, "data": ${q(b64url("D"))}}}
         |      ]}
         |   ]}
         |]""".stripMargin)

  /** Indeed application mail: dir=rtl container whose a/p elements are
    * positional (gmail_functions.py:216-219): elements[1]=role,
    * elements[3]=org, elements[2]="City - Location".
    */
  val indeedHtml: String =
    """<html><body>
      |<div dir="rtl">
      |<p>Application submitted!</p>
      |<p>Data &amp; Platform Engineer</p>
      |<a href="#">Austin - Remote</a>
      |<p>Acme Corp</p>
      |</div></body></html>""".stripMargin

  def indeedMessage(id: String): String = message(
    id = id,
    mimeType = "text/html",
    headers = Seq(("From", "Indeed Apply <indeedapply@indeed.com>"),
      ("Date", "Thu, 1 Dec 2022 10:15:30 -0800"),
      ("Subject", "Application submitted")),
    bodyData = Some(b64url(indeedHtml)))

  /** Indeed mail whose rtl section lacks the positional elements →
    * extractor must yield the all-null struct (bare except, :220).
    */
  def indeedMalformed(id: String): String = message(
    id = id,
    mimeType = "text/html",
    headers = Seq(("From", "indeedapply@indeed.com")),
    bodyData = Some(b64url("<div dir=\"rtl\"><p>only one</p></div>")))
}
