package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure `Column → Column` implementations of the reference transform's
  * scalar operators (SURVEY.md §2.8). Everything here is composed from
  * codegen'd built-ins — no UDF — except the HTML/extractor functions,
  * which are inherently imperative and isolated in [[HtmlText]] /
  * [[Extractors]].
  */
object EmailOps {

  /** F2: urlsafe-base64 → binary (reference gmail_functions.py:212,289:
    * `base64.urlsafe_b64decode`). Translate the urlsafe alphabet back to
    * standard, then unbase64 (lenient about missing padding, like Python).
    */
  def urlsafeUnbase64(c: Column): Column =
    unbase64(translate(c, "-_", "+/"))

  /** F2: urlsafe-base64 → UTF-8 text. */
  def decodeB64Utf8(c: Column): Column =
    decode(urlsafeUnbase64(c), "UTF-8")

  /** P2/F5: case-insensitive header lookup over the
    * `headers: array<struct<name,value>>` column. The reference overwrites
    * on every match while scanning (gmail_functions.py:271-283), so the
    * LAST matching header wins; `try_element_at(..., -1)` reproduces that
    * and yields NULL when the header is absent.
    */
  def headerValue(headers: Column, name: String): Column =
    try_element_at(
      filter(headers, h => lower(h.getField("name")) === lit(name)),
      lit(-1)).getField("value")

  /** F6: from-address parse (gmail_functions.py:281-283):
    * split on '<', take the LAST segment, remove every '>' char
    * (`.replace('>','')`, not strip), then trim whitespace.
    */
  def fromAddr(c: Column): Column =
    trim(translate(element_at(split(c, "<"), -1), ">", ""))

  /** RFC-2822-ish Date headers, with/without zone, with optional trailing
    * "(TZNAME)" comment. The reference prints the parsed datetime's OWN
    * wall-clock time (`dateutil.parser.parse(v).strftime('%D %H:%M:%S')`,
    * gmail_functions.py:274-277) — it never converts zones — so we strip
    * the zone designator and parse the naive wall time.
    */
  private val dateFormats = Seq(
    "d MMM yyyy HH:mm:ss",
    "d MMM yyyy HH:mm",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "MM/dd/yyyy HH:mm:ss")

  /** F7: strip the "EEE, " weekday prefix (Spark treats pattern letter E
    * as format-only, so it can't be parsed), the trailing "(comment)",
    * and the zone designator — leaving naive wall time.
    */
  def stripZone(c: Column): Column = {
    val noDow = regexp_replace(c, "^\\s*[A-Za-z]{3},\\s*", "")
    val noComment = regexp_replace(noDow, "\\s*\\([^)]*\\)\\s*$", "")
    regexp_replace(noComment, "\\s+(?:[+-]\\d{4}|[A-Z]{2,5})$", "")
  }

  /** F7: finite-format-list date parse (the engine's deterministic spec of
    * dateutil strict→fuzzy; SURVEY.md §1.3). NULL when nothing matches.
    */
  def parseDateMulti(c: Column): Column = {
    val s = stripZone(c)
    coalesce(dateFormats.map(f => try_to_timestamp(s, lit(f))): _*)
  }

  /** F7 output edge: `%D %H:%M:%S` = MM/DD/YY HH:mm:ss. */
  def formatDateString(c: Column): Column =
    date_format(parseDateMulti(c), "MM/dd/yy HH:mm:ss")

  /** F4: post-HTML cleanup (gmail_functions.py:295): ASCII-ignore
    * re-encode, then remove CR/LF.
    */
  def cleanBody(c: Column): Column =
    regexp_replace(regexp_replace(c, "[^\\x00-\\x7F]", ""), "[\\r\\n]", "")

  // ---------------------------------------------------------------------
  // F1: body-chunk assembly. The reference recursively collects EVERY value
  // of key 'data' anywhere in the message JSON (find_json_values,
  // gmail_functions.py:195-204) in document order, urlsafe-b64-decodes each
  // chunk, and space-joins (gmail_functions.py:286-291). With the schema
  // unrolled to a fixed depth, document order == pre-order traversal:
  // a node's own body.data precedes its children's.
  // ---------------------------------------------------------------------

  /** Typed empty array<string> trick: slice of a string array to length 0
    * (keeps the element type without naming it).
    */
  private def emptyLike(arr: Column): Column = slice(arr, 1, 0)

  /** Pre-order collection of `body.data` over one part subtree. */
  private def partChunks(p: Column, depth: Int): Column = {
    val own = array(p.getField("body").getField("data"))
    if (depth <= 0) own
    else {
      val kids = flatten(transform(p.getField("parts"),
        q => partChunks(q, depth - 1)))
      concat(own, coalesce(kids, emptyLike(own)))
    }
  }

  /** All base64 body chunks of a message payload column, document order,
    * nulls (absent `data` keys) removed.
    */
  def bodyChunks(payload: Column): Column = {
    val own = array(payload.getField("body").getField("data"))
    val kids = flatten(transform(payload.getField("parts"),
      q => partChunks(q, graft.schema.GmailSchema.PartsDepth - 1)))
    filter(concat(own, coalesce(kids, emptyLike(own))), c => c.isNotNull)
  }

  /** A1: decoded, space-joined raw body text (pre-HTML-strip). */
  def bodyText(payload: Column): Column =
    array_join(transform(bodyChunks(payload), c => decodeB64Utf8(c)), " ")

  /** F3: deterministic HTML→text (spec'd bs4 get_text(strip=True) — see
    * [[HtmlText.clean]]), as the native codegen'd expression
    * [[graft.functions.HtmlToText]] rather than a UDF black box.
    */
  def htmlToText(html: Column): Column = graft.functions.HtmlToText(html)

  /** F3+F4 composed: the reference's full body cleanup chain. */
  def cleanedBodyText(payload: Column): Column =
    cleanBody(htmlToText(bodyText(payload)))
}
