package graft.ops

/** Deterministic HTML→text transform — the engine's specified equivalent of
  * the reference's BeautifulSoup `get_text(strip=True)`
  * (resources/gmail_functions.py:294-295). Semantics (SURVEY.md §7 hard
  * part 2 — spec'd, not bug-for-bug bs4 parity):
  *
  *  1. drop <script>/<style> subtrees entirely;
  *  2. drop comments and CDATA;
  *  3. split the document on tags; each text node is trimmed and
  *     whitespace-only nodes are dropped; surviving nodes are concatenated
  *     with no separator (exactly bs4's `get_text("", strip=True)`);
  *  4. HTML entities in text are decoded (named common set + numeric).
  */
object HtmlText {
  private val scriptStyle =
    "(?is)<(script|style)[^>]*>.*?</\\1\\s*>".r
  private val comments = "(?s)<!--.*?-->".r
  private val tag = "<[^>]*>"

  private val named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "rsquo" -> "’", "lsquo" -> "‘",
    "rdquo" -> "”", "ldquo" -> "“")

  private val entity = "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r

  def decodeEntities(s: String): String =
    entity.replaceAllIn(s, m => {
      val e = m.group(1)
      val out =
        if (e.startsWith("#x") || e.startsWith("#X"))
          try new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
          catch { case _: Exception => m.matched }
        else if (e.startsWith("#"))
          try new String(Character.toChars(Integer.parseInt(e.drop(1))))
          catch { case _: Exception => m.matched }
        else named.getOrElse(e, m.matched)
      java.util.regex.Matcher.quoteReplacement(out)
    })

  /** Extract visible text: tag-strip + per-node trim + '' join + entities. */
  def clean(html: String): String = {
    if (html == null) return null
    val noScript = scriptStyle.replaceAllIn(html, "")
    val noComment = comments.replaceAllIn(noScript, "")
    val nodes = noComment.split(tag)
    val joined = nodes.iterator.map(_.trim).filter(_.nonEmpty).mkString("")
    decodeEntities(joined)
  }
}
