package graft

/** The ONE JSON string-escape implementation behind every JSON payload
  * the harness emits (Bench's headline + detail lines, Verify's and
  * RunOne's oracle_sql.json): backslash, quote, and EVERY control char
  * below 0x20. A stray \b or ESC in builder-authored SQL or an error
  * message would otherwise make the driver's json.load reject the
  * whole payload exactly when it matters most. Shared so an escaping
  * fix can never land in one emitter and silently miss the others.
  */
private[graft] object Jsons {
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
