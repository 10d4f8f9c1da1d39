package graft.util

/** Shared JSON string quoting for the driver-contract mains (Bench's
  * metric line, Verify's oracle dump): backslash, quote, and ALL
  * control chars — a raw newline or tab inside one value would make
  * the whole single-line JSON artifact unparseable and silently zero
  * a round's signal.
  */
object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
