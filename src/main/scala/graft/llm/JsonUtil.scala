package graft.llm

/** The one JSON string escaper (control-plane payloads; the data plane
  * uses json4s/get_json_object). Escapes quote, backslash, and every
  * control char below 0x20. */
object JsonUtil {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
