package graft

/** Minimal JSON string quoting shared by the gate mains. Escapes
  * backslash, quote, and ALL control chars (< 0x20): an unescaped tab,
  * newline (multi-line exception messages!), or CR inside the one-line
  * gate JSON would make the driver's line-based json parse fail and
  * silently zero the round's artifact. */
object Json {
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
