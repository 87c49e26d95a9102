package graft

/** Minimal JSON string escaping shared by the driver-contract mains
  * (Verify's oracle_sql.json, Bench's metric line): backslash, quote,
  * and ALL control chars — a tab or CR in builder-authored SQL would
  * otherwise make the driver's json.load fail. */
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
