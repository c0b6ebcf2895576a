package graft.util

/** The one JSON *writer* in the repo (there is deliberately no reader:
  * the library's data path never parses JSON outside Spark's own
  * `from_json`). Bench's metric line and Verify's oracle dump each grew a
  * hand-rolled escaper; round 18 consolidates them here so "which control
  * characters are escaped" has exactly one answer, pinned by MiniJsonSpec
  * (round-trip through the Jackson parser Spark already ships).
  */
object MiniJson {

  /** `s` as a JSON string literal: quote, backslash, and ALL control
    * chars (<0x20) escaped — a tab or CR in builder-authored SQL would
    * otherwise make the driver's `json.load` fail and silently zero a
    * round's correctness artifact.
    */
  def str(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }.mkString("\"", "", "\"")

  /** One-line JSON object from ordered fields whose values are ALREADY
    * rendered JSON (callers pass numbers via toString, strings via
    * [[str]], nested objects via another [[obj]]). Field order is
    * preserved — the metric line's shape is part of the driver contract.
    */
  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => str(k) + ":" + v }.mkString("{", ",", "}")
}
