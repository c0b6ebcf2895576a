package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.MiniJson

/** Pins the repo's single JSON writer: whatever [[MiniJson]] emits must
  * parse back to the original value under a real JSON parser (Jackson,
  * already on the Spark classpath — the same family of strict parsers as
  * the driver's Python `json.load`). A string the escaper mishandles
  * would silently zero a round's correctness artifact (oracle_sql.json)
  * or truncate the bench metric line, so the round-trip is the contract,
  * not the exact escape spelling.
  */
class MiniJsonSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parseString(json: String): String =
    mapper.readTree(json).asText()

  test("str round-trips quotes, backslashes, and every control char") {
    val nasty = Seq(
      """plain""",
      """with "quotes" and \backslashes\""",
      "tab\there newline\nthere cr\rcrlf\r\n",
      (0 until 32).map(_.toChar).mkString, // every control char
      "unicode: καλημέρα 你好   ", // JS line separators too
      "SELECT a,\n\tb FROM t -- builder-authored SQL shape",
      "")
    for (s <- nasty)
      assert(parseString(MiniJson.str(s)) === s,
        s"round-trip failed for ${s.map(_.toInt).mkString("[", ",", "]")}")
  }

  test("obj preserves field order and parses as an object") {
    val line = MiniJson.obj(Vector(
      "metric" -> MiniJson.str("total"),
      "value" -> "1.5",
      "queries" -> MiniJson.obj(Seq("q_a" -> "0.5", "q_b" -> "1.0")),
      "note" -> MiniJson.str("a \"note\"\nwith breaks")))
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() === "total")
    assert(node.get("value").asDouble() === 1.5)
    assert(node.get("queries").get("q_b").asDouble() === 1.0)
    assert(node.get("note").asText() === "a \"note\"\nwith breaks")
    val order = node.fieldNames()
    assert(Iterator.continually(order)
      .takeWhile(_.hasNext).map(_.next()).toSeq ===
      Seq("metric", "value", "queries", "note"),
      "field order is part of the driver-contract line shape")
  }

  // the drain-family cross-language sync tests moved to ToolingSyncSpec
  // in round 19 (they are unrelated to JSON; Bench.scala's scaladoc names
  // that spec as the pin)
}
