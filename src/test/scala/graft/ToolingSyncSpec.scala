package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-language tooling invariants: the Scala side of the
  * bench (Bench.drainCalibFamily gates the calibration drain) and the
  * Python side (tools/merge_bench.py DRAIN_FAMILY picks which anchor
  * ratios get the calib-normalized column) must name the same queries —
  * a name in one but not the other silently mis-triages exactly the
  * queries the calibration exists for.
  *
  * Lived in MiniJsonSpec through round 18 (it is unrelated to JSON);
  * Bench.scala's scaladoc has always said "ToolingSyncSpec pins the two
  * lists together", so round 19 made that file exist (ADVICE r18).
  */
class ToolingSyncSpec extends AnyFunSuite {

  test("Bench's drain family matches merge_bench.py's DRAIN_FAMILY " +
      "(cross-language list sync)") {
    val py = java.nio.file.Files.readString(
      java.nio.file.Paths.get("tools/merge_bench.py"))
    // tolerant of whitespace/reformat around the assignment; a miss is a
    // readable assertion failure, not an ArrayIndexOutOfBounds (ADVICE r18)
    val decl = """DRAIN_FAMILY\s*=\s*\(""".r
    val start = decl.findFirstMatchIn(py)
    assert(start.isDefined,
      "tools/merge_bench.py no longer declares 'DRAIN_FAMILY = (' — " +
        "update this spec's extraction alongside the rename")
    val rest = py.substring(start.get.end)
    val close = rest.indexOf(')')
    assert(close >= 0,
      "unterminated DRAIN_FAMILY tuple in tools/merge_bench.py")
    val block = rest.substring(0, close)
    val pyFamily = "\"(q[A-Za-z0-9_]+)\"".r.findAllMatchIn(block)
      .map(_.group(1)).toSet
    assert(pyFamily === Bench.drainCalibFamily,
      "edit both lists together: Bench.drainCalibFamily and " +
        "tools/merge_bench.py DRAIN_FAMILY")
  }

  test("every drain-family name is a registered query") {
    val unknown = Bench.drainCalibFamily -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"drain family names not in SparkEntry.queries: $unknown")
  }
}
