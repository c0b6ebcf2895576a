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

  test("BASELINE_ANCHOR.json's query key set equals SparkEntry.queries " +
      "(r19 verdict ask #7)") {
    // Today only merge_bench's exit-3 guard would notice drift between the
    // anchor and the registry, and only at merge time; this pins it at
    // test time. Key extraction mirrors Bench.main's anchor regex (same
    // key pattern; Bench additionally captures the value), so the two
    // readers can't diverge silently either.
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BASELINE_ANCHOR.json"))
    val anchorKeys = "\"(q[A-Za-z0-9_]+)\"\\s*:\\s*[0-9.]+".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    assert(anchorKeys === registered,
      s"anchor/registry drift — only in anchor: ${anchorKeys -- registered}" +
        s"; only in registry: ${registered -- anchorKeys}")
  }

  test("Bench's loadavg stamp is a parseable 1-min loadavg on Linux") {
    val v = Bench.loadavg1m()
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get("/proc/loadavg")))
      assert(v.matches("""\d+\.\d+"""),
        s"expected a decimal loadavg from /proc/loadavg, got '$v'")
    else assert(v == "?", s"off-Linux marker must be '?', got '$v'")
  }

  test("merge_bench.py carries the loadavg field names Bench emits " +
      "(cross-language field sync)") {
    val py = java.nio.file.Files.readString(
      java.nio.file.Paths.get("tools/merge_bench.py"))
    for (f <- Seq("loadavg_start", "loadavg_finish"))
      assert(py.contains("\"" + f + "\""),
        s"tools/merge_bench.py no longer reads '$f' — rename both sides " +
          "together (Bench.scala emits it)")
  }
}
