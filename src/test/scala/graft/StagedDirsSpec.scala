package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StagedDirs

/** Memo semantics of the staged-landing-zone registry, including the
  * cold-stage log Bench's noise guard uses to make its re-run pay the
  * same staging cost the first run did.
  */
class StagedDirsSpec extends AnyFunSuite {

  private def mkStaged(): String = {
    val d = graft.util.TempDirs.create("graft-stageddirs-spec")
    java.nio.file.Files.write(d.resolve("data.bin"), Array[Byte](1, 2, 3))
    d.toString
  }

  test("cold stage logs the key; memo hit does not") {
    val key = s"spec-cold|${System.nanoTime()}"
    StagedDirs.drainRecentlyStaged() // isolate from other suites
    var stagings = 0
    val d1 = StagedDirs.getOrStage(key) { stagings += 1; mkStaged() }
    assert(stagings == 1)
    assert(StagedDirs.drainRecentlyStaged() == Seq(key))
    val d2 = StagedDirs.getOrStage(key) { stagings += 1; mkStaged() }
    assert(stagings == 1 && d2 == d1, "memo hit must not re-stage")
    assert(StagedDirs.drainRecentlyStaged().isEmpty,
      "memo hit must not log the key")
  }

  test("invalidate forces a cold re-stage that is logged again") {
    val key = s"spec-invalidate|${System.nanoTime()}"
    StagedDirs.drainRecentlyStaged()
    var stagings = 0
    StagedDirs.getOrStage(key) { stagings += 1; mkStaged() }
    StagedDirs.drainRecentlyStaged()
    StagedDirs.invalidate(Seq(key))
    val d2 = StagedDirs.getOrStage(key) { stagings += 1; mkStaged() }
    assert(stagings == 2, "invalidated key must re-stage")
    assert(StagedDirs.drainRecentlyStaged() == Seq(key))
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d2)))
  }

  test("reaped dir fails revalidation and re-stages (existing contract)") {
    val key = s"spec-reaped|${System.nanoTime()}"
    StagedDirs.drainRecentlyStaged()
    var stagings = 0
    val d1 = StagedDirs.getOrStage(key) { stagings += 1; mkStaged() }
    // simulate a /tmp reaper removing the staged copy mid-JVM
    val p = java.nio.file.Paths.get(d1)
    val s0 = java.nio.file.Files.list(p)
    try s0.forEach(f => java.nio.file.Files.delete(f))
    finally s0.close()
    java.nio.file.Files.delete(p)
    StagedDirs.getOrStage(key) { stagings += 1; mkStaged() }
    assert(stagings == 2, "dead path must re-stage, not silently reuse")
  }
}
