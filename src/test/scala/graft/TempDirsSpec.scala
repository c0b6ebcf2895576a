package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.TempDirs

/** The property that makes TempDirs correct where `File.deleteOnExit` and
  * commons-io `forceDeleteOnExit` both silently leak: the recursive walk
  * happens at CLEANUP time, so files written into the dir AFTER
  * registration (Spark part files, _SUCCESS markers, checkpoint subtrees)
  * are reclaimed too. Verified here through the `deleteAll` seam — the
  * exact code the exit hook runs, minus the unassertable JVM exit.
  */
class TempDirsSpec extends AnyFunSuite {

  test("files written AFTER registration are reclaimed by the cleanup walk") {
    val d = TempDirs.create("tempdirs-spec")
    // populate after create(), the order every Spark staging site follows
    java.nio.file.Files.write(d.resolve("part-0000"), "x".getBytes)
    java.nio.file.Files.createDirectory(d.resolve("sub"))
    java.nio.file.Files.write(d.resolve("sub/_SUCCESS"), Array.empty[Byte])
    TempDirs.deleteAll(Seq(d))
    assert(!java.nio.file.Files.exists(d),
      "cleanup must re-walk the tree at cleanup time, not replay a " +
        "registration-time snapshot")
  }

  test("a path already removed by a /tmp reaper is a no-op, not a crash") {
    val d = TempDirs.create("tempdirs-spec-gone")
    java.nio.file.Files.delete(d)
    TempDirs.deleteAll(Seq(d)) // must not throw
  }

  test("a path a reaper replaced with a plain FILE doesn't abort cleanup " +
      "of the remaining registered dirs") {
    val bad = TempDirs.create("tempdirs-spec-bad")
    val good = TempDirs.create("tempdirs-spec-good")
    java.nio.file.Files.write(good.resolve("f"), Array[Byte](1))
    java.nio.file.Files.delete(bad)
    java.nio.file.Files.write(bad, "not a dir".getBytes) // now a plain file
    TempDirs.deleteAll(Seq(bad, good)) // bad first: must not short-circuit
    assert(!java.nio.file.Files.exists(good),
      "one undeletable path must not leak every dir registered after it")
    java.nio.file.Files.deleteIfExists(bad)
  }

  test("register returns its argument and covers later content") {
    val d = java.nio.file.Files.createTempDirectory("tempdirs-spec-reg")
    assert(TempDirs.register(d) eq d)
    java.nio.file.Files.write(d.resolve("late.bin"), Array[Byte](1))
    TempDirs.deleteAll(Seq(d))
    assert(!java.nio.file.Files.exists(d))
  }
}
