package graft.streaming

import java.util.concurrent.ConcurrentHashMap

/** Process-wide memo of staged landing-zone directories (replay-only
  * copies). A cache hit is REVALIDATED — the directory must still exist and
  * hold at least one file — because /tmp reapers or manual cleanup can
  * remove a staged copy mid-JVM (deleteOnExit only fires at exit), and a
  * blindly-reused dead path would make the file stream source drain ZERO
  * rows silently: an empty result, not an error. Staleness of the SOURCE
  * (a caller regenerating the table under the same path in-process) is out
  * of scope — keys are source paths, and the test/verify drivers treat the
  * testdata as immutable within a run.
  */
object StagedDirs {

  private val cache = new ConcurrentHashMap[String, String]()

  private def valid(path: String): Boolean = {
    val d = java.nio.file.Paths.get(path)
    java.nio.file.Files.isDirectory(d) && {
      val s = java.nio.file.Files.list(d)
      try s.iterator().hasNext
      finally s.close()
    }
  }

  /** Return the staged dir for `key`, staging (atomically per key) when
    * absent or when the cached dir no longer validates. */
  def getOrStage(key: String)(stage: => String): String =
    cache.compute(key, (_, cur) =>
      if (cur != null && valid(cur)) cur else stage)
}
