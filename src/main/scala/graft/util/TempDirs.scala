package graft.util

/** JVM-exit-reclaimed temp directories for staging landing zones, format
  * round trips, embedded-DB homes and stream checkpoints.
  *
  * Why not `File.deleteOnExit`: it only removes a path that is an EMPTY
  * dir (or plain file) at exit, and the engine's staging dirs are
  * populated by Spark WRITES (part files, _SUCCESS markers, .crc shadows)
  * that nothing registers individually — so the plain registration
  * silently leaked one fully populated dir per staging query per JVM
  * (measured before the round-12 sweep: ~1,050 dirs / 13 GB of /tmp
  * accumulated across eleven rounds of driver runs, ~82 per staging
  * family = one per JVM). On a long-lived production driver that is disk
  * exhaustion, not hygiene.
  *
  * Why not commons-io `forceDeleteOnExit` either: despite its name it
  * SNAPSHOTS the tree at registration time (it walks the dir once and
  * `deleteOnExit`s each child it finds), so registering a just-created
  * empty dir covers nothing Spark writes into it later — verified
  * empirically against the commons-io 2.21 jar this build runs on (a
  * probe dir registered empty, written after, survived JVM exit intact).
  *
  * The only mechanism that reclaims a dir whose contents appear AFTER
  * registration is deferring the recursive walk itself to exit: one
  * shutdown hook over a registry of paths, each deleted with
  * `FileUtils.deleteDirectory` (which re-walks at that moment and is a
  * no-op on paths something else already removed).
  */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  /** The cleanup the exit hook runs: re-walks each path AT THIS MOMENT
    * (covering files that appeared after registration), tolerating paths
    * something else already removed. Test seam — the hook itself only
    * fires at JVM exit, where nothing can assert. */
  private[graft] def deleteAll(paths: Iterable[java.nio.file.Path]): Unit =
    paths.foreach { p =>
      // per-path NonFatal, not just IOException: one undeletable path (or
      // a path a reaper replaced with a plain file, which deleteDirectory
      // rejects with IllegalArgumentException) must not abort cleanup of
      // every remaining registered dir
      try org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
      catch { case scala.util.control.NonFatal(_) => () } // exit anyway
    }

  // installed lazily so JVMs that never stage anything add no hook.
  // addShutdownHook throws IllegalStateException when the JVM is ALREADY
  // shutting down (a query thread creating a dir as SIGTERM lands) —
  // swallow it: create() must return the dir and surface the caller's own
  // outcome, not replace it with a shutdown artifact. That one dir may
  // leak (best-effort, same as deleteOnExit's shutdown-time no-op).
  private lazy val hookInstalled: Unit =
    try Runtime.getRuntime.addShutdownHook(new Thread(
      { () =>
        import scala.jdk.CollectionConverters._
        deleteAll(registered.asScala)
      }: Runnable,
      "graft-tempdirs-cleanup"))
    catch { case _: IllegalStateException => () }

  /** Create a temp dir whose ENTIRE TREE — including files Spark writes
    * into it later — is deleted at JVM exit. */
  def create(prefix: String): java.nio.file.Path =
    register(java.nio.file.Files.createTempDirectory(prefix))

  /** Register an existing dir for recursive deletion at JVM exit (for
    * dirs created by other APIs, e.g. stream checkpoints). Missing paths
    * at exit are a no-op, so callers may also delete eagerly. */
  def register(p: java.nio.file.Path): java.nio.file.Path = {
    hookInstalled
    registered.add(p)
    p
  }
}
