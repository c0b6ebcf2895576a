package graft.streaming

import org.apache.spark.sql.DataFrame

/** File landing zone staged for DETERMINISTIC multi-batch streaming drains.
  *
  * Watermark-gated state (event-time timers, outer-join null padding,
  * dropDuplicatesWithinWatermark eviction) only releases when the watermark
  * ADVANCES PAST the state's horizon — and the watermark is published at the
  * END of each micro-batch, gating emission to a SUBSEQUENT batch. A
  * single-batch replay of a finite table therefore never flushes the tail.
  * The staging contract here makes the flush provable: the real rows land
  * as the first file, then far-future sentinel rows land as later files,
  * and `maxFilesPerTrigger=1` forces one batch per file — so batch 2
  * publishes the data watermark and batch 3 runs with the sentinel
  * watermark, past every horizon the data could have set. Sentinel rows
  * carry an out-of-domain key — one RESERVED value per caller (e.g.
  * [[SessionTimers.SentinelKey]] = Long.MinValue), never a broad "any
  * negative id" convention that would swallow signed-hash keys — so query
  * logic can exclude them from results while they still advance the clock.
  *
  * This is exactly how a production landing zone behaves (late files keep
  * arriving and push the watermark); the sentinels just make the tail flush
  * happen inside the bounded drain instead of "on the next day's data".
  */
object LandingZone {

  /** Session-conf key bounding a single staged step's parquet size. The
    * `coalesce(1)` below is REQUIRED by the drain contract (one file =
    * one `maxFilesPerTrigger=1` batch), which makes every step a
    * single-task write — correct for the bounded drain fixtures this is
    * for, a bottleneck for bulk data. The guard makes that limit loud: a
    * step over the cap throws with a pointer to the partitioned writer
    * instead of silently serializing gigabytes through one task. -1
    * disables.
    */
  val MaxStepBytesKey = "graft.landing.maxStepBytes"
  val DefaultMaxStepBytes: Long = 1L << 30 // 1 GiB

  /** Write `first` then each of `sentinels` as single-parquet-file steps of
    * a landing-zone directory with strictly increasing mtimes (the file
    * source's processing order), and return the directory path. All frames
    * must share one schema.
    */
  def stage(first: DataFrame, sentinels: Seq[DataFrame]): String = {
    val maxStepBytes = {
      val raw = first.sparkSession.conf.get(MaxStepBytesKey,
        sys.props.getOrElse(MaxStepBytesKey, DefaultMaxStepBytes.toString))
      try raw.trim.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$MaxStepBytesKey must be a long (-1 disables the guard); " +
              s"got '$raw'")
      }
    }
    val staged = graft.util.TempDirs.create("graft-landing")
    val t0 = System.currentTimeMillis() - 60000L
    (first +: sentinels).zipWithIndex.foreach { case (df, i) =>
      // exit-registered like every staging dir: a write that FAILS below
      // (disk full, task error) must not orphan a populated intermediate;
      // the eager delete on the success path still runs (exit hook no-ops
      // on missing paths)
      val tmp = graft.util.TempDirs.create("graft-landing-stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      var src: java.nio.file.Path = null
      try {
        val part = listing.iterator()
        while (part.hasNext) {
          val p = part.next()
          if (p.getFileName.toString.endsWith(".parquet")) src = p
        }
      } finally listing.close()
      require(src != null,
        s"landing-zone step $i wrote no .parquet part file under $tmp " +
          "(empty-partition write?) — the drain would silently skip a batch")
      val stepBytes = java.nio.file.Files.size(src)
      if (maxStepBytes >= 0 && stepBytes > maxStepBytes)
        throw new IllegalStateException(
          s"landing-zone step $i is $stepBytes bytes, over the " +
            s"$MaxStepBytesKey cap of $maxStepBytes: stage() serializes " +
            "each step through ONE task (the maxFilesPerTrigger=1 drain " +
            "contract needs one file per step). For bulk data use " +
            "Scale.writePartitioned and a normal file-source stream; " +
            s"set $MaxStepBytesKey=-1 to override.")
      val dst = staged.resolve(f"step-$i%03d.parquet")
      java.nio.file.Files.copy(src, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 10000L))
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    staged.toString
  }
}
