package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only micro-batch census for the bounded drains (optimization round
  * 22): for each landing-zone drain variant — sentinel-step count x
  * `spark.sql.streaming.noDataMicroBatches.enabled` — report how many
  * micro-batches actually execute, their per-batch durations, and a hash of
  * the drained result, so the "3-step sentinel contract is the minimum"
  * claim is settled by measurement instead of assertion.
  *
  * Usage: sbt "runMain graft.DrainBatchProbe [sfDir]"
  * Not part of the driver contract; never invoked by Verify/Bench.
  */
object DrainBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def report(tag: String, q: org.apache.spark.sql.streaming.StreamingQuery,
        result: org.apache.spark.sql.DataFrame, wallSec: Double): Unit = {
      val prog = q.recentProgress
      val rows = result.collect().map(_.toString).sorted
      val hash = java.util.Arrays.hashCode(rows.asInstanceOf[Array[AnyRef]])
      println(f"[probe] $tag%-42s wall $wallSec%6.3f s  batches ${prog.length}%2d  " +
        s"rows ${rows.length}  hash $hash")
      prog.foreach { p =>
        println(f"[probe]    batch ${p.batchId}%2d  inRows ${p.numInputRows}%6d  " +
          f"ms ${p.durationMs.getOrDefault("triggerExecution", -1L)}%6d " +
          f"(addBatch ${p.durationMs.getOrDefault("addBatch", -1L)}%5d, " +
          f"getBatch ${p.durationMs.getOrDefault("getBatch", -1L)}%4d, " +
          f"commit ${p.durationMs.getOrDefault("commitOffsets", -1L)}%4d)")
      }
    }

    // ---- tws_sessions shape (SessionTimers) --------------------------------
    val gapUs = 1800000000L
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evRows = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id").cast("long"), col("ts_us").cast("long"))
    val maxUs = evRows.agg(max(col("ts_us"))).as[Option[Long]].first().getOrElse(0L)
    val sentA = maxUs + gapUs + 3600000000L
    val sentB = sentA + 3600000000L

    def twsVariant(nSent: Int, noData: Boolean, merge: Boolean = false): Unit = {
      def sentRow(ts: Long) = Seq((Long.MinValue, ts)) // SessionTimers.SentinelKey
        .toDF("user_id", "ts_us")
      // merge: sentinel A rides the DATA step (the batch's end-of-step
      // watermark jumps straight past every horizon), later sentinels are
      // their own steps
      val first = if (merge) evRows.unionByName(sentRow(sentA)) else evRows
      val sents = (if (merge) Seq(sentB).take(nSent - 1) else Seq(sentA, sentB).take(nSent))
        .map(sentRow)
      val staged = graft.streaming.LandingZone.stage(first, sents,
        filesPerStep = graft.streaming.LandingZone.DrainFilesPerStep)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      ss.conf.set("spark.sql.shuffle.partitions",
        graft.streaming.DrainWidth.forPath(spark, staged).toString)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
      val out = graft.streaming.SessionTimers.sessionStream(ss, staged, gapUs)
      val name = "probe_tws_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val t0 = System.nanoTime()
      val q = out.toDF().writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      graft.streaming.Drain.awaitOrFail(q, "probe_tws")
      val wall = (System.nanoTime() - t0) / 1e9
      report(s"tws_sessions sent=$nSent noData=$noData merge=$merge", q,
        ss.table(name), wall)
      ss.catalog.dropTempView(name)
    }

    // ---- stream_outer_join shape (Ext37) ------------------------------------
    val ev4 = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
    val maxUs4 = ev4.agg(max(col("ts_us"))).as[Option[Long]].head().getOrElse(0L)
    def sentinel(ts: Long) =
      Seq((-1L, -1L, ts, "click"), (-2L, -1L, ts, "purchase"))
        .toDF("event_id", "user_id", "ts_us", "event_type")
    def sojVariant(nSent: Int, noData: Boolean, merge: Boolean = false): Unit = {
      val (sa, sb) = (maxUs4 + 7200000000L, maxUs4 + 10800000000L)
      val first = if (merge) ev4.unionByName(sentinel(sa)) else ev4
      val sents = (if (merge) Seq(sb).take(nSent - 1) else Seq(sa, sb).take(nSent))
        .map(sentinel)
      val staged = graft.streaming.LandingZone.stage(first, sents,
        filesPerStep = graft.streaming.LandingZone.DrainFilesPerStep)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions",
        graft.streaming.DrainWidth.forPath(spark, staged).toString)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
      val joined = graft.queries.Ext37Queries.outerJoinStream(ss, staged)
      val name = "probe_soj_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val t0 = System.nanoTime()
      val q = joined
        .select(col("click_id"), col("click_us"), col("purchase_id"), col("purchase_us"))
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      graft.streaming.Drain.awaitOrFail(q, "probe_soj")
      val wall = (System.nanoTime() - t0) / 1e9
      report(s"stream_outer_join sent=$nSent noData=$noData merge=$merge", q,
        ss.table(name).filter(col("click_id") >= 0), wall)
      ss.catalog.dropTempView(name)
    }

    // ---- single-batch drains: how many batches do they pay today? ----------
    def tumblingVariant(noData: Boolean): Unit = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions",
        graft.streaming.DrainWidth.forPath(spark, s"$sfDir/events.parquet").toString)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
      val agg = graft.queries.StreamQueries.eventsStream(ss, sfDir)
        .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val name = "probe_tum_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val t0 = System.nanoTime()
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      graft.streaming.Drain.awaitOrFail(q, "probe_tum")
      val wall = (System.nanoTime() - t0) / 1e9
      report(s"stream_tumbling noData=$noData", q, ss.table(name), wall)
      ss.catalog.dropTempView(name)
    }

    def joinVariant(noData: Boolean): Unit = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions",
        graft.streaming.DrainWidth.forPath(spark, s"$sfDir/events.parquet").toString)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
      def side(tpe: String) = graft.queries.StreamQueries.eventsStream(ss, sfDir)
        .filter(col("event_type") === tpe)
        .select(col("event_id"), col("user_id"), col("ts_t"), col("ts_us"))
        .withWatermark("ts_t", "1 hour")
      val clicks = side("click").select(col("event_id").as("click_id"),
        col("user_id"), col("ts_t").as("click_t"), col("ts_us").as("click_us"))
      val purchases = side("purchase").select(col("event_id").as("purchase_id"),
        col("user_id"), col("ts_t").as("purchase_t"), col("ts_us").as("purchase_us"))
      val joined = clicks.join(purchases,
        clicks("user_id") === purchases("user_id") &&
          purchases("purchase_t") >= clicks("click_t") &&
          purchases("purchase_t") <= clicks("click_t") + expr("INTERVAL 1 HOUR"))
      val name = "probe_join_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val t0 = System.nanoTime()
      val q = joined
        .select(col("click_id"), col("purchase_id"), col("click_us"), col("purchase_us"))
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      graft.streaming.Drain.awaitOrFail(q, "probe_join")
      val wall = (System.nanoTime() - t0) / 1e9
      report(s"stream_join noData=$noData", q, ss.table(name), wall)
      ss.catalog.dropTempView(name)
    }

    // order: current postures first (warm the machinery), then variants
    twsVariant(2, noData = true)            // current posture
    twsVariant(2, noData = false)           // suppress trailing no-data batch
    twsVariant(1, noData = true)            // 1 sentinel + no-data flush
    twsVariant(2, noData = false, merge = true)  // sentA rides data: 2 file batches
    twsVariant(1, noData = true, merge = true)   // 1 file batch + 1 no-data
    sojVariant(2, noData = true)
    sojVariant(2, noData = false)
    sojVariant(1, noData = true)
    sojVariant(2, noData = false, merge = true)
    sojVariant(1, noData = true, merge = true)
    tumblingVariant(true); tumblingVariant(false)
    joinVariant(true); joinVariant(false)
    spark.stop()
  }
}
