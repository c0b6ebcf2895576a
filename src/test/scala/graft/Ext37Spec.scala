package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs
import graft.streaming.SessionTimers

/** Round-9 tier: distributed BFS reachability (the recursive-CTE shape),
  * SQL-standard inverse-distribution quantiles, and timer-emitted
  * transformWithState sessions.
  */
class Ext37Spec extends SparkTestBase {
  import spark.implicits._

  // ---- Graphs.reachability -----------------------------------------------

  test("reachability: min-hop labels on a diamond (shorter path wins)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Graphs.reachability(edges, "src", "dst", maxDepth = 4)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 4L)) == 2L, "diamond closure must take the 2-hop path")
    assert(got((1L, 5L)) == 3L)
    assert(got((1L, 2L)) == 1L && got((1L, 3L)) == 1L)
    assert(got((2L, 5L)) == 2L && got((3L, 5L)) == 2L)
    assert(got.size == 9, s"unexpected pairs: $got")
  }

  test("reachability: cycles terminate at maxDepth; self-pairs only when a " +
      "cycle closes within the depth budget") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val d4 = Graphs.reachability(ring, "src", "dst", maxDepth = 4)
      .as[(Long, Long, Long)].collect()
    // 5-ring: within 4 hops each node reaches the 4 OTHER nodes, never itself
    assert(d4.length == 20)
    assert(!d4.exists(r => r._1 == r._2))
    val d5 = Graphs.reachability(ring, "src", "dst", maxDepth = 5)
      .as[(Long, Long, Long)].collect()
    assert(d5.length == 25)
    assert(d5.filter(r => r._1 == r._2).forall(_._3 == 5L),
      "ring self-closure must be exactly 5 hops")
  }

  test("reachability: duplicate edges collapse; depth 1 is the edge set") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graphs.reachability(edges, "src", "dst", maxDepth = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)))
  }

  // ---- percentile_disc / percentile_cont ---------------------------------

  test("percentile_disc is the smallest value with cume_dist >= p; " +
      "percentile_cont interpolates") {
    val df = Seq.tabulate(4)(i => ("a", (i + 1).toDouble))
      .toDF("event_type", "value")
    df.createOrReplaceTempView("_p_disc_t")
    val r = spark.sql(
      """SELECT
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS d25,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS d50,
        |  percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS c25,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS c50
        |FROM _p_disc_t""".stripMargin)
      .as[(Double, Double, Double, Double)].first()
    assert(r == ((1.0, 2.0, 1.75, 2.5)))
  }

  // ---- SessionTimers -----------------------------------------------------

  test("timer-emitted sessions equal the batch gaps-and-islands rewrite " +
      "(inline close for mid-batch gaps, timer flush for the final session)") {
    val gap = 1800000000L // 30 min in µs
    val m = 60000000L // 1 min
    val rows = Seq(
      // user 1: two sessions — the first closes INLINE (gap breach inside
      // the batch), the second only ever closes via its event-time timer
      (1L, 0L), (1L, m), (1L, 5 * m),
      (1L, 120 * m), (1L, 121 * m),
      // user 2: single event — pure timer emission
      (2L, 7 * m),
      // user 3: duplicate timestamps stay one session
      (3L, 10 * m), (3L, 10 * m), (3L, 25 * m)
    ).toDF("user_id", "ts_us")
    val got = SessionTimers.drain(spark, rows, gap)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (1L, 0L, 5 * m, 3L),
      (1L, 120 * m, 121 * m, 2L),
      (2L, 7 * m, 7 * m, 1L),
      (3L, 10 * m, 25 * m, 3L))
    assert(got == want, s"got $got")
  }

  test("stream outer join: drained result equals the batch LEFT join, " +
      "including the final click's null-padded row (the tail only flushes " +
      "because sentinels ride the join types past the pushed filters)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Ext37Queries.streamOuterJoin(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts_us").as("purchase_us"))
    val want = c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_us") >= col("click_us") &&
          col("purchase_us") <= col("click_us") + lit(3600000000L),
        "left")
      .select(col("click_id"), col("click_us"), col("purchase_id"),
        col("purchase_us"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == want)
    // the scenario that regressed: the globally-last click must be present
    val lastClick = c.orderBy(col("click_us").desc).limit(1)
      .as[(Long, Long, Long)].collect().head
    assert(got.exists(_._1 == lastClick._1), "tail click never flushed")
  }

  test("a gap of exactly the threshold starts a new session (>= semantics, " +
      "matching the oracle's lag >= gap)") {
    val gap = 1000000L
    val rows = Seq((9L, 0L), (9L, gap)).toDF("user_id", "ts_us")
    val got = SessionTimers.drain(spark, rows, gap)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((9L, 0L, 0L, 1L), (9L, gap, gap, 1L)))
  }

  test("round-14: landing-zone step-size guard — a step over the byte cap " +
      "throws naming the knob; -1 disables; default caps at 1 GiB") {
    val rows = Seq((1L, 10L), (2L, 20L)).toDF("user_id", "ts_us")
    val key = graft.streaming.LandingZone.MaxStepBytesKey
    spark.conf.set(key, "10") // tiny cap: any real parquet step exceeds it
    try {
      val e = intercept[IllegalStateException] {
        graft.streaming.LandingZone.stage(rows, Seq.empty)
      }
      assert(e.getMessage.contains(key))
      assert(e.getMessage.contains("writePartitioned"))
      // -1 disables the guard
      spark.conf.set(key, "-1")
      val dir = graft.streaming.LandingZone.stage(rows, Seq.empty)
      assert(spark.read.parquet(dir).count() == 2)
      // malformed value names the knob
      spark.conf.set(key, "lots")
      val m = intercept[IllegalArgumentException] {
        graft.streaming.LandingZone.stage(rows, Seq.empty)
      }
      assert(m.getMessage.contains(key))
    } finally spark.conf.unset(key)
  }

  test("round-15: filesPerStep>1 stages EXACTLY k files per step (empty " +
      "padding included), one mtime per step, strictly increasing") {
    val rows = Seq.tabulate(9)(i => ((i % 3).toLong, i * 60000000L))
      .toDF("user_id", "ts_us")
    val sent = Seq((Long.MinValue, 999999999999L)).toDF("user_id", "ts_us")
    val dir = graft.streaming.LandingZone.stage(rows, Seq(sent, sent),
      filesPerStep = 4)
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val byStep = files.groupBy(_.getName.take("step-000".length))
    assert(byStep.keySet == Set("step-000", "step-001", "step-002"))
    byStep.values.foreach { fs =>
      assert(fs.length == 4, s"step not padded to 4 files: ${fs.toSeq}")
      assert(fs.map(_.lastModified).distinct.length == 1,
        "files within a step must share one mtime")
    }
    val stepTimes = byStep.toSeq.sortBy(_._1).map(_._2.head.lastModified)
    assert(stepTimes == stepTimes.sorted && stepTimes.distinct == stepTimes,
      "step mtimes must strictly increase")
    // padding files carry zero rows: full read-back equals data + sentinels
    assert(spark.read.parquet(dir).count() == 11)
    // a genuinely EMPTY first frame pads to a zero-row step (nothing to
    // fold; the sentinels still advance the clock) — layout intact
    val dirE = graft.streaming.LandingZone.stage(
      rows.filter(col("user_id") < -999), Seq(sent), filesPerStep = 4)
    val filesE = new java.io.File(dirE).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(filesE.length == 8, s"empty-first staging broke the layout")
    assert(spark.read.parquet(dirE).count() == 1)
  }

  test("round-16: upgrade tripwire — a small repartition(k) write never " +
      "emits MORE than k part files (the half of the writer contract the " +
      "step alignment actually rides on)") {
    // Discovery note (the red run that shaped this test): the draft pin
    // asserted the "empty shuffle partitions write NO part file" folklore
    // — expecting exactly 1 file from a 1-row repartition(4) write — and
    // FAILED on Spark 4.1.2: the write produced 2 files, one with ZERO
    // rows (AQE coalesces the tiny explicit repartition and the coalesced
    // write emits an empty part). So that assumption is already false
    // today, and LandingZone.stage never needed it: the pad count
    // (filesPerStep - written.size) is correct for ANY written count in
    // [0, k], and zero-row written files are data-free exactly like
    // padding files. What step alignment DOES require is written.size
    // <= filesPerStep — more files than maxFilesPerTrigger would smear
    // one step across two batches. stage() guards that loudly at runtime;
    // this spec pins the writer side of the bargain against Spark
    // upgrades, at the two frame shapes the drains actually stage
    // (bulk data step, 1-row sentinel step), and proves the <k shortfall
    // (empties included) still pads to an aligned k-file step.
    val k = graft.streaming.LandingZone.DrainFilesPerStep
    for (rows <- Seq(1, 3)) {
      val tmp = graft.util.TempDirs.create("graft-emptypart-pin")
      Seq.tabulate(rows)(i => (i.toLong, i.toLong)).toDF("a", "b")
        .repartition(k).write.mode("overwrite").parquet(tmp.toString)
      val parts = new java.io.File(tmp.toString).listFiles
        .filter(_.getName.endsWith(".parquet"))
      assert(parts.length <= k && parts.nonEmpty,
        s"Spark wrote ${parts.length} part files for a $rows-row " +
          s"repartition($k) write — outside the (0, k] band " +
          "LandingZone.stage's pad arithmetic and step alignment assume; " +
          "revisit the staged-drain layout before trusting this Spark")
      // read-back sanity: zero-row parts (if any) add no data
      assert(spark.read.parquet(tmp.toString).count() == rows)
    }
    // end-to-end: a 1-row step (the sentinel shape) still lands as
    // exactly k files after padding, zero-row parts and all
    val one = Seq((Long.MinValue, 999999999999L)).toDF("user_id", "ts_us")
    val dir = graft.streaming.LandingZone.stage(one, Seq.empty,
      filesPerStep = k)
    val staged = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(staged.length == k,
      s"1-row step staged ${staged.length} files, expected $k")
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("round-15: with k files per step, one micro-batch consumes exactly " +
      "one step (batch alignment is what makes the sentinel flush provable)") {
    import org.apache.spark.sql.streaming.Trigger
    val m = 60000000L
    val rows = Seq.tabulate(9)(i => ((i % 3).toLong, i * m))
      .toDF("user_id", "ts_us")
    val sentKey = Long.MinValue
    val sentA = Seq((sentKey, 9999L * m)).toDF("user_id", "ts_us")
    val sentB = Seq((sentKey, 10999L * m)).toDF("user_id", "ts_us")
    val k = graft.streaming.LandingZone.DrainFilesPerStep
    val staged = graft.streaming.LandingZone.stage(rows, Seq(sentA, sentB),
      filesPerStep = k)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val out = SessionTimers.sessionStream(ss, staged, gapUs = 1800000000L,
      filesPerStep = k)
    val name = "r15_align_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    graft.streaming.Drain.awaitOrFail(q, "r15_align")
    try {
      val perBatch = q.recentProgress.toSeq.map(_.numInputRows)
        .filter(_ > 0) // trailing no-data progress entries carry 0 rows
      assert(perBatch == Seq(9L, 1L, 1L),
        s"batches misaligned with steps: $perBatch")
      // all 9 on-time rows folded: 3 users x 1 session of 3 events each
      // (events 8 min apart, 30 min gap => one session per user)
      val got = ss.table(name)
        .as[(Long, Long, Long, Long)](org.apache.spark.sql.Encoders
          .tuple(org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong))
        .collect().toSeq
      assert(got.map(_._4).sum == 9L, s"rows dropped as late: $got")
      assert(got.size == 3)
    } finally ss.catalog.dropTempView(name)
  }

  test("round-22: merged-sentinel layout drains in exactly TWO micro-batches " +
      "with no trailing no-data batch, and still flushes every parked timer") {
    import org.apache.spark.sql.streaming.Trigger
    val m = 60000000L
    val rows = Seq.tabulate(9)(i => ((i % 3).toLong, i * m))
      .toDF("user_id", "ts_us")
    val gapUs = 1800000000L
    val sentKey = Long.MinValue
    // the drain's r22 layout: sentinel A rides the data step, sentinel B is
    // its own step — the end-of-batch-1 watermark (sentA) exceeds every
    // last+gap horizon, so batch 2 fires all timers; noDataMicroBatches
    // disabled = no third cycle
    val sentA = 9L * m + gapUs + 3600000000L
    val sentB = sentA + 3600000000L
    val k = graft.streaming.LandingZone.DrainFilesPerStep
    val staged = graft.streaming.LandingZone.stage(
      rows.unionByName(Seq((sentKey, sentA)).toDF("user_id", "ts_us")),
      Seq(Seq((sentKey, sentB)).toDF("user_id", "ts_us")),
      filesPerStep = k)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val out = SessionTimers.sessionStream(ss, staged, gapUs, filesPerStep = k)
    val name = "r22_merged_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.toDF().writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    graft.streaming.Drain.awaitOrFail(q, "r22_merged")
    try {
      val perBatch = q.recentProgress.toSeq.map(_.numInputRows)
      assert(perBatch == Seq(10L, 1L),
        s"expected exactly 2 micro-batches (data+sentA, sentB): $perBatch")
      // all 9 rows folded and FLUSHED: 3 users x 1 session of 3 events
      val got = ss.table(name)
        .as[(Long, Long, Long, Long)](org.apache.spark.sql.Encoders
          .tuple(org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong))
        .collect().toSeq
      assert(got.map(_._4).sum == 9L, s"rows lost: $got")
      assert(got.size == 3, s"parked sessions not flushed: $got")
    } finally ss.catalog.dropTempView(name)
  }

  test("round-13: negative user ids are DATA, not sentinels (the old key<0 " +
      "check silently swallowed every signed-hash key's sessions)") {
    val gap = 1000000L
    val m = 100000L
    val rows = Seq((-5L, 0L), (-5L, m), (7L, 2 * m)).toDF("user_id", "ts_us")
    val got = SessionTimers.drain(spark, rows, gap)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((-5L, 0L, m, 2L), (7L, 2 * m, 2 * m, 1L)),
      s"negative-keyed session lost: $got")
  }
}
