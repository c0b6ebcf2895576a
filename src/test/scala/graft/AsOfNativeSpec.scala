package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.col

import graft.operators.Joins
import graft.plans.{AsOfJoinExec, AsOfJoinNative}

/** The native sort-merge AS-OF operator: result-equal to the union-rewrite
  * on randomized data, correct on the pinned edges, and planned with two
  * per-side exchanges + the custom exec node (no window, no union).
  */
class AsOfNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def randomSides(seed: Int, nLeft: Int, nRight: Int) = {
    val rnd = new scala.util.Random(seed)
    val left = (1 to nLeft).map { i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(1000).toLong)
    }.toDF("k", "lid", "t")
    val right = (1 to nRight).map { i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(1000).toLong, rnd.nextDouble())
    }.toDF("k", "rid", "t", "v")
    (left, right)
  }

  test("native result == union-rewrite result on randomized data") {
    for (seed <- Seq(1, 2, 3)) {
      val (left, right) = randomSides(seed, 300, 200)
      val native = AsOfJoinNative.join(left, right, Seq("k"), "t", "t",
          Seq("v", "rid"), "rid")
        .select("k", "lid", "t", "asof_v", "asof_rid")
        .collect().map(_.toSeq).toSet
      val rewrite = Joins.asOfJoin(left, right, Seq("k"), "t", "t",
          Seq("v", "rid"), "rid")
        .select("k", "lid", "t", "asof_v", "asof_rid")
        .collect().map(_.toSeq).toSet
      assert(native == rewrite, s"seed $seed diverged")
    }
  }

  test("edges: inclusive <=, latest-tiebreak, null before first right row") {
    val left = Seq((1L, 10L, 100L), (1L, 11L, 50L), (2L, 12L, 100L))
      .toDF("k", "lid", "t")
    val right = Seq(
      (1L, 100L, 1L, 1.0), (1L, 100L, 2L, 2.0), // tie at t=100: rid 2 wins
      (2L, 999L, 3L, 9.0)) // after k=2's left row
      .toDF("k", "t", "rid", "v")
    val out = AsOfJoinNative.join(left, right, Seq("k"), "t", "t",
        Seq("v"), "rid")
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L) == Some(2.0)) // inclusive + highest tiebreak at equal t
    assert(out(11L) == None) // left before any right
    assert(out(12L) == None) // right only after
  }

  test("empty right side null-extends every left row") {
    val left = Seq((1L, 1L, 10L)).toDF("k", "lid", "t")
    val right = Seq.empty[(Long, Long, Long, Double)].toDF("k", "t", "rid", "v")
    val out = AsOfJoinNative.join(left, right, Seq("k"), "t", "t",
      Seq("v"), "rid").collect()
    assert(out.length == 1 && out(0).isNullAt(3))
  }

  test("self-join inputs (shared expression ids) plan and run") {
    val ev = Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"))
      .toDF("k", "id", "t", "tag")
    val l = ev.filter($"tag" === "a").select("k", "id", "t")
    val r = ev.filter($"tag" === "b").select("k", "id", "t")
    val out = AsOfJoinNative.join(l, r, Seq("k"), "t", "t", Seq("id"), "id")
      .select("id", "asof_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty && out(3L).contains(2L))
  }

  test("NULL join keys never match (SQL equi-join semantics)") {
    val left = Seq((Some(1L), 10L, 100L), (None, 11L, 100L))
      .toDF("k", "lid", "t")
    val right = Seq((Some(1L), 50L, 5L, 1.0), (None, 50L, 2L, 9.0))
      .toDF("k", "t", "rid", "v")
    val out = AsOfJoinNative.join(left, right, Seq("k"), "t", "t",
        Seq("v"), "rid")
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(10L) == Some(1.0)) // non-null key matches normally
    assert(out(11L) == None, "NULL key matched a NULL-keyed right row")
  }

  test("round-13: NULL timestamps never match — getLong read them as " +
      "epoch 0 (a NULL-timed right row could steal the as-of carry)") {
    val left = Seq((1L, 10L, Some(100L)), (1L, 11L, Option.empty[Long]))
      .toDF("k", "lid", "t")
    val right = Seq(
      (1L, Option.empty[Long], 9L, 66.0), // unmatchable: no time position
      (1L, Some(50L), 2L, 7.0)
    ).toDF("k", "t", "rid", "v")
    val out = AsOfJoinNative.join(left, right, Seq("k"), "t", "t",
        Seq("v", "rid"), "rid")
      .select("lid", "asof_v", "asof_rid").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    // left@100 matches right@50, NOT the NULL-timed row
    assert(out(10L) == ((Some(7.0), Some(2L))), s"${out(10L)}")
    // a NULL-timed left row has no as-of position at all
    assert(out(11L) == ((None, None)),
      s"NULL-timed left row got a phantom match: ${out(11L)}")
  }

  test("round-13: a non-key LEFT filter lands below the as-of join in the " +
      "optimized plan (the push no longer requires the key-shape guard)") {
    val left = (1 to 100).map(i => (i.toLong % 3, i.toLong, (i % 7).toLong))
      .toDF("k", "lid", "t")
    val right = (1 to 50).map(i => (i.toLong % 3, i.toLong, i.toLong * 2, 1.0))
      .toDF("k", "rid", "t", "v")
    val joined = AsOfJoinNative.join(left, right, Seq("k"), "t", "t",
        Seq("v"), "rid")
      .filter(col("lid") < 10) // deterministic, references only the left side
    val optimized = joined.queryExecution.optimizedPlan.toString
    val asofIdx = optimized.indexOf("AsOfJoin")
    val filterIdx = optimized.indexOf("lid")
    assert(asofIdx >= 0 && filterIdx >= 0, optimized)
    // plan trees print children BELOW parents: a pushed filter's first
    // mention of lid comes from the Filter under the join's left child
    assert(optimized.indexOf("Filter") > asofIdx,
      s"left filter stayed above the as-of join:\n$optimized")
    assert(joined.count() == 9)
  }

  test("key filters above the join push through to BOTH sides' scans") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select("user_id", "event_id", "ts_us", "value", "event_type")
      val clicks = ev.filter($"event_type" === "click").drop("event_type")
      val purchases = ev.filter($"event_type" === "purchase").drop("event_type")
      val joined = AsOfJoinNative.join(clicks, purchases, Seq("user_id"),
          "ts_us", "ts_us", Seq("value"), "event_id")
        .filter($"user_id" < 5)
      val scans = joined.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 2)
      scans.foreach { s =>
        assert(s.metadata("PushedFilters").contains("LessThan(user_id,5)"),
          s"filter not pushed into scan: ${s.metadata("PushedFilters")}")
      }
      // and the pushed plan still returns exactly the rewrite's answer
      val viaRewrite = Joins.asOfJoin(clicks, purchases, Seq("user_id"),
          "ts_us", "ts_us", Seq("value"), "event_id")
        .filter($"user_id" < 5)
        .select("user_id", "event_id", "ts_us", "asof_value")
        .collect().map(_.toSeq).toSet
      val viaNative = joined
        .select("user_id", "event_id", "ts_us", "asof_value")
        .collect().map(_.toSeq).toSet
      assert(viaNative == viaRewrite)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("plan shape: custom exec, two per-side exchanges, no window/union") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (left, right) = randomSides(7, 50, 50)
      val df = AsOfJoinNative.join(left, right, Seq("k"), "t", "t", Seq("v"), "rid")
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case e: AsOfJoinExec => e }.size == 1)
      assert(plan.collect { case s: ShuffleExchangeExec => s }.size == 2)
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty)
      assert(plan.collect {
        case u: org.apache.spark.sql.execution.UnionExec => u }.isEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
