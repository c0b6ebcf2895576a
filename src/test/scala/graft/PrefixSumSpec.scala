package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** The two-phase bucketed prefix sum must equal the naive single-partition
  * window bit-for-bit: the rank-stat queries' oracles keep the naive form,
  * so any divergence (a row in the wrong bucket, a missed offset) is a
  * correctness-gate failure, not just a perf bug.
  */
class PrefixSumSpec extends SparkTestBase {
  import spark.implicits._

  /** Run `body` with the adaptive threshold pinned: "-1" forces the
    * two-phase bucketed plan even on tiny test inputs; a huge value forces
    * the single-window small path. Equivalence tests run under BOTH. */
  private def withThreshold[A](t: String)(body: => A): A = {
    spark.conf.set("graft.prefixsum.threshold", t)
    try body finally spark.conf.unset("graft.prefixsum.threshold")
  }
  private val bothPaths = Seq("-1", "1000000000")

  private def naive(df: org.apache.spark.sql.DataFrame, orderCol: String,
      sumCol: String) = {
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(s"${sumCol}_excl",
      coalesce(sum(col(sumCol)).over(w), lit(0L)))
  }

  test("matches the naive global window on a continuous-ish domain") {
    val rnd = new scala.util.Random(11)
    // 5k distinct doubles — forces real multi-bucket splits at any
    // numParts, including bucket-boundary values
    val hist = (1 to 5000)
      .map(_ => rnd.nextDouble() * 1000)
      .distinct
      .map(v => (v, rnd.nextInt(50).toLong + 1))
      .toDF("value", "cnt")
    val expected = naive(hist, "value", "cnt")
      .select("value", "cnt_excl").as[(Double, Long)].collect().toMap
    for (t <- bothPaths; parts <- Seq(1, 4, 32)) withThreshold(t) {
      val got = PrefixSum.exclusive(hist, "value", Seq("cnt"), parts)
        .select("value", "cnt_excl").as[(Double, Long)].collect().toMap
      assert(got == expected, s"threshold=$t numParts=$parts diverged")
    }
  }

  test("multiple sum columns share one bucketing pass") {
    val hist = Seq((1.0, 2L, 10L), (2.0, 3L, 20L), (5.0, 5L, 30L),
      (9.0, 7L, 40L)).toDF("v", "a", "b")
    for (t <- bothPaths) withThreshold(t) {
      val out = PrefixSum.exclusive(hist, "v", Seq("a", "b"), 2)
        .select("v", "a_excl", "b_excl").as[(Double, Long, Long)]
        .collect().sortBy(_._1)
      assert(out.toSeq == Seq((1.0, 0L, 0L), (2.0, 2L, 10L), (5.0, 5L, 30L),
        (9.0, 10L, 60L)), s"threshold=$t")
    }
  }

  test("empty input and single-row input degenerate cleanly on both paths") {
    for (t <- bothPaths) withThreshold(t) {
      val empty = Seq.empty[(Double, Long)].toDF("v", "a")
      assert(PrefixSum.exclusive(empty, "v", Seq("a"), 8).count() == 0)
      val one = Seq((3.0, 7L)).toDF("v", "a")
      val r = PrefixSum.exclusive(one, "v", Seq("a"), 8)
        .select("a_excl").as[Long].collect()
      assert(r.toSeq == Seq(0L), s"threshold=$t")
    }
  }

  test("no single-partition window touches the data-sized side " +
      "(two-phase forced)") {
    // The data-cardinality window must be partitioned on the bucket id;
    // only the ≤numParts-row totals window may be global.
    val hist = (1 to 200).map(i => (i.toDouble, 1L)).toDF("value", "cnt")
    val plan = withThreshold("-1") {
      PrefixSum.exclusive(hist, "value", Seq("cnt"), 8)
    }.queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // the running-sum window over the data carries the _pid partition key;
    // any UNpartitioned window must be the ≤numParts-row offsets pass,
    // whose child aggregates on _pid (bounded by config, not data)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val aggBelow = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggBelow.exists(_.groupingExpressions.exists(
        _.references.map(_.name).exists(_ == "_pid"))),
        "global window not over the per-bucket totals")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "expected the per-bucket running sum to be a partitioned window")
  }

  test("rankedPrefix matches naive row_number + exclusive ROWS sum, asc and " +
      "desc, under value ties broken by the tie column") {
    val rnd = new scala.util.Random(7)
    // values drawn from a SMALL domain so ties are common; ids unique
    val rows = (1 to 3000).map(i => (i.toLong, rnd.nextInt(80).toDouble))
    val df = rows.toDF("id", "v")
    for (desc <- Seq(false, true)) {
      val ord = if (desc)
        Window.orderBy(col("v").desc, col("id"))
      else Window.orderBy(col("v"), col("id"))
      val expected = df
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("v_excl",
          sum(col("v")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
        .select("id", "rn", "v_excl").as[(Long, Long, Option[Double])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      for (t <- bothPaths; parts <- Seq(1, 4, 32)) withThreshold(t) {
        val got = PrefixSum.rankedPrefix(df, "v", desc, Seq("id"),
            Seq("v"), "rn", parts)
          .select("id", "rn", "v_excl").as[(Long, Long, Option[Double])]
          .collect().map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got == expected, s"t=$t desc=$desc parts=$parts diverged")
      }
    }
  }

  test("ntileFromRank reproduces the built-in ntile distribution, " +
      "including n < k and uneven remainders") {
    for ((n, k) <- Seq((1, 5), (3, 5), (5, 5), (7, 5), (10, 3), (100, 7))) {
      val df = (1 to n).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      val expected = df
        .withColumn("t", ntile(k).over(Window.orderBy(col("v"))))
        .select("id", "t").as[(Long, Int)].collect().toMap
      val got = PrefixSum.ntileFromRank(
          df.withColumn("rn", col("v")).withColumn("_n", lit(n.toLong)),
          "rn", "_n", k, "t")
        .select("id", "t").as[(Long, Int)].collect().toMap
      assert(got == expected, s"n=$n k=$k diverged: $got vs $expected")
    }
  }

  test("minBeforeDesc matches the naive descending prefix-min window " +
      "(NULL on the maximal row)") {
    val rnd = new scala.util.Random(23)
    val hist = (1 to 2000).map(_ => rnd.nextDouble() * 100).distinct
      .map(v => (v, rnd.nextInt(50))).toDF("price", "size")
    val w = Window.orderBy(col("price").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = hist.withColumn("mb", min(col("size")).over(w))
      .select("price", "mb").as[(Double, Option[Int])].collect().toMap
    for (t <- bothPaths; parts <- Seq(1, 4, 32)) withThreshold(t) {
      val got = PrefixSum.minBeforeDesc(hist, "price", "size", parts)
        .select(col("price"), col("size_minBefore"))
        .as[(Double, Option[Int])].collect().toMap
      assert(got == expected, s"t=$t parts=$parts diverged")
    }
  }

  test("two-phase path survives AQE at engaging size (regression: the " +
      "higher-order-function bucket id hit INTERNAL_ERROR_ATTRIBUTE_NOT_" +
      "FOUND at 200k rows with AQE on)") {
    // AQE is ON by default in the test session; 200k rows is where the
    // original lambda-filter _pid form started failing task binding.
    val big = spark.range(200000).select(
      (hash(col("id")).cast("double") + col("id") / lit(1e9)).as("value"),
      lit(1L).as("cnt"))
    val out = withThreshold("-1") {
      PrefixSum.exclusive(big, "value", Seq("cnt"))
    }
    // terminal action must EXECUTE the two-phase plan, not just analyze it
    val mx = out.agg(max(col("cnt_excl"))).as[Long].head()
    assert(mx == 199999L, s"exclusive prefix over 200k unit counts: $mx")
    // same at-size execution for the other two entry points (their plan
    // shapes differ: row_number windows / descending prefix-min)
    val big2 = spark.range(200000).select(col("id"),
      (hash(col("id")).cast("double") + col("id") / lit(1e9)).as("value"),
      lit(1L).as("cnt"))
    val rp = withThreshold("-1") {
      PrefixSum.rankedPrefix(big2, "value", descOrder = false,
        Seq("id"), Seq("cnt"), "rn")
    }
    assert(rp.agg(max(col("rn"))).as[Long].head() == 200000L)
    val mb = withThreshold("-1") {
      PrefixSum.minBeforeDesc(
        big2.select(col("value").as("price"), col("id").as("size")),
        "price", "size")
    }
    // exactly one row (the global max price) has a NULL prefix-min
    assert(mb.filter(col("size_minBefore").isNull).count() == 1L)
  }

  test("adaptive switch: default threshold routes small inputs to ONE " +
      "global window (no bucket column), low threshold routes to two-phase") {
    val hist = (1 to 500).map(i => (i.toDouble, 1L)).toDF("value", "cnt")
    // default (100k): small path — no _pid anywhere in the plan
    val small = PrefixSum.exclusive(hist, "value", Seq("cnt"), 8)
    val smallPlan = small.queryExecution.optimizedPlan
    val smallWindows = smallPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(smallWindows.size == 1, "small path should be a single window")
    assert(!smallPlan.toString.contains("_pid"),
      "small path must not pay the bucketing machinery")
    // threshold 10 < 500 rows: two-phase — bucket-partitioned data window
    val big = withThreshold("10") {
      PrefixSum.exclusive(hist, "value", Seq("cnt"), 8)
    }
    val bigWindows = big.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(bigWindows.exists(_.partitionSpec.nonEmpty),
      "two-phase path lost its bucket-partitioned window")
    // and both agree with each other
    assert(small.select("value", "cnt_excl").as[(Double, Long)].collect().toMap
      == big.select("value", "cnt_excl").as[(Double, Long)].collect().toMap)
  }

  test("round-13 guards: degenerate order column fails loudly above the " +
      "threshold; internal-name clashes and empty sumCols fail on BOTH " +
      "size paths") {
    import spark.implicits._
    // non-numeric order column: rejected at entry on BOTH paths. The old
    // contract let strings through the small path and bucketed the
    // two-phase path on their DOUBLE image — a STRING column of numeric
    // text ("9" < "10" lexically, 9.0 < 10.0 cast) would FLIP results when
    // the row count crossed the threshold. Uniform loud rejection instead.
    val strOrd = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    for (t <- bothPaths) withThreshold(t) {
      val e = intercept[IllegalArgumentException] {
        PrefixSum.exclusive(strOrd, "k", Seq("v"))
      }
      assert(e.getMessage.contains("DOUBLE image"))
    }
    // all-NULL numeric order column + forced two-phase: passes the type
    // guard but the probe finds no values to bucket on — must throw, not
    // silently run one single-task window over the whole input
    val nullOrd = Seq(1L, 2L, 3L).toDF("v")
      .withColumn("k", lit(null).cast("double"))
    withThreshold("-1") {
      val e = intercept[IllegalArgumentException] {
        PrefixSum.exclusive(nullOrd, "k", Seq("v")).collect()
      }
      assert(e.getMessage.contains("no numeric values"))
    }
    // internal working-column clash: uniform loud failure on BOTH paths
    // (silently overwriting + dropping the caller's _pid only above the
    // size threshold would be a data-dependent schema change)
    val clash = Seq((1.0, 1L, 7)).toDF("o", "v", "_pid")
    for (t <- bothPaths) withThreshold(t) {
      val e = intercept[IllegalArgumentException] {
        PrefixSum.exclusive(clash, "o", Seq("v"))
      }
      assert(e.getMessage.contains("_pid"))
    }
    // empty sumCols: uniform contract (the small path used to silently
    // no-op while the two-phase path threw NoSuchElementException)
    val ok = Seq((1.0, 1L)).toDF("o", "v")
    for (t <- bothPaths) withThreshold(t) {
      val e = intercept[IllegalArgumentException] {
        PrefixSum.exclusive(ok, "o", Nil)
      }
      assert(e.getMessage.contains("sumCols"))
    }
  }
}
