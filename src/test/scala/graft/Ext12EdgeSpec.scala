package graft

import org.apache.spark.sql.functions._

import graft.operators.{Anonymize, Graphs, RobustStats, Similarity}

/** Degenerate-input contracts for the round-7 operators: empty inputs,
  * constant columns, fully-suppressed releases — the cases a 100 TB run
  * WILL hit somewhere in some partition.
  */
class Ext12EdgeSpec extends SparkTestBase {

  import spark.implicits._

  test("triangleCount: empty edge set yields a single all-zero row") {
    val empty = Seq.empty[(Int, Int)].toDF("u", "v")
    val out = Graphs.triangleCount(empty, "u", "v").collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_nodes") == 0)
    assert(out(0).getAs[Long]("n_edges") == 0)
    assert(out(0).getAs[Long]("n_triangles") == 0)
  }

  test("triangleCount: a graph of only self-loops has no edges") {
    val loops = Seq((1, 1), (2, 2)).toDF("u", "v")
    val out = Graphs.triangleCount(loops, "u", "v").collect()(0)
    assert(out.getAs[Long]("n_edges") == 0)
    assert(out.getAs[Long]("n_triangles") == 0)
  }

  test("kAnonymize: k=1 suppresses nothing; an under-k suppressed pool is " +
      "dropped; a >=k pool is released as '*'") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("q", "id")
    val none = Anonymize.kAnonymize(df, Seq("q"), 1)
      .filter(col("q") === "*").count()
    assert(none == 0)
    // k > table size: every row would be suppressed, but 3 '*' rows can't
    // satisfy k=100 either — suppression alone cannot anonymize this table,
    // so the rows are dropped, not released as a k-violating '*' class
    assert(Anonymize.kAnonymize(df, Seq("q"), 100).count() == 0)
    // k=2: singleton 'b' suppressed; the pool has 1 < 2 rows -> dropped
    val k2 = Anonymize.kAnonymize(df, Seq("q"), 2).collect()
    assert(k2.length == 2 && k2.forall(_.getString(0) == "a"))
    // two singletons at k=2: the '*' pool itself reaches k -> released
    val df2 = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("q", "id")
    val stars = Anonymize.kAnonymize(df2, Seq("q"), 2)
      .filter(col("q") === "*").count()
    assert(stars == 2)
  }

  test("round-15: kAnonymize pin modes (localCheckpoint|cache|none) agree; " +
      "an unknown mode throws") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4), ("c", 5))
      .toDF("q", "id")
    def run() = Anonymize.kAnonymize(df, Seq("q"), 2)
      .orderBy("id").collect().toSeq
    val expected = run() // default localCheckpoint
    // 'none' BEFORE 'cache', with a cache sweep after each leg: the cache
    // leg registers the window plan in the shared CacheManager, and a
    // later identical plan would silently get the cached InMemoryRelation
    // substituted — the un-pinned double-evaluation path 'none' exists to
    // exercise would never actually run
    for (mode <- Seq("none", "cache")) {
      spark.conf.set(Anonymize.PinModeKey, mode)
      try assert(run() == expected, s"pin mode '$mode' diverged")
      finally {
        spark.conf.unset(Anonymize.PinModeKey)
        spark.catalog.clearCache()
      }
    }
    spark.conf.set(Anonymize.PinModeKey, "bogus")
    try intercept[IllegalArgumentException](run())
    finally spark.conf.unset(Anonymize.PinModeKey)
  }

  test("madOutliers: constant column gives mad=0 and zero outliers " +
      "(dev > 3*0 never fires on dev == 0)") {
    val df = Seq.fill(10)(5.0).zipWithIndex.map { case (v, i) => ("g", v, i) }
      .toDF("grp", "v", "i")
    val out = RobustStats.madOutliers(df, "grp", "v", 3.0).collect()(0)
    assert(out.getAs[Double]("mad") == 0.0)
    assert(out.getAs[Long]("n_outliers") == 0L)
  }

  test("madOutliers: constant-with-one-spike — degenerate mad=0 flags " +
      "exactly the spike") {
    val df = (Seq.fill(9)(5.0) :+ 99.0).zipWithIndex
      .map { case (v, i) => ("g", v, i) }.toDF("grp", "v", "i")
    val out = RobustStats.madOutliers(df, "grp", "v", 3.0).collect()(0)
    assert(out.getAs[Double]("mad") == 0.0)
    assert(out.getAs[Long]("n_outliers") == 1L) // dev 94 > 3*0
  }

  test("round-13: winsorizedMean keeps NULL values out of the clipped " +
      "average (greatest/least silently turned them into the lower bound)") {
    val df = Seq(("g", Some(1.0)), ("g", Some(3.0)), ("g", None))
      .toDF("grp", "v")
    val r = RobustStats.winsorizedMean(df, "grp", "v", 0.1, 0.9).collect()(0)
    // avg_raw skips the null: (1+3)/2 = 2. Pre-fix, _clipped fabricated a
    // third value at the lower percentile bound and avg_winsorized
    // diverged from the same two real rows.
    assert(r.getAs[Double]("avg_raw") == 2.0)
    // the invariant: the null row must not move the winsorized mean away
    // from the null-free computation over the same two real values
    val clean = RobustStats.winsorizedMean(
      df.filter(col("v").isNotNull), "grp", "v", 0.1, 0.9).collect()(0)
    assert(r.getAs[Double]("avg_winsorized") ==
      clean.getAs[Double]("avg_winsorized"),
      "null row changed the winsorized mean")
  }

  test("winsorizedMean: single-row group clips to itself (avg unchanged)") {
    val df = Seq(("g", 42.0)).toDF("grp", "v")
    val out = RobustStats.winsorizedMean(df, "grp", "v", 0.05, 0.95).collect()(0)
    assert(out.getAs[Double]("avg_raw") == 42.0)
    assert(out.getAs[Double]("avg_winsorized") == 42.0)
  }

  test("semDedup: threshold above 1 drops nothing (cosine <= 1)") {
    val emb = Tables12Fixtures.embeddings(spark)
    val kept = Similarity.semDedup(emb, emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", 1.5)
    assert(kept.count() == 4)
  }

  test("temperature mix: integer targets conserve the 10000 budget exactly") {
    val out = graft.queries.Ext13Queries.temperatureMix(
      spark, "/root/testdata/sf0.001")
    val total = out.agg(sum("target")).collect()(0).getLong(0)
    assert(total == 10000L)
  }

  test("skyline of a single point is that point") {
    val out = graft.queries.Ext13Queries.skyline(spark, "/root/testdata/sf0.001")
    assert(out.count() >= 1) // real data; the hand fixture lives in Ext13Spec
  }
}
