package graft

/** Every declared query runs end-to-end at sf0.001 and (except genuinely
  * selective ones) returns rows; every query has an oracle or a documented
  * reason not to.
  */
class QueriesSmokeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  // Queries where an empty result at tiny SF is legitimate.
  private val mayBeEmpty = Set("q_anti_join")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("every query has an oracle — full coverage, no rows-only set") {
    // Round 2 closed the last two gaps: SimHash runs on the portable md5
    // 60-bit hash (oracle replays the fingerprints), and the VADER scorer
    // is replayed in SQL. Any new query must ship with its oracle.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("slow-oracle shapes stay fixed: chained valence CTEs + materialized helpers") {
    // DuckDB expands lateral column aliases and multiply-referenced CTEs by
    // textual substitution; these two shapes are what keeps the driver's
    // oracle pass at ~20 s instead of ~10 min (see LlmQueries.sentimentOracle
    // scaladoc). Trip if a rewrite reintroduces the exponential forms.
    assert(graft.queries.LlmQueries.sentimentOracle.contains("st13 AS ("),
      "sentiment oracle lost its chained per-level CTEs")
    for ((name, sql) <- Seq(
        "q_macd" -> graft.queries.Ext19Queries.macdOracle,
        "q_heikin_ashi" -> graft.queries.Ext19Queries.heikinAshiOracle,
        "q_trix" -> graft.queries.Ext31Queries.trixOracle,
        "q_keltner" -> graft.queries.Ext31Queries.keltnerOracle,
        "q_kalman_1d" -> graft.queries.Ext21Queries.kalman1dOracle,
        "q_two_core" -> graft.queries.Ext21Queries.twoCoreOracle,
        // the trade-graph family: pw (the 4-table lineitem join) sits under
        // a doubly-referencing e, and e under 2-6 consumers — un-materialized
        // these went >180 s at sf0.1 (0.1 s materialized)
        "q_triangle_count" -> graft.queries.Ext12Queries.triangleCountOracle,
        "q_clustering_coeff" -> graft.queries.Ext32Queries.clusteringCoeffOracle,
        "q_graph_jaccard" -> graft.queries.Ext33Queries.graphJaccardOracle,
        "q_adamic_adar" -> graft.queries.Ext20Queries.adamicAdarOracle,
        "q_khop_reach" -> graft.queries.Ext20Queries.khopReachOracle))
      assert(sql.contains("AS MATERIALIZED ("),
        s"$name oracle lost its MATERIALIZED helper CTEs")
  }

  test("golden pin: the e2e pipeline result is byte-stable across rounds") {
    // Fixture-driven, so this hash must never change unless semantics
    // intentionally change — catches silent drift in any pipeline stage.
    val rows = graft.queries.PipelineE2E.run(spark, sfDir)
      .collect().map(_.toString).sorted.mkString("\n")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.linesIterator.size == 622)
    assert(digest == "d83e9ab1b297f5484f2c20ea7c71c558",
      s"e2e golden drifted: $digest")
  }
}
