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
