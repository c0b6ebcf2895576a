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
}
