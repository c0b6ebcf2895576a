package graft

/** Round-13 state-store interchangeability (VERDICT r12 #6): the 100-TB
  * lever for stateful streaming is the state-store provider — HDFS-backed
  * (small hot state held on-heap, zero native deps) vs RocksDB (state
  * larger than executor heap, incremental checkpointing). These tests
  * prove that flipping `spark.sql.streaming.stateStore.providerClass` is
  * a pure PERFORMANCE decision, never a correctness risk: the same drains
  * produce identical state/output rows under both providers. The
  * transformWithState family is the documented exception — Spark only
  * supports it on RocksDB, which is why SessionTimers/RunningTotals PIN
  * the provider inside their drains (and restore the caller's conf), so a
  * host session configured for HDFS state still runs them correctly.
  */
class StateStoreToggleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider(p: String): org.apache.spark.sql.SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass", p)
    s2
  }

  test("windowed-agg operator state is provider-interchangeable: HDFS " +
      "and RocksDB drains leave identical state rows") {
    val h = graft.queries.StreamQueries
      .stateInspectFreshWithProvider(spark, dir, Hdfs)
      .map(_.toString).sorted
    val r = graft.queries.StreamQueries
      .stateInspectFreshWithProvider(spark, dir, Rocks)
      .map(_.toString).sorted
    assert(h.nonEmpty, "drain must leave state rows")
    assert(h == r,
      s"provider divergence: only-hdfs=${(h.toSet -- r.toSet).take(3)} " +
        s"only-rocksdb=${(r.toSet -- h.toSet).take(3)}")
  }

  test("stream-stream left-outer drain (watermark eviction + null " +
      "padding) emits identical rows under both providers") {
    val h = graft.queries.Ext37Queries.streamOuterJoin(withProvider(Hdfs), dir)
      .collect().map(_.toString).sorted
    val r = graft.queries.Ext37Queries.streamOuterJoin(withProvider(Rocks), dir)
      .collect().map(_.toString).sorted
    assert(h.nonEmpty, "drain must emit rows")
    assert(h.sameElements(r))
  }

  test("transformWithState sessions pin RocksDB internally: a host " +
      "session configured for HDFS state still drains correctly and " +
      "matches the RocksDB-configured run") {
    val h = graft.queries.Ext37Queries.twsSessions(withProvider(Hdfs), dir)
      .collect().map(_.toString).sorted
    val r = graft.queries.Ext37Queries.twsSessions(withProvider(Rocks), dir)
      .collect().map(_.toString).sorted
    assert(h.nonEmpty, "drain must emit sessions")
    assert(h.sameElements(r))
  }
}
