package graft

import org.apache.spark.sql.functions._

/** Batch/state parity for the statestore-reader query: the operator state
  * a drained tumbling-count aggregation leaves in its checkpoint must be
  * exactly the batch group-by over the same events.
  */
class StateInspectSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q_state_inspect state equals the batch tumbling counts") {
    val got = graft.queries.StreamQueries.stateInspect(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ts = if (raw.schema("ts").dataType.typeName == "long")
      timestamp_micros((col("ts") / 1000L).cast("long"))
    else col("ts").cast("timestamp")
    val want = raw.withColumn("ts_t", ts)
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got.nonEmpty, "state read must not be empty")
    assert(got == want,
      s"state/batch divergence: only-state=${(got -- want).take(3)} " +
        s"only-batch=${(want -- got).take(3)}")
  }

  test("repeat run is deterministic (fresh checkpoint, same state)") {
    val a = graft.queries.StreamQueries.stateInspect(spark, dir)
      .collect().map(_.toString).sorted
    val b = graft.queries.StreamQueries.stateInspect(spark, dir)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
