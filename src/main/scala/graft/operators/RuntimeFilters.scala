package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Hand-instantiated Bloom-filter runtime filtering — the same machinery
  * Spark's `InjectRuntimeFilter` rule builds for shuffle-join pruning
  * (`BloomFilterAggregate` on the build side, `BloomFilterMightContain`
  * behind a scalar subquery on the probe side), exposed as a library
  * operator so a pipeline can pre-filter a huge probe table against a
  * build-side key set WITHOUT first shuffling the probe.
  *
  * Why not `broadcast()` + left-semi: a broadcast hash relation costs
  * O(64 B/key) on every executor and is capped by the broadcast threshold;
  * the Bloom sidecar costs ~1 byte/key at 1% false positives, so a key set
  * 100× past broadcastability still ships as a few-MB binary blob. The
  * filter admits false positives, so callers MUST follow with an exact
  * join on the survivors — the point is that at 100 TB the exact join then
  * shuffles only the (tiny) candidate stream, not the whole probe side.
  * False negatives are impossible: a non-match verdict is definitive.
  */
object RuntimeFilters {

  /** Predicate: `probe`'s value might be in `build.col(buildKey)`.
    *
    * The build side aggregates xxhash64(key) into one binary Bloom blob
    * (partial aggregation tree-reduces it — no driver collect), delivered to
    * the probe side as a scalar subquery; the probe evaluates a codegen'd
    * `might_contain` per row. `expectedItems` sizes the filter (bits chosen
    * by Spark's optimal-m formula under the runtime-filter conf caps).
    */
  def bloomMightContain(build: DataFrame, buildKey: String, probe: Column,
      expectedItems: Long = 1L << 20): Column = {
    val bloomDf = build
      .select(xxhash64(col(buildKey)).as("h"))
      .agg(GraftColumnBridge.column(
        new BloomFilterAggregate(
          GraftColumnBridge.expression(col("h")), expectedItems)
          .toAggregateExpression()).as("bloom"))
    GraftColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      XxHash64(Seq(GraftColumnBridge.expression(probe)), 42L)))
  }

  /** Exact semi-join accelerated by a Bloom pre-filter: rows of `left` whose
    * `key` appears in `right.col(key)`. The Bloom pass prunes the probe
    * stream before the shuffle; the exact semi-join on survivors removes the
    * false positives, so the result is EXACTLY the plain semi-join's.
    */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, key: String,
      expectedItems: Long = 1L << 20): DataFrame =
    left.filter(bloomMightContain(right, key, col(key), expectedItems))
      .join(right.select(col(key)).distinct(), Seq(key), "left_semi")
}
