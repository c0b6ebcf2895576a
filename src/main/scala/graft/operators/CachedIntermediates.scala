package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-wide registry for intermediates an operator persists on the
  * caller's behalf.
  *
  * Several operators cache a mid-pipeline table because the returned plan
  * references it from more than one branch (dedup shingle postings, minhash
  * signatures) or because Spark requires the decoupling (the
  * `_corrupt_record` quarantine scan). Those blocks cannot be dropped before
  * the caller's terminal action, so the contract is: consume the result,
  * then call [[unpersistAll]] (or `spark.catalog.clearCache()`). Verify and
  * Bench both do; a library caller that skips it leaks storage blocks for
  * the session's lifetime.
  *
  * [[Dedup.unpersistIntermediates]] delegates here, so either entry point
  * drains the same queue.
  */
object CachedIntermediates {

  private val queue = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Register a persisted/cached DataFrame for a later [[unpersistAll]]. */
  def track(df: DataFrame): DataFrame = {
    queue.add(df)
    df
  }

  /** Drop every tracked intermediate persisted since the last drain. Safe to
    * call any time after the terminal action on the consumed results;
    * `blocking = true` waits for the block eviction (tests).
    */
  def unpersistAll(blocking: Boolean = false): Unit = {
    var d = queue.poll()
    while (d != null) { d.unpersist(blocking); d = queue.poll() }
  }
}
