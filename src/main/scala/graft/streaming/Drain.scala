package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Bounded-drain guard for the `Trigger.AvailableNow` replay queries: a
  * drain that exceeds its timeout must FAIL, not silently hand back the
  * partially-filled memory table — a partial result is a wrong answer,
  * where a thrown timeout is a visibly slow run.
  */
object Drain {

  /** Await `q` up to `timeoutMs`; on timeout stop the query and throw. */
  def awaitOrFail(q: StreamingQuery, what: String,
      timeoutMs: Long = 300000L): Unit = {
    if (!q.awaitTermination(timeoutMs)) {
      val timeout = new IllegalStateException(
        s"$what drain did not terminate within ${timeoutMs / 1000}s; " +
          "partial result discarded")
      // a failing stop() must not REPLACE the timeout diagnosis — the
      // 'did not terminate' message is the actionable signal
      try q.stop()
      catch { case e: Throwable => timeout.addSuppressed(e) }
      throw timeout
    }
  }
}
