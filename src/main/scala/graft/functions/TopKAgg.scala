package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded top-k as ONE typed [[Aggregator]] pass: each group keeps a
  * ≤k-element array ordered by (ord DESC, id ASC), so the shuffle carries at
  * most k rows per group instead of the group's full contents — the map-side
  * partial-aggregation alternative to the `row_number() OVER (...) <= k`
  * window, which must shuffle and SORT every row of every group. At 100 TB
  * the window formulation's per-group sort is the bottleneck; this buffer is
  * O(k) state per group and merge is an O(k) sorted merge — associative,
  * commutative, and DETERMINISTIC under any partition layout because the
  * (ord, id) total order breaks ties before the buffer ever truncates.
  *
  * The reference's dashboards page "latest/top" slices of every indicator
  * table (SURVEY.md §2: ORDER BY + LIMIT per symbol); this is that operator
  * at engine level.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]]
    with Serializable {
  require(k >= 1, s"TopKAgg: k must be >= 1, got $k")

  // total order: ord DESC, id ASC — a beats b when it sorts strictly earlier
  @inline private def beats(aOrd: Double, aId: Long, bOrd: Double, bId: Long): Boolean =
    aOrd > bOrd || (aOrd == bOrd && aId < bId)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    val (ord, id) = x
    // NaN is unordered under `beats` (nothing beats it, it beats nothing):
    // once inside a non-full buffer it would wedge ahead of every later
    // element and break the sorted invariant both reduce and merge rely
    // on. Contract: NaN-ordered rows are never in the top k.
    if (java.lang.Double.isNaN(ord)) buf
    else if (buf.length == k && !beats(ord, id, buf(k - 1)._1, buf(k - 1)._2)) buf
    else {
      // insertion into a ≤k sorted array: find position, shift tail
      var pos = buf.length
      var i = 0
      var found = false
      while (i < buf.length && !found) {
        if (beats(ord, id, buf(i)._1, buf(i)._2)) { pos = i; found = true }
        i += 1
      }
      val outLen = math.min(buf.length + 1, k)
      val out = new Array[(Double, Long)](outLen)
      System.arraycopy(buf, 0, out, 0, pos)
      if (pos < outLen) {
        out(pos) = x
        val tail = math.min(buf.length - pos, outLen - pos - 1)
        if (tail > 0) System.arraycopy(buf, pos, out, pos + 1, tail)
      }
      out
    }
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
    var ia = 0; var ib = 0; var io = 0
    while (io < out.length) {
      val takeA =
        ib >= b.length || (ia < a.length &&
          beats(a(ia)._1, a(ia)._2, b(ib)._1, b(ib)._2))
      if (takeA) { out(io) = a(ia); ia += 1 } else { out(io) = b(ib); ib += 1 }
      io += 1
    }
    out
  }

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()

  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}
