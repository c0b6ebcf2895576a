package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min Sketch as a typed [[Aggregator]] — the custom-aggregate tier of
  * the engine (SURVEY.md §2.9: sketches are the canonical
  * TypedImperativeAggregate/Aggregator use case). Sub-linear heavy-hitter
  * counting for term frequencies at 100 TB scale: the buffer is a fixed
  * depth x width long matrix, merge is elementwise addition (associative and
  * commutative, so map-side partial aggregation applies), and estimates
  * never under-count (eps-overcount bound with probability 1 - delta).
  *
  * depth=4, width=2048 gives eps ~ 2e/width ~ 0.0013 of the stream length
  * at delta ~ e^-4. Hashing is Spark's Murmur3 over the UTF-8 bytes with
  * per-row seeds — deterministic across runs and cluster layouts.
  */
class CountMinSketchAgg(depth: Int = 4, width: Int = 2048)
    extends Aggregator[String, Array[Long], Array[Long]] with Serializable {
  // depth 0 would make estimate() return Long.MaxValue for every term
  // (empty min-loop), a silently absurd count rather than an error
  require(depth >= 1 && width >= 1,
    s"CountMinSketchAgg: depth/width must be >= 1, got depth=$depth width=$width")

  private def idx(row: Int, term: String): Int = {
    val u = UTF8String.fromString(term)
    val h = Murmur3_x86_32.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), 41 + row)
    row * width + java.lang.Math.floorMod(h, width)
  }

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], term: String): Array[Long] = {
    if (term != null) {
      var r = 0
      while (r < depth) { buf(idx(r, term)) += 1; r += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Point estimate from a finished sketch: min over the depth rows. */
  def estimate(sketch: Array[Long], term: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch(idx(r, term))
      if (v < best) best = v
      r += 1
    }
    best
  }
}
