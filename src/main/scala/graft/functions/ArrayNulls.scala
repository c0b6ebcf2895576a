package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.Platform

/** O(elements/64) null-presence scan for the vector hot loops.
  *
  * The round-14 null-element parity fix (see [[CosineSimilarity]]) needs
  * "does this array hold any NULL element?" before the arithmetic loop —
  * but an `isNullAt(i)` interleaved per element measurably slowed the
  * brute-force pair verifier ~35% (the bit-test loads rival the FP work
  * itself in those 3-op loop bodies). For [[UnsafeArrayData]] — the form
  * every post-shuffle/codegen operand takes — the null bits are a packed
  * bitmap directly after the 8-byte numElements header (the layout
  * `UnsafeArrayData.calculateHeaderPortionInBytes` exposes publicly:
  * 8 + 8*ceil(n/64) bytes), so one long-compare per 64 elements decides
  * the whole question. Other ArrayData forms fall back to the per-element
  * scan, still OUTSIDE the arithmetic loop.
  */
object ArrayNulls {

  /** Cached reflective access to ColumnarArray's private vector: the
    * OTHER form hot operands take — a parquet-scan array consumed inside
    * the same codegen stage wraps the column vector directly, and its
    * per-element `isNullAt` is a virtual call into the vector (measured
    * ~80% on the LSH verify join when scanned per element). The vector's
    * own `hasNull()` answers the whole question in O(1) for the
    * no-nulls-in-vector common case; only a vector that DOES hold nulls
    * somewhere falls back to scanning the slice. Reflection is resolved
    * once and the Field handle cached; if the private layout ever
    * changes, the cache resolves to None and the per-element fallback
    * still gives the right answer.
    */
  private val columnarData: Option[java.lang.reflect.Field] =
    try {
      val f = classOf[org.apache.spark.sql.vectorized.ColumnarArray]
        .getDeclaredField("data")
      f.setAccessible(true)
      Some(f)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Field offset of ColumnarArray.data for a raw Unsafe read: the hot
    * joins evaluate this check PER PAIR, and a reflective `Field.get`
    * there (~tens of ns with access checks) measurably dominated the
    * 64-float arithmetic it guards. `objectFieldOffset` + `getObject`
    * is a single inlined load. -1 when unavailable — the reflective
    * path above, then the per-element scan, remain the fallbacks.
    */
  private val theUnsafe: sun.misc.Unsafe =
    try {
      val f = classOf[sun.misc.Unsafe].getDeclaredField("theUnsafe")
      f.setAccessible(true)
      f.get(null).asInstanceOf[sun.misc.Unsafe]
    } catch { case scala.util.control.NonFatal(_) => null }

  private val columnarDataOffset: Long =
    if (theUnsafe == null) -1L
    else columnarData.fold(-1L)(f =>
      try theUnsafe.objectFieldOffset(f)
      catch { case scala.util.control.NonFatal(_) => -1L })

  /** True when any of the first `n` elements of `v` is NULL. */
  def hasNull(v: ArrayData, n: Int): Boolean = v match {
    case u: UnsafeArrayData =>
      val base = u.getBaseObject
      var off = u.getBaseOffset + 8L
      // full words cover 64 elements each; the last word's tail bits
      // beyond numElements are zero by construction (writers zero the
      // header region before setting bits), but mask defensively anyway
      val full = n >>> 6
      var i = 0
      while (i < full) {
        if (Platform.getLong(base, off) != 0L) return true
        off += 8L
        i += 1
      }
      val rem = n & 63
      rem != 0 &&
        (Platform.getLong(base, off) & ((1L << rem) - 1)) != 0L
    case ca: org.apache.spark.sql.vectorized.ColumnarArray
        if columnarData.isDefined =>
      val vec = (if (columnarDataOffset >= 0L)
        theUnsafe.getObject(ca, columnarDataOffset)
      else columnarData.get.get(ca))
        .asInstanceOf[org.apache.spark.sql.vectorized.ColumnVector]
      // whole-vector verdict first: false means no element of ANY slice
      // is null; only a null-bearing vector pays the per-slice scan
      if (!vec.hasNull()) false
      else {
        var i = 0
        while (i < n) {
          if (ca.isNullAt(i)) return true
          i += 1
        }
        false
      }
    case g =>
      var i = 0
      while (i < n) {
        if (g.isNullAt(i)) return true
        i += 1
      }
      false
  }
}
