package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (Ukkonen) Levenshtein threshold test: `lev(a, b) <= k` without
  * computing the full O(n·m) DP matrix. The band restricts each row to the
  * 2k+1 cells within k of the diagonal — O(k·min(n,m)) work — and the row
  * exits as soon as every in-band cell exceeds k (a row-minimum > k can
  * never recover, since DP values are non-decreasing along any path).
  *
  * DECISION-EXACT vs the full distance: inside the band the recurrence is
  * the textbook one, and any path leaving the band has cost > k by
  * construction, so `within(a, b, k) == (levenshtein(a, b) <= k)` for every
  * input — which is why `q_entity_blocking`'s DuckDB oracle can keep using
  * plain `levenshtein(...) <= 4` unchanged. On the blocking workload
  * (~30-char names, k = 4) the band does ~9/30 of the full DP work and
  * early-exits most non-matches in a few rows.
  */
object LevUtil {
  def within(ua: UTF8String, ub: UTF8String, k: Int): Boolean = {
    val s = ua.toString
    val t = ub.toString
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return false
    if (n == 0 || m == 0) return math.max(n, m) <= k
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    val j0 = math.min(m, k)
    while (j <= j0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      var best = inf
      if (i <= k) { cur(0) = i; best = i }
      var jj = lo
      while (jj <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        val ins = cur(jj - 1) + 1
        if (del < v) v = del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best > k) return false
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m) <= k
  }
}

/** `lev(left, right) <= k` as a codegen'd boolean expression — the hot loop
  * of blocked entity resolution ([[graft.queries.Ext21Queries]]). The
  * generated code is one static call per row (no interpreter dispatch, no
  * full-matrix allocation).
  */
case class LevenshteinWithin(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "levenshtein_within"

  override def nullSafeEval(a: Any, b: Any): Any =
    LevUtil.within(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LevUtil.within($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LevenshteinFunctions {
  /** Codegen'd banded `levenshtein(a, b) <= k` test. */
  def lev_within(a: Column, b: Column, k: Int): Column =
    GraftColumnBridge.column(LevenshteinWithin(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), k))
}
