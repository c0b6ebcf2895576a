package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity, pinned to DuckDB's `jaro_winkler_similarity`
  * semantics (rapidfuzz lineage) so the oracle can use the built-in:
  *
  *  - Jaro: match window floor(max(n,m)/2) − 1, greedy left-to-right
  *    marking, transpositions = FLOOR of half the out-of-order matched
  *    pairs (integer division — not the textbook fractional half);
  *  - Winkler boost ONLY when jaro > 0.7 (verified against DuckDB:
  *    jw('abcdefgh','abzzzzzz') = jaro = 0.5, no boost), prefix capped at
  *    4, scaling 0.1;
  *  - either side empty → 0.0 (DuckDB returns 0.0 even for two empties —
  *    NOT the textbook 1.0).
  *
  * Spark ships levenshtein but no Jaro-Winkler; a Scala UDF would box both
  * strings and break codegen, so this is a native BinaryExpression whose
  * generated code is one static call per row. Reference golden values
  * (martha/marhta 0.961111, dwayne/duane 0.84) are pinned in
  * JaroWinklerSpec next to DuckDB probes of the gate/edge conventions.
  */
object JaroWinklerUtil {
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val s = ua.toString
    val t = ub.toString
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: compare the matched subsequences in order
    var k = 0
    var half = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // rapidfuzz/DuckDB FLOOR the half-count (integer division) — with an
    // odd number of out-of-order matched pairs this differs from the
    // textbook t = half/2.0 (probed: jw('large gear','red gear') =
    // 0.810714… requires t = 1, not 1.5)
    val trans = half / 2
    val jaro = (mm / n + mm / m + (mm - trans) / mm) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val lMax = math.min(4, math.min(n, m))
      while (l < lMax && s.charAt(l) == t.charAt(l)) l += 1
      jaro + 0.1 * l * (1.0 - jaro)
    } else jaro
  }
}

/** `jaro_winkler(left, right)` as a codegen'd double expression. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerUtil.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerFunctions {
  /** Codegen'd Jaro-Winkler similarity (DuckDB-parity semantics). */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinkler(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
