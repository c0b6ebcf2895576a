package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string, mod 1e9+7 — the codegen form of
  * [[graft.operators.TextAnalysis.fingerprint]]'s HOF formulation
  * (aggregate over per-char ascii values). For single-byte (ASCII) content
  * the two are identical: acc = (acc * 31 + byte) % 1000000007, left to
  * right. The HOF version walks code points; this walks UTF-8 bytes — they
  * diverge only on multi-byte characters, where the HOF form is retained as
  * the reference.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31 + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Regex tokenizer as a native Catalyst Generator (the engine's UDTF tier —
  * SURVEY §2.9 reserves "a tokenizer Generator" as our addition alongside the
  * sentiment UDF and the Count-Min-Sketch Aggregator). Splits `child` on the
  * foldable `pattern`, drops empty tokens, and generates one
  * (pos, token) row per surviving token, 0-indexed in document order —
  * usable from SQL as `LATERAL VIEW graft_tokenize(text, ' ')` or directly
  * in a select list, planned through GenerateExec like explode.
  */
case class RegexTokenize(child: Expression, pattern: Expression)
    extends org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

  override def children: Seq[Expression] = Seq(child, pattern)

  override def prettyName: String = "graft_tokenize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType != StringType || pattern.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_tokenize(text, pattern) takes two strings")
    else if (!pattern.foldable)
      TypeCheckResult.TypeCheckFailure("pattern must be a constant")
    else pattern.eval(null) match {
      // validate HERE, at analysis time — a null or malformed constant
      // would otherwise surface as an executor-side NPE/PatternSyntax
      // exception on the first row
      case null => TypeCheckResult.TypeCheckFailure("pattern must not be NULL")
      case p =>
        try { java.util.regex.Pattern.compile(p.toString); TypeCheckResult.TypeCheckSuccess }
        catch { case e: java.util.regex.PatternSyntaxException =>
          TypeCheckResult.TypeCheckFailure(s"invalid pattern: ${e.getMessage}") }
    }
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false)))

  // pattern is foldable — compile once per executor instance, not per row
  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      pattern.eval(null).asInstanceOf[UTF8String].toString)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) Nil
    else {
      val parts = compiled.split(text.asInstanceOf[UTF8String].toString, -1)
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow](parts.length)
      var pos = 0
      var i = 0
      while (i < parts.length) {
        if (parts(i).nonEmpty) {
          out += InternalRow(pos, UTF8String.fromString(parts(i)))
          pos += 1
        }
        i += 1
      }
      out
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegexTokenize =
    copy(child = newChildren(0), pattern = newChildren(1))
}

/** Byte-histogram statistics of a string in one codegen'd O(len) pass over a
  * 256-slot array — no explode, no shuffle. `CharDistinct` counts occupied
  * slots; `CharEntropy` computes Shannon entropy as
  * log2(n) - sum(c*log2(c))/n over the exact integer counts (the same
  * formulation the SQL oracle groups out of substr+UNNEST). Byte == char for
  * the ASCII corpus; like [[PolyHash]], multi-byte text would diverge and the
  * exploded formulation stays the reference for it.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.DoubleType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Int](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var acc = 0.0
    var j = 0
    while (j < 256) {
      val c = counts(j)
      if (c > 0) acc += c * (Math.log(c) / Math.log(2.0))
      j += 1
    }
    val n = bytes.length
    if (n == 0) 0.0 else Math.log(n) / Math.log(2.0) - acc / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int[] $counts = new int[256];
         |for (int $i = 0; $i < $bytes.length; $i++) $counts[$bytes[$i] & 0xff]++;
         |double $acc = 0.0;
         |for (int $j = 0; $j < 256; $j++) {
         |  int $c = $counts[$j];
         |  if ($c > 0) $acc += $c * (Math.log($c) / Math.log(2.0));
         |}
         |${ev.value} = $bytes.length == 0 ? 0.0
         |  : Math.log($bytes.length) / Math.log(2.0) - $acc / $bytes.length;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of distinct bytes in a string — see [[CharEntropy]]. */
case class CharDistinct(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = IntegerType
  override def prettyName: String = "char_distinct"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val seen = new Array[Boolean](256)
    var i = 0
    while (i < bytes.length) { seen(bytes(i) & 0xff) = true; i += 1 }
    var n = 0
    var j = 0
    while (j < 256) { if (seen(j)) n += 1; j += 1 }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |byte[] $bytes = $s.getBytes();
         |boolean[] $seen = new boolean[256];
         |for (int $i = 0; $i < $bytes.length; $i++) $seen[$bytes[$i] & 0xff] = true;
         |int $n = 0;
         |for (int $j = 0; $j < 256; $j++) if ($seen[$j]) $n++;
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (UAX #15 canonical composition) as a codegen'd
  * native expression — Spark ships no builtin for it, and the usual fallback
  * (a Scala UDF over `java.text.Normalizer`) breaks whole-stage codegen for
  * the entire normalize→casefold→hash dedup pipeline. The generated code
  * short-circuits on `Normalizer.isNormalized` (true for all-ASCII content,
  * the common case at corpus scale) so the already-normalized path does a
  * single scan and no allocation beyond `toString`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $s.toString();
         |${ev.value} = java.text.Normalizer.isNormalized(
         |    $str, java.text.Normalizer.Form.NFC)
         |  ? $s
         |  : UTF8String.fromString(java.text.Normalizer.normalize(
         |      $str, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** Codegen'd polynomial rolling hash (mod 1e9+7) over a string column. */
  def poly_hash(c: Column): Column =
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(c)))

  /** Generator column: (pos, token) rows per input row (see [[RegexTokenize]]). */
  def tokenize(text: Column, pattern: String): Column =
    GraftColumnBridge.column(RegexTokenize(GraftColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(pattern)))

  /** Codegen'd byte-level Shannon entropy (see [[CharEntropy]]). */
  def char_entropy(c: Column): Column =
    GraftColumnBridge.column(CharEntropy(GraftColumnBridge.expression(c)))

  /** Codegen'd distinct-byte count (see [[CharDistinct]]). */
  def char_distinct(c: Column): Column =
    GraftColumnBridge.column(CharDistinct(GraftColumnBridge.expression(c)))

  /** Codegen'd Unicode NFC normalization (see [[NfcNormalize]]). */
  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
