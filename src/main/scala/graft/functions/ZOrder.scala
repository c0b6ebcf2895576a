package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of the low 16 bits of two longs: x takes the
  * even output bits, y the odd. The layout-clustering key for multi-column
  * data skipping at 100 TB — sort/partition by z-value and both dimensions
  * get locality, so per-file min/max stats prune scans on either predicate
  * (the technique Delta/Iceberg OPTIMIZE ZORDER applies; public magic-number
  * bit-spreading, e.g. the "Interleave bits by Binary Magic Numbers" method
  * from Sean Anderson's public Bit Twiddling Hacks page).
  *
  * Whole-stage-codegen'd: the spread is 10 shift/mask ops per row, no
  * branches, no allocation.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // AbstractDataType (and with it ExpectsInputTypes' inputTypes contract) is
  // private[sql] in Spark 4 — check the child types directly instead
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("zorder2(x, y) takes two BIGINTs")
  }
  override def prettyName: String = "zorder2"

  @inline private def spread16(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    spread16(x.asInstanceOf[Long]) | (spread16(y.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def spread(in: String, out: String): String =
        s"""
           |long $out = $in & 0xffffL;
           |$out = ($out | ($out << 8)) & 0x00ff00ffL;
           |$out = ($out | ($out << 4)) & 0x0f0f0f0fL;
           |$out = ($out | ($out << 2)) & 0x33333333L;
           |$out = ($out | ($out << 1)) & 0x55555555L;
         """.stripMargin
      spread(x, sx) + spread(y, sy) +
        s"${ev.value} = $sx | ($sy << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  /** Codegen'd 2-D Morton key over the low 16 bits of each input. */
  def zorder2(x: Column, y: Column): Column =
    GraftColumnBridge.column(ZOrder2(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y)))
}
