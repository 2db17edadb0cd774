package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `zorder2(x, y)`: Morton (Z-order) bit interleave of the low 16 bits
  * of two non-negative long columns — the multi-dimensional data-layout
  * key lakehouse tables cluster by so that ONE sort order yields bounded
  * min/max ranges on BOTH dimensions per file (multi-column skipping,
  * where a plain lexicographic sort only prunes its leading column).
  *
  * Bit i of x lands at output bit 2i, bit i of y at 2i+1:
  *   z = Σ_i ((x>>i)&1) << 2i  |  ((y>>i)&1) << (2i+1)
  * computed branch-free with the classic mask-spread ladder (each step
  * doubles the gap between occupied bits), inlined into whole-stage
  * codegen. Inputs are masked to 16 bits, so z < 2^32 and every shift
  * stays well inside a long. Null in, null out.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def ladder(v: String): String =
        s"""
           |$v = ($v | ($v << 8)) & 0x00ff00ffL;
           |$v = ($v | ($v << 4)) & 0x0f0f0f0fL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;
         """.stripMargin
      s"""
         |long $sx = $x & 0xffffL;
         |long $sy = $y & 0xffffL;
         |${ladder(sx)}
         |${ladder(sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 16 bits of v to even bit positions 0,2,..,30. */
  def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
