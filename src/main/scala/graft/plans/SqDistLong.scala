package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact squared Euclidean distance over two long vectors — the
  * assignment kernel of q205's k-means cells (SURVEY.md §2.13).
  *
  * Inputs are embeddings quantized to integer ten-thousandths (the
  * same 4-decimal grid as the DECIMAL(9,4) oracle contract, scaled by
  * 10^4), so the result is exact INTEGER arithmetic both engines
  * reproduce bit-for-bit — per-element diffs are < 2·10^5, squares
  * < 4·10^10, and a 64-dim sum stays far below 2^63. Replacing the
  * DECIMAL(30,8) higher-order-function fold with this single fused
  * long loop is what makes a k=Θ(sqrt n) codebook affordable: the
  * Θ(n·k) assignment runs as n·k native 64-step loops instead of
  * n·k·dims interpreted BigDecimal closure steps (measured 7x+ on the
  * sf1 corpus). Null when either input is null; mismatched lengths
  * take the common prefix (both engines feed equal-length vectors).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<bigint> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "sq_dist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) {
      val diff = x.getLong(i) - y.getLong(i)
      d += diff * diff
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh names: see CosineSimilarity — duplicate occurrences in one
      // codegen scope must not collide
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $diff = $x.getLong($i) - $y.getLong($i);
         |  $d += $diff * $diff;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

/** Exact dot product over two long vectors — q205's rescore kernel
  * (and, with both arguments the same column, its norm). Same integer
  * ten-thousandths contract and width budget as [[SqDistLong]]:
  * element products < 4·10^10, 64-dim sums far below 2^63, and the
  * downstream cosine divides exact-integer-sourced DOUBLES (long →
  * double is exact below 2^53, then one correctly-rounded division),
  * so both engines reproduce every similarity bit-for-bit without the
  * decimal→double cast hazard. */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<bigint> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = left.nullable || right.nullable

  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) {
      d += x.getLong(i) * y.getLong(i)
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $d += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}
