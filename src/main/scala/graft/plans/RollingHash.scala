package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash over a string's code points — the hot
  * kernel of q98's Rabin-Karp fingerprinting, as codegen'd Catalyst
  * expressions instead of nested higher-order functions.
  *
  * The HOF formulation (transform to a code array, aggregate folds,
  * per-block re-slices) is interpreted row-by-row with boxing — it
  * measured ~4 ms/doc at sf0.1, the costliest scan op in the suite.
  * These expressions run the identical recurrence
  * h = (h * 131 + codePoint) mod 1e9+7 in one fused primitive loop
  * inlined into whole-stage codegen. Code points (not UTF-16 units)
  * match Spark `ascii(substring(s,i,1))` and DuckDB
  * `ascii(substr(s,i,1))`, so the DuckDB oracle's list_reduce twin is
  * unchanged.
  *
  * Shared constants are fixed (base 131, modulus 1e9+7, 64-code-point
  * blocks) so both engines and both formulations agree bit-for-bit.
  */
object RollingHashConsts {
  val Base = 131L
  val Mod = 1000000007L
  val Block = 64
}

sealed trait RollingHashLike extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
}

/** `rolling_hash(s)`: the full-string fold; 0 for the empty string
  * (the fold's zero seed, matching `aggregate([], 0, ...)`). */
case class RollingHash(child: Expression) extends RollingHashLike {

  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      h = (h * RollingHashConsts.Base + c) % RollingHashConsts.Mod
      i += Character.charCount(c)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |java.lang.String $s = $x.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $c = $s.codePointAt($i);
         |  $h = ($h * ${RollingHashConsts.Base}L + $c) % ${RollingHashConsts.Mod}L;
         |  $i += Character.charCount($c);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** `rolling_minblock_hash(s)`: minimum of the rolling hashes of each
  * consecutive 64-code-point block (last block may be short) — the
  * winnowing-style fingerprint. NULL for the empty string (no blocks),
  * matching `array_min([])`/`list_min([])`. */
case class RollingMinBlockHash(child: Expression) extends RollingHashLike {

  override def nullable: Boolean = true

  override def prettyName: String = "rolling_minblock_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var blk = 0L
    var minBlk = Long.MaxValue
    var cnt = 0
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      blk = (blk * RollingHashConsts.Base + c) % RollingHashConsts.Mod
      cnt += 1
      if (cnt == RollingHashConsts.Block) {
        if (blk < minBlk) minBlk = blk
        blk = 0L; cnt = 0
      }
      i += Character.charCount(c)
    }
    if (cnt > 0 && blk < minBlk) minBlk = blk
    if (cnt > 0 || minBlk != Long.MaxValue) minBlk else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val blk = ctx.freshName("blk")
      val minBlk = ctx.freshName("minBlk")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |java.lang.String $s = $x.toString();
         |long $blk = 0L;
         |long $minBlk = Long.MAX_VALUE;
         |int $cnt = 0;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $c = $s.codePointAt($i);
         |  $blk = ($blk * ${RollingHashConsts.Base}L + $c) % ${RollingHashConsts.Mod}L;
         |  $cnt++;
         |  if ($cnt == ${RollingHashConsts.Block}) {
         |    if ($blk < $minBlk) $minBlk = $blk;
         |    $blk = 0L; $cnt = 0;
         |  }
         |  $i += Character.charCount($c);
         |}
         |if ($cnt > 0 && $blk < $minBlk) $minBlk = $blk;
         |if ($cnt == 0 && $minBlk == Long.MAX_VALUE) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $minBlk;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinBlockHash =
    copy(child = newChild)
}
