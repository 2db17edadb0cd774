package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `sorted_intersect_count(a, b)`: |a ∩ b| for two ASCENDING-sorted
  * array<bigint> columns, as one two-pointer merge pass — the
  * triangle-closing kernel of q130.
  *
  * Why not `size(array_intersect(a, b))`: Spark's array_intersect
  * builds a hash set of one side and MATERIALIZES the intersection
  * array per row, only for size() to immediately reduce it to a count.
  * On the degree-oriented adjacency arrays (O(√m) long, millions of
  * rows) that is an allocation per edge in the hottest loop of the
  * query. The merge pass allocates nothing, reads both arrays once,
  * and stays inside whole-stage codegen via a static kernel call (the
  * Winnow/RollingHash pattern — eval and codegen share the kernel so
  * the paths cannot diverge).
  *
  * PRECONDITIONS: each input is sorted ascending and duplicate-free.
  * q130 holds both via `sort_array(collect_list(...))` over the
  * DISTINCT oriented edge set (coPurchaseEdges deduplicates (u,v)
  * pairs before orientation, so each neighbor appears once per node —
  * the duplicate-freedom comes from the edge build, not a collect_set).
  * On
  * unsorted input the count is an undercount, not an error — this is a
  * deliberate non-check; validating order would re-read the arrays and
  * erase the point of the kernel.
  */
object SortedIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> arguments, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
