package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003 — the MOSS algorithm): over a document's character k-gram
  * rolling hashes, slide a w-hash window and select each window's
  * minimum; the distinct selected hashes are the document's
  * fingerprint set. The guarantee that makes it the standard local
  * fingerprinting scheme: any shared substring of at least w + k - 1
  * characters between two documents yields at least one shared
  * selected fingerprint, while expected density stays ~2/(w+1) — so
  * overlap detection needs only a fingerprint equi-join, never text.
  *
  * q98's per-doc scalar hashes (same base/modulus recurrence,
  * RollingHashConsts) answer "same document?"; winnowing's SET answers
  * "do these documents share any sufficiently long passage?" — the
  * plagiarism/boilerplate primitive.
  *
  * Fixed parameters k = 8 codepoints per gram, w = 16 grams per
  * window, shared with the DuckDB oracle's list-formulation so both
  * engines agree bit-for-bit. When a document has fewer than w grams
  * (but at least one), the single window spans all grams — the global
  * minimum, matching winnowing's short-input convention. Fewer than k
  * codepoints → empty set.
  *
  * The hot loop is a static JVM kernel invoked from whole-stage
  * codegen (one call per row, no interpreted expression tree, no
  * boxing); eval and codegen share the same kernel so the paths
  * cannot diverge.
  */
object WinnowConsts {
  val K = 8
  val W = 16
}

object Winnow {
  /** The kernel: codepoints → k-gram rolling hashes → per-window
    * minima → sorted distinct selection. O(n·k) hashing + O(n·w)
    * window minima on primitive arrays; n is document length, so both
    * terms are scan-side per-row work. */
  def compute(s: String): ArrayData = {
    import RollingHashConsts.{Base, Mod}
    import WinnowConsts.{K, W}
    // decode codepoints once (supplementary-safe, matching q98)
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var i = 0
    var ci = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      cps(ci) = c
      ci += 1
      i += Character.charCount(c)
    }
    val m = n - K + 1 // gram count
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      var h = 0L
      var j = 0
      while (j < K) {
        h = (h * Base + cps(g + j)) % Mod
        j += 1
      }
      hs(g) = h
      g += 1
    }
    val nwin = math.max(m - W + 1, 1)
    val sel = new java.util.TreeSet[java.lang.Long]()
    var w0 = 0
    while (w0 < nwin) {
      var mn = Long.MaxValue
      var j = w0
      val end = math.min(w0 + W, m)
      while (j < end) {
        if (hs(j) < mn) mn = hs(j)
        j += 1
      }
      sel.add(mn)
      w0 += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow_fingerprints(s)`: the sorted distinct winnowing selection
  * as array<bigint>; empty array for strings shorter than k. */
case class Winnow(child: Expression) extends UnaryExpression {

  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.plans.Winnow.compute($x.toString());")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}
