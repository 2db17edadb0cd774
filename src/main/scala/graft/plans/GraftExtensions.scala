package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions.
  *
  * Two entry points:
  *   - config `spark.sql.extensions=graft.plans.GraftExtensions` (the
  *     production wiring via SparkSessionExtensions), or
  *   - `GraftFunctions.register(spark)` for an existing session (what
  *     queries/tests use — the driver owns session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(e.injectFunction)
}

object GraftFunctions {
  type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        // arity-check before indexing: a 1-arg call would otherwise die
        // with IndexOutOfBounds instead of an analysis-time error, and
        // extra args would be silently ignored
        require(children.size == 2,
          s"cosine_sim expects exactly 2 arguments, got ${children.size}")
        CosineSimilarity(children.head, children(1))
      }),
    (FunctionIdentifier("sq_dist_long"),
      new ExpressionInfo(classOf[SqDistLong].getName, "sq_dist_long"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"sq_dist_long expects exactly 2 arguments, got ${children.size}")
        SqDistLong(children.head, children(1))
      }),
    (FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"dot_long expects exactly 2 arguments, got ${children.size}")
        DotLong(children.head, children(1))
      }),
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"rolling_hash expects exactly 1 argument, got ${children.size}")
        RollingHash(children.head)
      }),
    (FunctionIdentifier("rolling_minblock_hash"),
      new ExpressionInfo(classOf[RollingMinBlockHash].getName, "rolling_minblock_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"rolling_minblock_hash expects exactly 1 argument, got ${children.size}")
        RollingMinBlockHash(children.head)
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"nfc_normalize expects exactly 1 argument, got ${children.size}")
        NfcNormalize(children.head)
      }),
    (FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"zorder2 expects exactly 2 arguments, got ${children.size}")
        ZOrder2(children.head, children(1))
      }),
    (FunctionIdentifier("gram_upper"),
      new ExpressionInfo(classOf[GramUpper].getName, "gram_upper"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"gram_upper expects exactly 1 argument, got ${children.size}")
        GramUpper(children.head)
      }),
    (FunctionIdentifier("vec_sum"),
      new ExpressionInfo(classOf[VecSum].getName, "vec_sum"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"vec_sum expects exactly 1 argument, got ${children.size}")
        VecSum(children.head)
      }),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"sorted_intersect_count expects exactly 2 arguments, got ${children.size}")
        SortedIntersectCount(children.head, children(1))
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[Winnow].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"winnow_fingerprints expects exactly 1 argument, got ${children.size}")
        Winnow(children.head)
      }))

  /** Idempotent in-session registration. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
