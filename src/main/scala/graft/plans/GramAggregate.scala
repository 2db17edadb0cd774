package graft.plans

import java.nio.ByteBuffer
import java.nio.ByteOrder

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass upper-triangle Gram accumulation over a bigint-vector
  * column: `gram_upper(vm)` returns the dim·(dim-1)/2 array
  * G[(i,j)] = Σ_rows vm[i]·vm[j] (i < j, row-major pair order —
  * (0,1),(0,2),…,(0,d-1),(1,2),…).
  *
  * This is the aggregate a dedicated BLAS pass would run, expressed as
  * a native Catalyst `TypedImperativeAggregate`: per-partition state is
  * ONE long array (allocated lazily on the first row, so the operator
  * is dimension-agnostic), partial buffers serialize to packed
  * little-endian longs for the single-row-per-partition shuffle, and
  * merge is element-wise addition — associative and commutative by
  * construction, so the result is partition-count-invariant
  * (GramAggregateSpec proves it under 1/7/32-way repartitions).
  *
  * Why it exists: the relational formulation (q139's original shape)
  * explodes dim²/2 structs per ROW before the map-side combine — at
  * dim 64 that is 2016 intermediate rows per input row feeding the
  * hash aggregate. This operator folds each row into the state array
  * in place: zero intermediate rows, zero per-pair hashing, the same
  * single tiny shuffle. Same trade BotStatsAggregator makes for
  * count+min-gap, scaled to array state.
  */
case class GramUpper(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_upper expects array<bigint>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val m = n * (n - 1) / 2
      val buf = if (buffer.length == 0 && m > 0) new Array[Long](m) else buffer
      require(buf.length == m,
        s"gram_upper: vector length $n (=> ${m} pairs) does not match state of ${buf.length} pairs")
      var i = 0
      var idx = 0
      while (i < n) {
        val vi = arr.getLong(i)
        var j = i + 1
        while (j < n) {
          buf(idx) += vi * arr.getLong(j)
          idx += 1
          j += 1
        }
        i += 1
      }
      buf
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"gram_upper: merging states of ${b1.length} vs ${b2.length} pairs")
      var k = 0
      while (k < b1.length) { b1(k) += b2(k); k += 1 }
      b1
    }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_upper"

  override def withNewMutableAggBufferOffset(newOffset: Int): GramUpper =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramUpper =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramUpper =
    copy(child = newChild)
}

/** Element-wise vector sum over a bigint-vector column:
  * `vec_sum(vm)` returns the dim-length array S[i] = Σ_rows vm[i].
  *
  * The centroid-update half of a distributed Lloyd iteration (q143):
  * per-partition state is one long array folded in place (the
  * [[GramUpper]] discipline — no posexplode to (row, dim) pairs, no
  * per-dim hashing), merge is element-wise addition, and the packed
  * partial buffers shuffle one row per partition. Dimension-agnostic
  * via lazy allocation; mixed lengths fail loudly. */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<bigint>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val buf = if (buffer.length == 0 && n > 0) new Array[Long](n) else buffer
      require(buf.length == n,
        s"vec_sum: vector length $n does not match state of ${buf.length}")
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
      buf
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"vec_sum: merging states of ${b1.length} vs ${b2.length}")
      var k = 0
      while (k < b1.length) { b1(k) += b2(k); k += 1 }
      b1
    }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)
}
