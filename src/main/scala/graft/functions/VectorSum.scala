package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Elementwise sum of `array<double>` vectors with O(dim) state — the
 * map-side kernel for centroid updates and per-group embedding statistics.
 * The alternative (`posexplode` + per-position aggregation) multiplies the
 * shuffle row count by the vector dimension; this aggregate partial-sums
 * within each partition and ships ONE dim-length array per (group,
 * partition), so k-means centroid updates shuffle k rows instead of
 * k × dim. Runs as a first-class untyped aggregate (UnsafeRow-serialized
 * buffer, no typed-Aggregator object barrier).
 *
 * Semantics match SQL `sum`: null input rows are skipped; no input rows
 * at all evaluates to null. All non-null vectors in a group must share
 * one dimension — mismatches raise rather than silently truncating.
 * Elementwise mean = `graft_vec_sum(v) / count(v)` via `transform`.
 */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum expects array<double>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sum"

  /** null buffer = "no input seen yet" (distinguishes from a zero vector). */
  override def createAggregationBuffer(): Array[Double] = null

  private def add(buf: Array[Double], arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Double] = {
    val n = arr.numElements()
    // a null ELEMENT would silently read as 0.0 — raise, like the
    // dimension-mismatch path (null whole-vector rows are skipped upstream)
    def elem(i: Int): Double = {
      require(!arr.isNullAt(i), s"graft_vec_sum: null element at position $i")
      arr.getDouble(i)
    }
    if (buf == null) {
      val fresh = new Array[Double](n)
      var i = 0
      while (i < n) { fresh(i) = elem(i); i += 1 }
      fresh
    } else {
      require(buf.length == n,
        s"graft_vec_sum: dimension mismatch (${buf.length} vs $n)")
      var i = 0
      while (i < n) { buf(i) += elem(i); i += 1 }
      buf
    }
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else add(buf, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (b == null) a
    else if (a == null) b
    else {
      require(a.length == b.length,
        s"graft_vec_sum: dimension mismatch (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(DoubleType, containsNull = false)))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val arr = if (buf == null) null else new GenericArrayData(buf)
    projection.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    if (row.isNullAt(0)) null else row.getArray(0).toDoubleArray
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

/**
 * Elementwise min (`max = false`) or max (`max = true`) of `array<double>`
 * vectors — [[VectorSum]]'s sibling for per-dimension range statistics
 * (the scalar-quantization training pass): one partial-aggregated scan
 * shipping ONE dim-length array per (group, partition), never a
 * rows × dim explode. Null rows skip; no rows at all evaluates to null;
 * dimension mismatches and null elements raise.
 */
case class VectorExtreme(
    child: Expression,
    max: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (max) "graft_vec_max" else "graft_vec_min"

  override def createAggregationBuffer(): Array[Double] = null

  @inline private def pick(a: Double, b: Double): Double =
    if (max) math.max(a, b) else math.min(a, b)

  private def fold(buf: Array[Double], arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Double] = {
    val n = arr.numElements()
    def elem(i: Int): Double = {
      require(!arr.isNullAt(i), s"$prettyName: null element at position $i")
      arr.getDouble(i)
    }
    if (buf == null) {
      val fresh = new Array[Double](n)
      var i = 0
      while (i < n) { fresh(i) = elem(i); i += 1 }
      fresh
    } else {
      require(buf.length == n, s"$prettyName: dimension mismatch (${buf.length} vs $n)")
      var i = 0
      while (i < n) { buf(i) = pick(buf(i), elem(i)); i += 1 }
      buf
    }
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (b == null) a
    else if (a == null) b
    else {
      require(a.length == b.length,
        s"$prettyName: dimension mismatch (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) = pick(a(i), b(i)); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(DoubleType, containsNull = false)))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val arr = if (buf == null) null else new GenericArrayData(buf)
    projection.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    if (row.isNullAt(0)) null else row.getArray(0).toDoubleArray
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorExtreme =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorExtreme =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorExtreme =
    copy(child = newChild)
}
