package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/**
 * Collect the last `n` non-null values, in frame order, with O(n) state —
 * the bounded-buffer replacement for `collect_list(...)` + `slice(tail)`
 * in running window frames. With `collect_list` a key with millions of
 * prior rows materializes a millions-element array PER ROW before the
 * slice; this ring buffer never holds more than `n` elements, so the
 * windowed join's state is bounded regardless of key skew (mirrors the
 * reference's bounded per-key window state,
 * milan `runtime/TimeWindowFlatMapProcessWindowFunction.scala`).
 *
 * Used as a running-frame window function (UNBOUNDED PRECEDING..CURRENT
 * ROW), where Spark's window evaluator only ever calls `update` — the
 * same evaluation class as `collect_list` (TypedImperativeAggregate).
 */
case class BoundedLastList(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayDeque[Any]] with UnaryLike[Expression] {

  require(n > 0, s"bounded tail size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"graft_bounded_last$n"

  override def createAggregationBuffer(): mutable.ArrayDeque[Any] = mutable.ArrayDeque.empty

  override def update(buf: mutable.ArrayDeque[Any], input: InternalRow): mutable.ArrayDeque[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // copy: unsafe rows backing struct values are reused per input row
      buf.append(InternalRow.copyValue(v))
      if (buf.size > n) buf.removeHead()
    }
    buf
  }

  override def merge(a: mutable.ArrayDeque[Any], b: mutable.ArrayDeque[Any]): mutable.ArrayDeque[Any] = {
    a.appendAll(b)
    while (a.size > n) a.removeHead()
    a
  }

  override def eval(buf: mutable.ArrayDeque[Any]): Any =
    new GenericArrayData(buf.toArray)

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.ArrayDeque[Any]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayDeque[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buf.append(v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedLastList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedLastList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedLastList =
    copy(child = newChild)
}
