package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k by (score desc, id asc) with O(k) state: the map-side
 * partial-aggregation kernel for brute-force ANN ranking. Each partition
 * keeps at most k candidates per group, so the shuffle carries groups × k
 * rows instead of groups × corpus. Runs as a first-class aggregate on the
 * untyped frame — unlike a typed `Aggregator`, the scoring projection
 * around it stays inside whole-stage codegen (no DeserializeToObject /
 * MapElements barrier) and the buffer serializes as an UnsafeRow, not kryo.
 *
 * Output: array<struct<id:bigint, cos:double>> sorted best-first.
 */
case class BoundedTopK(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]]
  with BinaryLike[Expression] {

  require(k > 0, s"top-k size must be positive, got $k")

  private def id: Expression = left
  private def score: Expression = right

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType == LongType && score.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_top$k expects (bigint, double), got (${id.dataType}, ${score.dataType})")

  private val elementType: StructType =
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false)))
  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"graft_top$k"

  /** Max of this ordering = worst candidate (lowest score, then highest
    * id), so `head`/`dequeue` evict the right element. */
  private implicit val worstFirst: Ordering[(Long, Double)] =
    Ordering.by((t: (Long, Double)) => (-t._2, t._1))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Double)]

  private def insert(buf: mutable.PriorityQueue[(Long, Double)], cand: (Long, Double)): Unit =
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.lt(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }

  override def update(buf: mutable.PriorityQueue[(Long, Double)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null) insert(buf, (i.asInstanceOf[Long], s.asInstanceOf[Double]))
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Long, Double)],
                     b: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any =
    new GenericArrayData(buf.toArray.sorted(worstFirst) // ascending = best first
      .map { case (i, s) => InternalRow(i, s) })

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(elementType, containsNull = false)))

  override def serialize(buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] =
    projection.apply(InternalRow(new GenericArrayData(
      buf.toArray.map { case (i, s) => InternalRow(i, s) }))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 2)
      buf.enqueue((s.getLong(0), s.getDouble(1)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
}
