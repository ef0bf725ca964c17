package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bucket family shared by the sketch aggregate, the estimate columns,
  * the property tests, and the DuckDB oracle mirror: row `i` of the
  * sketch hashes item-hash `h` (a portable [[PolyHashUtil]] value in
  * `[0, P)`) to `(((h mod P) * (2i+1) + 12345i+7) mod P) mod width` — the
  * same `(2j+1, 12345j+7)` affine family the MinHash signatures use, so
  * an independent engine reproduces every cell exactly.
  *
  * `h` is reduced into `[0, P)` FIRST (floorMod, so negative hashes land
  * in range too): internal callers always feed [[PolyHashUtil]] values,
  * for which the reduction is the identity, but the registered SQL
  * function `graft_count_min` accepts any bigint (e.g. an xxhash64) — a
  * signed `%` would produce a negative bucket and crash the aggregate
  * with an opaque ArrayIndexOutOfBounds, and an unreduced multiply could
  * overflow. After the reduction every term is non-negative and
  * < 2³¹·2⁵ ≪ 2⁶³, so the remaining `%`s are exact. */
object CountMinUtil {
  import PolyHashUtil.P
  def bucket(h: Long, i: Int, width: Int): Int =
    (((Math.floorMod(h, P) * (2L * i + 1) + (12345L * i + 7)) % P) % width).toInt

  /** Definitional reference: the full d×w table from a list of hashes. */
  def reference(hs: Seq[Long], depth: Int, width: Int): Array[Long] = {
    val t = new Array[Long](depth * width)
    hs.foreach { h =>
      var i = 0
      while (i < depth) { t(i * width + bucket(h, i, width)) += 1; i += 1 }
    }
    t
  }
}

/**
 * Count–min sketch (Cormode & Muthukrishnan 2005) over portable item
 * hashes, as a mergeable aggregate — the 100 TB shape for frequency
 * estimation: each partition folds its items into a FIXED d×w table of
 * longs (depth×width, one cache-friendly array), partials combine by
 * elementwise addition (map-side combine applies — the shuffle carries
 * one d×w row per partition, never per key), and the final table is a
 * point-queryable artifact: `estimate(x) = min over rows i of
 * cell[i][bucket_i(hash(x))]`, an upper bound on x's true count that is
 * within εN with high probability for w = e/ε, d = ln(1/δ).
 *
 * Input is the item's [[StringPolyHash]] value (hash in the projection,
 * where it is codegen'd) — the aggregate only buckets and counts.
 * Null inputs are skipped, like SQL `count`. No input rows at all
 * evaluates to the zero table (a valid empty sketch). Determinism:
 * cell values are pure counts — insertion order never matters, so the
 * sketch is deterministic under any partitioning, and the DuckDB oracle
 * reproduces it cell-for-cell.
 */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"count-min depth must be in [1,16], got $depth")
  require(width >= 2, s"count-min width must be >= 2, got $width")
  require(depth.toLong * width <= (1 << 22),
    s"count-min table $depth x $width exceeds the 4M-cell sanity cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_count_min expects a bigint item hash, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_count_min"

  /** null buffer = "no input yet"; materialized lazily so empty
    * partitions never allocate the table. */
  override def createAggregationBuffer(): Array[Long] = null

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val t = if (buf == null) new Array[Long](depth * width) else buf
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) { t(i * width + CountMinUtil.bucket(h, i, width)) += 1; i += 1 }
      t
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (b == null) a
    else if (a == null) b
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(if (buf == null) new Array[Long](depth * width) else buf)

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(LongType, containsNull = false)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val arr = if (buf == null) null else new GenericArrayData(buf)
    projection.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    if (row.isNullAt(0)) null else row.getArray(0).toLongArray
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}
