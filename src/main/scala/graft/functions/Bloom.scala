package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Probe family shared by the aggregate, the membership expression, and
  * the definitional test reference. Bit `i` of item-hash `h` in an
  * `mBits`-bit filter comes from Kirsch–Mitzenmacher double hashing
  * (`g_i = h1 + i·h2 mod m` needs only two base hashes for k
  * independent-enough probes) over the murmur3 64-bit finalizer — the
  * full-Long domain matters here because the item keys are `xxhash64`
  * values, not the `[0, P)` polynomial hashes the count-min family
  * buckets (reducing mod P first would floor the reachable false-positive
  * rate at n/P regardless of filter size). */
object BloomUtil {
  def bitOf(h: Long, i: Int, mBits: Int): Int = {
    var x = h
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
    val h1 = x
    x *= 0xc4ceb9fe1a85ec53L; x ^= x >>> 33
    val h2 = x | 1L
    java.lang.Math.floorMod(h1 + i.toLong * h2, mBits.toLong).toInt
  }

  def add(words: Array[Long], h: Long, k: Int): Unit = {
    val m = words.length << 6
    var i = 0
    while (i < k) {
      val b = bitOf(h, i, m)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  def contains(words: ArrayData, h: Long, k: Int): Boolean = {
    val m = words.numElements() << 6
    var i = 0
    while (i < k) {
      val b = bitOf(h, i, m)
      if ((words.getLong(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Definitional reference: the word array from a list of item hashes. */
  def reference(hs: Seq[Long], numBits: Int, k: Int): Array[Long] = {
    val words = new Array[Long](numBits >>> 6)
    hs.foreach(add(words, _, k))
    words
  }
}

/**
 * Bloom filter over 64-bit item hashes as a mergeable aggregate — the
 * 100 TB join-pruning shape: each partition folds its keys into a fixed
 * `numBits`-bit array, partials combine by bitwise OR (map-side combine
 * applies; the shuffle carries one `numBits/8`-byte row per partition,
 * never a row per key), and the final word array is a membership
 * artifact with NO false negatives: `mightContain` true for every
 * inserted key, false positives at rate ~(1 - e^{-kn/m})^k. A screen
 * built from it prunes definite-negatives before an exact join without
 * ever being able to change the join's answer.
 *
 * Null inputs are skipped, like SQL `count`. No input rows at all
 * evaluates to the zero filter (matches nothing). Cell values are ORs of
 * pure bit sets — insertion order and partitioning never matter, so the
 * filter is deterministic and the operator built on it oracle-stable.
 */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"bloom numBits must be a positive multiple of 64, got $numBits")
  require(numBits <= (1 << 30),
    s"bloom numBits $numBits exceeds the 2^30 (128 MB) sanity cap")
  require(numHashes >= 1 && numHashes <= 32,
    s"bloom numHashes must be in [1,32], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects a bigint item hash, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  /** null buffer = "no input yet"; materialized lazily so empty
    * partitions never allocate the word array. */
  override def createAggregationBuffer(): Array[Long] = null

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val words = if (buf == null) new Array[Long](numBits >>> 6) else buf
      BloomUtil.add(words, v.asInstanceOf[Long], numHashes)
      words
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (b == null) a
    else if (a == null) b
    else {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(if (buf == null) new Array[Long](numBits >>> 6) else buf)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/**
 * Membership probe against a [[BloomAgg]] word array (`left` = the
 * filter, typically a plan literal or broadcast column; `right` = the
 * bigint item hash): true iff all `numHashes` probed bits are set —
 * guaranteed true for every inserted key, so `!mightContain` is a safe
 * definite-negative prune. Filter size derives from the array itself
 * (`64 · numElements` bits), so the expression stays correct for any
 * filter built with the same `numHashes`.
 */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {
  require(numHashes >= 1 && numHashes <= 32,
    s"bloom numHashes must be in [1,32], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint), got ($l, $r)")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bits: Any, h: Any): Any =
    BloomUtil.contains(bits.asInstanceOf[ArrayData], h.asInstanceOf[Long], numHashes)

  /** Test hook: interpreted eval without a Spark session. */
  def nullSafeEvalPublic(bits: Any, h: Any): Any = nullSafeEval(bits, h)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bits, h) =>
      s"graft.functions.BloomUtil.contains($bits, $h, $numHashes)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}
