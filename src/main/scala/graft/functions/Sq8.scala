package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Scalar (int8) quantization codec — the third member of the embedding
 * compression family next to IVF (coarse cells) and PQ (sub-codebooks):
 * per-dimension affine mapping of doubles onto [0, 255] codes, 8× smaller
 * embedding storage with one multiply per element to decode. The
 * per-dimension [lo, hi] ranges ride as ONE constructor artifact
 * (reference object in codegen, like `NearestCells`), so generated-method
 * size is constant in the dimension.
 *
 * Determinism contract (the DuckDB oracle reproduces every code):
 * `code[j] = clamp(floor((x - lo[j]) * 255.0 / (hi[j] - lo[j])), 0, 255)`
 * — exactly this op order, with degenerate dims (`hi == lo`) coding 0.
 * The clamp makes the `x == hi` boundary engine-independent even when
 * `(s * 255.0) / s` rounds above 255.
 */
case class Sq8Encode(child: Expression, lo: Seq[Double], hi: Seq[Double])
  extends UnaryExpression {
  require(lo.nonEmpty && lo.length == hi.length,
    s"sq8_encode: ${lo.length} lower vs ${hi.length} upper bounds")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sq8_encode"

  @transient private lazy val loArr: Array[Double] = lo.toArray
  @transient private lazy val hiArr: Array[Double] = hi.toArray

  def encode(a: ArrayData): ArrayData = {
    val n = a.numElements()
    require(n == loArr.length,
      s"sq8_encode: vector dimension $n vs ${loArr.length} trained dims")
    val out = new Array[Int](n)
    var j = 0
    while (j < n) {
      val s = hiArr(j) - loArr(j)
      out(j) =
        if (s == 0.0) 0
        else {
          val c = math.floor((a.getDouble(j) - loArr(j)) * 255.0 / s)
          if (c < 0.0) 0 else if (c > 255.0) 255 else c.toInt
        }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Encode", this, classOf[Sq8Encode].getName)
    defineCodeGen(ctx, ev, a => s"$ref.encode($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Midpoint reconstruction of [[Sq8Encode]] codes:
  * `x̂[j] = lo[j] + (code[j] + 0.5) * (hi[j] - lo[j]) / 255.0` — the
  * decode half for approximate distance arithmetic on compressed
  * vectors (max per-element error = half a quantization step). */
case class Sq8Decode(child: Expression, lo: Seq[Double], hi: Seq[Double])
  extends UnaryExpression {
  require(lo.nonEmpty && lo.length == hi.length,
    s"sq8_decode: ${lo.length} lower vs ${hi.length} upper bounds")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_sq8_decode"

  @transient private lazy val loArr: Array[Double] = lo.toArray
  @transient private lazy val hiArr: Array[Double] = hi.toArray

  def decode(a: ArrayData): ArrayData = {
    val n = a.numElements()
    require(n == loArr.length,
      s"sq8_decode: code dimension $n vs ${loArr.length} trained dims")
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      out(j) = loArr(j) + (a.getInt(j) + 0.5) * (hiArr(j) - loArr(j)) / 255.0
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    decode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Decode", this, classOf[Sq8Decode].getName)
    defineCodeGen(ctx, ev, a => s"$ref.decode($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
