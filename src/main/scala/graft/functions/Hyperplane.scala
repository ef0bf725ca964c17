package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH for cosine (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002 §3): bit b of a
  * vector's code is the sign of its dot product with pseudo-random
  * hyperplane `fam = seed·bits + b`, whose component j is the CENTERED
  * portable hash `((j·(2·fam+1) + 12345·fam+7) mod P) / P - 0.5` — the
  * same affine family as the MinHash signatures, so an independent
  * engine reproduces every hyperplane (and therefore every bucket)
  * exactly. P(bit agrees) = 1 - θ/π: vectors at high cosine collide on
  * whole codes, and `seed` yields independent tables for standard LSH
  * OR-amplification.
  *
  * Determinism contract: per bit, products accumulate in position order
  * from 0.0 (one IEEE double fold both here and in the DuckDB mirror),
  * so the sign — and hence the bucket — is bit-identical across engines. */
object HyperplaneUtil {
  import PolyHashUtil.P

  def component(fam: Int, j: Int): Double =
    ((j.toLong * (2L * fam + 1) + (12345L * fam + 7)) % P) / 1000000007.0 - 0.5

  def code(vec: ArrayData, bits: Int, seed: Int): Long = {
    val d = vec.numElements()
    val acc = new Array[Double](bits)
    var j = 0
    while (j < d) {
      val x = vec.getDouble(j)
      var b = 0
      while (b < bits) { acc(b) += x * component(seed * bits + b, j); b += 1 }
      j += 1
    }
    var c = 0L
    var b = 0
    while (b < bits) { if (acc(b) >= 0) c |= (1L << b); b += 1 }
    c
  }
}

/** `bits`-bit hyperplane code of an array<double> vector — one codegen'd
  * pass per row; the code never leaves the row until the bucket join. */
case class HyperplaneBits(child: Expression, bits: Int, seed: Int)
  extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"hyperplane bits must be in [1,63], got $bits")
  require(seed >= 0, s"hyperplane seed must be non-negative, got $seed")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = s"graft_hyperplane$bits"

  override protected def nullSafeEval(a: Any): Any =
    HyperplaneUtil.code(a.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HyperplaneUtil.code($a, $bits, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
