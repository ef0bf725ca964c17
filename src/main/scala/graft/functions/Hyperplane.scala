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

object JlProjectUtil {
  /** Johnson–Lindenstrauss projection onto `outDim` portable hyperplanes
    * (the SAME affine family as [[HyperplaneUtil]] — JL projection is
    * hyperplane LSH without the sign): `y[b] = (Σ_j x[j]·c(seed·outDim+b,
    * j)) / √outDim`, products folded in position order from 0.0 and one
    * final IEEE division, so every output element is bit-identical across
    * engines. The dense pseudo-random family is Achlioptas-style
    * (bounded, zero-mean ±~0.29 components) rather than Gaussian — the
    * distance-preservation guarantee is the same and the determinism is
    * what makes it an ORACLE-checkable operator. */
  def project(vec: ArrayData, outDim: Int, seed: Int): ArrayData = {
    val d = vec.numElements()
    val acc = new Array[Double](outDim)
    var j = 0
    while (j < d) {
      val x = vec.getDouble(j)
      var b = 0
      while (b < outDim) {
        acc(b) += x * HyperplaneUtil.component(seed * outDim + b, j); b += 1
      }
      j += 1
    }
    val s = math.sqrt(outDim.toDouble)
    var b = 0
    while (b < outDim) { acc(b) /= s; b += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }
}

/** `graft_jl_project`: dimensionality reduction before ANN/clustering —
  * a codegen'd stateless per-row projection to `outDim` dims. */
case class JlProject(child: Expression, outDim: Int, seed: Int)
  extends UnaryExpression {
  require(outDim >= 1 && outDim <= 4096, s"outDim must be in [1,4096], got $outDim")
  require(seed >= 0, s"seed must be non-negative, got $seed")
  // family index is seed*outDim + b (b < outDim) as an Int: overflow
  // would silently draw from a biased family instead of failing
  require(seed.toLong * outDim + (outDim - 1) <= Int.MaxValue,
    s"seed * outDim overflows the hyperplane family index " +
      s"(seed=$seed, outDim=$outDim); pick a smaller seed")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_jl_project"

  override protected def nullSafeEval(a: Any): Any =
    JlProjectUtil.project(a.asInstanceOf[ArrayData], outDim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.JlProjectUtil.project($a, $outDim, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bits`-bit hyperplane code of an array<double> vector — one codegen'd
  * pass per row; the code never leaves the row until the bucket join. */
case class HyperplaneBits(child: Expression, bits: Int, seed: Int)
  extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"hyperplane bits must be in [1,63], got $bits")
  require(seed >= 0, s"hyperplane seed must be non-negative, got $seed")
  require(seed.toLong * bits + (bits - 1) <= Int.MaxValue,
    s"seed * bits overflows the hyperplane family index " +
      s"(seed=$seed, bits=$bits); pick a smaller seed")

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
