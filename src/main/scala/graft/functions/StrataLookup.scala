package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Constant string→long table lookup with a default for missing keys — the
 * LARGE-table face of `Sampling.strataLookup` (per-stratum rates/weights).
 * Why not `element_at` on a map literal: Spark's map-literal access is a
 * LINEAR key scan (`GetMapValue` over `ArrayBasedMapData` has no hash
 * index), so a 100k-strata rate table would cost ~10⁵ string comparisons
 * per corpus row — here the table rides as one reference object hashed
 * into a `java.util.HashMap` once per task, O(1) per row, still one plan
 * node and still inside whole-stage codegen (the [[NearestCells]]
 * pattern). NULL input returns NULL (UnaryExpression contract); the
 * caller coalesces to the default, giving NULL strata the same
 * fall-to-default semantics as the small-table when-chain.
 */
case class StrataLookup(child: Expression, keys: Seq[String], values: Seq[Long],
                        default: Long)
  extends UnaryExpression {
  require(keys.length == values.length,
    s"strata_lookup: ${keys.length} keys vs ${values.length} values")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string stratum, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_strata_lookup"

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](keys.size * 2)
    keys.iterator.zip(values.iterator).foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), v)
    }
    m
  }

  def get(k: UTF8String): Long = {
    val v = table.get(k)
    if (v == null) default else v.longValue()
  }

  override protected def nullSafeEval(a: Any): Any = get(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("strataLookup", this, classOf[StrataLookup].getName)
    defineCodeGen(ctx, ev, a => s"$ref.get($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
