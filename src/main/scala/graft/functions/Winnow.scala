package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003): over a position-ordered k-gram hash sequence, each window of
  * `w` consecutive hashes selects its MINIMUM (rightmost occurrence on
  * ties); the fingerprint set is the distinct selected (pos, hash)
  * pairs. Guarantee: any substring match of at least w+k-1 tokens
  * between two documents shares at least one fingerprint, at expected
  * density 2/(w+1) — a position-robust sparse signature that whole-doc
  * hashing and fixed-stride sampling both lack.
  *
  * Sequences shorter than `w` are treated as one window (every non-empty
  * document carries >= 1 fingerprint). One O(n) monotonic-deque pass —
  * shared verbatim by interpreted eval, generated code, and the
  * ScalaCheck reference comparison; the DuckDB oracle mirrors the
  * per-window rightmost-min definition directly. */
object WinnowUtil {
  /** Definitional reference: independent rightmost-min scan per window. */
  def reference(hs: Seq[Long], w: Int): Seq[(Int, Long)] = {
    if (hs.isEmpty) return Nil
    val n = hs.length
    val starts = if (n < w) Seq(0) else 0 to (n - w)
    starts.map { i =>
      val end = math.min(i + w, n)
      var best = i
      var j = i + 1
      while (j < end) { if (hs(j) <= hs(best)) best = j; j += 1 }
      (best, hs(best))
    }.distinct
  }

  /** O(n) monotonic-deque selection; `pos` is 0-based. */
  def select(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val win = math.min(w, n)
    // deque of candidate indices, hash values strictly increasing front
    // to back; equal values pop so the rightmost minimum survives
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var lastSel = -1
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      while (tail > head && hs.getLong(deque(tail - 1)) >= h) tail -= 1
      deque(tail) = j; tail += 1
      if (j >= win) { if (deque(head) <= j - win) head += 1 }
      if (j >= win - 1) {
        val sel = deque(head)
        if (sel != lastSel) {
          out += InternalRow(sel, hs.getLong(sel))
          lastSel = sel
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/**
 * Native winnowing selector: array<bigint> position-ordered k-gram
 * hashes → array<struct<pos:int, h:bigint>> selected fingerprints,
 * one codegen'd O(n) pass per row — the signature never leaves the row
 * and nothing shuffles until the caller explodes it.
 */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = s"graft_winnow$w"

  override protected def nullSafeEval(a: Any): Any =
    WinnowUtil.select(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WinnowUtil.select($a, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
