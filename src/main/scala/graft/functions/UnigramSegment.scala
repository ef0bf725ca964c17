package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unigram-LM (SentencePiece, Kudo 2018) Viterbi segmentation of a whole
 * TEXT column into pieces — one compiled pass per row: whitespace word
 * scan (the Java `\s` class, matching `TextOps.words` exactly) and the
 * per-word probability-space DP (dp[i] = max over l of dp[i−l] ·
 * p(word[i−l+1..i]), ascending-l `>=` fold so ties take the longer
 * piece, unknown single chars at exactly 1e-100 — the ARITHMETIC of
 * `graft.pipeline.Unigram`'s reference fold, decision-identical across
 * IEEE engines).
 *
 * Why a native expression: the higher-order-function formulation builds
 * the dp table through interpreted lambdas with per-step array copies
 * (aggregate/transform are CodegenFallback) — measured ~27 µs per word
 * occurrence at sf0.1, which made the zero-shuffle inline tokenizer the
 * corpus bottleneck. This expression runs the same DP as compiled JVM
 * code inside whole-stage codegen (the [[StrataLookup]] reference-object
 * pattern); UnigramSegmentProps pins it against the definitional fold.
 */
case class UnigramSegment(child: Expression, pieces: Seq[String],
                          probs: Seq[Double], maxPieceLen: Int,
                          /** LOG-space DP (dp[i] = max of dp[i−l] +
                            * lp(piece)) for vocabularies that arrive as
                            * log probabilities (the SentencePiece .vocab
                            * interop): sums of identically-parsed doubles
                            * are IEEE-identical across engines, the same
                            * determinism the product fold has for exact
                            * count divisions. Unknown single chars take
                            * exactly −1000.0 (the 1e-100 analog), unknown
                            * longer pieces −1e18 (the 0.0 analog — never
                            * on a winning path). */
                          logSpace: Boolean = false)
  extends UnaryExpression {
  require(pieces.length == probs.length,
    s"unigram_segment: ${pieces.length} pieces vs ${probs.length} probabilities")
  require(maxPieceLen >= 1 && maxPieceLen <= 16,
    s"unigram_segment: maxPieceLen must be in 1..16, got $maxPieceLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string text column, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_unigram_segment$maxPieceLen"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.iterator.zip(probs.iterator).foreach { case (p, v) => m.put(p, v) }
    m
  }

  /** Java's `\s` (no UNICODE_CHARACTER_CLASS): the exact class Spark's
    * `split(text, "\\s+")` matches, so word boundaries agree with
    * `TextOps.words` byte for byte (all of `\s` is BMP, so matching on
    * code points is equivalent). */
  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\u000B' || cp == '\f' || cp == '\r'

  def segment(text: UTF8String): ArrayData = {
    // CODE POINTS, not UTF-16 units: Spark's length/substr and DuckDB's
    // len/slicing count code points, so piece lengths must too (an astral
    // char is ONE position, not a surrogate pair)
    val cps = text.toString.codePoints().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = cps.length
    while (i < n) {
      while (i < n && isWs(cps(i))) i += 1
      var j = i
      while (j < n && !isWs(cps(j))) j += 1
      if (j > i) segmentWord(cps, i, j, out)
      i = j
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** The reference DP over cps[from, until): probability-space scores,
    * ascending-l >= fold (longer piece wins ties), unknown single chars
    * at the exact literal 1e-100, unknown longer pieces at 0.0 (still
    * tie-competing — identical to the definitional fold). */
  private def segmentWord(cps: Array[Int], from: Int, until: Int,
                          out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val n = until - from
    val dp = new Array[Double](n + 1)
    val bl = new Array[Int](n + 1)
    dp(0) = if (logSpace) 0.0 else 1.0
    var i = 1
    while (i <= n) {
      var bestS = if (logSpace) Double.NegativeInfinity else -1.0
      var bestL = 0
      val lMax = if (maxPieceLen < i) maxPieceLen else i
      var l = 1
      while (l <= lMax) {
        val piece = new String(cps, from + i - l, l)
        val pv = table.get(piece)
        val p = if (pv != null) pv.doubleValue()
          else if (l == 1) { if (logSpace) -1000.0 else 1e-100 }
          else { if (logSpace) -1e18 else 0.0 }
        val cand = if (logSpace) dp(i - l) + p else dp(i - l) * p
        if (cand >= bestS) { bestS = cand; bestL = l }
        l += 1
      }
      dp(i) = bestS; bl(i) = bestL
      i += 1
    }
    val first = out.length
    var pos = n
    while (pos > 0) {
      out += UTF8String.fromString(new String(cps, from + pos - bl(pos), bl(pos)))
      pos -= bl(pos)
    }
    // backtrace emits right-to-left: reverse the slice in place
    var a = first; var b = out.length - 1
    while (a < b) { val t = out(a); out(a) = out(b); out(b) = t; a += 1; b -= 1 }
  }

  override protected def nullSafeEval(a: Any): Any =
    segment(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegment", this, classOf[UnigramSegment].getName)
    defineCodeGen(ctx, ev, a => s"$ref.segment($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
