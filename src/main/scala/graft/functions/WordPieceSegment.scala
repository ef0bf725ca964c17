package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * WordPiece greedy longest-match-first segmentation of a whole TEXT
 * column into pieces — one compiled pass per row: whitespace word scan
 * (the Java `\s` class, matching `TextOps.words` exactly) and the
 * per-word greedy matcher (Schuster & Nakajima 2012; the algorithm
 * BERT's `WordpieceTokenizer` runs): from each position take the
 * LONGEST vocabulary piece that matches — word-initial positions match
 * pieces verbatim, word-internal positions match `##`-prefixed
 * continuation pieces — and a word with any unmatchable position (or
 * longer than `maxInputChars` code points) collapses to the single
 * `unk` token, discarding partial matches, exactly the reference
 * semantics.
 *
 * Why a native expression: same rationale as [[UnigramSegment]] — the
 * higher-order-function formulation runs interpreted lambdas with
 * per-step array copies (aggregate/transform are CodegenFallback),
 * which made the zero-shuffle inline unigram tokenizer the corpus
 * bottleneck before its native rewrite; this expression runs the same
 * greedy loop as compiled JVM code inside whole-stage codegen (the
 * [[StrataLookup]] reference-object pattern). Positions and lengths
 * count CODE POINTS (Spark's `length`/`substr` and DuckDB's
 * `len`/slicing agree on code points; an astral char is ONE position).
 * WordPieceSegmentProps pins it against the definitional greedy fold.
 */
case class WordPieceSegment(child: Expression, vocab: Seq[String],
                            unk: String, maxPieceLen: Int,
                            maxInputChars: Int)
  extends UnaryExpression {
  require(vocab.nonEmpty, "wordpiece_segment: empty vocabulary")
  require(maxPieceLen >= 1 && maxPieceLen <= 64,
    s"wordpiece_segment: maxPieceLen must be in 1..64, got $maxPieceLen")
  require(maxInputChars >= 1,
    s"wordpiece_segment: maxInputChars must be >= 1, got $maxInputChars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string text column, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_wordpiece_segment$maxPieceLen"

  @transient private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val unkUtf8 = UTF8String.fromString(unk)

  /** Java's `\s` (no UNICODE_CHARACTER_CLASS): the exact class Spark's
    * `split(text, "\\s+")` matches, so word boundaries agree with
    * `TextOps.words` byte for byte. */
  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\u000B' || cp == '\f' || cp == '\r'

  def segment(text: UTF8String): ArrayData = {
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

  /** Greedy longest-match over cps[from, until): at each position try
    * lengths maxPieceLen..1 (bounded by the remainder), word-initial
    * candidates verbatim, word-internal candidates `##`-prefixed; the
    * first vocabulary hit wins and the cursor advances by its CONTENT
    * length. Any position with no hit — or a word longer than
    * `maxInputChars` — emits the single `unk` token for the WHOLE word
    * (partial matches discarded, the reference's is_bad path). */
  private def segmentWord(cps: Array[Int], from: Int, until: Int,
                          out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val n = until - from
    if (n > maxInputChars) { out += unkUtf8; return }
    val first = out.length
    var pos = from
    while (pos < until) {
      var l = if (maxPieceLen < until - pos) maxPieceLen else until - pos
      var hit: String = null
      while (l >= 1 && hit == null) {
        val content = new String(cps, pos, l)
        val cand = if (pos == from) content else "##" + content
        if (table.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) {
        // unmatchable position: the whole word is one unk token
        out.takeInPlace(first)
        out += unkUtf8
        return
      }
      out += UTF8String.fromString(hit)
      pos += l
    }
  }

  override protected def nullSafeEval(a: Any): Any =
    segment(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceSegment", this, classOf[WordPieceSegment].getName)
    defineCodeGen(ctx, ev, a => s"$ref.segment($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
