package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * CCNet-style unicode text fold (Wenzek et al., "CCNet: Extracting High
 * Quality Monolingual Datasets from Web Crawl Data", LREC 2020 — the
 * normalization applied before hashing/dedup; the fuzzy-dedup pipelines
 * of Penedo et al.'s RefinedWeb normalize the same way before MinHash).
 * One deterministic, locale-free pass:
 *
 *  1. NFKD compatibility decomposition (ligatures and width variants
 *     expand: `ﬁ` → `fi`, full-width `Ａ` → `A`, `①` → `1`);
 *  2. drop non-spacing combining marks (accent stripping: `é` → `e`,
 *     identically for precomposed and decomposed inputs);
 *  3. per-code-point lowercase (`Character.toLowerCase(int)` — no
 *     locale, so `I` → `i` regardless of default locale);
 *  4. fold every decimal digit (Nd) to `0` — numbers carry no signal
 *     for dedup but explode the shingle space;
 *  5. collapse runs of whitespace to a single space and trim the ends —
 *     whitespace is the PORTABLE Java-`\s` class (space, tab, LF, VT, FF, CR),
 *     the exact separator rule of `TextOps.words` and the DuckDB
 *     oracles (NFKD already folds the compat space variants — NBSP,
 *     ideographic space, fullwidth forms — onto U+0020, so unicode
 *     spacing still collapses; the class only excludes exotic
 *     non-decomposing separators, keeping fold and oracle byte-agreed
 *     on EVERY input, not just the corpus).
 *
 * On pure-ASCII lowercase text the fold reduces to whitespace collapse +
 * digit fold, which is how the DuckDB oracle mirrors it; the unicode
 * steps are pinned by a ScalaCheck property against an independent
 * regex-based reference (NormalizeSpec).
 */
object UnicodeFoldUtil {
  /** The portable Java-`\s` separator class (`WordShingleUtil.isSep`'s
    * rule) — NOT `Character.isWhitespace`, whose extras (U+001C–U+001F,
    * NEL, line/paragraph separator) the oracles' regex class excludes. */
  @inline private def isSep(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** Shared by interpreted eval and generated code. */
  def fold(s: UTF8String): UTF8String = {
    val nfkd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFKD)
    val n = nfkd.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < n) {
      val cp = nfkd.codePointAt(i)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) {
        // strip accents / diacritics
      } else if (isSep(cp)) {
        pendingSpace = started // leading whitespace never emits
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        val lc = Character.toLowerCase(cp)
        if (Character.isDigit(lc)) sb.append('0') else sb.appendCodePoint(lc)
        started = true
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_normalize(text)`: the [[UnicodeFoldUtil]] fold as a codegen'd
  * expression — a stateless per-row projection, so it runs identically
  * over batch and streaming frames and stays inside WholeStageCodegen. */
case class UnicodeFold(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(a: Any): Any =
    UnicodeFoldUtil.fold(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.UnicodeFoldUtil.fold($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {
  /** Column face of [[UnicodeFold]]. */
  def fold(text: Column): Column = ColumnBridge.column(UnicodeFold(ColumnBridge.expr(text)))
}
