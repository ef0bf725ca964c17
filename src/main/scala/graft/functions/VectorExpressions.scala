package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst vector expressions with whole-stage codegen. The
 * higher-order-function formulation (`aggregate(zip_with(...))`) evaluates
 * lambdas interpretively per element — ~10 µs per 64-dim dot product; these
 * generate a tight primitive loop instead (~50 ns), which matters in the
 * O(n²) stages of similarity search and embedding dedup.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class NormL2(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0d
    var i = 0
    while (i < x.numElements()) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/**
 * Jaccard similarity of two SORTED, de-duplicated array<long> columns via a
 * codegen'd two-pointer merge — no hash-set build per pair, the fast path
 * for n-gram set similarity in O(pairs) dedup stages. Caller guarantees
 * sortedness (`sort_array` once per row, amortized outside the pair join).
 */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var (i, j, inter) = (0, 0, 0)
    while (i < nx && j < ny) {
      val (u, v) = (x.getLong(i), y.getLong(j))
      if (u == v) { inter += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0d else inter.toDouble / union
  }

  /** Test hook: interpreted eval without a Spark session. */
  def nullSafeEvalPublic(a: Any, b: Any): Any = nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val inter = ctx.freshName("inter"); val u = ctx.freshName("u"); val v = ctx.freshName("v")
      val union = ctx.freshName("union")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $u = $a.getLong($i); long $v = $b.getLong($j);
         |  if ($u == $v) { $inter++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |int $union = $nx + $ny - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
}

/** Static helper shared by interpreted eval and generated code (Scala
  * objects expose static forwarders, so codegen calls it directly). */
object JaccardGateUtil {
  /** Two-pointer Jaccard with early abandonment: returns the exact Jaccard
    * while the running upper bound (inter + min(remaining)) / (S - same)
    * can still reach `t`, else -1.0 the moment it provably cannot. The
    * first iteration's check subsumes the size-ratio prefilter
    * (min(n)/max(n) < t ⇒ skip without touching the arrays). The 1e-9
    * slack makes skipping strictly conservative under fp rounding, so
    * (result >= t) ⇔ (exact Jaccard >= t) for any t in (0, 1]. */
  def jaccardAtLeast(x: ArrayData, y: ArrayData, t: Double): Double = {
    val nx = x.numElements(); val ny = y.numElements()
    val s = nx + ny
    if (s == 0) return 0.0
    // smallest intersection that can still reach t: J = i/(s-i) >= t
    val need = t * s / (1.0 + t) - 1e-9
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      if (inter + math.min(nx - i, ny - j) < need) return -1.0
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { inter += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    val union = s - inter
    inter.toDouble / union
  }
}

/**
 * Thresholded Jaccard over sorted, de-duplicated array<long> columns:
 * exact value when >= threshold is still possible, -1.0 as soon as the
 * remaining-overlap bound proves it is not — candidate pairs from LSH/
 * blocking are mostly BELOW threshold, so the quadratic verify stage skips
 * most of its merge work. Filter the result with `>= threshold` exactly as
 * with [[JaccardSorted]]; outputs are identical for all surviving rows.
 */
case class JaccardSortedAtLeast(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  import org.apache.spark.sql.types.LongType
  // t = 0 degrades gracefully: the bound can never fire, every merge exact
  require(threshold >= 0.0 && threshold <= 1.0, "threshold must be in [0, 1]")
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted_at_least"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardGateUtil.jaccardAtLeast(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  /** Test hook: interpreted eval without a Spark session. */
  def nullSafeEvalPublic(a: Any, b: Any): Any = nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardGateUtil.jaccardAtLeast($a, $b, ${threshold}D)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedAtLeast =
    copy(left = l, right = r)
}

/** Static helper so both interpreted eval and generated code share one
  * implementation of the portable polynomial string hash. */
object PolyHashUtil {
  final val P = 1000000007L
  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var a = 0L
    var i = 0
    while (i < str.length) { a = (a * 31 + str.charAt(i)) % P; i += 1 }
    a
  }
}

/**
 * Portable polynomial string hash `fold (acc*31 + codepoint) mod 1e9+7` as
 * a native expression — the HOF formulation (`aggregate(split(s,''),...)`)
 * interprets two lambdas per character; this is one tight loop. Matches
 * DuckDB `list_reduce([0] || [ord(c) ...])` for BMP text.
 */
case class StringPolyHash(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(a: Any): Any =
    PolyHashUtil.hash(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PolyHashUtil.hash($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/**
 * Full MinHash signature in one pass over a hashed-shingle array: for
 * hash family j in 0..k-1, `min over shingles of ((2j+1)*h + 12345j+7)
 * mod P`. Replaces explode → k min-aggregates → shuffle with a per-row
 * array expression — the signature never leaves the row. Interpreted eval
 * (CodegenFallback) is fine here: one call per document, with the k×n
 * loop compiled JVM code.
 */
object MinHashUtil {
  /** Shared by interpreted eval and generated code. */
  def signature(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * (2L * j + 1) + (12345L * j + 7)) % PolyHashUtil.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

object WordShingleUtil {
  import PolyHashUtil.P

  /** Word separators = Java regex `\s` (ASCII whitespace), matching
    * `TextOps.words`' `split(text, "\\s+")` + empty-filter rule exactly —
    * token counts and shingle features must agree on irregular whitespace
    * (DuckDB's RE2 `\s` is the same class). */
  @inline private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The words of `text` under the same separator + empty-filter rule as
    * `TextOps.words` — shared by the gram-stats pass. */
  def splitWords(text: org.apache.spark.unsafe.types.UTF8String): Array[String] = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = -1
    var i = 0
    while (i <= s.length) {
      val sep = i == s.length || isSep(s.charAt(i))
      if (sep) { if (start >= 0) { out += s.substring(start, i); start = -1 } }
      else if (start < 0) start = i
      i += 1
    }
    out.toArray
  }

  /**
   * Hashes of all word n-gram shingles of `text` in ONE pass over the
   * characters, identical to hashing each "w1 w2 ... wn" string: per word
   * we track (hash, 31^length mod P) and compose
   * `h(a + ' ' + b) = (h(a)*31 + ' ') * 31^len(b) + h(b)  (mod P)`.
   * Building the ~n× intermediate shingle strings is what this avoids.
   */
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val s = text.toString
    // per-word (hash, 31^len)
    val wh = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var h = 0L; var pw = 1L; var inWord = false
    var i = 0
    while (i <= s.length) {
      val c = if (i < s.length) s.charAt(i) else ' '
      if (isSep(c)) {
        if (inWord) { wh += ((h, pw)); h = 0L; pw = 1L; inWord = false }
      } else {
        h = (h * 31 + c) % P
        pw = (pw * 31) % P
        inWord = true
      }
      i += 1
    }
    val m = wh.length
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    var j = 0
    while (j <= m - n) {
      var acc = wh(j)._1
      var t = 1
      while (t < n) {
        val (hw, pww) = wh(j + t)
        acc = (((acc * 31 + 32) % P) * pww + hw) % P
        t += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Static helper shared by interpreted eval and generated code. */
object WordGramStatsUtil {
  import WordShingleUtil.splitWords

  /** Multiplicity statistics of a text's word n-grams in one pass:
    * [total grams, distinct grams, max multiplicity]. Counts key on EXACT
    * gram strings (a per-row hash map), not on poly hashes — the 30-bit
    * poly space (and even 64-bit 31-poly composition, where "Aa"/"BB"
    * collide by construction) cannot guarantee count parity with a
    * string-keyed oracle. */
  def stats(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val words = splitWords(text)
    val m = words.length
    if (m < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Integer]()
    var max = 0
    var j = 0
    while (j <= m - n) {
      val gram =
        if (n == 1) words(j)
        else {
          val sb = new java.lang.StringBuilder(words(j))
          var t = 1
          while (t < n) { sb.append(' ').append(words(j + t)); t += 1 }
          sb.toString
        }
      val c = counts.merge(gram, 1, (a, b) => a + b)
      if (c > max) max = c
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array((m - n + 1).toLong, counts.size.toLong, max.toLong))
  }
}

/** Word n-gram multiplicity stats `[total, distinct, max]` of a text
  * column, one codegen'd pass per row — repetition features compute with
  * NO explode and NO shuffle (vs two (doc, term)-keyed aggregations over
  * the exploded corpus). */
case class WordGramStats(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}
  require(n > 0, s"gram size must be positive, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"graft_gram_stats$n"

  override protected def nullSafeEval(a: Any): Any =
    WordGramStatsUtil.stats(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WordGramStatsUtil.stats($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object CharShingleUtil {
  import PolyHashUtil.P
  /** Hashes of all character n-gram shingles, one pass. Values equal
    * `polyHash` of each substring. */
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val m = s.length - n + 1
    if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < n) { h = (h * 31 + s.charAt(i + j)) % P; j += 1 }
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** All char-n-gram shingle hashes of a text column, one pass. */
case class CharShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"graft_char_shingle_hashes$n"

  override protected def nullSafeEval(a: Any): Any =
    CharShingleUtil.shingleHashes(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CharShingleUtil.shingleHashes($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** All word-n-gram shingle hashes of a text column, one pass, no
  * intermediate strings. Values equal `polyHash` of each shingle string. */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"graft_shingle_hashes$n"

  override protected def nullSafeEval(a: Any): Any =
    WordShingleUtil.shingleHashes(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WordShingleUtil.shingleHashes($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"graft_minhash$k"

  override protected def nullSafeEval(a: Any): Any =
    MinHashUtil.signature(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MinHashUtil.signature($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Static helper shared by interpreted eval and generated code. */
object SimHashUtil {
  /** SimHash over feature hashes: per-bit ±1 sums over all features, sign
    * → bit. Matches the aggregate formulation (bit i set iff strictly more
    * features have bit i set than clear) and the DuckDB oracle's
    * CASE-sum mirror, feature multiplicity included. */
  def signature(hashes: org.apache.spark.sql.catalyst.util.ArrayData, bits: Int): Long = {
    val n = hashes.numElements()
    val sums = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (sums(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}

/** SimHash signature of a hashed-feature array, one codegen'd pass per row
  * — the whole signature computes inside the document's row, so the
  * signature stage needs NO explode and NO shuffle (vs the per-bit
  * aggregate formulation's 2·bits sum columns over exploded features). */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType
  require(bits > 0 && bits <= 63, s"simhash bits must be in [1, 63], got $bits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = s"graft_simhash$bits"

  override protected def nullSafeEval(a: Any): Any =
    SimHashUtil.signature(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHashUtil.signature($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Static helper shared by interpreted eval and generated code. */
object ByteResizeUtil {
  /** 1-D nearest-neighbor resample of a byte payload to `outLen` bytes —
    * the deterministic stand-in for media resizing (see
    * `pipeline.Multimodal.resizeStub`). */
  def resize(bytes: Array[Byte], outLen: Int): Array[Byte] = {
    if (outLen <= 0 || bytes.isEmpty) return Array.emptyByteArray
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = bytes((i.toLong * bytes.length / outLen).toInt)
      i += 1
    }
    out
  }
}

/** Nearest-neighbor byte resample `(binary, int) -> binary`, codegen'd. */
case class ByteResize(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{BinaryType, IntegerType}
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (binary, int), got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_byte_resize"

  override protected def nullSafeEval(b: Any, n: Any): Any =
    ByteResizeUtil.resize(b.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, n) => s"graft.functions.ByteResizeUtil.resize($b, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ByteResize =
    copy(left = newLeft, right = newRight)
}

/** Static helper shared by interpreted eval and generated code. */
object ByteMeanUtil {
  /** Mean unsigned byte value; 0.0 for an empty payload. The integer sum
    * is exact, so the result is bit-identical across engines. */
  def mean(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0d
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    s.toDouble / bytes.length
  }
}

/**
 * Mean unsigned byte of a binary column — the deterministic stand-in for
 * media decoding in the multimodal pipeline (see `pipeline.Multimodal`),
 * as a native codegen'd expression rather than a per-row closure.
 */
case class ByteMean(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_byte_mean"

  override protected def nullSafeEval(a: Any): Any =
    ByteMeanUtil.mean(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ByteMeanUtil.mean($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/**
 * Top-n nearest centroids by squared L2 distance, best-first, ties on the
 * lower cell id — the LARGE-codebook face of IVF cell assignment
 * (`Ivf.nearestCid`/`probeCids` dispatch here above `Ivf.LiteralCells`).
 *
 * Why not the literal `least(struct(d, cid)…)` formulation everywhere: that
 * expression TREE is O(k·dim) literal nodes — past a few hundred cells the
 * generated method blows Janino's 64 KB limit (whole-stage codegen falls
 * back to interpreted) and the plan itself carries every centroid double as
 * a separate literal. Here the codebook is ONE constructor artifact: the
 * expression ships it with the task binary once, the generated code calls a
 * single compiled loop (`topCids`) via a reference object — compact
 * bytecode at any k, still inside whole-stage codegen (no fallback), zero
 * shuffle, no join. Why not broadcast-join + `min_by`: that shuffles one
 * row per corpus point through an aggregation; assignment is a pure per-row
 * computation and should stay a projection.
 *
 * Bit-parity with the literal path (IvfSpec pins it): per cell
 * `d = |p|² − 2·p·c + |c|²` with [[DotProduct]]'s exact summation order
 * (left-to-right over min(len) elements), |c|² folded left-to-right at
 * construction, the same `(pp - (2.0*dot)) + cc` association, double
 * comparison via Spark's SQL ordering (`x == y` first, then
 * `Double.compare` — so -0.0 == 0.0 and NaN sorts last, matching `least`
 * over structs and `array_sort`), and ascending-cid iteration so distance
 * ties keep the lower cid.
 */
case class NearestCells(child: Expression, cids: Seq[Int], cents: Seq[Seq[Double]], n: Int)
  extends UnaryExpression {
  import org.apache.spark.sql.types.IntegerType
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  require(cents.nonEmpty, "nearest_cells needs a non-empty codebook")
  require(cids.length == cents.length,
    s"nearest_cells: ${cids.length} cell ids vs ${cents.length} centroids")
  require(n >= 1, s"nearest_cells needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  @transient private lazy val cidArr: Array[Int] = cids.toArray
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val ccArr: Array[Double] = centArr.map { cv =>
    var s = 0.0; cv.foreach(x => s += x * x); s
  }

  /** Spark SQL double ordering (SQLOrderingUtil): equality first so
    * -0.0 == 0.0, Double.compare for the rest so NaN sorts greatest. */
  private def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** One compiled pass: O(k·dim) distance work into an O(n) sorted
    * insertion buffer — the same selection `array_sort` + `slice` makes,
    * without materializing k structs per row. */
  def topCids(a: ArrayData): ArrayData = {
    val k = centArr.length
    val keep = math.min(n, k)
    val bd = new Array[Double](keep)
    val bc = new Array[Int](keep)
    var filled = 0
    val len = a.numElements()
    var pp = 0.0
    var i = 0
    while (i < len) { val x = a.getDouble(i); pp += x * x; i += 1 }
    var j = 0
    while (j < k) {
      val cv = centArr(j)
      val m = math.min(len, cv.length)
      var dot = 0.0
      i = 0
      while (i < m) { dot += a.getDouble(i) * cv(i); i += 1 }
      val d = pp - 2.0 * dot + ccArr(j)
      if (filled < keep || cmp(d, bd(keep - 1)) < 0) {
        var pos = if (filled < keep) filled else keep - 1
        while (pos > 0 && cmp(d, bd(pos - 1)) < 0) {
          bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); pos -= 1
        }
        bd(pos) = d
        bc(pos) = cidArr(j)
        if (filled < keep) filled += 1
      }
      j += 1
    }
    new GenericArrayData(if (filled == keep) bc else java.util.Arrays.copyOf(bc, filled))
  }

  override protected def nullSafeEval(a: Any): Any = topCids(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the codebook rides as ONE reference object; generated code is a
    // single call, so method size is constant in k
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    defineCodeGen(ctx, ev, a => s"$ref.topCids($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * ADC lookup table for product quantization: the m×ksub table of exact
 * squared-L2 sub-distances from a query vector's m sub-slices to every
 * codeword, flattened sub-major codeword-ascending — the LARGE-codebook
 * face of `Pq`'s per-query LUT (above `Pq.LiteralLutEntries` the literal
 * `array(entry…)` formulation is m×ksub separate expression trees and
 * hits the same Janino method ceiling as the IVF literal codebook; see
 * [[NearestCells]]). The codebooks ride as one constructor artifact and
 * the generated code is a single compiled-loop call.
 *
 * Bit-parity with the literal staging (PqLutProps + PqSpec pin it): per
 * subspace j over the slice `[j·sd, j·sd+sd)` clipped to the vector's
 * length, `qq_j` and the dot fold left-to-right like [[DotProduct]]
 * (min-length semantics), |c|² folded left-to-right at construction, and
 * the same `(qq - (2.0*dot)) + cc` association.
 */
case class PqLut(child: Expression, cents: Seq[Seq[Seq[Double]]], sd: Int)
  extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  require(cents.nonEmpty && cents.forall(_.nonEmpty),
    "pq_lut needs non-empty sub-codebooks")
  require(sd >= 1, s"pq_lut needs sub-dimension >= 1, got $sd")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  @transient private lazy val centArr: Array[Array[Array[Double]]] =
    cents.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val ccArr: Array[Array[Double]] = centArr.map(_.map { cv =>
    var s = 0.0; cv.foreach(x => s += x * x); s
  })

  def lut(a: ArrayData): ArrayData = {
    val qlen = a.numElements()
    val m = centArr.length
    var total = 0
    var j = 0
    while (j < m) { total += centArr(j).length; j += 1 }
    val out = new Array[Double](total)
    var idx = 0
    j = 0
    while (j < m) {
      val base = j * sd
      // the sub-slice clipped to the vector: slice() past the end is empty
      val qjLen = math.max(0, math.min(sd, qlen - base))
      var qq = 0.0
      var i = 0
      while (i < qjLen) { val x = a.getDouble(base + i); qq += x * x; i += 1 }
      val book = centArr(j)
      val ccs = ccArr(j)
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        val n = math.min(qjLen, cv.length)
        var dot = 0.0
        i = 0
        while (i < n) { dot += a.getDouble(base + i) * cv(i); i += 1 }
        out(idx) = qq - 2.0 * dot + ccs(c)
        idx += 1
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = lut(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    defineCodeGen(ctx, ev, a => s"$ref.lut($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  /** Bounded top-k aggregate by (score desc, id asc); O(k) state, map-side
    * partial aggregation. Output array<struct<id,cos>> best-first. */
  def topKByScore(id: Column, score: Column, k: Int): Column =
    ColumnBridge.column(BoundedTopK(ColumnBridge.expr(id), ColumnBridge.expr(score), k)
      .toAggregateExpression())

  /** Codegen'd L2 norm of an array<double> column. */
  def normNative(a: Column): Column =
    ColumnBridge.column(NormL2(ColumnBridge.expr(a)))

  /** Codegen'd Jaccard of two sorted, de-duplicated array<long> columns. */
  def jaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSorted(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  /** Thresholded Jaccard with early abandonment: exact value when it can
    * reach `t`, -1.0 once it provably cannot. Filter with `>= t`. */
  def jaccardSortedAtLeast(a: Column, b: Column, t: Double): Column =
    ColumnBridge.column(JaccardSortedAtLeast(ColumnBridge.expr(a), ColumnBridge.expr(b), t))

  /** Codegen'd portable polynomial string hash. */
  def polyHashNative(s: Column): Column =
    ColumnBridge.column(StringPolyHash(ColumnBridge.expr(s)))

  /** k-minhash signature of a hashed-shingle array, one pass per row. */
  def minhashSignature(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expr(hashes), k))

  /** SimHash signature of a hashed-feature array, one pass per row. */
  def simhashBits(hashes: Column, bits: Int): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expr(hashes), bits))

  /** Word-n-gram shingle hashes straight from text, one pass per row. */
  def wordShingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expr(text), n))

  /** Char-n-gram shingle hashes straight from text, one pass per row. */
  def charShingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(CharShingleHashes(ColumnBridge.expr(text), n))

  /** Word n-gram multiplicity stats [total, distinct, max] per row. */
  def wordGramStats(text: Column, n: Int): Column =
    ColumnBridge.column(WordGramStats(ColumnBridge.expr(text), n))

  /** Elementwise vector-sum aggregate (array<double>); O(dim) state,
    * map-side partial aggregation — centroids without posexplode. */
  def vectorSum(v: Column): Column =
    ColumnBridge.column(VectorSum(ColumnBridge.expr(v)).toAggregateExpression())

  /** Exact per-key counts as one map<int,bigint> aggregate; state is one
    * counter per distinct key — for BOUNDED key spaces (bucket ids). */
  def countByIntKey(k: Column): Column =
    ColumnBridge.column(CountByIntKey(ColumnBridge.expr(k)).toAggregateExpression())

  /** Count–min sketch aggregate over item-hash longs: fixed d×w table,
    * map-side partial aggregation — frequency estimation whose shuffle
    * is one table per partition, never one row per key. */
  def countMin(itemHash: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(CountMinAgg(ColumnBridge.expr(itemHash), depth, width)
      .toAggregateExpression())

    /** O(1) constant string→long table lookup (default for missing keys,
    * NULL in → NULL out; see [[StrataLookup]]). */
  def strataLookup(stratum: Column, table: Map[String, Long], default: Long): Column = {
    val sorted = table.toSeq.sortBy(_._1)
    ColumnBridge.column(StrataLookup(ColumnBridge.expr(stratum),
      sorted.map(_._1), sorted.map(_._2), default))
  }

  /** Flattened m×ksub ADC lookup table of a query vector against PQ
    * sub-codebooks — the beyond-literal LUT face (see [[PqLut]]). */
  def pqLut(vec: Column, books: Seq[Seq[Seq[Double]]], sd: Int): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expr(vec), books, sd))

  /** Top-n nearest centroids of an array<double> vector by squared L2,
    * best-first, ties on the lower cell id — the beyond-literal-codebook
    * assignment face (see [[NearestCells]]). */
  def nearestCells(vec: Column, cent: Seq[(Int, Seq[Double])], n: Int): Column = {
    val sorted = cent.sortBy(_._1)
    ColumnBridge.column(NearestCells(ColumnBridge.expr(vec),
      sorted.map(_._1), sorted.map(_._2), n))
  }

  /** Point query against a count–min sketch column: min over rows of the
    * item's cell — an upper bound on the item's true count. Pure column
    * arithmetic (codegen'd), mirroring [[CountMinUtil.bucket]] — including
    * the leading floorMod reduction into [0, P), so an arbitrary bigint
    * hash (negative, or large enough to overflow the affine multiply)
    * indexes the same cell the aggregate counted it in instead of
    * producing an invalid element_at index. */
  def countMinEstimate(sketch: Column, itemHash: Column,
                       depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val h = pmod(itemHash, lit(PolyHashUtil.P))
    val cells = (0 until depth).map { i =>
      val b = ((h * (2L * i + 1) + (12345L * i + 7)) % PolyHashUtil.P) % width
      element_at(sketch, (b + i.toLong * width).cast("int") + 1)
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }

  /** Winnowing fingerprint selection over a position-ordered k-gram hash
    * array: per window of `w`, the rightmost minimum — one codegen'd
    * O(n) deque pass per row. */
  def winnowSelect(hashes: Column, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expr(hashes), w))

  /** Hyperplane LSH code (Charikar 2002) of an array<double> vector:
    * `bits` sign bits under the seeded portable hyperplane family. */
  def hyperplaneBits(vec: Column, bits: Int, seed: Int): Column =
    ColumnBridge.column(HyperplaneBits(ColumnBridge.expr(vec), bits, seed))

  /** Johnson–Lindenstrauss projection to `outDim` dims under the seeded
    * portable hyperplane family (deterministic, engine-reproducible). */
  def jlProject(vec: Column, outDim: Int, seed: Int): Column =
    ColumnBridge.column(JlProject(ColumnBridge.expr(vec), outDim, seed))

  /** Bloom-filter aggregate over item-hash longs: fixed bit array,
    * OR-mergeable, map-side partial aggregation — the join-pruning
    * membership artifact (no false negatives). */
  def bloomAgg(itemHash: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomAgg(ColumnBridge.expr(itemHash), numBits, numHashes)
      .toAggregateExpression())

  /** Codegen'd membership probe against a [[BloomAgg]] word array. */
  def bloomContains(filter: Column, itemHash: Column, numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expr(filter), ColumnBridge.expr(itemHash), numHashes))

  /** Codegen'd mean unsigned byte of a binary column. */
  def byteMeanNative(b: Column): Column =
    ColumnBridge.column(ByteMean(ColumnBridge.expr(b)))

  /** Codegen'd nearest-neighbor byte resample of a binary column. */
  def byteResize(b: Column, outLen: Column): Column =
    ColumnBridge.column(ByteResize(ColumnBridge.expr(b), ColumnBridge.expr(outLen)))
}
