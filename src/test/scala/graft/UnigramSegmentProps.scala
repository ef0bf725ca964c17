package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.UnigramSegment

/** The native UnigramSegment expression against the definitional fold
  * (the CLAUDE invariant: custom expressions carry a ScalaCheck property
  * vs the definition in plain Scala): random texts — including astral
  * code points, which must count as ONE position like Spark/DuckDB
  * substring semantics — random vocabularies, random maxPieceLen. */
object UnigramSegmentProps extends Properties("UnigramSegment") {

  /** Plain-Scala reference: Java-\s word scan + probability-space DP
    * (ascending-l >= fold, longer piece wins ties, unknown single code
    * points at 1e-100), on CODE POINTS. */
  private def refSegmentText(text: String, probs: Map[String, Double],
                             maxL: Int): Seq[String] = {
    def isWs(cp: Int) = cp == ' ' || cp == '\t' || cp == '\n' ||
      cp == '\u000B' || cp == '\f' || cp == '\r'
    val cps = text.codePoints().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < cps.length) {
      while (i < cps.length && isWs(cps(i))) i += 1
      var j = i
      while (j < cps.length && !isWs(cps(j))) j += 1
      if (j > i) {
        val n = j - i
        val dp = new Array[Double](n + 1); val bl = new Array[Int](n + 1)
        dp(0) = 1.0
        for (k <- 1 to n) {
          var bs = -1.0; var bb = 0
          for (l <- 1 to math.min(maxL, k)) {
            val piece = new String(cps, i + k - l, l)
            val p = probs.getOrElse(piece, if (l == 1) 1e-100 else 0.0)
            val cand = dp(k - l) * p
            if (cand >= bs) { bs = cand; bb = l }
          }
          dp(k) = bs; bl(k) = bb
        }
        var pos = n
        val ps = scala.collection.mutable.ArrayBuffer.empty[String]
        while (pos > 0) { ps += new String(cps, i + pos - bl(pos), bl(pos)); pos -= bl(pos) }
        out ++= ps.reverse
      }
      i = j
    }
    out.toSeq
  }

  // alphabet mixes BMP letters, a CJK char, an ASTRAL char (one code
  // point, two UTF-16 units) and every \s class member
  private val alpha: Gen[String] = Gen.oneOf(
    "a", "b", "c", "ka", "to", "中", new String(Character.toChars(0x1F600)))
  private val ws: Gen[String] = Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  ")
  private val textGen: Gen[String] = Gen.listOfN(12,
    Gen.frequency(4 -> alpha, 1 -> ws)).map(_.mkString)

  private val vocabGen: Gen[Map[String, Double]] = for {
    n <- Gen.choose(1, 12)
    pieces <- Gen.listOfN(n, Gen.listOfN(2, alpha).map(_.mkString.take(3)))
    counts <- Gen.listOfN(n, Gen.choose(1L, 50L))
  } yield {
    val total = counts.sum.toDouble
    pieces.zip(counts.map(_ / total)).toMap
  }

  property("expression eval == definitional fold (incl. astral code points)") =
    forAll(textGen, vocabGen, Gen.choose(1, 4)) { (text, probs, maxL) =>
      val ks = probs.keys.toSeq.sorted
      val e = UnigramSegment(Literal(UTF8String.fromString(text),
        org.apache.spark.sql.types.StringType), ks, ks.map(probs), maxL)
      val got = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[UTF8String].toString).toSeq
      val want = refSegmentText(text, probs, maxL)
      val rebuild = got.mkString == text.split("\\s+").filter(_.nonEmpty).mkString
      (got == want) && rebuild
    }

  /** Plain-Scala LOG-space reference: sums instead of products, −1000.0
    * for unknown single code points, −1e18 for unknown longer pieces. */
  private def refSegmentTextLog(text: String, lps: Map[String, Double],
                                maxL: Int): Seq[String] = {
    def isWs(cp: Int) = cp == ' ' || cp == '\t' || cp == '\n' ||
      cp == '\u000B' || cp == '\f' || cp == '\r'
    val cps = text.codePoints().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < cps.length) {
      while (i < cps.length && isWs(cps(i))) i += 1
      var j = i
      while (j < cps.length && !isWs(cps(j))) j += 1
      if (j > i) {
        val n = j - i
        val dp = new Array[Double](n + 1); val bl = new Array[Int](n + 1)
        dp(0) = 0.0
        for (k <- 1 to n) {
          var bs = Double.NegativeInfinity; var bb = 0
          for (l <- 1 to math.min(maxL, k)) {
            val piece = new String(cps, i + k - l, l)
            val p = lps.getOrElse(piece, if (l == 1) -1000.0 else -1e18)
            val cand = dp(k - l) + p
            if (cand >= bs) { bs = cand; bb = l }
          }
          dp(k) = bs; bl(k) = bb
        }
        var pos = n
        val ps = scala.collection.mutable.ArrayBuffer.empty[String]
        while (pos > 0) { ps += new String(cps, i + pos - bl(pos), bl(pos)); pos -= bl(pos) }
        out ++= ps.reverse
      }
      i = j
    }
    out.toSeq
  }

  private val lpVocabGen: Gen[Map[String, Double]] = for {
    n <- Gen.choose(1, 12)
    pieces <- Gen.listOfN(n, Gen.listOfN(2, alpha).map(_.mkString.take(3)))
    lps <- Gen.listOfN(n, Gen.choose(-20.0, -0.001))
  } yield pieces.zip(lps).toMap

  property("log-space eval == definitional log fold (the SP-vocab face)") =
    forAll(textGen, lpVocabGen, Gen.choose(1, 4)) { (text, lps, maxL) =>
      val ks = lps.keys.toSeq.sorted
      val e = UnigramSegment(Literal(UTF8String.fromString(text),
        org.apache.spark.sql.types.StringType), ks, ks.map(lps), maxL,
        logSpace = true)
      val got = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[UTF8String].toString).toSeq
      val want = refSegmentTextLog(text, lps, maxL)
      val rebuild = got.mkString == text.split("\\s+").filter(_.nonEmpty).mkString
      (got == want) && rebuild
    }
}
