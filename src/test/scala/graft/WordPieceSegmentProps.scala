package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.WordPieceSegment

/** The native WordPieceSegment expression against the definitional
  * greedy fold (the CLAUDE invariant: custom expressions carry a
  * ScalaCheck property vs the definition in plain Scala): random texts
  * — including astral code points, which must count as ONE position
  * like Spark/DuckDB substring semantics — random vocabularies, random
  * maxPieceLen/maxInputChars. */
object WordPieceSegmentProps extends Properties("WordPieceSegment") {

  /** Plain-Scala reference: Java-\s word scan + greedy
    * longest-match-first (word-initial candidates verbatim,
    * word-internal `##`-prefixed; no hit or an over-maxInputChars word
    * collapses the WHOLE word to unk), on CODE POINTS. */
  private def refSegmentText(text: String, vocab: Set[String], unk: String,
                             maxL: Int, maxChars: Int): Seq[String] = {
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
        if (j - i > maxChars) out += unk
        else {
          val word = scala.collection.mutable.ArrayBuffer.empty[String]
          var pos = i
          var bad = false
          while (pos < j && !bad) {
            val hit = (math.min(maxL, j - pos) to 1 by -1).iterator.map { l =>
              val content = new String(cps, pos, l)
              (l, if (pos == i) content else "##" + content)
            }.find { case (_, cand) => vocab.contains(cand) }
            hit match {
              case Some((l, cand)) => word += cand; pos += l
              case None => bad = true
            }
          }
          if (bad) out += unk else out ++= word
        }
      }
      i = j
    }
    out.toSeq
  }

  // alphabet mixes BMP letters, a CJK char, an ASTRAL char (one code
  // point, two UTF-16 units) and every \s class member
  private val astral = new String(Character.toChars(0x1F600))
  private val alpha: Gen[String] = Gen.oneOf("a", "b", "c", "中", astral)
  private val ws: Gen[String] = Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  ")
  private val textGen: Gen[String] = Gen.listOfN(12,
    Gen.frequency(4 -> alpha, 1 -> ws)).map(_.mkString)

  // vocab pieces: short sequences over the same alphabet, half of them
  // marked as ## continuations; single chars included with enough
  // frequency that both matched and unk paths get exercised
  private val vocabGen: Gen[Set[String]] = for {
    n <- Gen.choose(1, 14)
    pieces <- Gen.listOfN(n, for {
      k <- Gen.choose(1, 3)
      cs <- Gen.listOfN(k, alpha)
      cont <- Gen.oneOf(true, false)
    } yield (if (cont) "##" else "") + cs.mkString)
  } yield pieces.toSet

  property("expression eval == definitional greedy fold (incl. astral)") =
    forAll(textGen, vocabGen, Gen.choose(1, 6), Gen.choose(1, 12)) {
      (text, vocab, maxL, maxChars) =>
        val e = WordPieceSegment(Literal(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType),
          vocab.toSeq.sorted, "[UNK]", maxL, maxChars)
        val got = e.eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[UTF8String].toString).toSeq
        val want = refSegmentText(text, vocab, "[UNK]", maxL, maxChars)
        got == want
    }

  property("full-alphabet vocab rebuilds text (no unk, pieces concat back)") =
    forAll(textGen) { text =>
      // every single char (bare + ##) in vocab -> greedy always succeeds
      val cps = text.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))
      val chars = cps.filterNot(c => c.exists(_.isWhitespace)).toSet
      val vocab = chars ++ chars.map("##" + _)
      if (vocab.isEmpty) true
      else {
        val e = WordPieceSegment(Literal(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType),
          vocab.toSeq.sorted, "[UNK]", 3, 1000)
        val got = e.eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.asInstanceOf[UTF8String].toString).toSeq
        val rebuild = got.map(p => if (p.startsWith("##")) p.substring(2) else p).mkString
        rebuild == text.split("\\s+").filter(_.nonEmpty).mkString
      }
    }
}
