package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.pipeline.Dedup

/**
 * Randomized brute-fold equivalence for `Dedup.maximalRepeats`: on random
 * small corpora over a 3-token vocabulary (dense with repeats), the
 * operator's output must equal the DEFINITIONAL fold — for every anchor
 * position whose minLen-gram spans >= minDocs distinct docs, the max
 * common extension over ALL other occurrences (the operator only looks at
 * two lexicographic neighbors — the suffix-array LCP property this pins),
 * bounded at maxExtend, then per-doc containment pruning. Maximality is
 * verified by construction: the fold computes the true maximum over every
 * partner.
 */
object MaximalRepeatsProps extends Properties("graft.maximalRepeats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val P = 1000000007L
  private def h(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c) % P)

  private def brute(docs: Seq[(Long, String)], l: Int, e: Int,
                    minDocs: Int): Set[(Long, Long, Long, Long)] = {
    def w(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val toks = docs.map { case (id, t) => id -> w(t) }.toMap
    val occ = toks.toSeq.flatMap { case (id, ws) =>
      if (ws.size < l) Nil
      else (0 to ws.size - l).map(p => (ws.slice(p, p + l).mkString(" "), id, p))
    }
    val byG = occ.groupBy(_._1)
      .filter { case (_, os) => os.map(_._2).distinct.size >= minDocs }
    val spans0 = byG.toSeq.flatMap { case (_, os) =>
      os.map { case (_, id, p) =>
        val ext = toks(id).slice(p + l, p + l + e)
        val ml = os.collect { case (_, id2, p2) if (id2, p2) != (id, p) =>
          val ext2 = toks(id2).slice(p2 + l, p2 + l + e)
          ext.zip(ext2).takeWhile { case (a, b) => a == b }.size
        }.max
        val len = l + ml
        (id, p.toLong, len.toLong, h(toks(id).slice(p, p + len).mkString(" ")))
      }
    }
    spans0.groupBy(_._1).values.flatMap { ss =>
      val sorted = ss.sortBy(s => (s._2, -s._3))
      var maxE = Long.MinValue
      sorted.filter { s =>
        val end = s._2 + s._3
        val keep = end > maxE
        maxE = math.max(maxE, end)
        keep
      }
    }.toSet
  }

  private val word = Gen.oneOf("a", "b", "c")
  private val doc = Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpus: Gen[Seq[(Long, String)]] =
    Gen.choose(2, 6).flatMap(k => Gen.listOfN(k, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  property("operator == definitional max-over-all-partners fold") =
    forAll(corpus, Gen.choose(1, 4)) { (docs, e) =>
      val spark = SparkSpec.session
      import spark.implicits._
      try {
        val got = Dedup.maximalRepeats(docs.toDF("doc_id", "text"),
            "doc_id", "text", minLen = 2, maxExtend = e, minDocs = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        val want = brute(docs, 2, e, 2)
        if (got != want)
          println(s"MISMATCH docs=$docs e=$e\n got=$got\n want=$want")
        got == want
      } finally graft.api.Pinned.release(spark)
    }
}
