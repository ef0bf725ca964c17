package graft

import graft.pipeline.TextOps

/** Winnowing fingerprints (`TextOps.winnowFingerprints`): the paper's
  * guarantee — documents sharing a run of >= w+n-1 words share a
  * fingerprint hash — on seeded random corpora with planted spans, the
  * 2/(w+1) density regime, and the short-document single-window rule. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
  private def sent(k: Int): String =
    Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] =
    TextOps.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, w = 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap

  test("a shared run of >= w+n-1 words always yields a shared fingerprint") {
    // n=3, w=4: guarantee threshold is 6 shared words
    val span = sent(6)
    for (trial <- 0 until 20) {
      val a = s"${sent(10 + rnd.nextInt(10))} $span ${sent(10 + rnd.nextInt(10))}"
      val b = s"${sent(10 + rnd.nextInt(10))} $span ${sent(10 + rnd.nextInt(10))}"
      val f = fps(Seq((1L, a), (2L, b)))
      assert((f(1L) & f(2L)).nonEmpty,
        s"trial $trial: planted 6-word span must share a fingerprint")
    }
  }

  test("fingerprint density sits in the 2/(w+1) regime, far below one per gram") {
    val doc = sent(2000)
    val nGrams = 2000 - 2
    val k = fps(Seq((1L, doc)))(1L).size
    // selected POSITIONS per gram ~ 2/(w+1) = 0.4; distinct hashes can
    // only be fewer. Bound generously both ways against flakiness.
    assert(k > nGrams / 10 && k < nGrams * 6 / 10,
      s"density $k/$nGrams outside the winnowing regime")
  }

  test("short documents winnow as a single window; sub-n docs emit nothing") {
    val f = TextOps.winnowFingerprints(
      Seq((1L, "alpha beta gamma"),   // one 3-gram -> one fingerprint
          (2L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text", 3, 4)
      .collect()
    assert(f.length == 1 && f.head.getLong(0) == 1L && f.head.getInt(1) == 0)
  }

  test("overlap pairs surface planted spans and the boilerplate cap holds") {
    val span = sent(12)
    val docs = Seq(
      (1L, s"${sent(15)} $span ${sent(15)}"),
      (2L, s"${sent(15)} $span ${sent(15)}"),
      (3L, sent(30)), (4L, sent(30)))
    val pairs = TextOps.winnowOverlapPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, w = 4, minShared = 2, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2L),
      s"the planted 12-word span must pair 1-2: ${pairs.toSeq}")
    // a fingerprint hotter than maxBucket never pairs: every doc shares
    // the same boilerplate sentence, cap 2 kills its bucket
    val boiler = span
    val many = (1L to 6L).map(i => (i, s"$boiler ${sent(1)}"))
    val capped = TextOps.winnowOverlapPairs(many.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, w = 4, minShared = 1, maxBucket = 2)
      .collect()
    assert(capped.isEmpty, "fingerprints hotter than maxBucket must not pair")
  }

  test("identical documents produce identical (pos, fp) sets at any partitioning") {
    val doc = sent(300)
    val df = Seq((1L, doc), (2L, doc)).toDF("doc_id", "text")
    val rows = TextOps.winnowFingerprints(df.repartition(13), "doc_id", "text", 3, 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet).toMap
    assert(rows(1L) == rows(2L) && rows(1L).nonEmpty)
  }
}
