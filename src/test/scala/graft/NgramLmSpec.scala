package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.TextOps

/** Order-n interpolated LM (`ngramLmScore` / `ngramLmScoreAgainst` /
  * `lm3ScoreAgainst`): order-n scores pinned to an independent Scala fold
  * over the definition, order-3 parity with the shipped trigram face,
  * streaming == batch on the against face, lambda-default contracts. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "a b a b c a b"), (1L, "a b a b a"), (2L, "c c c c d c"),
    (3L, "x y z"), (4L, ""), (5L, "a b c a b c a b c"))

  /** The order-n definition folded in plain Scala (no Spark, no SQL):
    * counts per order from their own j-gram populations, JM interpolation
    * highest order first, add-alpha with V = distinct unigrams. */
  private def reference(order: Int, alpha: Double, l: Seq[Double],
                        train: Seq[(Long, String)], score: Seq[(Long, String)],
                        minCount: Long = 1L)
      : Map[Long, (Long, Option[Double])] = {
    def w(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    val trainDocs = train.map { case (_, t) => w(t) }
    def gramsOf(ws: Seq[String], j: Int): Seq[Seq[String]] =
      if (ws.size < j) Nil else ws.sliding(j).toSeq
    val counts: Map[Int, Map[Seq[String], Long]] = (1 to order).map { j =>
      val raw = trainDocs.flatMap(gramsOf(_, j)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      j -> (if (j >= 2 && minCount > 1) raw.filter(_._2 >= minCount) else raw)
    }.toMap
    val ctxs: Map[Int, Map[Seq[String], Long]] = (2 to order).map { j =>
      j -> counts(j).toSeq.groupBy(_._1.dropRight(1))
        .view.mapValues(_.map(_._2).sum).toMap
    }.toMap
    val n = counts(1).values.sum.toDouble
    val v = counts(1).size.toDouble
    score.map { case (id, t) =>
      val ws = w(t)
      val pos = gramsOf(ws, order)
      if (pos.isEmpty) id -> (0L, None)
      else {
        val lps = pos.map { g =>
          math.log((order to 1 by -1).zip(l).map { case (j, wj) =>
            val gram = g.takeRight(j)
            val c = counts(j).getOrElse(gram, 0L).toDouble
            val cx = if (j >= 2) ctxs(j).getOrElse(gram.dropRight(1), 0L).toDouble else n
            wj * (c + alpha) / (cx + v * alpha)
          }.sum)
        }
        val avg = BigDecimal(lps.sum / lps.size)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        id -> (pos.size.toLong, Some(avg))
      }
    }.toMap
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Option[Double])] =
    df.collect().map { r =>
      r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toMap

  test("ngramLmScore equals the independent fold at orders 2, 4 and 5") {
    for ((order, alpha, l) <- Seq(
        (2, 0.5, Seq(0.7, 0.3)),
        (4, 0.5, Seq(0.4, 0.3, 0.2, 0.1)),
        (5, 1.0, Seq(0.4, 0.25, 0.15, 0.12, 0.08)))) {
      val got = rowsOf(TextOps.ngramLmScore(
        corpus.toDF("doc_id", "text"), "doc_id", "text", order, alpha, l))
      assert(got == reference(order, alpha, l, corpus, corpus),
        s"order=$order alpha=$alpha")
      graft.api.Pinned.release(spark)
    }
  }

  test("order 3 is the shipped trigram face (same scores, n column renamed)") {
    try {
      val tri = rowsOf(TextOps.trigramLmScore(
        corpus.toDF("doc_id", "text"), "doc_id", "text"))
      val gen = TextOps.ngramLmScore(
        corpus.toDF("doc_id", "text"), "doc_id", "text", 3, 0.5,
        Seq(0.6, 0.3, 0.1))
      assert(gen.columns.toSeq == Seq("doc_id", "n_grams", "avg_logprob"))
      assert(rowsOf(gen) == tri)
      // self-referenced against face reproduces the self-scoring result
      // (every context seen -> the left-join backoff never fires)
      val agn = TextOps.lm3ScoreAgainst(
        MStream(corpus.toDF("doc_id", "text")), corpus.toDF("doc_id", "text"),
        "doc_id", "text", "text")
      assert(agn.df.columns.toSeq == Seq("doc_id", "n_tris", "avg_logprob"))
      assert(rowsOf(agn.df) == tri)
    } finally graft.api.Pinned.release(spark)
  }

  test("lambda contracts: halving default sums to 1; partial/invalid rejected") {
    assert(TextOps.lambdasFor(3, Nil) == Seq(4.0 / 7, 2.0 / 7, 1.0 / 7))
    assert(math.abs(TextOps.lambdasFor(5, Nil).sum - 1.0) < 1e-12)
    val wrongLen = intercept[IllegalArgumentException](
      TextOps.lambdasFor(4, Seq(0.5, 0.5)))
    assert(wrongLen.getMessage.contains("4 lambdas"))
    val badSum = intercept[IllegalArgumentException](
      TextOps.lambdasFor(2, Seq(0.9, 0.3)))
    assert(badSum.getMessage.contains("sum to 1"))
    val badOrder = intercept[IllegalArgumentException](TextOps.ngramLmScore(
      corpus.toDF("doc_id", "text"), "doc_id", "text", 1))
    assert(badOrder.getMessage.contains("[2, 8]"))
  }

  test("ngramLmScoreAgainst: unseen backoff matches the fold; streaming == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val ref = corpus.toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b a b c a"),                  // contexts seen in ref
      (11L, "q r s t u v w"),                // everything unseen -> floor
      (12L, "a b"))                          // under order tokens -> (0, NULL)
    val order = 3
    val l = Seq(0.6, 0.3, 0.1)
    try {
      val batch = TextOps.ngramLmScoreAgainst(
        MStream(docs.toDF("doc_id", "text")), ref, "doc_id", "text", "text",
        order, 0.5, l)
      assert(!batch.df.isStreaming)
      assert(batch.df.columns.toSeq == Seq("doc_id", "n_grams", "avg_logprob"))
      val b = rowsOf(batch.df)
      assert(b == reference(order, 0.5, l, corpus, docs),
        "against face equals the fold trained on ref, scored on docs")
      assert(b(12L) == (0L, None), "short doc scores (0, NULL)")
      assert(b(11L)._2.get < b(10L)._2.get,
        "in-distribution text scores above gibberish")

      val in = MemoryStream[(Long, String)]
      val out = TextOps.ngramLmScoreAgainst(
        MStream(in.toDF().toDF("doc_id", "text")), ref, "doc_id", "text", "text",
        order, 0.5, l)
      assert(out.df.isStreaming)
      in.addData(docs.take(2): _*)
      in.addData(docs.drop(2): _*)
      val name = s"ngram_${System.nanoTime()}"
      val q = out.df.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        assert(q.lastProgress == null ||
          q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
          "ingest scoring is stateless: no state rows accumulate")
        assert(rowsOf(spark.table(name)) == b,
          "streaming scoring equals the batch face")
      } finally q.stop()
    } finally graft.api.Pinned.release(spark)
  }

  test("minCount pruning scores pruned grams as unseen; broadcastModel=false identical") {
    val ref = corpus.toDF("doc_id", "text")
    val docs = Seq((20L, "a b a b c a"), (21L, "c c c c d"), (22L, "x y z w"))
    try {
      val pruned = rowsOf(TextOps.ngramLmScoreAgainst(
        MStream(docs.toDF("doc_id", "text")), ref, "doc_id", "text", "text",
        order = 3, alpha = 0.5, lambdas = Seq(0.6, 0.3, 0.1),
        minCount = 2L).df)
      assert(pruned == reference(3, 0.5, Seq(0.6, 0.3, 0.1), corpus, docs,
        minCount = 2L), "pruned model equals the fold with counts >= 2")
      val unpruned = rowsOf(TextOps.ngramLmScoreAgainst(
        MStream(docs.toDF("doc_id", "text")), ref, "doc_id", "text", "text",
        order = 3, alpha = 0.5, lambdas = Seq(0.6, 0.3, 0.1)).df)
      assert(pruned != unpruned, "pruning must actually change rare-gram scores")
      val shuffled = rowsOf(TextOps.ngramLmScoreAgainst(
        MStream(docs.toDF("doc_id", "text")), ref, "doc_id", "text", "text",
        order = 3, alpha = 0.5, lambdas = Seq(0.6, 0.3, 0.1),
        minCount = 2L, broadcastModel = Some(false)).df)
      assert(shuffled == pruned, "the beyond-broadcast face is score-identical")
    } finally graft.api.Pinned.release(spark)
  }

  test("awaitPinned registers completed siblings even when one pin fails") {
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    // one future pins a real frame, the other fails: the completed pin's
    // ids must land in the registry (so release can unpersist them) and
    // the failure must still propagate
    val good = Future {
      val (cp, ids) = graft.api.Pinned.checkpointTracked(
        spark.range(100).toDF("id"))
      (cp, ids)
    }
    val bad = Future[(org.apache.spark.sql.DataFrame, Set[Int])] {
      throw new RuntimeException("count-table build failed")
    }
    val before = graft.api.Pinned.registered(spark)
    val e = intercept[RuntimeException](
      TextOps.awaitPinned(spark, Seq(good, bad))(_._2))
    assert(e.getMessage.contains("count-table build failed"))
    val after = graft.api.Pinned.registered(spark)
    assert((after -- before).nonEmpty,
      "the completed sibling's checkpoint ids must be registered on failure")
    graft.api.Pinned.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.keySet.intersect(after -- before).isEmpty,
      "release reclaims the sibling's blocks — zero leaked")
  }
}
