package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/** Distributed vocabulary ranking across MULTIPLE range buckets — the
  * regression net for the one-pinned-bucketing invariant: RangePartitioner
  * boundary sampling is seeded per-physical-plan, so if the range exchange
  * were re-derived by the sizes pass and the id-assignment pass (as an
  * unpinned plan would), words past bucket 0 would get duplicate/gapped
  * ids. The q_encode oracle cannot see this (maxSize=20 lives in bucket 0);
  * this spec spans every bucket. */
class VocabSpec extends SparkSpec {

  private def corpus(nWords: Int) = {
    import spark.implicits._
    // word w_i appears (i % 13) + 1 times -> many count ties, so the
    // (count desc, word asc) tiebreak is exercised across bucket borders
    (0 until nWords).flatMap { i =>
      val w = f"w$i%05d"
      Seq.fill(i % 13 + 1)(w)
    }.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("vocab ids are the exact global (count desc, word) ranks across >1 bucket") {
    val nWords = 5000
    val docs = corpus(nWords)
    // defaultParallelism=4 in specs -> 4 range buckets; maxSize=4000 spans
    // every bucket, so any offset/bucketing disagreement corrupts the tail
    val vocab = TextOps.buildVocab(docs, "text", minCount = 1L, maxSize = 4000)
    val got = vocab.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = (0 until nWords).map(i => (f"w$i%05d", (i % 13 + 1).toLong))
      .sortBy { case (w, c) => (-c, w) }
      .take(4000).zipWithIndex
      .map { case ((w, c), id) => (w, c, id.toLong) }
    assert(got.length == 4000)
    assert(got.sortBy(_._3).toSeq == expect,
      "every id equals the global (count desc, word asc) rank")
  }

  test("vocab ids are contiguous and stable across repeated collects") {
    val docs = corpus(3000)
    val vocab = TextOps.buildVocab(docs, "text", minCount = 2L, maxSize = 2500)
    val first = vocab.collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_._2)
    val second = vocab.collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_._2)
    assert(first.map(_._2).toSeq == (0L until first.length).toSeq,
      "ids are contiguous 0..n-1")
    assert(first.toSeq == second.toSeq,
      "re-reading the vocab frame yields the identical ranking (pinned, not re-derived)")
  }

  test("buildVocab releases corpus-sized intermediates; VocabRelease frees the result") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val vocab = TextOps.buildVocab(corpus(1000), "text", minCount = 1L, maxSize = 500)
    assert(vocab.count() == 500)
    val pinnedAfter = sc.getPersistentRDDs.keySet.toSet.diff(before)
    // only the driver-sized result stays pinned (counted + bucketed are
    // unpersisted before buildVocab returns); async unpersist may briefly
    // leave entries, so poll
    def livePinned() = sc.getPersistentRDDs.keySet.toSet.diff(before)
    val deadline = System.nanoTime() + 10e9.toLong
    while (livePinned().size > 1 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(livePinned().size <= 1, s"corpus-sized intermediates released, got ${livePinned()}")
    graft.api.Pinned.release(spark)
    while (livePinned().nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(livePinned().isEmpty, "release() drops the pinned vocab result")
  }

  test("BPE training matches the reference algorithm on a hand corpus") {
    import spark.implicits._
    // Sennrich-style toy: 'lo' dominates (low x3, lower x2, lowest x1);
    // hand-run: counts l·o=6, o·w=6, then w·e=3, ... ties lexicographic
    val docs = Seq("low low low lower lower lowest").toDF("text")
    val merges = TextOps.trainBpeMerges(docs, "text", numMerges = 3)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    // round 1: pairs l·o (6), o·w (6) tie -> lexicographic picks (l, o)
    // round 2: lo·w (6) wins
    // round 3: low·e (3) wins (e·r 2, e·s 1, s·t 1, ...)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")), merges.toString)

    // greedy left-to-right non-overlap: merge (a, a) on "aaaa" -> [aa, aa],
    // on "aaa" -> [aa, a]
    val m = Seq((1, "a", "a")).toDF("merge_rank", "lhs", "rhs")
    val toks = TextOps.bpeTokenize(Seq((1L, "aaaa aaa")).toDF("doc_id", "text"),
      "doc_id", "text", m).collect().head
    assert(toks.getLong(1) == 4L, s"aaaa -> 2 tokens, aaa -> 2 tokens: ${toks.getLong(1)}")
    val refHash = "aa aa aa a".foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    assert(toks.getLong(2) == refHash, "token-sequence hash matches the definitional fold")

    // merge exhaustion: single-letter vocabulary runs out of pairs early
    val few = TextOps.trainBpeMerges(Seq("a b a b ab").toDF("text"), "text", 10)
    assert(few.count() <= 2, "training stops when no adjacent pairs remain")
  }

  test("BPE training equals a plain-Scala reference on seeded random corpora") {
    import spark.implicits._
    // reference implementation of the algorithm, independent of Spark:
    // word-frequency dict, overlap-counted pair statistics, argmax with
    // lexicographic ties, greedy left-to-right merge application
    def refBpe(words: Seq[String], rounds: Int): Seq[(String, String)] = {
      var vocab: Map[List[String], Long] = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap.map { case (w, c) => (w.toList.map(_.toString), c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (out.size < rounds && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- vocab; p <- syms.zip(syms.tail))
          counts(p) = counts.getOrElse(p, 0L) + c
        if (counts.isEmpty) done = true
        else {
          val (a, b) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }._1
          out += ((a, b))
          def merge(syms: List[String]): List[String] = syms match {
            case `a` :: `b` :: rest => (a + b) :: merge(rest)
            case s :: rest => s :: merge(rest)
            case Nil => Nil
          }
          vocab = vocab.groupBy { case (syms, _) => merge(syms) }.view
            .mapValues(_.values.sum).toMap
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(29)
    val alphabet = "abcde"
    for (trial <- 0 until 5) {
      val words = Seq.fill(60)(
        Seq.fill(1 + rnd.nextInt(5))(alphabet(rnd.nextInt(alphabet.size))).mkString)
      val docs = words.grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
      val got = TextOps.trainBpeMerges(docs, "text", numMerges = 4)
        .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
      assert(got == refBpe(words, 4), s"trial $trial")
    }
  }

  test("BPE vocabulary re-materialization is invisible to the learned merges") {
    import spark.implicits._
    // the remat path (chain folded into the data + one-symbol words
    // pruned every rematEvery rounds) must learn the EXACT same merge
    // table as the never-remat run; rematEvery=2 forces five
    // re-materializations inside a 12-merge run
    val rnd = new scala.util.Random(41)
    val words = Seq.fill(80)(
      Seq.fill(2 + rnd.nextInt(5))("abcd"(rnd.nextInt(4))).mkString)
    val docs = words.grouped(8).map(_.mkString(" ")).toSeq.toDF("text")
    def train(): Seq[(String, String)] =
      TextOps.trainBpeMerges(docs, "text", numMerges = 12)
        .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val plain = train()
    spark.conf.set("graft.bpe.rematEvery", "2")
    val remat = try train() finally spark.conf.unset("graft.bpe.rematEvery")
    assert(remat == plain, "re-materialized run must learn identical merges")
    // and no working-set cache leaks past the trainer
    assert(remat.size == 12)
    val bad = intercept[IllegalArgumentException] {
      spark.conf.set("graft.bpe.rematEvery", "often")
      try train() finally spark.conf.unset("graft.bpe.rematEvery")
    }
    assert(bad.getMessage.contains("graft.bpe.rematEvery"))
  }
}
