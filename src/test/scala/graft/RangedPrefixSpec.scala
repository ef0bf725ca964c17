package graft

import org.apache.spark.sql.functions._

/**
 * The distributed exact per-group prefix (`RangedPrefix`) behind
 * `capTokensPerKey` and `perplexityBuckets`: at shuffle width 1 the
 * machinery degenerates to LITERALLY the old per-group window (one range,
 * offset 0), so width-1 vs width-N equality is the exactness proof — and
 * the null-safe offsets join must keep null groups (a null stratum /
 * language is its own group, exactly as a window partition treats it).
 */
class RangedPrefixSpec extends SparkSpec {
  import spark.implicits._

  private def withWidth[T](n: Int)(body: => T): T = {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("capTokensPerKey: distributed prefix == width-1 window face; null strata/tokens kept") {
    // one dominant stratum (the hot-language regime), a small one, a NULL
    // stratum, and a null token count (rides free by contract)
    val rows = (0 until 300).map(i => (i.toLong, Option("en"), Option((i % 17).toLong))) ++
      (0 until 20).map(i => (1000L + i, Option("fr"), Option((i % 5).toLong))) ++
      (0 until 7).map(i => (2000L + i, Option.empty[String], Option(3L))) ++
      Seq((3000L, Option("en"), Option.empty[Long]))
    val df = rows.toDF("id", "strata", "toks")
    def run(w: Int): Set[Long] = withWidth(w) {
      try graft.pipeline.Sampling.capTokensPerKey(
          df, col("strata"), col("id"), col("toks"), budget = 200L)
        .collect().map(_.getLong(0)).toSet
      finally graft.api.Pinned.release(spark)
    }
    val ref = run(1)
    assert(ref.nonEmpty && ref.size < rows.size, "budget must actually cut")
    assert((2000L until 2007L).forall(ref.contains),
      "the null stratum fits its budget whole and must survive the offsets join")
    assert(run(5) == ref, "width 5 must equal the width-1 window face")
    assert(run(32) == ref, "width 32 must equal the width-1 window face")
  }

  test("runningSum kernel: both faces equal the definitional per-group fold") {
    // the ONE packing kernel (round 15): packChunks / capTokensPerKey /
    // capPerKey all lower through runningSum, chunkSentences through
    // windowedSum — pin the kernel itself against a plain Scala fold,
    // inclusive and exclusive, with a null group and a hot group
    val rows = (0 until 120).map(i => (i.toLong, Option("en"), (i % 7).toLong)) ++
      (0 until 9).map(i => (500L + i, Option("de"), 2L)) ++
      (0 until 5).map(i => (900L + i, Option.empty[String], 1L))
    val df = rows.toDF("id", "g", "v")
    def fold(inclusive: Boolean): Map[Long, Long] =
      rows.groupBy(_._2).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(_._1)
        val csum = sorted.map(_._3).scanLeft(0L)(_ + _)
        sorted.zipWithIndex.map { case (r, i) =>
          r._1 -> (if (inclusive) csum(i + 1) else csum(i))
        }
      }.toMap
    for (inclusive <- Seq(true, false)) {
      val viaRanged =
        try graft.pipeline.RangedPrefix.runningSum(df, Seq("g"), Seq(col("id")),
            col("v"), inclusive, "s")
          .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("s"))).toMap
        finally graft.api.Pinned.release(spark)
      val viaWindow = df.withColumn("s", graft.pipeline.RangedPrefix.windowedSum(
          Seq(col("g")), Seq(col("id")), col("v"), inclusive))
        .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("s"))).toMap
      val want = fold(inclusive)
      assert(viaRanged == want, s"ranged face, inclusive=$inclusive")
      assert(viaWindow == want, s"window face, inclusive=$inclusive")
    }
  }

  test("capPerKey: distributed rank == width-1 window face; null strata and string keys kept") {
    // the round's third RangedPrefix rider — and the one whose integral-id
    // scale face (exactKPerKey) can't cover null keys or string keys, so
    // this width pin is its only hot-stratum exactness evidence
    val rows = (0 until 260).map(i => (s"k$i", Option("en"))) ++
      (0 until 24).map(i => (s"q$i", Option("fr"))) ++
      (0 until 9).map(i => (s"n$i", Option.empty[String]))
    val df = rows.toDF("key", "strata")
    def run(w: Int): Set[String] = withWidth(w) {
      try graft.pipeline.Sampling.capPerKey(df, col("strata"), col("key"), n = 7)
        .collect().map(_.getString(0)).toSet
      finally graft.api.Pinned.release(spark)
    }
    val ref = run(1)
    assert(ref.size == 7 + 7 + 7, "each stratum (null included) keeps exactly n")
    assert(run(5) == ref && run(32) == ref,
      "distributed rank must equal the width-1 window face")
  }

  test("packChunks: distributed prefix == width-1 window face; coarse hot key and null key") {
    // the r13 verdict's last avoidable unbounded-per-key window: one shard
    // key holds nearly the whole corpus (the single-source packing run), a
    // small key, and a NULL key (its own group, as a window treats it)
    val rows = (0 until 280).map(i =>
        (i.toLong, ("tok " * (1 + i % 9)).trim, Option("corpus"))) ++
      (0 until 15).map(i => (1000L + i, "a b c", Option("small"))) ++
      (0 until 6).map(i => (2000L + i, "x y", Option.empty[String]))
    val df = rows.toDF("doc_id", "text", "source")
    def run(w: Int): Set[(Long, Long)] = withWidth(w) {
      try graft.pipeline.TextOps.packChunks(df, "doc_id", "text", "source", budget = 64L)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      finally graft.api.Pinned.release(spark)
    }
    val ref = run(1)
    assert(ref.size == rows.size, "every document gets a chunk")
    assert(ref.filter(_._1 < 1000L).map(_._2).max > 5,
      "the hot key must actually span many chunks")
    assert(ref.filter(t => t._1 >= 2000L).map(_._2) == Set(0L),
      "the null key packs as its own group and must survive the offsets join")
    assert(run(5) == ref, "width 5 must equal the width-1 window face")
    assert(run(32) == ref, "width 32 must equal the width-1 window face")
  }

  test("degenerate inputs: empty frames and single rows survive the machinery") {
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "strata", "toks")
    try {
      assert(graft.pipeline.Sampling.capTokensPerKey(
        empty, col("strata"), col("id"), col("toks"), budget = 10L).count() == 0)
      val one = Seq((1L, "en", 3L)).toDF("id", "strata", "toks")
      assert(graft.pipeline.Sampling.capTokensPerKey(
          one, col("strata"), col("id"), col("toks"), budget = 10L)
        .collect().map(_.getLong(0)).toSeq == Seq(1L))
      // a single row larger than the budget is dropped (fits-alone rule)
      assert(graft.pipeline.Sampling.capTokensPerKey(
        Seq((1L, "en", 99L)).toDF("id", "strata", "toks"),
        col("strata"), col("id"), col("toks"), budget = 10L).count() == 0)
      // bm25Retrieve: empty corpus / empty query table return no rows
      val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
      val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val qs = Seq((1L, "cat")).toDF("q_id", "q_text")
      val noQs = Seq.empty[(Long, String)].toDF("q_id", "q_text")
      assert(graft.pipeline.TextOps.bm25Retrieve(
        noDocs, "doc_id", "text", qs, "q_id", "q_text", k = 3).count() == 0)
      assert(graft.pipeline.TextOps.bm25Retrieve(
        docs, "doc_id", "text", noQs, "q_id", "q_text", k = 3).count() == 0)
      assert(graft.pipeline.TextOps.bm25Retrieve(
          docs, "doc_id", "text", qs, "q_id", "q_text", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ==
        Seq((1L, 1L, 1L)))
    } finally graft.api.Pinned.release(spark)
  }

  test("perplexityBuckets: null-language group tiles on its own and survives") {
    val texts = Seq(
      "the cat sat on the mat", "the cat sat on the rug",
      "the dog sat on the mat", "a dog ran over the hill",
      "the cat ran over the hill", "a cat sat on a mat",
      "the dog ran over a hill", "a dog sat on the rug",
      "the cat sat on a hill", "a dog ran on the mat")
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, Option("en")) } ++
      texts.zipWithIndex.map { case (t, i) => (100L + i, t + " bis", Option.empty[String]) }
    val df = rows.toDF("doc_id", "text", "lang")
    def run(w: Int) = withWidth(w) {
      try graft.pipeline.TextOps.perplexityBuckets(df, "doc_id", "text", "lang")
        .collect().map(r => r.toSeq.toList).toSet
      finally graft.api.Pinned.release(spark)
    }
    val ref = run(1)
    val nullLang = ref.filter(_(1) == null)
    assert(nullLang.size == 10, "null-language rows must survive the offsets join")
    val tiles = nullLang.toSeq.groupBy(_(4)).view.mapValues(_.size).toMap
    assert(tiles == Map(1 -> 4, 2 -> 3, 3 -> 3),
      s"null language tiles as its own equal-depth group: $tiles")
    assert(run(17) == ref, "width 17 must equal the width-1 window face")
  }
}
