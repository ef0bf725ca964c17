package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.{Dedup, TextOps}

/**
 * Repeated-passage (exact substring, token-k-gram) dedup:
 * `Dedup.repeatedSpans` island assembly and `Dedup.scrubRepeatedSpans`
 * accounting on a hand-computed corpus — adjacent duplicated grams merge
 * into ONE maximal span, disjoint runs stay separate spans, docs shorter
 * than k are untouched, and the scrub drops exactly the covered tokens.
 */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // k=3, minDocs=2. Shared 3-grams: "a b c" (d1@1, d2@1, d4@0, d8@0) and
  // "b c d" (d1@2, d2@2, d8@8). Everything else is unique to its doc.
  private def corpus = Seq(
    (1L, "x a b c d y"),             // island {1,2} -> span (1, 4)
    (2L, "z a b c d w"),             // island {1,2} -> span (1, 4)
    (3L, "q r s"),                   // no repeated grams
    (4L, "a b c"),                   // exactly one gram, repeated -> (0, 3)
    (5L, "ab"),                      // shorter than k: no grams at all
    (8L, "a b c m n o p q b c d")    // TWO islands: (0, 3) and (8, 3)
  ).toDF("doc_id", "text")

  test("repeatedSpans merges adjacent duplicated grams into maximal spans") {
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", k = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (4L, 0L, 3L), (8L, 0L, 3L), (8L, 8L, 3L)))
  }

  test("scrubRepeatedSpans drops exactly the covered tokens and hashes the rest") {
    val got = Dedup.scrubRepeatedSpans(corpus, "doc_id", "text", k = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    def h(s: String): Long =
      corpus.sparkSession.range(1).select(TextOps.polyHash(lit(s)))
        .collect().head.getLong(0)
    assert(got(1L) == (2L, h("x y")), "d1 keeps the tokens outside its span")
    assert(got(2L) == (2L, h("z w")))
    assert(got(3L) == (3L, h("q r s")), "a doc with no spans keeps everything")
    assert(got(4L) == (0L, h("")), "a fully-covered doc keeps nothing")
    assert(got(5L) == (1L, h("ab")), "a doc shorter than k keeps everything")
    assert(got(8L) == (5L, h("m n o p q")), "both islands are scrubbed")
  }

  test("excludeCanonical drops each gram's minimum-doc occurrence (keep-one)") {
    // min doc for both shared grams is d1 -> d1 reports NO spans; everyone
    // else is unchanged (they are never the canonical occurrence)
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", k = 3, minDocs = 2,
        excludeCanonical = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (2L, 1L, 4L), (4L, 0L, 3L), (8L, 0L, 3L), (8L, 8L, 3L)))
  }

  test("keepCanonical scrub leaves exactly one copy of each passage") {
    val got = Dedup.scrubRepeatedSpans(corpus, "doc_id", "text", k = 3, minDocs = 2,
        keepCanonical = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 6L, "the canonical doc keeps its full text")
    assert(got(2L) == 2L, "non-canonical copies are still scrubbed")
    assert(got(4L) == 0L)
    assert(got(8L) == 5L)
  }

  test("scrubKnownSpans: streaming output equals the batch branch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // ref corpus: "a b c d" -> 3-grams "a b c", "b c d" are boilerplate
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val arriving = Seq(
      (1L, "x a b c d y"),  // interior span scrubbed -> "x y"
      (2L, "q r s"),        // no boilerplate -> untouched
      (3L, "b c d"),        // fully covered -> ""
      (4L, "ab"))           // under k tokens -> untouched
    def expect(rows: Seq[(Long, String, Long)]): Unit =
      assert(rows.toSet == Set(
        (1L, "x y", 2L), (2L, "q r s", 3L), (3L, "", 0L), (4L, "ab", 1L)))

    val batch = Dedup.scrubKnownSpans(
        new MStream(arriving.toDF("doc_id", "text"), Seq("doc_id")),
        "doc_id", "text", ref, "text", k = 3)
    assert(!batch.df.isStreaming)
    expect(batch.df.select("doc_id", "scrubbed", "n_kept")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2))))

    val in = MemoryStream[(Long, String)]
    val stream = Dedup.scrubKnownSpans(
        new MStream(in.toDF().toDF("doc_id", "text"), Seq("doc_id")),
        "doc_id", "text", ref, "text", k = 3)
    assert(stream.df.isStreaming)
    val name = s"sks_${System.nanoTime()}"
    val q = stream.df.select("doc_id", "scrubbed", "n_kept")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(arriving.take(2): _*)
      in.addData(arriving.drop(2): _*)
      q.processAllAvailable()
      expect(spark.table(name).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
    } finally q.stop()
  }

  test("scrubDuplicateLines: first occurrence wins, short lines exempt, order kept") {
    val docs = Seq(
      (1L, "unique opening line one\nshared footer line here\nok"),
      (2L, "another distinct first line\nshared footer line here"),
      (3L, "shared footer line here\nlast unique content line"),
      (4L, "ok\nok\nthird unique line of text"),  // "ok" < 3 words: kept twice
      (5L, ""))                                   // empty doc: one empty line
      .toDF("doc_id", "text")
    val out = Dedup.scrubDuplicateLines(docs, "doc_id", "text", minWords = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((3L, 0L, "unique opening line one\nshared footer line here\nok")),
      "doc 1 holds the footer's first occurrence")
    assert(out(2L) == ((2L, 1L, "another distinct first line")))
    assert(out(3L) == ((2L, 1L, "last unique content line")),
      "dropping a leading line keeps later lines in order")
    assert(out(4L) == ((3L, 0L, "ok\nok\nthird unique line of text")),
      "sub-minWords duplicates are structural, never scrubbed")
    assert(out(5L) == ((1L, 0L, "")), "empty doc survives as one empty line")
  }

  test("scrubDuplicateLines equals a brute-force reference on seeded random corpora") {
    val rnd = new scala.util.Random(17)
    val vocabLines = Vector(
      "alpha beta gamma", "delta epsilon zeta", "eta theta iota kappa",
      "one two", "x", "", "shared boiler plate line", "lambda mu nu xi")
    for (trial <- 0 until 5) {
      val docs = (0L until 30L).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(4))(vocabLines(rnd.nextInt(vocabLines.size)))
          .mkString("\n"))
      }
      // reference: iterate all lines in global (doc, pos) order;
      // substantive (>= 3 words) lines keep only their first occurrence
      val seen = scala.collection.mutable.Set.empty[String]
      val expect2 = docs.sortBy(_._1).map { case (id, t) =>
        val ls = t.split("\n", -1)
        val kept = ls.zipWithIndex.filter { case (l, _) =>
          val sub = l.split("\\s+").count(_.nonEmpty) >= 3
          !sub || seen.add(l)
        }.map(_._1)
        (id, (ls.length.toLong, (ls.length - kept.length).toLong, kept.mkString("\n")))
      }.toMap
      val got = Dedup.scrubDuplicateLines(docs.toDF("doc_id", "text"), "doc_id", "text",
          minWords = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == expect2, s"trial $trial")
    }
  }

  test("scrubDuplicateParagraphs: paragraph units, separator round-trip, node codec") {
    val docs = Seq(
      (1L, "first unique paragraph here\n\nshared boiler plate block"),
      (2L, "shared boiler plate block\n\nsecond unique paragraph here"),
      // a paragraph containing single newlines is ONE unit — the line
      // face would split it; minWords counts across the whole block
      (3L, "multi line\nparagraph body\n\nshared boiler plate block"),
      (4L, "so so"))  // < 3 words: exempt, kept verbatim
      .toDF("doc_id", "text")
    val out = Dedup.scrubDuplicateParagraphs(docs, "doc_id", "text", minWords = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((2L, 0L, "first unique paragraph here\n\nshared boiler plate block")),
      "doc 1 holds the shared block's first occurrence")
    assert(out(2L) == ((2L, 1L, "second unique paragraph here")))
    assert(out(3L) == ((2L, 1L, "multi line\nparagraph body")),
      "inner single newlines stay inside one paragraph unit")
    assert(out(4L) == ((1L, 0L, "so so")), "sub-minWords paragraphs are exempt")
    // brute-force parity on seeded corpora (the line-scrub reference with
    // the paragraph separator)
    val rnd = new scala.util.Random(23)
    val vocabParas = Vector(
      "alpha beta gamma", "delta epsilon zeta", "shared boiler plate block",
      "one two", "eta theta iota kappa\nwith a second line")
    val rdocs = (0L until 25L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(3))(vocabParas(rnd.nextInt(vocabParas.size)))
        .mkString("\n\n"))
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val expect2 = rdocs.sortBy(_._1).map { case (id, t) =>
      val ps = t.split(java.util.regex.Pattern.quote("\n\n"), -1)
      val kept = ps.zipWithIndex.filter { case (p, _) =>
        val sub = p.split("\\s+").count(_.nonEmpty) >= 3
        !sub || seen.add(p)
      }.map(_._1)
      (id, (ps.length.toLong, (ps.length - kept.length).toLong, kept.mkString("\n\n")))
    }.toMap
    val got = Dedup.scrubDuplicateParagraphs(rdocs.toDF("doc_id", "text"),
        "doc_id", "text", minWords = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == expect2, "brute-force parity")
    // ParaScrub node: v10 stamp, codec identity, document run == direct API
    import graft.api.{App, Program}
    import graft.api.Program._
    val d = Doc(Seq(External("in"), ParaScrub("a", "in", "doc_id", "text", 3)), Seq("a"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":10") && Program.fromJson(json) == d)
    val cap = Program.capture(
      Program.Rec.external("in", graft.api.MStream(docs))
        .paraScrub("doc_id", "text").as("a"))
    assert(Program.fromJson(Program.toJson(cap)) == cap)
    val config = new App.Config()
      .setSource("in", App.Source("list", rows = Some(docs)))
      .addSink("a", App.Sink("memory"))
    Program.validate(cap, spark, config)
    val ran = App.runProgram(spark, config, Program.toJson(cap))
      .collectFirst { case App.BatchOutput("a", o) => o }.get
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(ran == out, "document execution equals the direct API")
  }

  test("repeatedSpans equals a brute-force reference on seeded random corpora") {
    // tiny vocab forces heavy cross-doc gram sharing — the regime where
    // island assembly, thresholds, and the collision-guard stage all work
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 5) {
      val k = 2 + rnd.nextInt(2)
      val minDocs = 2 + rnd.nextInt(2)
      val docs = (1L to (3 + rnd.nextInt(5)).toLong).map { i =>
        (i, Seq.fill(rnd.nextInt(13))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      def grams(t: String): Vector[String] = {
        val w = t.split("\\s+").filter(_.nonEmpty).toVector
        if (w.size < k) Vector()
        else (0 to w.size - k).map(p => w.slice(p, p + k).mkString(" ")).toVector
      }
      val docsPerGram = docs.flatMap { case (id, t) => grams(t).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val expected = docs.flatMap { case (id, t) =>
        val dup = grams(t).zipWithIndex.collect {
          case (g, p) if docsPerGram(g) >= minDocs => p
        }
        val spans = scala.collection.mutable.Buffer.empty[(Long, Long, Long)]
        var i = 0
        while (i < dup.size) {
          var j = i
          while (j + 1 < dup.size && dup(j + 1) == dup(j) + 1) j += 1
          spans += ((id, dup(i).toLong, (dup(j) - dup(i) + k).toLong))
          i = j + 1
        }
        spans
      }.toSet
      val got = Dedup.repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
          k, minDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"trial $trial k=$k minDocs=$minDocs docs=$docs")
    }
  }

  test("minDocs raises the repetition threshold") {
    // "a b c" is in 4 docs, "b c d" in 3 — at minDocs=4 only "a b c" spans
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", k = 3, minDocs = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (4L, 0L, 3L), (8L, 0L, 3L)))
  }
}
