package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.TextOps

/** Sentence segmentation + sentence-aware chunking (`sentencesOf` /
  * `chunkSentences` / `chunkSentencesIngest`): segmentation pinned to the
  * regex definition, the greedy packing to a hand fold, streaming ==
  * batch, edge shapes (oversized sentence, no punctuation, empty doc). */
class SentenceChunkSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "One two three. Four five six! Seven eight? Nine ten."),
    (2L, "no punctuation at all just words flowing on and on"),
    (3L, "Tiny. " + ("very long single sentence " * 10).trim + ". End."),
    (4L, ""),
    (5L, "...!!!"),                        // punctuation only: no sentences
    (6L, "Dr. Smith went home. The end."))  // abbreviation splits (documented)

  private def run(maxTokens: Long): Map[(Long, Long), (String, Long, Long)] =
    TextOps.chunkSentences(docs.toDF("doc_id", "text"), "doc_id", "text", maxTokens)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap

  test("segmentation: trailing fragment kept, punctuation runs attach, empties dropped") {
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.sentencesOf(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("One two three.", "Four five six!", "Seven eight?", "Nine ten."))
    assert(got(2L) == Seq("no punctuation at all just words flowing on and on"))
    assert(got(4L) == Nil && got(5L) == Nil)
    assert(got(6L) == Seq("Dr.", "Smith went home.", "The end."),
      "regex segmenter splits abbreviations — the documented heuristic trade")
  }

  test("greedy packing follows the packChunks convention; oversized sentence alone") {
    val got = run(6L)
    // doc 1: sentences of 3/3/2/2 tokens; prefixes 0,3,6,8 -> chunks 0,0,1,1
    assert(got((1L, 0L)) == ("One two three. Four five six!", 6L, 2L))
    assert(got((1L, 1L)) == ("Seven eight? Nine ten.", 4L, 2L))
    // doc 2: one unpunctuated 10-token sentence -> one oversized chunk
    assert(got((2L, 0L))._2 == 10L && got((2L, 0L))._3 == 1L)
    // doc 3: Tiny.(1) + a 40-token run + End.(1): the long sentence
    // crosses the budget inside chunk 0 (greedy overflow, 41 tokens),
    // End. starts at prefix 41 -> chunk 41/6 = 6
    assert(got((3L, 0L))._3 == 2L && got((3L, 0L))._2 == 41L)
    assert(got((3L, 6L)) == ("End.", 1L, 1L))
    assert(got.keys.count(_._1 == 3L) == 2)
    // no chunks for empty / punctuation-only docs
    assert(!got.keys.exists(k => k._1 == 4L || k._1 == 5L))
    // totals: every token lands in exactly one chunk
    assert(got.collect { case ((d, _), (_, t, _)) if d == 1L => t }.sum == 10L)
  }

  test("streaming equals batch; stateless at ingest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val batch = TextOps.chunkSentencesIngest(
      MStream(docs.toDF("doc_id", "text")), "doc_id", "text", maxTokens = 6L)
    assert(!batch.df.isStreaming)
    val b = batch.df.collect().map(_.toSeq.toList).toSet

    val in = MemoryStream[(Long, String)]
    val out = TextOps.chunkSentencesIngest(
      MStream(in.toDF().toDF("doc_id", "text")), "doc_id", "text", maxTokens = 6L)
    assert(out.df.isStreaming)
    in.addData(docs.take(3): _*)
    in.addData(docs.drop(3): _*)
    val name = s"sc_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "sentence chunking is stateless at ingest")
      assert(spark.table(name).collect().map(_.toSeq.toList).toSet == b,
        "streaming chunks equal the batch face")
    } finally q.stop()
  }

  test("chunkSentences node: v8 stamp, codec identity, document run == direct API") {
    import graft.api.{App, Program}
    import graft.api.Program._
    val d = Doc(
      nodes = Seq(External("in"),
        SentChunk("c", "in", "doc_id", "text", 6L, " ")),
      outputs = Seq("c"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":8"), "chunkSentences is a v8 node")
    assert(Program.fromJson(json) == d, "codec is the identity")
    val bad = intercept[IllegalArgumentException](Program.fromJson(Program.toJson(
      Doc(Seq(External("in"), SentChunk("c", "in", "doc_id", "text", 0L, " ")),
        Seq("c")))))
    assert(bad.getMessage.contains("node 'c'") &&
      bad.getMessage.contains("maxTokens"), bad.getMessage)
    val config = new App.Config()
      .setSource("in", App.Source("list", rows = Some(docs.toDF("doc_id", "text"))))
      .addSink("c", App.Sink("memory"))
    val out = App.runProgram(spark, config, json)
      .collectFirst { case App.BatchOutput("c", o) => o }.get
      .collect().map(_.toSeq.toList).toSet
    assert(out == TextOps.chunkSentences(docs.toDF("doc_id", "text"),
      "doc_id", "text", 6L).collect().map(_.toSeq.toList).toSet,
      "document execution equals the direct API")
  }

  test("contracts: positive budget required") {
    val e = intercept[IllegalArgumentException](TextOps.chunkSentences(
      docs.toDF("doc_id", "text"), "doc_id", "text", 0L))
    assert(e.getMessage.contains("positive"))
  }
}
