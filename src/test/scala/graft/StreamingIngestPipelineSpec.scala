package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.{Dedup, TextOps}

/** End-to-end STREAMING ingest pipeline: quality gate (per-row) →
  * cross-corpus near-dup screen (stream-static + combine) → token encode
  * (stream-static + combine), all composed into ONE streaming query —
  * three Generate/join legs and two chained per-batch combines in Append
  * mode. The batch face runs the identical operators on the same rows;
  * the streaming output must match it exactly, proving the ingest faces
  * compose, not just work in isolation. */
class StreamingIngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (900L, "the quick brown fox jumps over the lazy dog today"),
    (901L, "pack my box with five dozen liquor jugs right now"))
    .toDF("doc_id", "text")

  private val vocab = Seq(("the", 0L), ("fox", 1L), ("dog", 2L), ("fresh", 3L),
    ("words", 4L), ("appear", 5L)).toDF("word", "id")

  private val arriving = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"), // near-dup of ref -> dropped
    (2L, "fresh words appear in the stream with enough content"),
    (3L, "ok"),                                                // quality gate: too short
    (4L, "completely original sentences carry fresh ideas forward nicely"))

  private def pipeline(docs: MStream): MStream = {
    val gated = new MStream(
      docs.df.where(size(TextOps.words(col("text"))) >= 5),
      docs.eventOrder, docs.contextKeys, docs.name)
    val deduped = Dedup.dedupAgainstCorpus(gated, ref, "doc_id", "text",
      k = 16, bands = 8, threshold = 0.8)
    TextOps.encodeTokensIngest(deduped, vocab, "doc_id", "text")
  }

  private def key(r: org.apache.spark.sql.Row): (Long, Seq[Long], Long) =
    (r.getLong(0), r.getSeq[Long](1), r.getLong(2))

  test("quality gate -> cross-corpus dedup -> encode composes in one streaming query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    val batch = pipeline(MStream(arriving.toDF("doc_id", "text")))
    assert(!batch.df.isStreaming)
    val b = batch.df.select("doc_id", "ids", "n_oov").collect().map(key).toSet
    // doc 1 near-dups the reference, doc 3 fails the gate; 2 and 4 encode
    assert(b.map(_._1) == Set(2L, 4L), s"survivors encode, got ${b.map(_._1)}")
    assert(b.find(_._1 == 2L).get._2.take(3) == Seq(3L, 4L, 5L),
      "vocabulary ids apply in token order")

    val in = MemoryStream[(Long, String)]
    val out = pipeline(MStream(in.toDF().toDF("doc_id", "text")))
    assert(out.df.isStreaming)
    val name = s"ingest_pipe_${System.nanoTime()}"
    val q = out.df.select("doc_id", "ids", "n_oov")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(arriving.take(2): _*)
      in.addData(arriving.drop(2): _*)
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "the whole composed pipeline is stateless at ingest")
      assert(spark.table(name).collect().map(key).toSet == b,
        "one streaming query through gate + dedup + encode equals the batch face")
    } finally q.stop()
    graft.api.Pinned.release(spark)
  }
}
