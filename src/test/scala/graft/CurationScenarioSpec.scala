package graft

import org.apache.spark.sql.functions._
import graft.api.{App, MStream, Program}
import graft.sources.Tables
import graft.api.Program._

/** The flagship curation-pipeline composition: one shipped document
  * running the whole pre-training data flow — normalization, quality +
  * language gates, deterministic sampling, split labeling, token
  * chunking — end to end over the real sf0.001 corpus, checked three
  * ways: (1) against the step-by-step direct API, (2) reloaded from its
  * serialized JSON under a config, (3) STREAMING — every node in the
  * chain is a stateless per-row op, so the identical document runs over
  * a MemoryStream with zero state rows and byte-identical output. */
class CurationScenarioSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def buildDoc: (String, Program.Rec) = {
    val docs = Program.Rec.external("documents",
      Tables.documents(spark, dir))
    val piped = docs
      .normalize("text")
      .qualityAnnotate("norm_text")
      .langId("norm_text")
      .where("n_words >= 10 AND lang = 'en'")
      .hashSample("doc_id", rate = 0.9, salt = "scn")
      .assignSplit("doc_id",
        Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1), salt = "scn2")
      .where("split = 'train'")
      .chunkTokens("doc_id", "norm_text", chunkSize = 32, stride = 24)
      .as("out")
    (Program.toJson(Program.capture(piped)), piped)
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("chunk_id")),
      r.getString(r.fieldIndex("chunk_text")), r.getLong(r.fieldIndex("n_tokens")))

  test("the 8-node pipeline document == the step-by-step direct API") {
    val (json, piped) = buildDoc
    assert(json.contains("\"version\":6"))
    val live = piped.stream.df.collect().map(key).toSet
    assert(live.nonEmpty, "the gates must keep a non-empty train slice")

    val d = Tables.documents(spark, dir).df
    val annotated = MStream(d)
      .addFields("norm_text" -> graft.pipeline.TextOps.normalizeText(col("text")))
      .addFields(graft.pipeline.TextOps.qualityFeatures(col("norm_text")): _*)
      .addFields("lang" -> graft.pipeline.TextOps.langId(col("norm_text")))
      .where(expr("n_words >= 10 AND lang = 'en'")).df
    val sampled = graft.pipeline.Sampling.assignSplit(
      graft.pipeline.Sampling.hashSample(annotated, col("doc_id"), 0.9, "scn"),
      col("doc_id"), Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1),
      "split", "scn2").filter(col("split") === "train")
    val direct = graft.pipeline.TextOps.chunkTokens(
      sampled, "doc_id", "norm_text", 32, 24).collect().map(key).toSet
    assert(live == direct, "document diverged from the direct API")

    // reload from JSON and run under a config
    val config = new App.Config()
      .setSource("documents", App.Source(
        format = "parquet", path = Some(s"$dir/documents.parquet")))
      .addSink("out", App.Sink("memory"))
    Program.validate(Program.fromJson(json), spark, config)
    val reloaded = App.runProgram(spark, config, json)
      .collectFirst { case App.BatchOutput("out", df) => df }.get
      .collect().map(key).toSet
    assert(reloaded == live, "reloaded document diverged")
  }

  test("the SAME document runs streaming: stateless, output == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val (json, piped) = buildDoc
    val batch = piped.stream.df.collect().map(key).toSet

    val rows = Tables.documents(spark, dir).df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val in = MemoryStream[(Long, String, String, String, Long)]
    val name = s"scenario_stream_${System.nanoTime()}"
    val running = App.run(spark, new App.Config()
        .setSource("documents", App.Source("list", rows = Some(
          in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"))))
        .addSink("out", App.Sink("memory", outputMode = "append",
          queryName = Some(name))))(
      Program.interpret(Program.fromJson(json)))
    val q = running.collect { case App.StreamingOutput("out", sq) => sq }.head
    try {
      rows.grouped(100).foreach(g => in.addData(g: _*))
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "every pipeline stage is stateless")
      assert(spark.table(name).collect().map(key).toSet == batch,
        "streaming curation output equals the batch run exactly")
    } finally q.stop()
  }
}
