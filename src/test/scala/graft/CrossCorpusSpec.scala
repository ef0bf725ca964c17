package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.Dedup

/** Cross-corpus ingest dedup (`Dedup.dedupAgainstCorpus`): the streaming
  * face must equal the batch face row-for-row (the batch face carries the
  * DuckDB oracle, q_cross_ingest), and the streaming query must hold no
  * state store (the op is two stream-static broadcast joins + a per-batch
  * combine). */
class CrossCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (100L, "the quick brown fox jumps over the lazy dog today"),
    (101L, "pack my box with five dozen liquor jugs right now"),
    (102L, "sphinx of black quartz judge my vow said the king"))
    .toDF("doc_id", "text")

  private val arriving = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"), // exact copy -> dropped
    (2L, "a completely different sentence about nothing that matches here"),
    (3L, "pack my box with five dozen liquor jugs right now"), // exact copy -> dropped
    (4L, "so eh"))                                             // under 3 words -> survives

  private def runBatch(in: Seq[(Long, String)]): Set[Long] =
    Dedup.dedupAgainstCorpus(MStream(in.toDF("doc_id", "text")), ref,
        "doc_id", "text", k = 16, bands = 8, threshold = 0.8)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def runStreaming(in: Seq[(Long, String)]): Set[Long] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = Dedup.dedupAgainstCorpus(
      MStream(mem.toDF().toDF("doc_id", "text")), ref,
      "doc_id", "text", k = 16, bands = 8, threshold = 0.8)
    assert(out.df.isStreaming)
    val name = s"cci_${System.nanoTime()}"
    val q = out.df.select("doc_id")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val (first, rest) = in.splitAt(2)
      mem.addData(first: _*)
      mem.addData(rest: _*)
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "cross-corpus ingest is stateless: no state rows accumulate")
      spark.table(name).collect().map(_.getLong(0)).toSet
    } finally q.stop()
  }

  test("batch face: copies of reference docs drop, fresh and short docs survive") {
    assert(runBatch(arriving) == Set(2L, 4L))
  }

  test("streaming output equals the batch branch") {
    assert(runStreaming(arriving) == runBatch(arriving))
  }

  test("streaming equals batch on a seeded random corpus with near-copies") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(): String = Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val refDocs = (0L until 30L).map(i => (1000L + i, doc()))
    val arrivingDocs = (0L until 40L).map { i =>
      val t =
        if (i % 4 == 0) refDocs((i % 30).toInt)._2                    // exact copy
        else if (i % 4 == 1) refDocs((i % 30).toInt)._2 + " extra"    // near copy
        else doc()                                                    // fresh
      (i, t)
    }
    val refDf = refDocs.toDF("doc_id", "text")
    def batchOf(in: Seq[(Long, String)]): Set[Long] =
      Dedup.dedupAgainstCorpus(MStream(in.toDF("doc_id", "text")), refDf,
          "doc_id", "text", k = 16, bands = 8, threshold = 0.7)
        .df.select("doc_id").collect().map(_.getLong(0)).toSet
    def streamOf(in: Seq[(Long, String)]): Set[Long] = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val out = Dedup.dedupAgainstCorpus(
        MStream(mem.toDF().toDF("doc_id", "text")), refDf,
        "doc_id", "text", k = 16, bands = 8, threshold = 0.7)
      val name = s"ccr_${System.nanoTime()}"
      val q = out.df.select("doc_id")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        in.grouped(15).foreach(batch => mem.addData(batch: _*))
        q.processAllAvailable()
        spark.table(name).collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    val b = batchOf(arrivingDocs)
    assert(b.nonEmpty && b.size < arrivingDocs.size,
      s"seeded corpus should drop some and keep some, kept ${b.size}/40")
    assert(streamOf(arrivingDocs) == b)
  }

  test("embeddingDedupAgainstCorpus: streaming equals batch, stateless anti-join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val refE = Seq(
      (900L, Array(1.0f, 0.0f, 0.0f)),
      (901L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val arrivingE = Seq(
      (1L, Array(0.99f, 0.01f, 0.0f)),  // near ref 900 -> dropped
      (2L, Array(0.0f, 0.0f, 1.0f)),    // orthogonal -> survives
      (3L, Array(0.01f, 0.98f, 0.0f)),  // near ref 901 -> dropped
      (4L, Array(0.5f, -0.5f, 0.7f)))   // below threshold -> survives
    def run(in: org.apache.spark.sql.DataFrame) =
      Dedup.embeddingDedupAgainstCorpus(MStream(in), refE,
        "vec_id", "embedding", threshold = 0.8)

    val b = run(arrivingE.toDF("vec_id", "embedding"))
      .df.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(b == Set(2L, 4L))

    val mem = MemoryStream[(Long, Array[Float])]
    val out = run(mem.toDF().toDF("vec_id", "embedding"))
    assert(out.df.isStreaming)
    val name = s"cce_${System.nanoTime()}"
    val q = out.df.select("vec_id").writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      arrivingE.grouped(2).foreach(g => mem.addData(g: _*))
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "the anti-join ingest is stateless")
      assert(spark.table(name).collect().map(_.getLong(0)).toSet == b)
    } finally q.stop()
    graft.api.Pinned.release(spark)
  }

  test("payload columns ride through both faces unchanged") {
    val in = Seq((1L, "the quick brown fox jumps over the lazy dog today", "web", 7L),
                 (2L, "untouched fresh document with original words inside it", "book", 9L))
      .toDF("doc_id", "text", "source", "n")
    val out = Dedup.dedupAgainstCorpus(MStream(in), ref,
      "doc_id", "text", k = 16, bands = 8, threshold = 0.8).df
    assert(out.columns.toSeq == Seq("doc_id", "text", "source", "n"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq ==
      Seq((2L, "book", 9L)))
  }
}
