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

  test("broadcastRef=false (beyond-broadcast face): same survivors, still stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // force the shuffled-join path genuinely: no auto-broadcast rescue
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val mem = MemoryStream[(Long, String)]
      val out = Dedup.dedupAgainstCorpus(
        MStream(mem.toDF().toDF("doc_id", "text")), ref,
        "doc_id", "text", k = 16, bands = 8, threshold = 0.8, broadcastRef = false)
      val name = s"ccnb_${System.nanoTime()}"
      val q = out.df.select("doc_id")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        arriving.grouped(2).foreach(batch => mem.addData(batch: _*))
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
          "the shuffled face is as stateless as the broadcast one")
        assert(spark.table(name).collect().map(_.getLong(0)).toSet == runBatch(arriving),
          "beyond-broadcast face equals the oracle-carrying batch face")
      } finally q.stop()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    graft.api.Pinned.release(spark)
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

  test("embeddingDedupAgainstCorpusIvf: IVF-routed == exact on a recall-complete corpus, no product join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // four tight, well-separated clusters around the unit axes of R^4;
    // reference ids ordered so k-means init (4 lowest ids) seeds one
    // centroid per cluster -> every near-dup's nearest cell IS its
    // reference's cell, so nProbe=1 is recall-complete by construction
    def axis(i: Int, eps: Float): Array[Float] = {
      val v = Array.fill(4)(eps); v(i) = 1.0f; v
    }
    val refE = (0 until 12).map(j => (100L + j, axis(j % 4, 0.01f * (j / 4 + 1))))
      .toDF("vec_id", "embedding")
    val arrivingE = Seq(
      (1L, axis(0, 0.02f)),                       // near cluster 0 -> dropped
      (2L, Array(0.5f, -0.5f, 0.5f, -0.5f)),      // far from every axis -> survives
      (3L, axis(2, 0.03f)),                       // near cluster 2 -> dropped
      (4L, Array(-0.7f, 0.1f, -0.7f, 0.1f)))      // negative quadrant -> survives
    val centroids = graft.pipeline.Ivf.train(refE, "vec_id", "embedding", k = 4, iters = 2)

    val exact = Dedup.embeddingDedupAgainstCorpus(
        MStream(arrivingE.toDF("vec_id", "embedding")), refE, "vec_id", "embedding", 0.9)
      .df.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exact == Set(2L, 4L))

    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ivfBatch = Dedup.embeddingDedupAgainstCorpusIvf(
        MStream(arrivingE.toDF("vec_id", "embedding")), refE, "vec_id", "embedding",
        0.9, centroids, nProbe = 1, broadcastRef = false)
      val plan = ivfBatch.df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
        s"IVF route must not contain a |batch|x|ref| product join:\n$plan")
      assert(ivfBatch.df.select("vec_id").collect().map(_.getLong(0)).toSet == exact,
        "IVF-routed survivors equal exact survivors when every near-dup's cell is probed")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)

    val mem = MemoryStream[(Long, Array[Float])]
    val out = Dedup.embeddingDedupAgainstCorpusIvf(
      MStream(mem.toDF().toDF("vec_id", "embedding")), refE, "vec_id", "embedding",
      0.9, centroids, nProbe = 1)
    assert(out.df.isStreaming)
    val name = s"ccivf_${System.nanoTime()}"
    val q = out.df.select("vec_id").writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      arrivingE.grouped(2).foreach(g => mem.addData(g: _*))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "the IVF-routed ingest is stateless")
      assert(spark.table(name).collect().map(_.getLong(0)).toSet == exact)
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
