package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.Dedup

/** Exact cross-corpus ingest dedup (`Dedup.exactDedupAgainstCorpus`): the
  * Bloom screen must be semantics-free (identical output to the plain
  * text-equality anti-join even when the filter is tiny and riddled with
  * false positives), the streaming face must equal the oracle-carrying
  * batch face (q_exact_ingest), and the streaming query must hold zero
  * state-store rows. */
class BloomSpec extends SparkSpec {
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
    (4L, "pack my box with five dozen liquor jugs right now!"), // near copy -> SURVIVES (exact only)
    (5L, null.asInstanceOf[String]))                            // null text -> survives

  private def runBatch(in: Seq[(Long, String)], numBits: Int = 1 << 20,
                       numHashes: Int = 7): Set[Long] =
    Dedup.exactDedupAgainstCorpus(MStream(in.toDF("doc_id", "text")), ref,
        "doc_id", "text", numBits = numBits, numHashes = numHashes)
      .df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def runStreaming(in: Seq[(Long, String)], broadcastRef: Boolean = true): Set[Long] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = Dedup.exactDedupAgainstCorpus(
      MStream(mem.toDF().toDF("doc_id", "text")), ref,
      "doc_id", "text", broadcastRef = broadcastRef)
    assert(out.df.isStreaming)
    val name = s"bex_${System.nanoTime()}"
    val q = out.df.select("doc_id")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      in.grouped(2).foreach(batch => mem.addData(batch: _*))
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "exact ingest dedup is stateless: no state rows accumulate")
      spark.table(name).collect().map(_.getLong(0)).toSet
    } finally { q.stop(); graft.api.Pinned.release(spark) }
  }

  test("batch face: exact copies drop, near copies / fresh / null-text docs survive") {
    assert(runBatch(arriving) == Set(2L, 4L, 5L))
  }

  test("a tiny saturated filter (64 bits, all false positives) never changes the answer") {
    // 3 keys x 2 probes in 64 bits: nearly every arrival passes the
    // screen — the exact confirm join must reject every false positive
    assert(runBatch(arriving, numBits = 64, numHashes = 2) == Set(2L, 4L, 5L))
  }

  test("the default filter prunes: a fresh doc fails the screen before any join") {
    val bfLit = ref.agg(graft.functions.VectorFunctions.bloomAgg(
      xxhash64(col("text")), 1 << 20, 7)).head().getSeq[Long](0)
    val freshKey = Seq("a completely different sentence about nothing that matches here")
      .toDF("text").select(xxhash64(col("text"))).head().getLong(0)
    val copyKey = Seq("the quick brown fox jumps over the lazy dog today")
      .toDF("text").select(xxhash64(col("text"))).head().getLong(0)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val probe = graft.functions.BloomMightContain(null, null, 7)
    val table = new GenericArrayData(bfLit.toArray)
    assert(!probe.nullSafeEvalPublic(table, freshKey).asInstanceOf[Boolean],
      "a never-inserted key should fail the screen at this filter size")
    assert(probe.nullSafeEvalPublic(table, copyKey).asInstanceOf[Boolean],
      "an inserted key must always pass the screen")
  }

  test("streaming output equals the batch face, broadcast and shuffled") {
    assert(runStreaming(arriving) == runBatch(arriving))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(runStreaming(arriving, broadcastRef = false) == runBatch(arriving))
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("empty reference corpus: everything survives in both modes") {
    val emptyRef = ref.where(lit(false))
    val got = Dedup.exactDedupAgainstCorpus(
        MStream(arriving.toDF("doc_id", "text")), emptyRef, "doc_id", "text")
      .df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == arriving.map(_._1).toSet)
  }

  test("droppedBecause lineage: one edge per (dropped arrival, matching reference)") {
    import graft.api.App
    val config = new App.Config()
      .setSource("arrivals", App.Source("list",
        rows = Some(arriving.toDF("doc_id", "text"))))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> Dedup.exactDedupAgainstCorpus(
        in("arrivals"), ref, "doc_id", "text"))
    }
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 4L, 5L))
    def h(id: Long): Long =
      spark.range(1).select(xxhash64(struct(lit(id)))).head().getLong(0)
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges == Set(
      ("droppedBecause:exactDedupAgainstCorpus", h(1L), h(100L)),
      ("droppedBecause:exactDedupAgainstCorpus", h(3L), h(101L))),
      "exactly the two exact-copy pairs explain the drops")
    graft.api.Pinned.release(spark)
  }
}
