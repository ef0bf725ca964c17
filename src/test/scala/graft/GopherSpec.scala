package graft

import org.apache.spark.sql.Row
import graft.pipeline.TextOps

/** Gopher quality-rule gate (`TextOps.gopherRules`): each rule trips on a
  * document crafted to violate exactly that rule (small thresholds so the
  * fixtures stay readable), wordless/null documents fail closed, and the
  * streaming face — a pure projection — equals batch row-for-row. */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  // a clean passing document at minWords = 6: mixed-length words, two
  // stopwords, no symbols, no bullets, plain lines
  private val good = "the quick brown horse jumps with steady calm energy today"

  private val docs = Seq(
    (1L, good),                                                     // keep
    (2L, "the tiny document with nothing"),                         // ok_words fails (5 < 6)
    (3L, "the of and to it is he we us an me my do no so by"),      // ok_word_len fails (avg < 3)
    (4L, "the quick# brown# horse jumps with steady calm energy today"), // ok_symbols fails (hashes)
    (5L, "the quick… brown… horse… jumps with steady calm energy today"), // ok_symbols fails (ellipses)
    (6L, "- the quick brown words\n- with steady calm energy\n- fine words flow here\n- more words keep going"), // ok_bullets fails (4/4 lines)
    (7L, "the quick brown horse jumps...\nwith steady calm energy great\nfine words flow easily here"), // ok_ellipses fails (1/3 lines)
    (8L, "the 123 456 789 1012 1345 1678 1901 2234 2567 with"),     // ok_alpha fails
    (9L, "quick brown horse jumps over steady calm energy today"),  // ok_stopwords fails (0 stops)
    (10L, ""),                                                      // wordless: fails closed
    (11L, null.asInstanceOf[String]))                               // null text: fails closed

  private def flags(minWords: Int = 6): Map[Long, Row] =
    TextOps.gopherRules(docs.toDF("doc_id", "text"), "doc_id", "text",
        minWords = minWords, maxWords = 100000)
      .collect().map(r => r.getLong(0) -> r).toMap

  private val names = Seq("ok_words", "ok_word_len", "ok_symbols", "ok_bullets",
    "ok_ellipses", "ok_alpha", "ok_stopwords", "keep")

  private def failing(r: Row): Set[String] =
    names.filter(n => !r.getBoolean(r.fieldIndex(n))).toSet

  test("each crafted document violates exactly its targeted rule") {
    val f = flags()
    assert(failing(f(1L)) == Set.empty, s"good doc: ${failing(f(1L))}")
    assert(failing(f(2L)) == Set("ok_words", "keep"))
    assert(failing(f(3L)) == Set("ok_word_len", "keep"))
    assert(failing(f(4L)) == Set("ok_symbols", "keep"))
    assert(failing(f(5L)) == Set("ok_symbols", "keep"))
    assert(failing(f(6L)) == Set("ok_bullets", "keep"))
    assert(failing(f(7L)) == Set("ok_ellipses", "keep"))
    assert(failing(f(8L)) == Set("ok_alpha", "keep"))
    assert(failing(f(9L)) == Set("ok_stopwords", "keep"))
  }

  test("wordless and null-text documents fail every word rule closed") {
    val f = flags()
    for (id <- Seq(10L, 11L)) {
      val r = f(id)
      assert(r.getLong(r.fieldIndex("n_words")) == 0L)
      assert(Set("ok_words", "ok_word_len", "ok_symbols", "ok_alpha",
        "ok_stopwords", "keep").subsetOf(failing(r)), s"doc $id: ${failing(r)}")
    }
  }

  test("word count and mean word length are exact") {
    val r = flags()(1L)
    assert(r.getLong(r.fieldIndex("n_words")) == 10L)
    // 10 words, 50 chars -> mean 5.0, inside [3, 10]
    assert(r.getBoolean(r.fieldIndex("ok_word_len")))
  }

  test("streaming face equals batch (pure projection, zero state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = TextOps.gopherRules(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", minWords = 6, maxWords = 100000)
    assert(out.isStreaming)
    val name = s"gph_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      docs.grouped(4).foreach(batch => mem.addData(batch: _*))
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L))
      val got = spark.table(name).collect().map(r => r.getLong(0) -> r.toSeq).toMap
      val want = flags().map { case (k, r) => k -> r.toSeq }
      assert(got == want)
    } finally q.stop()
  }
}
