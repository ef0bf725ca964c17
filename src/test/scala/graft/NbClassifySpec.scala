package graft

import graft.api.MStream
import graft.pipeline.TextOps

/** Naive Bayes classification at ingest (`TextOps.nbClassifyAgainst`):
  * sensible predictions on a separable corpus, wordless fail-closed
  * outputs, streaming == batch (zero state rows), deterministic
  * tie-break. */
class NbClassifySpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    ("the cat sat on the mat and the dog ran", "en"),
    ("the quick brown fox jumps over the lazy dog", "en"),
    ("a small house with a red door and a garden", "en"),
    ("le chat dort sur le tapis et le chien court", "fr"),
    ("la maison est grande et le jardin est beau", "fr"),
    ("le renard brun saute par dessus le chien", "fr"))
    .toDF("text", "lang")

  private val arriving = Seq(
    (1L, "the dog sat on the mat"),        // -> en
    (2L, "le chien dort sur le tapis"),    // -> fr
    (3L, ""),                              // wordless -> (NULL, NULL)
    (4L, "zzz qqq vvv"))                   // all-unseen: priors + floors decide

  private def runBatch(in: Seq[(Long, String)]): Map[Long, (Option[String], Option[Double])] =
    TextOps.nbClassifyAgainst(MStream(in.toDF("doc_id", "text")), ref,
        "doc_id", "text", "text", "lang")
      .df.collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap

  private def runStreaming(in: Seq[(Long, String)]): Map[Long, (Option[String], Option[Double])] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = TextOps.nbClassifyAgainst(MStream(mem.toDF().toDF("doc_id", "text")),
      ref, "doc_id", "text", "text", "lang")
    assert(out.df.isStreaming)
    val name = s"nbc_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      in.grouped(2).foreach(batch => mem.addData(batch: _*))
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "nb classification at ingest is stateless")
      spark.table(name).collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    } finally { q.stop(); graft.api.Pinned.release(spark) }
  }

  test("separable corpus classifies correctly; wordless docs emit nulls") {
    val got = runBatch(arriving)
    assert(got(1L)._1.contains("en"), s"doc 1: ${got(1L)}")
    assert(got(2L)._1.contains("fr"), s"doc 2: ${got(2L)}")
    assert(got(3L) == (None, None), s"doc 3: ${got(3L)}")
    assert(got(4L)._1.nonEmpty && got(4L)._2.nonEmpty,
      "all-unseen docs still score on priors + floors")
  }

  test("streaming equals batch") {
    assert(runStreaming(arriving) == runBatch(arriving))
  }

  test("non-string reference labels are rejected by name; NULL labels train nothing") {
    val e = intercept[IllegalArgumentException] {
      TextOps.nbClassifyAgainst(
        MStream(arriving.toDF("doc_id", "text")),
        Seq(("the cat sat", 7L)).toDF("text", "lang"),
        "doc_id", "text", "text", "lang")
    }
    assert(e.getMessage.contains("must be string"), e.getMessage)

    // a NULL-label row neither becomes a phantom class nor shifts priors:
    // predictions match the null-free corpus exactly
    val noisy = ref.unionByName(Seq(("bruit parasite text", null: String))
      .toDF("text", "lang"))
    val got = TextOps.nbClassifyAgainst(MStream(arriving.toDF("doc_id", "text")),
        noisy, "doc_id", "text", "text", "lang")
      .df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(got.values.flatten.toSet == Set("en", "fr"),
      s"phantom null class surfaced: $got")
    assert(got == runBatch(arriving).map { case (k, v) => k -> v._1 },
      "NULL label rows shifted the trained model")
  }

  test("tie-break is the smallest class: a fully symmetric doc picks the first label") {
    // both classes have 3 docs; "shared" appears once in each class, so
    // every class scores identically -> smallest label wins
    val sym = Seq(
      ("shared alpha", "aa"), ("only beta", "aa"), ("more gamma", "aa"),
      ("shared delta", "bb"), ("only epsilon", "bb"), ("more zeta", "bb"))
      .toDF("text", "lang")
    val got = TextOps.nbClassifyAgainst(
        MStream(Seq((1L, "shared")).toDF("doc_id", "text")), sym,
        "doc_id", "text", "text", "lang")
      .df.collect().head
    assert(got.getString(1) == "aa", s"symmetric doc must tie-break to 'aa': $got")
  }
}
