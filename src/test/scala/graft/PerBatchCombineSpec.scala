package graft

import graft.api.MStream
import graft.pipeline.TextOps
import graft.streaming.PerBatchCombine

/** The shared stateless per-batch combine: its unique-id-per-run
  * precondition must be checkable (validation conf drives a cross-batch
  * id reuse to a clear error instead of silently duplicated output), and
  * normal mode must keep the zero-state posture the ingest suites pin. */
class PerBatchCombineSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private val bench = Seq(Tuple1("one two three four five six seven eight")).toDF("text")

  private def runIngest(batches: Seq[Seq[(Long, String)]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = TextOps.decontaminateIngest(
      MStream(in.toDF().toDF("doc_id", "text")), bench, "doc_id", "text", "text")
    val name = s"pbc_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
  }

  test("checkUniqueIds: reused id across micro-batches fails with a clear error") {
    spark.conf.set(PerBatchCombine.CheckConf, "true")
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        runIngest(Seq(
          Seq(1L -> "alpha beta", 2L -> "gamma"),
          Seq(2L -> "gamma again"))) // id 2 reappears in a later batch
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("more than one micro-batch")),
        s"expected the unique-id precondition error, got: ${messages(e)}")
    } finally spark.conf.unset(PerBatchCombine.CheckConf)
  }

  test("checkUniqueIds: unique ids across batches still pass") {
    spark.conf.set(PerBatchCombine.CheckConf, "true")
    try {
      runIngest(Seq(Seq(1L -> "alpha", 2L -> "beta"), Seq(3L -> "gamma")))
    } finally spark.conf.unset(PerBatchCombine.CheckConf)
  }

  test("default mode: reused id mis-combines silently but stores zero state") {
    // documents WHY the validation conf exists: without it the second
    // arrival of id 2 emits a second (partial) verdict row
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = TextOps.decontaminateIngest(
      MStream(in.toDF().toDF("doc_id", "text")), bench, "doc_id", "text", "text")
    val name = s"pbc_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(2L -> "one")
      q.processAllAvailable()
      in.addData(2L -> "two")
      q.processAllAvailable()
      assert(spark.table(name).filter($"doc_id" === 2L).count() == 2L)
      assert(q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "normal mode keeps the zero-state posture")
    } finally q.stop()
  }
}
