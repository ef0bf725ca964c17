package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.QueryStageExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import graft.api.MStream
import graft.pipeline.TextOps

/** The AUTO broadcast lever of the LM against faces (round 15): with no
  * explicit `broadcastModel`, each pinned count table broadcasts iff its
  * MEASURED persisted size fits the session's autoBroadcastJoinThreshold.
  * Pinned at both boundaries — a small model broadcasts, an
  * over-threshold model shuffles — plus scores identical across all
  * three lever settings, and the streaming-face rejection when auto
  * decides the model cannot broadcast. */
class LmAutoLeverSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "a b a b c a b"), (1L, "a b a b a"), (2L, "c c c c d c"),
    (3L, "x y z w u v"), (5L, "a b c a b c a b c"))
  private val docs = Seq((10L, "a b a b c"), (11L, "q r s t u"))

  /** MODEL-table broadcast joins in the executed plan: broadcast hash
    * joins keyed on the suffix-aligned gram columns (__p1..__pN) — the
    * per-doc aggregate join-back may legitimately broadcast regardless of
    * the lever, so the assertion targets only the scoring joins.
    * Descends into the AQE-final plan (AdaptiveSparkPlanExec exposes no
    * children) and completed query stages. */
  private def modelBroadcastJoins(plan: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def deep(p: SparkPlan): Seq[SparkPlan] = p.flatMap {
      case a: AdaptiveSparkPlanExec => a +: deep(a.executedPlan)
      case q: QueryStageExec => q +: deep(q.plan)
      case x => Seq(x)
    }
    deep(plan).collect {
      case b: BroadcastHashJoinExec
          if b.leftKeys.exists(_.references.exists(_.name.startsWith("__p"))) => b
    }
  }

  private def withThreshold[T](bytes: Long)(body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try body finally spark.conf.set(key, old)
  }

  test("auto broadcasts a small model and shuffles an over-threshold one") {
    try {
      // tiny corpus, generous threshold: every model join broadcasts
      val small = TextOps.knLmScoreAgainst(
        MStream(docs.toDF("doc_id", "text")), corpus.toDF("doc_id", "text"),
        "doc_id", "text", "text", order = 3).df
      small.collect()
      assert(modelBroadcastJoins(small.queryExecution.executedPlan).nonEmpty,
        "under-threshold model tables broadcast")

      // 1-byte threshold: auto decides every table is beyond-broadcast —
      // no scoring join broadcasts (planned AND executed under the low
      // threshold: AQE would otherwise re-broadcast the tiny stages)
      val (big, forced) = withThreshold(1L) {
        val b = TextOps.knLmScoreAgainst(
          MStream(docs.toDF("doc_id", "text")), corpus.toDF("doc_id", "text"),
          "doc_id", "text", "text", order = 3).df
        val f = TextOps.knLmScoreAgainst(
          MStream(docs.toDF("doc_id", "text")), corpus.toDF("doc_id", "text"),
          "doc_id", "text", "text", order = 3,
          broadcastModel = Some(true)).df
        b.collect(); f.collect()
        (b, f)
      }
      assert(modelBroadcastJoins(big.queryExecution.executedPlan).isEmpty,
        "over-threshold model tables shuffle under auto")
      // the explicit lever still forces broadcast hints past the threshold
      assert(modelBroadcastJoins(forced.queryExecution.executedPlan).nonEmpty,
        "Some(true) overrides the auto decision")
      assert(big.collect().toSet == small.collect().toSet &&
        forced.collect().toSet == small.collect().toSet,
        "scores are identical across all three lever settings")
    } finally graft.api.Pinned.release(spark)
  }

  test("ngram face: auto decision applies per table and keeps scores identical") {
    try {
      val auto = TextOps.ngramLmScoreAgainst(
        MStream(docs.toDF("doc_id", "text")), corpus.toDF("doc_id", "text"),
        "doc_id", "text", "text", order = 3).df.collect().toSet
      val shuffled = withThreshold(1L) {
        TextOps.ngramLmScoreAgainst(
          MStream(docs.toDF("doc_id", "text")), corpus.toDF("doc_id", "text"),
          "doc_id", "text", "text", order = 3).df
      }.collect().toSet
      assert(auto == shuffled, "auto-shuffled face is score-identical")
    } finally graft.api.Pinned.release(spark)
  }

  test("streaming face: auto rejection when the model cannot broadcast") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    try {
      val in = MemoryStream[(Long, String)]
      val e = withThreshold(1L) {
        intercept[IllegalArgumentException](TextOps.knLmScoreAgainst(
          MStream(in.toDF().toDF("doc_id", "text")), corpus.toDF("doc_id", "text"),
          "doc_id", "text", "text", order = 3))
      }
      assert(e.getMessage.contains("streaming face") &&
        e.getMessage.contains("minCount"), e.getMessage)
      // Some(true) is the explicit escape: the stream builds fine
      val ok = withThreshold(1L) {
        TextOps.knLmScoreAgainst(
          MStream(in.toDF().toDF("doc_id", "text")), corpus.toDF("doc_id", "text"),
          "doc_id", "text", "text", order = 3, broadcastModel = Some(true))
      }
      assert(ok.df.isStreaming)
    } finally graft.api.Pinned.release(spark)
  }
}
