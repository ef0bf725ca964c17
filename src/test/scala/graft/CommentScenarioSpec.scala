package graft

import org.apache.spark.sql.functions._
import graft.api.MStream

// Reference-ported record types for the comment-processing scenario
// (TestEventAppCommentProcessingScenario.scala:25-62)
case class CUserVote(seq: Long, commentId: String, username: String,
                     updateTime: Long, upvotes: Long, downvotes: Long)
case class CVotes(seq: Long, commentId: String, updateTime: Long,
                  upvotes: Long, downvotes: Long)
case class CEdit(seq: Long, commentId: String, eventTime: Long, data: String)

/**
 * Assertion-by-assertion port of the reference's end-to-end comment
 * scenario (`TestEventAppCommentProcessingScenario.scala:118-232`): six
 * events consumed in order, each producing exactly one rendered-comment
 * output whose text/upvotes/downvotes the reference checks after every
 * consume. The batch face drives the same dataflow with `seq` as the
 * arrival order; causality makes the per-event trace recoverable — the
 * output row with seq = k IS the reference's sink value after consume k.
 *
 * Emission-rule note the port pins: the reference's EVENT compiler emits
 * the reigning best from ArgMax scans on EVERY input — "output the
 * previous value" when not beaten (`event/operators/ScanOperations.scala:
 * 56-64`) — which is what makes consume #6 (a stale edit) still produce a
 * sixth output. graft's `maxBy` follows the ops-doc / Flink "emit on
 * strict improvement" contract instead (`Scans.argCompare`, q_maxby), and
 * the per-record variant is expressed here exactly the way Milan itself
 * defines it: as a `scan` whose step re-emits the running best
 * (`ScanOperationBase`) — same state machine, per-record emission.
 */
class CommentScenarioSpec extends SparkSpec {
  import spark.implicits._

  private val Create = "CreateComment"
  private val Up = "UpVoteComment"
  private val Down = "DownVoteComment"
  private val Edit = "EditComment"
  private val Delete = "DeleteComment"

  // the reference's exact consume sequence (t0 = 1000, seconds as longs)
  private val trace = Seq(
    (1L, "c1", 1000L, Create, "u1", "text"),
    (2L, "c1", 1001L, Up, "u2", ""),
    (3L, "c1", 1002L, Down, "u2", ""),
    (4L, "c1", 1003L, Up, "u3", ""),
    (5L, "c1", 1004L, Edit, "u1", "new text"),
    (6L, "c1", 1003L, Edit, "u1", "ignore me"))

  private def pipeline(events: MStream): MStream = {
    // local copies: the scan closures below must capture ONLY these (a
    // reference to a spec field would drag the non-serializable suite
    // object into the task closure)
    val (upT, createT, editT, deleteT) = (Up, Create, Edit, Delete)
    // createdComments: where(Create).map(createComment) — upvote/downvote
    // counters start 0, deleted false (reference createComment:67-71)
    val createdComments = events
      .where(col("eventType") === createT)
      .map(col("seq"), col("commentId"), col("eventTime").as("createTime"),
        col("username"), col("data").as("text"),
        lit(0L).as("upvotes"), lit(0L).as("downvotes"),
        lit(false).as("deleted"))

    // latestVotePerUser: groupBy(comment, user).maxBy(eventTime).map(fromEvent)
    // — the per-(comment,user) running-latest vote, re-emitted per event
    // (UserCommentVotes.fromEvent: up → (1,0), else (0,1))
    val latestVotePerUser = events
      .where(col("eventType") === upT || col("eventType").endsWith("VoteComment"))
      .groupBy("commentId", "username")
      .scanRows(Option.empty[(Long, String)]) { (st, r) =>
        val t = r.getAs[Long]("eventTime")
        val up = r.getAs[String]("eventType") == upT
        // strict improvement replaces, like ArgMaxScanOperation
        val best = st match {
          case Some((bt, _)) if bt >= t => st
          case _ => Some((t, if (up) "u" else "d"))
        }
        val (bt, kind) = best.get
        (best, Some(CUserVote(r.getAs[Long]("seq"), r.getAs[String]("commentId"),
          r.getAs[String]("username"), bt,
          if (kind == "u") 1L else 0L, if (kind == "u") 0L else 1L)))
      }.orderedBy("seq")

    // votesPerComment: groupBy(commentId) { groupBy(username).map(maxBy)
    // .recordWindow(1).select(any, max, sum) } — per comment, the last
    // record per user aggregated across users, re-emitted per event
    val votesPerComment = latestVotePerUser
      .groupBy("commentId")
      .scanRows(Map.empty[String, (Long, Long, Long)]) { (st, r) =>
        val u = r.getAs[String]("username")
        val t = r.getAs[Long]("updateTime")
        val next = st.get(u) match {
          case Some((bt, _, _)) if bt >= t => st
          case _ => st + (u -> ((t, r.getAs[Long]("upvotes"), r.getAs[Long]("downvotes"))))
        }
        (next, Some(CVotes(r.getAs[Long]("seq"), r.getAs[String]("commentId"),
          next.values.map(_._1).max,
          next.values.map(_._2).sum, next.values.map(_._3).sum)))
      }.orderedBy("seq")

    // editEventsByTime: groupBy(commentId).maxBy(eventTime), per-record
    // emission of the reigning best edit — consume #6's stale edit emits
    // the previous best again (ScanOperations.scala:62-64)
    val editEventsByTime = events
      .where(col("eventType") === editT)
      .groupBy("commentId")
      .scanRows(Option.empty[(Long, String)]) { (st, r) =>
        val t = r.getAs[Long]("eventTime")
        val best = st match {
          case Some((bt, _)) if bt >= t => st
          case _ => Some((t, r.getAs[String]("data")))
        }
        (best, Some(CEdit(r.getAs[Long]("seq"), r.getAs[String]("commentId"),
          best.get._1, best.get._2)))
      }.orderedBy("seq")

    val deleteEvents = events.where(col("eventType") === deleteT)

    // fullJoin chain: each event on either side emits the pair with the
    // latest other side; outputs carry the triggering event's seq
    def seqOf(l: String => org.apache.spark.sql.Column,
              r: String => org.apache.spark.sql.Column) =
      greatest(coalesce(l("seq"), lit(0L)), coalesce(r("seq"), lit(0L))).as("seq")

    // applyCommentVotes (reference :76-91): null votes keep the comment's
    // counters, else the votes' counters replace them
    val commentsWithVotes = createdComments.fullJoin(votesPerComment)
      .on((l, r) => l("commentId") === r("commentId"))
      .select((l, r) => Seq(
        coalesce(l("commentId"), r("commentId")).as("commentId"),
        l("text").as("text"),
        coalesce(r("upvotes"), l("upvotes")).as("upvotes"),
        coalesce(r("downvotes"), l("downvotes")).as("downvotes"),
        l("deleted").as("deleted"),
        seqOf(l, r)))
      .orderedBy("seq")

    // updateComment on edits (reference :96-109): a present edit replaces
    // the text with the (reigning-best) edit data
    val commentsWithEdits = commentsWithVotes.fullJoin(editEventsByTime)
      .on((l, r) => l("commentId") === r("commentId"))
      .select((l, r) => Seq(
        coalesce(l("commentId"), r("commentId")).as("commentId"),
        when(r("data").isNotNull, r("data")).otherwise(l("text")).as("text"),
        l("upvotes").as("upvotes"), l("downvotes").as("downvotes"),
        l("deleted").as("deleted"),
        seqOf(l, r)))
      .orderedBy("seq")

    // updateComment on deletes: a present delete marks deleted = true
    commentsWithEdits.fullJoin(deleteEvents)
      .on((l, r) => l("commentId") === r("commentId"))
      .select((l, r) => Seq(
        coalesce(l("commentId"), r("commentId")).as("commentId"),
        l("text").as("text"),
        l("upvotes").as("upvotes"), l("downvotes").as("downvotes"),
        when(r("eventType").isNotNull, lit(true)).otherwise(l("deleted")).as("deleted"),
        seqOf(l, r)))
      .orderedBy("seq")
  }

  test("the six consumes produce the reference's exact per-event sink trace") {
    val events = new MStream(
      trace.toDF("seq", "commentId", "eventTime", "eventType", "username", "data"),
      Seq("seq"))
    val got = pipeline(events).df
      .select("seq", "text", "upvotes", "downvotes", "deleted")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

    // reference: every consume adds exactly one sink record
    assert(got.size == 6, s"6 consumes -> 6 outputs, got ${got.size}: $got")
    // consume 1 (create): text "text", 0 upvotes (assertEquals :202-204)
    assert(got(1L) == (("text", 0L, 0L, false)), s"after create: ${got(1L)}")
    // consume 2 (u2 upvote): 1 upvote (:208-209)
    assert(got(2L) == (("text", 1L, 0L, false)), s"after upvote: ${got(2L)}")
    // consume 3 (u2 changes to downvote): 0 up, 1 down (:213-215)
    assert(got(3L) == (("text", 0L, 1L, false)), s"after vote change: ${got(3L)}")
    // consume 4 (u3 upvote): 1 up, 1 down (:219-221)
    assert(got(4L) == (("text", 1L, 1L, false)), s"after second voter: ${got(4L)}")
    // consume 5 (edit): text "new text" (:225-226)
    assert(got(5L) == (("new text", 1L, 1L, false)), s"after edit: ${got(5L)}")
    // consume 6 (STALE edit, t0+3 < t0+4): still emits one record, text
    // unchanged (:228-231) — the per-record ArgMax emission rule
    assert(got(6L) == (("new text", 1L, 1L, false)), s"after stale edit: ${got(6L)}")
  }

  test("streaming one-event-per-batch reproduces the same cumulative trace") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, String, String, String)]
    val events = new MStream(
      in.toDF().toDF("seq", "commentId", "eventTime", "eventType", "username", "data"),
      Seq("seq"))
    val out = pipeline(events)
    assert(out.df.isStreaming)
    val name = s"comments_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    def snapshot(): Map[Long, (String, Long, Long, Boolean)] =
      spark.table(name).select("seq", "text", "upvotes", "downvotes", "deleted")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    try {
      // the reference's consume loop: one event per micro-batch, sink
      // record count checked after each (cumulative = k outputs after
      // consume k — per-record emission through the whole chain)
      val expected = Seq(
        1L -> (("text", 0L, 0L, false)),
        2L -> (("text", 1L, 0L, false)),
        3L -> (("text", 0L, 1L, false)),
        4L -> (("text", 1L, 1L, false)),
        5L -> (("new text", 1L, 1L, false)),
        6L -> (("new text", 1L, 1L, false)))
      trace.zip(expected).foreach { case (ev, (k, want)) =>
        in.addData(ev)
        q.processAllAvailable()
        val got = snapshot()
        assert(got.size == k, s"after consume $k: ${got.size} outputs ($got)")
        assert(got(k) == want, s"after consume $k: ${got(k)} != $want")
      }
    } finally q.stop()
  }

  test("context keys mirror the reference's key-type assertions") {
    // reference test_..._HasCorrectKeys (:315-325): a grouped flatMap's
    // OUTPUT drops back to the outer context (editEventsByTime fullKeyType
    // EmptyTuple); inside the group, nested operators carry the group key
    val events = new MStream(
      trace.toDF("seq", "commentId", "eventTime", "eventType", "username", "data"),
      Seq("seq"))
    var innerContext: Seq[String] = null
    var nestedKeys: Seq[String] = null
    val out = events.groupBy("commentId").flatMap { scoped =>
      innerContext = scoped.contextKeys
      val nested = scoped.groupBy("username")
      nestedKeys = nested.keys
      scoped.where(col("eventType") === Edit)
    }
    assert(innerContext == Seq("commentId"),
      "inside the group the stream is scoped to the group key (contextKeyType Tuple1)")
    assert(nestedKeys == Seq("commentId", "username"),
      "nested grouping composes context + own key")
    assert(out.contextKeys.isEmpty,
      "the flatMap result returns to the outer (empty) context — fullKeyType EmptyTuple")
  }
}
