package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class AsofL(lk: Int, lts: Timestamp, lid: Int)
case class AsofR(rk: Int, rts: Timestamp, rid: Int)

/**
 * Event-time streaming as-of: lefts emit only when the watermark passes
 * their timestamp, so rights that ARRIVE after a left but carry earlier
 * EVENT time still win — the property that separates an as-of join from
 * arrival-order enrichment (StreamingJoinSpec covers the latter).
 */
class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  private def run(toleranceMs: Option[Long] = None,
                  watermarkDelay: String = "0 seconds")(
      feed: (MemoryStream[AsofL], MemoryStream[AsofR], () => Set[(Int, Int)]) => Unit): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[AsofL]
    val rs = MemoryStream[AsofR]
    val out = graft.streaming.StreamingAsof.asofBackward(
      ls.toDF(), "lts", rs.toDF(), "rts", Seq("lk" -> "rk"), Seq("rid"),
      toleranceMs = toleranceMs, watermarkDelay = watermarkDelay)
    val name = s"asof_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def rows(): Set[(Int, Int)] = {
        q.processAllAvailable()
        spark.table(name).select("lid", "rid").collect()
          .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
      }
      feed(ls, rs, rows _)
    } finally q.stop()
  }

  test("a left waits for the watermark; an out-of-order earlier right still wins") {
    // 10 s allowed lateness: the t8 right arriving after the watermark has
    // seen t10 is still admissible (with 0 s it would be dropped as late —
    // the delay is the disorder bound, exactly as in native SS joins)
    run(watermarkDelay = "10 seconds") { (ls, rs, rows) =>
      // batch 1: right@5s, left@10s — watermark still behind the left
      rs.addData(AsofR(1, t(5), 1))
      ls.addData(AsofL(1, t(10), 1))
      assert(rows().isEmpty, "left must not emit before the watermark passes it")
      // batch 2: right@8s arrives AFTER the left but is EARLIER in event
      // time; a key-2 right@100s pushes the watermark past the left
      rs.addData(AsofR(1, t(8), 2), AsofR(2, t(100), 99))
      rows()
      // batch 3: any trigger lets the event-time timeout fire
      rs.addData(AsofR(2, t(101), 98))
      assert(rows() == Set((1, 2)),
        "the t8 right (latest at-or-before t10) must win over the t5 one")
    }
  }

  test("tolerance nulls stale matches; equal-timestamp rights are admissible") {
    run(toleranceMs = Some(2000L)) { (ls, rs, rows) =>
      // l1@10s: only right is @5s — outside the 2 s tolerance -> null match
      rs.addData(AsofR(1, t(5), 1))
      ls.addData(AsofL(1, t(10), 1))
      // l2@20s: rights at exactly 20s (admissible, <=) and 19s; rid ties
      // break last-wins on (ts, rightOrder)
      rs.addData(AsofR(1, t(19), 2), AsofR(1, t(20), 3))
      ls.addData(AsofL(1, t(20), 2))
      rs.addData(AsofR(2, t(100), 99)) // watermark push
      rows()
      rs.addData(AsofR(2, t(101), 98)) // timeout trigger
      assert(rows() == Set((1, -1), (2, 3)),
        "stale-beyond-tolerance -> null; equal-ts right admissible and wins")
    }
  }

  test("with a tolerance, an idle key's state evicts once its rights age out") {
    // the watermark jump triggers an extra no-data batch inside
    // processAllAvailable, so key 1's wake-up timeout fires right after
    // the jump: with a tolerance its aged-out right leaves empty state
    // (key removed); without one, the compacted right is kept forever
    // (the reference's forever-groups default) and the key stays
    def stateKeysAfterJump(tol: Option[Long]): Long = {
      implicit val sqlCtx = spark.sqlContext
      val ls = MemoryStream[AsofL]
      val rs = MemoryStream[AsofR]
      val out = graft.streaming.StreamingAsof.asofBackward(
        ls.toDF(), "lts", rs.toDF(), "rts", Seq("lk" -> "rk"), Seq("rid"),
        toleranceMs = tol)
      val name = s"asof_evict_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        rs.addData(AsofR(1, t(5), 1)) // key 1 holds one right, no lefts
        q.processAllAvailable()
        rs.addData(AsofR(2, t(100), 99)) // watermark -> 100s, far past 5s+2s
        q.processAllAvailable()
        rs.addData(AsofR(2, t(200), 98)) // ensure a further observed batch
        q.processAllAvailable()
        q.lastProgress.stateOperators(0).numRowsTotal
      } finally q.stop()
    }
    assert(stateKeysAfterJump(Some(2000L)) == 1L,
      "tolerance: idle key 1 evicts entirely; only key 2 remains")
    assert(stateKeysAfterJump(None) == 2L,
      "no tolerance: key 1 keeps its compacted right forever")
  }

  test("per-key isolation: each key matches only its own rights") {
    run() { (ls, rs, rows) =>
      rs.addData(AsofR(1, t(5), 1), AsofR(2, t(6), 2))
      ls.addData(AsofL(1, t(10), 1), AsofL(2, t(10), 2))
      rs.addData(AsofR(3, t(100), 99))
      rows()
      rs.addData(AsofR(3, t(101), 98))
      assert(rows() == Set((1, 1), (2, 2)))
    }
  }

  // ------------------------------------------------------------- forward

  private def runFwd(toleranceMs: Long, watermarkDelay: String = "0 seconds")(
      feed: (MemoryStream[AsofL], MemoryStream[AsofR], () => Set[(Int, Int)]) => Unit): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[AsofL]
    val rs = MemoryStream[AsofR]
    val out = graft.streaming.StreamingAsof.asofForward(
      ls.toDF(), "lts", rs.toDF(), "rts", Seq("lk" -> "rk"), Seq("rid"),
      toleranceMs = toleranceMs, watermarkDelay = watermarkDelay)
    val name = s"asoff_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def rows(): Set[(Int, Int)] = {
        q.processAllAvailable()
        spark.table(name).select("lid", "rid").collect()
          .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
      }
      feed(ls, rs, rows _)
    } finally q.stop()
  }

  test("forward: a left waits for its candidate to finalize; an out-of-order earlier right wins") {
    runFwd(toleranceMs = 60000L, watermarkDelay = "10 seconds") { (ls, rs, rows) =>
      // left@10s, then a right@20s arrives — candidate, but not final while
      // an earlier admissible right (>=10s) could still arrive
      ls.addData(AsofL(1, t(10), 1))
      rs.addData(AsofR(1, t(20), 1))
      assert(rows().isEmpty, "left must not emit while an earlier right may arrive")
      // right@12s arrives AFTER, but is EARLIER in event time — it must win
      rs.addData(AsofR(1, t(12), 2), AsofR(2, t(100), 99))
      rows()
      rs.addData(AsofR(2, t(101), 98)) // let the event-time timeout fire
      assert(rows() == Set((1, 2)),
        "the t12 right (earliest at-or-after t10) must win over the t20 one")
    }
  }

  test("forward: tolerance horizon finalizes an unmatched left as null") {
    runFwd(toleranceMs = 5000L) { (ls, rs, rows) =>
      ls.addData(AsofL(1, t(10), 1))
      // only right for key 1 is BEFORE the left — never admissible forward
      rs.addData(AsofR(1, t(8), 1))
      // push the watermark past 10s + 5s tolerance
      rs.addData(AsofR(2, t(100), 99))
      rows()
      rs.addData(AsofR(2, t(101), 98))
      assert(rows() == Set((1, -1)),
        "no right in [10s, 15s]: the left finalizes unmatched at the horizon")
    }
  }

  test("forward: equal-timestamp rights are admissible and ties break first-wins") {
    runFwd(toleranceMs = 60000L) { (ls, rs, rows) =>
      ls.addData(AsofL(1, t(20), 1))
      // a right at exactly 20s is admissible; rid 2 vs 5 at equal ts -> 2
      rs.addData(AsofR(1, t(20), 5), AsofR(1, t(20), 2), AsofR(1, t(25), 1))
      rs.addData(AsofR(2, t(100), 99))
      rows()
      rs.addData(AsofR(2, t(101), 98))
      assert(rows() == Set((1, 2)),
        "equal-ts rights admissible; (ts, rightOrder) ties break first-wins")
    }
  }

  test("forward: the watermark boundary is INCLUSIVE-late (ts <= w drops) — compaction loses nothing") {
    // Spark's late predicate is ts <= watermark (verified against
    // WatermarkSupport's LessThanOrEqual), so a left stamped at-or-below
    // the watermark never reaches the state machine — which is exactly why
    // compacting rights at ts <= w (none pending) is safe: no admissible
    // future left exists for them. This pins both halves.
    runFwd(toleranceMs = 60000L) { (ls, rs, rows) =>
      rs.addData(AsofR(1, t(10), 7), AsofR(2, t(10), 99)) // watermark -> 10s
      rows() // idle pass: key 1's right compacts away (no pending lefts)
      ls.addData(AsofL(1, t(10), 1)) // at exactly the watermark: late, dropped
      ls.addData(AsofL(1, t(11), 2)) // above the watermark: admitted
      rs.addData(AsofR(1, t(12), 8), AsofR(2, t(100), 97))
      rows()
      rs.addData(AsofR(2, t(101), 96)) // let the timeout fire
      assert(rows() == Set((2, 8)),
        "the boundary left is late-dropped; the live left matches the fresh right")
    }
  }

  test("forward: state empties once lefts finalize and rights age out") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[AsofL]
    val rs = MemoryStream[AsofR]
    val out = graft.streaming.StreamingAsof.asofForward(
      ls.toDF(), "lts", rs.toDF(), "rts", Seq("lk" -> "rk"), Seq("rid"),
      toleranceMs = 2000L)
    val name = s"asoff_evict_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      ls.addData(AsofL(1, t(10), 1))
      rs.addData(AsofR(1, t(11), 1))
      q.processAllAvailable()
      rs.addData(AsofR(2, t(100), 99)) // watermark far past key 1's horizon
      q.processAllAvailable()
      rs.addData(AsofR(2, t(200), 98)) // further batches let timeouts fire
      q.processAllAvailable()
      rs.addData(AsofR(2, t(300), 97))
      q.processAllAvailable()
      assert(spark.table(name).count() == 1L, "key 1's left emitted its match")
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1L,
        "key 1's state fully removed; only key 2's fresh right remains")
    } finally q.stop()
  }

  test("MStream.asofJoin(direction = Forward) lowers to the forward state machine") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.AsofJoins
    val ls = MemoryStream[AsofL]
    val rs = MemoryStream[AsofR]
    val lefts = new graft.api.MStream(ls.toDF(), Seq("lts"))
    val rights = new graft.api.MStream(rs.toDF(), Seq("rts"))
    intercept[IllegalArgumentException] { // forward needs a horizon
      lefts.asofJoin(rights, "lts", "rts", Seq("lk" -> "rk"), Seq("rid"),
        direction = AsofJoins.Forward)
    }
    val out = lefts.asofJoin(rights, "lts", "rts", Seq("lk" -> "rk"), Seq("rid"),
      tolerance = Some(60000L), direction = AsofJoins.Forward)
    assert(out.df.isStreaming)
    val name = s"asoff_ms_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      ls.addData(AsofL(1, t(10), 1))
      rs.addData(AsofR(1, t(15), 7))
      rs.addData(AsofR(2, t(100), 99))
      q.processAllAvailable()
      rs.addData(AsofR(2, t(101), 98))
      q.processAllAvailable()
      val got = spark.table(name).select("lid", "rid").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
      assert(got == Set((1, 7)))
    } finally q.stop()
  }
}
