package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.SpaceSaving

/** Windowed SpaceSaving heavy hitters: the algorithm's guarantees against
  * a definitional reference, batch == streaming under controlled arrival
  * order, bounded state (k counters per OPEN window, gone after close),
  * and watermark-driven window firing. */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  test("table guarantees: est >= true >= est - err; frequent items present") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 10) {
      val items = Seq.fill(300)(s"t${rnd.nextInt(20)}")
      val k = 2 + rnd.nextInt(8)
      val tab = items.foldLeft(SpaceSaving.Table(k, Map.empty))(_.add(_))
      assert(tab.counters.size <= k, "never more than k counters")
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      for ((t, est, err) <- tab.rows) {
        assert(est >= truth(t), s"$t: overestimate only")
        assert(est - err <= truth(t), s"$t: error bound holds")
      }
      val n = items.size
      for ((t, c) <- truth if c > n.toLong / k)
        assert(tab.counters.contains(t), s"frequent item $t (count $c > $n/$k) must survive")
    }
  }

  // arrival order is seq; two 10-second windows plus late flush rows
  private def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
  private val rows = Seq(
    (1L, ts(1), "a a b"),
    (2L, ts(3), "a c c c"),
    (3L, ts(8), "b d"),
    (4L, ts(12), "x y x"),
    (5L, ts(15), "x z"))
  private def w0ms = rows.head._2.getTime - Math.floorMod(rows.head._2.getTime, 10000L)

  test("batch face folds per window in event order (hand-run reference)") {
    val batch = SpaceSaving.heavyHittersWindowed(
      MStream(rows.toDF("seq", "ts", "text"), "seq"),
      "text", "ts", windowMs = 10000L, k = 3)
    assert(!batch.df.isStreaming)
    val b = batch.df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // window 0 token order: a a b | a c c c | b d -> a:3, c:3, b reaches 2,
    // then d evicts the (count, token)-minimal b:2 -> d:(3,2)
    assert(b.filter(_._1 == w0ms) == Set(
      (w0ms, "a", 3L, 0L), (w0ms, "c", 3L, 0L), (w0ms, "d", 3L, 2L)),
      s"hand-run window 0, got ${b.filter(_._1 == w0ms)}")
    assert(b.filter(_._1 == w0ms + 10000L).map(r => (r._2, r._3, r._4)) ==
      Set(("x", 3L, 0L), ("y", 1L, 0L), ("z", 1L, 0L)),
      "window 1 fits within k: exact counts, zero error")
  }

  test("streaming equals the batch fold; state is per open window, then gone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b = SpaceSaving.heavyHittersWindowed(
        MStream(rows.toDF("seq", "ts", "text"), "seq"),
        "text", "ts", windowMs = 10000L, k = 3)
      .df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = SpaceSaving.heavyHittersWindowed(
      MStream(in.toDF().toDF("seq", "ts", "text"), "seq")
        .withWatermark("ts", "0 seconds"),
      "text", "ts", windowMs = 10000L, k = 3)
    assert(out.df.isStreaming)
    val name = s"ss_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal <= 2L),
        "state: one row per OPEN window, never per token")
      // each flush batch advances the watermark; the due timeouts fire on
      // the batch AFTER the advance (round-4 note), so flush twice
      in.addData((6L, ts(25), "flush"))
      q.processAllAvailable()
      in.addData((7L, ts(39), "flush2"))
      q.processAllAvailable()
      // the flush rows' own windows also close and emit — compare the
      // two windows under test
      val s = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .filter(r => r._1 == w0ms || r._1 == w0ms + 10000L).toSet
      assert(s == b, s"streaming equals the batch fold:\n  $s\n  vs $b")
    } finally q.stop()
  }
}
