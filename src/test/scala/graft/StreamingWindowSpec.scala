package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingWindows

case class TEv(k: String, ts: Timestamp, v: Double)
case class Trail(k: String, seq: Long, tsum: Double)

/** Streaming window semantics: watermarked tumbling aggregation in update
  * mode; trailing-n record windows emit per record. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("tumbling window aggregates per (window, key) with watermark = window size") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TEv]
    val agg = StreamingWindows.tumbling(in.toDF(), "ts", "10 seconds", keys = Seq("k"))
      .agg(sum(col("v")).as("total"))
      .select(col("w.start").cast("long").as("ws"), col("k"), col("total"))
    val name = s"win_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    try {
      def t(s: Long) = new Timestamp(s * 1000)
      in.addData(TEv("a", t(1), 1.0), TEv("a", t(5), 2.0), TEv("a", t(12), 4.0))
      q.processAllAvailable()
      val out = spark.table(name).as[(Long, String, Double)].collect().toSet
      assert(out.contains((0L, "a", 3.0)), "window [0,10) sums in-window records")
      assert(out.contains((10L, "a", 4.0)), "window [10,20) opens with the late-window record")
    } finally q.stop()
  }

  test("append mode emits a window only after the watermark passes its end") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TEv]
    val agg = StreamingWindows.tumbling(in.toDF(), "ts", "10 seconds", keys = Seq("k"),
        lateness = Some("0 seconds"))
      .agg(sum(col("v")).as("total"))
      .select(col("w.start").cast("long").as("ws"), col("k"), col("total"))
    val name = s"winap_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: Long) = new Timestamp(s * 1000)
      in.addData(TEv("a", t(1), 1.0), TEv("a", t(5), 2.0))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0, "open window emits nothing in append mode")
      in.addData(TEv("a", t(25), 4.0)) // watermark jumps past window [0,10)
      q.processAllAvailable()
      in.addData(TEv("a", t(26), 1.0)) // one more batch so the closed window flushes
      q.processAllAvailable()
      val out = spark.table(name).as[(Long, String, Double)].collect().toSet
      assert(out.contains((0L, "a", 3.0)), "window [0,10) closed and emitted exactly once")
    } finally q.stop()
  }

  test("time-window apply emits the full window contents once, at window close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TEv]
    val out = StreamingWindows.timeWindowApply[TEv, String, Med](
      in.toDS().withWatermark("ts", "0 seconds"), _.k, _.ts, windowMs = 10000L) {
      (ws, k, buf) =>
        val vs = buf.map(_.v).sorted
        Med(k, ws.getTime / 1000, vs(vs.length / 2))
    }
    val name = s"twa_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: Long) = new Timestamp(s * 1000)
      in.addData(TEv("a", t(1), 1.0), TEv("a", t(5), 9.0), TEv("a", t(8), 5.0))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0, "open window emits nothing")
      in.addData(TEv("a", t(25), 7.0)) // watermark → 25, window [0,10) closes
      q.processAllAvailable()
      in.addData(TEv("a", t(26), 1.0)) // extra batch to deliver the timeout
      q.processAllAvailable()
      val got = spark.table(name).as[Med].collect().toSet
      assert(got == Set(Med("a", 0L, 5.0)),
        "median over the full closed window, emitted exactly once")
    } finally q.stop()
  }

  test("session windows run streaming through the same MStream API (append at close)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TEv]
    val out = new graft.api.MStream(in.toDF())
      .withWatermark("ts", "0 seconds")
      .groupBy("k")
      .sessionWindow(col("ts"), "5 seconds")
      .select("s_start", count(lit(1)).as("cnt"), sum(col("v")).as("total"))
      .df
    assert(out.isStreaming)
    val name = s"sess_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def t(s: Long) = new Timestamp(s * 1000)
      in.addData(TEv("a", t(1), 1.0), TEv("a", t(3), 2.0)) // one session [1, 8)
      in.addData(TEv("a", t(20), 4.0))                     // gap > 5s: new session + watermark -> 20
      q.processAllAvailable()
      in.addData(TEv("a", t(40), 8.0)) // advance watermark past the second session
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got.contains((1000000L, "a", 2L, 3.0)), "first session merged both events")
      assert(got.contains((20000000L, "a", 1L, 4.0)), "gap opened a second session")
    } finally q.stop()
  }

  test("recordWindow(n) emits trailing-n aggregate per record across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingWindows.recordWindow[Ev, String, Trail](
      in.toDS(), _.k, _.seq, 3)((t, w) => Trail(t.k, t.seq, w.map(_.v).sum))
    val name = s"rw_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Ev("a", 1, 1.0), Ev("a", 2, 2.0))
      in.addData(Ev("a", 3, 4.0), Ev("a", 4, 8.0))
      q.processAllAvailable()
      val got = spark.table(name).as[Trail].collect().toSet
      assert(got == Set(Trail("a", 1, 1.0), Trail("a", 2, 3.0),
        Trail("a", 3, 7.0), Trail("a", 4, 14.0)),
        "ring buffer keeps last 3 across batch boundaries")
    } finally q.stop()
  }
}
