package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * SpaceSaving heavy hitters (Metwally, Agrawal & El Abbadi 2005,
 * "Efficient Computation of Frequent and Top-k Elements in Data Streams")
 * over tumbling event-time windows: per window, track at most `k`
 * (token → (count, err)) counters — an unseen token evicts the minimal
 * counter and inherits its count as its error bound. The classic
 * guarantees hold per window: `count ≥ true ≥ count − err`, and any token
 * with true frequency > N/k is in the table.
 *
 * This is the BOUNDED-STATE windowed frequency tracker: where
 * `StreamingWindows.timeWindowApply` buffers a window's rows, this folds
 * them away — state per open window is k counters regardless of volume,
 * the shape that holds at 100 TB/day ingest. The sketch is
 * order-dependent by definition, so both faces fold in the SAME order:
 * batch sorts (window, eventOrder…, token position) and folds each
 * window in one pass (`Scans.foldKeyRuns` — no per-window collect);
 * streaming folds each micro-batch's rows in event order into the keyed
 * state and emits when the watermark closes the window
 * (`EventTimeTimeout`, the `timeWindowApply` firing rule). Order
 * dependence also means no SQL oracle — the gate is the spec equality
 * (streaming == batch) plus ScalaCheck against the definitional fold.
 *
 * Output: (window_start_ms, token, est, err), best-first per window
 * (est desc, token asc). Raw counters — filter `est - err >= t` for
 * guaranteed-frequency reporting.
 */
object SpaceSaving {

  final val StateVersion = 1

  /** The pure bounded table; immutable, shared by both faces and the
    * property tests. Eviction is deterministic: the (count, token)-
    * minimal counter goes. */
  final case class Table(k: Int, counters: Map[String, (Long, Long)]) {
    def add(token: String): Table = counters.get(token) match {
      case Some((c, e)) => copy(counters = counters.updated(token, (c + 1, e)))
      case None if counters.size < k =>
        copy(counters = counters.updated(token, (1L, 0L)))
      case None =>
        val (mt, (mc, _)) = counters.minBy { case (t, (c, _)) => (c, t) }
        copy(counters = (counters - mt).updated(token, (mc + 1, mc)))
    }
    /** (token, est, err) best-first: (est desc, token asc). */
    def rows: Seq[(String, Long, Long)] =
      counters.toSeq.map { case (t, (c, e)) => (t, c, e) }
        .sortBy { case (t, c, _) => (-c, t) }
  }

  final case class State(version: Int, counters: Map[String, (Long, Long)])

  private[graft] def requireStateVersion(v: Int): Unit =
    require(v <= StateVersion,
      s"SpaceSaving window state format $v is newer than this library's " +
        s"$StateVersion — upgrade the reading side (refusing to misread state)")

  private def outSchema = StructType(Seq(
    StructField("window_start_ms", LongType, nullable = false),
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  /** Dual-mode windowed heavy hitters; `tsCol` must be a timestamp
    * column (streaming: carry a watermark on it — the window fires when
    * the watermark passes its end). Batch needs `eventOrder` on the
    * stream, the repo-wide order contract for stateful folds. */
  def heavyHittersWindowed(stream: graft.api.MStream, textCol: String,
                           tsCol: String, windowMs: Long,
                           k: Int): graft.api.MStream = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    require(k >= 1 && k <= 100000,
      s"k=$k counters per window; keep the table human-bounded")
    val df = stream.df
    val tsMs = unix_millis(col(tsCol).cast("timestamp"))
    val win = (tsMs - pmod(tsMs, lit(windowMs))).as("__w")
    val outEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)

    if (!df.isStreaming) {
      require(stream.eventOrder.nonEmpty,
        "batch SpaceSaving folds in arrival order: call orderedBy(...) first " +
          "(the repo-wide batch contract for order-dependent state)")
      val toks = df
        .select(win +: stream.eventOrder.map(col) :+
          posexplode(TextOps.words(col(textCol))).as(Seq("__p", "__t")): _*)
      val sorted = toks
        .repartition(col("__w"))
        .sortWithinPartitions(
          col("__w") +: stream.eventOrder.map(col) :+ col("__p"): _*)
      val wIdx = sorted.schema.fieldIndex("__w")
      val tIdx = sorted.schema.fieldIndex("__t")
      val kk = k
      val folded = sorted.mapPartitions { it =>
        graft.operators.Scans.foldKeyRuns[Row, Long, (Long, Table)](
          it, _.getLong(wIdx), (0L, Table(kk, Map.empty)),
          { case ((_, tab), r) => (r.getLong(wIdx), tab.add(r.getString(tIdx))) })
          .flatMap { case (w, tab) =>
            tab.rows.map { case (t, c, e) => Row(w, t, c, e) } }
      }(outEnc)
      return new graft.api.MStream(folded.toDF(), stream.eventOrder,
        stream.contextKeys, stream.name)
    }

    implicit val stEnc: Encoder[State] = Encoders.kryo[State]
    implicit val rowEnc: Encoder[Row] = outEnc
    // the watermark-tagged column must survive the projection — the
    // event-time timeout is rejected at analysis without it
    val toks = df
      .select(win +: col(tsCol) +: stream.eventOrder.map(col) :+
        posexplode(TextOps.words(col(textCol))).as(Seq("__p", "__t")): _*)
    val oIdx = (stream.eventOrder :+ "__p").map(toks.schema.fieldIndex)
    val tIdx = toks.schema.fieldIndex("__t")
    val kk = k; val wm = windowMs
    val out = graft.streaming.KeyedRows.byNames(toks, Seq("__w"))
      .flatMapGroupsWithState[State, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Row, it: Iterator[Row], state: GroupState[State]) =>
          if (state.hasTimedOut) {
            val st = state.get
            requireStateVersion(st.version)
            state.remove()
            val w = key.getLong(0)
            Table(kk, st.counters).rows.iterator
              .map { case (t, c, e) => Row(w, t, c, e) }
          } else {
            val prev = state.getOption.getOrElse(State(StateVersion, Map.empty))
            requireStateVersion(prev.version)
            var tab = Table(kk, prev.counters)
            it.toSeq.sorted(graft.streaming.EventOrder.rowOrdering(oIdx))
              .foreach(r => tab = tab.add(r.getString(tIdx)))
            state.update(State(StateVersion, tab.counters))
            // fire when the watermark passes the window end (never in
            // the past) — the timeWindowApply rule
            val end = key.getLong(0) + wm
            state.setTimeoutTimestamp(
              math.max(end, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
    new graft.api.MStream(out.toDF(), stream.eventOrder,
      stream.contextKeys, stream.name)
  }
}
