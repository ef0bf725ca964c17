package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.api.MStream
import graft.streaming.StreamingRowScans
import graft.streaming.StreamingRowScans.{RCount, RMean, RProduct, RSum, RunKind}

/**
 * Milan's stateful sequential operators (`ScanExpression`s,
 * `program/StreamExpressions.scala:494`), with BOTH lowerings behind one
 * API: batch inputs use window functions over the arrival order
 * (whole-stage codegen, one shuffle on the key); streaming inputs use the
 * keyed-state engine in `streaming.StreamingRowScans`. The reference runs
 * these per key with Flink ValueState (`runtime/ArgScanProcessFunction`,
 * `event/operators/ScanOperations.scala`).
 */
object Scans {

  private def requireOrder(s: MStream): Seq[String] = {
    require(s.eventOrder.nonEmpty, "stateful scan needs orderedBy(...) — arrival order columns")
    s.eventOrder
  }

  /** Milan `maxBy`/`minBy` (`lang/Stream.scala:229,239`): emit a record only
    * when its arg strictly beats the running max/min — i.e. on change, not
    * per record ("Milan Operations.md", MaxBy/MinBy). First record emits. */
  def argCompare(s: MStream, keys: Seq[String], arg: Column, isMax: Boolean): MStream = {
    val order = requireOrder(s)
    if (s.df.isStreaming)
      return new MStream(StreamingRowScans.argCompare(s.df, keys, order, arg, isMax),
        s.eventOrder, s.contextKeys, s.name)
    val past = (if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy())
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val running = (if (isMax) max(arg) else min(arg)).over(past)
    // compare against the materialized column, not the raw window expression
    // — a window function may not appear inside a WHERE clause
    val beats = if (isMax) arg > col("__run") else arg < col("__run")
    new MStream(
      s.df.withColumn("__run", running).filter(col("__run").isNull || beats).drop("__run"),
      s.eventOrder, s.contextKeys, s.name)
  }

  /** Milan `sumBy` family (`lang/Stream.scala:251`): running aggregate per
    * key; output = input record + running value (one output per input). */
  def runningAgg(s: MStream, keys: Seq[String], arg: Column, kind: RunKind, as: String): MStream = {
    val order = requireOrder(s)
    val out =
      if (s.df.isStreaming) StreamingRowScans.running(s.df, keys, order, arg, kind, as)
      else {
        val agg = kind match {
          case RSum => sum(arg)
          case RMean => avg(arg)
          case RProduct => product(arg)
          case RCount => count(lit(1))
        }
        val w = (if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy())
          .orderBy(order.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        s.df.withColumn(as, agg.over(w))
      }
    // opt-in lineage (config bound a lineage sink): each output row IS its
    // input row plus the running column, so the input id derives in place
    val withLineage = graft.api.Lineage.current(s.df.sparkSession) match {
      case None => out
      case Some(rec) =>
        val inCols = s.df.columns.toIndexedSeq.map(col)
        graft.api.Lineage.record(rec, s"$kind:${s.name}", out,
          idCols = out.columns.toIndexedSeq.map(col),
          inputIds = Seq(xxhash64(struct(inCols: _*))))
    }
    new MStream(withLineage, s.eventOrder, s.contextKeys, s.name)
  }

  /** Milan `last()` (`lang/Stream.scala:123`, `runtime/LastOperators.scala`):
    * final record per key (global when unkeyed — the reference forces
    * parallelism 1 there; batch uses a global aggregate instead, which
    * stays distributed via partial aggregation). */
  def lastRecord(s: MStream, keys: Seq[String]): MStream = {
    val order = requireOrder(s)
    if (s.df.isStreaming)
      return new MStream(StreamingRowScans.lastRecord(s.df, keys, order),
        s.eventOrder, Nil, s.name)
    val ordKey = struct(order.map(col): _*)
    val payload = struct(s.df.columns.toIndexedSeq.map(col): _*)
    val agg = max_by(payload, ordKey).as("__last")
    val out =
      if (keys.isEmpty) s.df.agg(agg).select(col("__last.*"))
      else s.df.groupBy(keys.map(col): _*).agg(agg).select(col("__last.*"))
    new MStream(out, s.eventOrder, Nil, s.name)
  }

  /**
   * Milan `reduce` ("Milan Operations.md" declares the Scan/Reduce family;
   * like several doc-only ops it has no IR node in the reference either):
   * fold every record of a (key-scoped) stream into ONE final value per
   * key. Batch: one pass over key-sorted partitions, emitting at key
   * boundaries — no per-group materialization, spill-safe via the shuffle
   * sort. Streaming: the running fold's latest value re-emits per
   * micro-batch (the micro-batch face of "final", same update semantics
   * as `last()`).
   */
  def reduceRows[S: scala.reflect.ClassTag: Encoder](s: MStream, keys: Seq[String], initial: S,
                                                     step: (S, Row) => S): MStream = {
    val order = requireOrder(s)
    val df = s.df
    val keyIdx = keys.map(df.columns.indexOf(_))
    if (df.isStreaming) {
      val stEnc: Encoder[S] = Encoders.kryo[S] // state: kryo; output: caller's encoder
      val oIdx = order.map(df.schema.fieldIndex)
      val out = graft.streaming.KeyedRows.byNames(df, keys)
        .flatMapGroupsWithState[S, S](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (_: Row, it: Iterator[Row], state: GroupState[S]) =>
            var st = state.getOption.getOrElse(initial)
            it.toSeq.sorted(graft.streaming.EventOrder.rowOrdering(oIdx))
              .foreach { r => st = step(st, r) }
            state.update(st)
            Iterator.single(st)
        }(stEnc, implicitly[Encoder[S]])
      return new MStream(out.toDF(), Nil, Nil, s.name)
    }
    val sorted =
      if (keys.isEmpty) df.repartition(1).sortWithinPartitions(order.map(col): _*)
      else df.repartition(keys.map(col): _*)
        .sortWithinPartitions((keys ++ order).map(col): _*)
    val out = sorted.mapPartitions(base =>
      foldKeyRuns(base, (row: Row) => keyIdx.map(row.get), initial, step))
    new MStream(out.toDF(), Nil, Nil, s.name)
  }

  /** Fold each contiguous key run of a (key-sorted) iterator to one value,
    * lazily — the partition-local engine of [[reduceRows]], extracted pure
    * so its boundary handling is property-testable without Spark. */
  private[graft] def foldKeyRuns[A, K, S](base: Iterator[A], keyOf: A => K,
                                          initial: S, step: (S, A) => S): Iterator[S] =
    new Iterator[S] {
      private var curKey: K = _
      private var acc: S = initial
      private var open = false           // a fold is in progress
      private var pending: Option[S] = None
      private var flushed = false
      private def advance(): Unit = {
        while (pending.isEmpty && base.hasNext) {
          val row = base.next()
          val k = keyOf(row)
          if (open && k != curKey) { pending = Some(acc); acc = initial }
          curKey = k; open = true
          acc = step(acc, row)
        }
        if (pending.isEmpty && !base.hasNext && open && !flushed) {
          pending = Some(acc); flushed = true
        }
      }
      def hasNext: Boolean = { advance(); pending.nonEmpty }
      def next(): S = { advance(); val v = pending.get; pending = None; v }
    }

  /**
   * Milan generic `scan` (`lang/Stream.scala:176`): running state + one
   * optional output per record, per key. Batch: repartition by key, sort
   * within partitions, run the state machine per contiguous key run — one
   * pass, no per-group materialization, spill-safe. Streaming: the same
   * state machine inside `flatMapGroupsWithState` (kryo state).
   */
  def genericScan[S: scala.reflect.ClassTag, O: Encoder](s: MStream, keys: Seq[String], initial: S,
                                 step: (S, Row) => (S, Option[O])): MStream = {
    val order = requireOrder(s)
    val df = s.df
    val keyIdx = keys.map(df.columns.indexOf(_))
    if (df.isStreaming) {
      implicit val stEnc: Encoder[S] = Encoders.kryo[S]
      val oIdx = order.map(df.schema.fieldIndex)
      val out = graft.streaming.KeyedRows.byNames(df, keys)
        .flatMapGroupsWithState[S, O](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (_: Row, it: Iterator[Row], state: GroupState[S]) =>
            var st = state.getOption.getOrElse(initial)
            val outs = it.toSeq.sorted(graft.streaming.EventOrder.rowOrdering(oIdx)).flatMap { r =>
              val (s2, o) = step(st, r)
              st = s2
              o
            }
            state.update(st)
            outs.iterator
        }
      return new MStream(out.toDF(), Nil, Nil, s.name)
    }
    // repartition(1), not coalesce(1): a shuffle boundary keeps the upstream
    // scan/filter/projection stages at full parallelism — only the final
    // state machine is inherently serial (the reference forces parallelism 1
    // the same way, milan generator/LastByGenerator.scala:59).
    val sorted =
      if (keys.isEmpty) df.repartition(1).sortWithinPartitions(order.map(col): _*)
      else df.repartition(keys.map(col): _*)
        .sortWithinPartitions((keys ++ order).map(col): _*)
    val out = sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state: S = initial
      it.flatMap { row =>
        val k = keyIdx.map(row.get)
        if (curKey == null || k != curKey) { curKey = k; state = initial }
        val (s2, o) = step(state, row)
        state = s2
        o.iterator
      }
    }
    new MStream(out.toDF(), Nil, Nil, s.name)
  }
}
