package graft.operators

import org.apache.spark.sql.{Column, Encoder, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.api.MStream

/**
 * Milan's stateful sequential operators (`ScanExpression`s,
 * `program/StreamExpressions.scala:494`), batch lowerings.
 *
 * The reference runs these per key with Flink ValueState
 * (`runtime/ArgScanProcessFunction.scala`, `runtime/ScanProcessFunction.scala`,
 * `event/operators/ScanOperations.scala`). On Spark, the SQL-expressible
 * ones lower to window functions over the arrival order — whole-stage
 * codegen, one shuffle on the key, per-key sort only. The generic `scan`
 * uses a single-pass sorted `mapPartitions` keyed run (the direct analog of
 * the reference's composable `ScanOperation`,
 * `event/operators/ScanOperation.scala:6`).
 */
object Scans {

  private def requireOrder(s: MStream): Seq[String] = {
    require(s.eventOrder.nonEmpty, "stateful scan needs orderedBy(...) in batch mode")
    s.eventOrder
  }

  /** Milan `maxBy`/`minBy` (`lang/Stream.scala:229,239`): emit a record only
    * when its arg strictly beats the running max/min — i.e. on change, not
    * per record ("Milan Operations.md", MaxBy/MinBy). First record emits. */
  def argCompare(s: MStream, keys: Seq[String], arg: Column, isMax: Boolean): MStream = {
    val order = requireOrder(s)
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
  def runningAgg(s: MStream, keys: Seq[String], agg: Column, as: String): MStream = {
    val order = requireOrder(s)
    val w = (if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy())
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new MStream(s.df.withColumn(as, agg.over(w)), s.eventOrder, s.contextKeys, s.name)
  }

  /** Milan `last()` (`lang/Stream.scala:123`, `runtime/LastOperators.scala`):
    * final record per key (global when unkeyed — the reference forces
    * parallelism 1 there; we use a global aggregate instead, which stays
    * distributed via partial aggregation). */
  def lastRecord(s: MStream, keys: Seq[String]): MStream = {
    val order = requireOrder(s)
    val ordKey = struct(order.map(col): _*)
    val payload = struct(s.df.columns.toIndexedSeq.map(col): _*)
    val agg = max_by(payload, ordKey).as("__last")
    val out =
      if (keys.isEmpty) s.df.agg(agg).select(col("__last.*"))
      else s.df.groupBy(keys.map(col): _*).agg(agg).select(col("__last.*"))
    new MStream(out, s.eventOrder, Nil, s.name)
  }

  /**
   * Milan generic `scan` (`lang/Stream.scala:176`): running state + one
   * optional output per record, per key. Single pass: repartition by key,
   * sort within partitions by (key, arrival order), run the state machine
   * per contiguous key run — no per-group materialization, spill-safe.
   */
  def genericScan[S, O: Encoder](s: MStream, keys: Seq[String], initial: S,
                                 step: (S, Row) => (S, Option[O])): MStream = {
    val order = requireOrder(s)
    val df = s.df
    val keyIdx = keys.map(df.columns.indexOf(_))
    val sorted =
      if (keys.isEmpty) df.coalesce(1).sortWithinPartitions(order.map(col): _*)
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
