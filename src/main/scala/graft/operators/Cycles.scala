package graft.operators

import org.apache.spark.sql.DataFrame
import graft.api.MStream

/**
 * Milan `beginCycle`/`closeCycle` (`lang/CycleStream.scala:22`,
 * `program/StreamExpressions.scala:141`) models feedback edges; Flink
 * lowers them to `DataStream.iterate`. Structured Streaming has no
 * iterative streaming — the reference's own docs recommend routing
 * feedback through an external sink→source when cycles can't be used
 * (`bodaboda/BodaApp.scala:62-66`), which works unchanged here (write the
 * feedback stream to a sink, read it back as a source).
 *
 * For batch programs the equivalent is driver-side fixpoint iteration,
 * provided here: apply `step` until `maxIterations` or until the output
 * row count stabilizes (a cheap fixpoint witness that never collects rows
 * to the driver).
 */
object Cycles {

  /** Iterate a batch dataflow to a fixpoint. Each round's result is
    * localCheckpoint()ed so lineage doesn't grow unboundedly (the classic
    * iterative-Spark hazard). */
  def iterate(initial: MStream, maxIterations: Int,
              checkpoint: Boolean = true)(step: MStream => MStream): MStream = {
    var current = initial
    var lastCount = -1L
    var i = 0
    while (i < maxIterations) {
      val next = step(current)
      val df: DataFrame =
        if (checkpoint) next.df.localCheckpoint(true) else next.df
      val c = df.count()
      current = new MStream(df, next.eventOrder, next.contextKeys, next.name)
      if (c == lastCount) return current
      lastCount = c
      i += 1
    }
    current
  }
}
