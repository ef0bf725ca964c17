package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/**
 * Stateless per-batch grouped reduction — a plain grouped combine in
 * `flatMapGroupsWithState` clothing (a streaming `groupBy` would hold its
 * aggregate until a watermark closes the group; this emits within the
 * micro-batch).
 *
 * The one invariant every caller relies on, enforced here so the sites
 * can't drift: **all rows carrying one group key arrive in a single
 * micro-batch**. That holds when each group's rows derive narrowly from
 * the group's own input rows (projections, explodes, stream-static joins,
 * same-batch keyed-state emissions — the ingest-operator pattern), AND
 * the upstream keys are unique per run. Under it, every group combines
 * exactly once and the operator stores ZERO state rows (spec-asserted by
 * the ingest suites) — no state-store scaling wall, nothing to
 * checkpoint, nothing to version.
 *
 * If a caller violates the unique-key precondition (the same document id
 * arriving in two source batches), each batch combines only its own rows:
 * silently duplicated/partial output. Set [[PerBatchCombine.CheckConf]]
 * to `true` to detect that at the cost of one small state row per group:
 * a second batch seeing a known key fails the query with a clear error
 * naming the key. Validation mode only — production keeps the zero-state
 * posture.
 */
object PerBatchCombine {

  /** Session conf: when `true`, cross-batch key reuse raises instead of
    * silently mis-combining. Costs one Int state row per group. */
  val CheckConf = "graft.ingest.checkUniqueIds"

  /** Combine `df`'s rows grouped by `keys` with `combine(key, rows)`,
    * emitting within the micro-batch. `combine` gets the batch's rows for
    * the group as a one-pass iterator (materialize with `.toList` only if
    * the group is known small; top-k style consumers should stream it). */
  def apply(df: DataFrame, keys: Seq[String], outEnc: Encoder[Row])(
      combine: (Row, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val check = df.sparkSession.conf.get(CheckConf, "false").toBoolean
    KeyedRows.byNames(df, keys)
      .flatMapGroupsWithState[Int, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Row, it: Iterator[Row], state) =>
          if (check) {
            if (state.exists) throw new IllegalStateException(
              s"per-batch combine saw group key $key in more than one micro-batch: " +
                "group ids must be unique across a run's source batches " +
                "(the stateless ingest combine folds only same-batch rows, so a " +
                "reused id would emit duplicated/partial results). Fix the source, " +
                s"or disable $CheckConf after validating.")
            state.update(1)
          }
          combine(key, it)
      }(Encoders.scalaInt, outEnc).toDF()
  }
}
