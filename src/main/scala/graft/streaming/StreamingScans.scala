package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming lowerings of Milan's stateful sequential operators
 * (`ScanExpression`s, reference `runtime/ScanProcessFunction.scala:17,66`
 * and `event/operators/ScanOperation.scala:6`): one generic keyed state
 * scan on `flatMapGroupsWithState`, with the concrete operators
 * (maxBy/minBy/sumBy/last/scan) as instances — mirroring how the reference
 * composes every scan out of one `ScanOperation` abstraction.
 *
 * Emission granularity: the reference emits per record; Structured
 * Streaming emits per micro-batch. Records *within* one micro-batch are
 * processed in `seq` order (caller supplies it), so feeding one record per
 * batch reproduces the reference's per-record traces exactly — that is
 * what the specs do.
 */
object StreamingScans {

  /**
   * Generic keyed running scan: state `S`, per-record optional output.
   * The direct analog of Milan `scan` (`lang/Stream.scala:176`).
   *
   * Milan's groups live forever; on an unbounded key space that is
   * unbounded state (the reference has the same hazard, hidden inside
   * Flink state backends). `stateTtl` opts a pipeline out: keys idle
   * longer than the TTL are evicted, resetting their running state.
   */
  def scanWithState[T, K: Encoder, S: Encoder, O: Encoder](
      ds: Dataset[T], key: T => K, seq: T => Long,
      initial: S, step: (K, S, T) => (S, Option[O]),
      stateTtl: Option[java.time.Duration] = None): Dataset[O] = {
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(key).flatMapGroupsWithState[S, O](
      OutputMode.Append(), timeoutConf) {
      (k: K, it: Iterator[T], state: GroupState[S]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var s = state.getOption.getOrElse(initial)
          val out = it.toSeq.sortBy(seq).flatMap { t =>
            val (s2, o) = step(k, s, t)
            s = s2
            o
          }
          state.update(s)
          stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
          out.iterator
        }
    }
  }

  /** Milan `maxBy`/`minBy`: emit the record only when its arg strictly
    * beats the running extreme (first record emits). */
  def argCompare[T: Encoder, K: Encoder, A: Ordering](
      ds: Dataset[T], key: T => K, seq: T => Long, arg: T => A,
      isMax: Boolean): Dataset[T] = {
    val ord = implicitly[Ordering[A]]
    implicit val stEnc: Encoder[Option[A]] = Encoders.kryo[Option[A]]
    scanWithState[T, K, Option[A], T](ds, key, seq, Option.empty[A],
      (_, s, t) => {
        val a = arg(t)
        val beats = s.forall(prev => if (isMax) ord.gt(a, prev) else ord.lt(a, prev))
        if (beats) (Some(a), Some(t)) else (s, None)
      })
  }

  /** Milan `sumBy`: running sum of the extracted arg, one output per input
    * built from (record, running value). */
  def sumBy[T: Encoder, K: Encoder, O: Encoder](
      ds: Dataset[T], key: T => K, seq: T => Long, arg: T => Double,
      out: (T, Double) => O): Dataset[O] = {
    implicit val dEnc: Encoder[Double] = Encoders.scalaDouble
    scanWithState[T, K, Double, O](ds, key, seq, 0.0,
      (_, s, t) => { val s2 = s + arg(t); (s2, Some(out(t, s2))) })
  }

  /** Milan `last()`: latest record per key, re-emitted whenever it changes
    * (update-mode semantics; the reference emits at checkpoint/end). */
  def lastByKey[T: Encoder, K: Encoder](
      ds: Dataset[T], key: T => K, seq: T => Long): Dataset[T] =
    scanWithState[T, K, T, T](ds, key, seq, null.asInstanceOf[T],
      (_, _, t) => (t, Some(t)))

  /** Running count per key (Milan `Count` scan). */
  def countByKey[T: Encoder, K: Encoder, O: Encoder](
      ds: Dataset[T], key: T => K, seq: T => Long, out: (T, Long) => O): Dataset[O] = {
    implicit val lEnc: Encoder[Long] = Encoders.scalaLong
    scanWithState[T, K, Long, O](ds, key, seq, 0L,
      (_, s, t) => { val s2 = s + 1; (s2, Some(out(t, s2))) })
  }
}
