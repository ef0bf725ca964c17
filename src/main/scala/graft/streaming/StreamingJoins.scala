package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming enrichment joins, mirroring the reference co-process functions:
 *
 *  - leftEnrichment (`runtime/LeftJoinKeyedCoProcessFunction.scala:47-75`):
 *    a left arrival pairs with the latest right of its key (or None);
 *    right arrivals only update state and emit nothing.
 *  - fullEnrichment (`runtime/FullJoinKeyedCoProcessFunction.scala:51-92`):
 *    an arrival on either side pairs with the latest of the other side;
 *    a residual gates emission reference-strictly by default (failing
 *    pair emits nothing; see `lenientResidual`).
 *  - leftInner (`runtime/LeftInnerJoinKeyedCoProcessFunction.scala:48`):
 *    lefts buffer until a right satisfying the residual exists; each left
 *    emits exactly once.
 *
 * Lowering: tag both sides, union, `groupByKey` on the join key, one
 * `flatMapGroupsWithState` holding (lastLeft, lastRight, pendingLefts).
 * The shuffle key is the join key — the same partitioning point as the
 * reference's `keyBy` — so state is horizontally partitioned across
 * executors, never concentrated. Internal tagged/state values use kryo
 * encoders (opaque binary, like the reference's POJO serialization);
 * the user-visible input/output Datasets keep their columnar encoders.
 *
 * Emission is per micro-batch; records within a batch are processed in
 * `seq` order with rights-before-lefts at equal seq (the reference's
 * arrival interleaving). One record per batch reproduces per-record traces.
 */
object StreamingJoins {

  sealed trait Kind
  case object LeftEnrichment extends Kind
  case object FullEnrichment extends Kind
  case object LeftInner extends Kind

  /** The shared no-residual default — ONE object, so the strict full-join
    * gate can recognize "no residual supplied" and skip evaluating it
    * against an absent side entirely. */
  private val alwaysTrue: (Any, Any) => Boolean = (_, _) => true
  def noResidual[L, R]: (L, R) => Boolean = alwaysTrue.asInstanceOf[(L, R) => Boolean]


  def enrichmentJoin[L, R, K: Encoder, O: Encoder](
      left: Dataset[L], right: Dataset[R],
      lKey: L => K, rKey: R => K,
      lSeq: L => Long, rSeq: R => Long,
      kind: Kind,
      /** Cross-side post-condition. It is handed a NULL side when that
        * side's state is absent (reference semantics) — a residual that
        * is not null-tolerant NPEs there, and that NPE is treated as
        * gate-failed (row suppressed, matching the Column faces' SQL
        * null comparison), NOT as a query error. An NPE raised with BOTH
        * sides present still propagates as a genuine residual bug; but
        * one raised while a side is null is indistinguishable from the
        * null-side dereference and degrades to suppression — write
        * residuals null-tolerant if that distinction matters. */
      residual: (L, R) => Boolean = noResidual[L, R],
      /** Evict join state for keys idle longer than this (Milan keeps
        * group state forever — unbounded on an unbounded key space). */
      stateTtl: Option[java.time.Duration] = None,
      /** Full joins only: true = a failing-residual pair emits the
        * arriving side with the other as None; false (default,
        * reference-strict) = it emits nothing, matching the reference's
        * post-condition gate (`FullJoinKeyedCoProcessFunction.scala:
        * 57-79` — collect only inside `if (postCondition(...))`, which
        * is also handed null sides there). With no residual supplied the
        * two modes coincide. */
      lenientResidual: Boolean = false)(
      out: (Option[L], Option[R]) => O): Dataset[O] = {

    implicit val tagEnc: Encoder[(K, Long, Option[L], Option[R])] =
      Encoders.kryo[(K, Long, Option[L], Option[R])]
    implicit val stEnc: Encoder[(Option[L], Option[R], List[L])] =
      Encoders.kryo[(Option[L], Option[R], List[L])]

    // Reference-strict gating hands the residual a NULL for the side with
    // no state yet (the reference does the same). Scala can't represent
    // null in a primitive, and null.asInstanceOf silently unboxes to a
    // phantom 0/false — so a primitive-typed side with a strict residual
    // is a named contract error, not a silent wrong gate.
    val hasResidual = !(residual.asInstanceOf[AnyRef] eq alwaysTrue)
    // Reference-strict gating hands the residual a NULL for a side with no
    // state yet (the reference does the same). Scala can't represent null
    // in a primitive — null.asInstanceOf silently unboxes to a phantom
    // 0/false — so reject the combination EAGERLY at construction: a lazy
    // per-arrival check would make the failure arrival-order-dependent
    // (clean in tests where lefts happen to precede rights, then a
    // terminated streaming query on the first right-before-left in
    // production).
    if (kind == FullEnrichment && !lenientResidual && hasResidual) {
      Seq("left" -> left.encoder.clsTag.runtimeClass,
          "right" -> right.encoder.clsTag.runtimeClass).foreach { case (side, cls) =>
        require(!cls.isPrimitive,
          s"graft: a reference-strict full-join residual can receive a null $side side, " +
            s"but the $side type is primitive ($cls) and null silently unboxes to zero — " +
            "box the side type (e.g. java.lang.Long) or use lenientResidual = true")
      }
    }

    // The strict gate is the ONE place user code receives a null side
    // (absent state). A residual that isn't null-tolerant NPEs there —
    // and the batch/Row faces evaluate the same null pair to FALSE (SQL
    // null comparison) and quietly suppress the row. Align the failure
    // modes: an NPE thrown WHILE a null side is in hand is gate-failed,
    // not a query-terminating error; an NPE with both sides present is a
    // genuine residual bug and propagates.
    def strictGate(l: L, r: R): Boolean =
      if (!hasResidual) true
      else try residual(l, r)
      catch {
        case _: NullPointerException
          if l.asInstanceOf[AnyRef] == null || r.asInstanceOf[AnyRef] == null => false
      }

    val lt = left.map(l => (lKey(l), lSeq(l), Option(l), Option.empty[R]))
    val rt = right.map(r => (rKey(r), rSeq(r), Option.empty[L], Option(r)))
    val u = lt.union(rt)

    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    u.groupByKey(_._1)
      .flatMapGroupsWithState[(Option[L], Option[R], List[L]), O](
        OutputMode.Append(), timeoutConf) {
        (_: K, it: Iterator[(K, Long, Option[L], Option[R])],
         state: GroupState[(Option[L], Option[R], List[L])]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var (lastL, lastR, pending) = state.getOption.getOrElse(
            (Option.empty[L], Option.empty[R], List.empty[L]))
          val outs = scala.collection.mutable.ArrayBuffer.empty[O]
          // rights before lefts at equal seq — reference interleaving
          it.toSeq.sortBy(t => (t._2, t._3.isDefined)).foreach {
            case (_, _, Some(l), _) => // left arrival
              lastL = Some(l)
              kind match {
                case LeftEnrichment =>
                  outs += out(Some(l), lastR.filter(r => residual(l, r)))
                case FullEnrichment =>
                  if (lenientResidual)
                    outs += out(Some(l), lastR.filter(r => residual(l, r)))
                  // reference-strict: the residual gates emission and is
                  // evaluated with the state's value even when absent
                  // (the reference passes null the same way; NPE on the
                  // null side = gate-failed, matching the Column faces)
                  else if (strictGate(l, lastR.getOrElse(null.asInstanceOf[R])))
                    outs += out(Some(l), lastR)
                case LeftInner =>
                  lastR.filter(r => residual(l, r)) match {
                    case some @ Some(_) => outs += out(Some(l), some)
                    case None           => pending :+= l
                  }
              }
            case (_, _, _, Some(r)) => // right arrival
              lastR = Some(r)
              kind match {
                case LeftEnrichment => // right arrivals emit nothing
                case FullEnrichment =>
                  if (lenientResidual)
                    outs += out(lastL.filter(l => residual(l, r)), Some(r))
                  else if (strictGate(lastL.getOrElse(null.asInstanceOf[L]), r))
                    outs += out(lastL, Some(r))
                case LeftInner =>
                  val (matched, stillWaiting) = pending.partition(l => residual(l, r))
                  matched.foreach(l => outs += out(Some(l), Some(r)))
                  pending = stillWaiting
              }
            case _ => ()
          }
          state.update((lastL, lastR, pending))
          stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
          outs.iterator
          }
      }
  }
}
