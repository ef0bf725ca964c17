package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/**
 * EVENT-TIME-correct streaming as-of joins — the streaming lowerings of
 * `operators/AsofJoins`, with the semantics a feature pipeline needs: each
 * left matches on its EVENT time, not on whichever right happened to
 * ARRIVE first. Because streams arrive out of event-time order, a left
 * cannot emit on arrival — a better-timestamped right may still be in
 * flight. Lefts buffer per key and emit exactly when the watermark proves
 * no better right can still arrive (event-time timeout). Neither Milan
 * (arrival-order enrichment only) nor native Structured Streaming
 * (interval joins emit ALL rights in range, not one) expresses this
 * directly.
 *
 * Backward (`asofBackward`): latest right at-or-before the left's
 * timestamp; a left matures when the watermark passes its own timestamp.
 * State per key is bounded by the watermark: pending lefts drain as it
 * advances, and the right history COMPACTS to a single record at-or-below
 * the watermark — among rights older than every future left, only the
 * latest can ever win. With a tolerance, an idle key's compacted right
 * ages out entirely and the key's state is removed; without one, that
 * single record is legitimately needed forever — the reference's own
 * forever-groups enrichment default.
 *
 * Forward (`asofForward`): earliest right at-or-after, first-wins ties —
 * the mirror state machine. A left's match is final when the watermark
 * passes its current candidate's timestamp (no earlier admissible right
 * can still arrive), or passes `ts + tolerance` with no candidate (none
 * ever will). The tolerance is REQUIRED in the forward direction: without
 * a horizon, a left with no future right would wait, and hold state,
 * forever. Rights compact to those still admissible to some pending left
 * or newer than the watermark.
 *
 * The timestamp columns must be TimestampType; `toleranceMs` is in
 * milliseconds (the watermark clock). Emission ties match the batch
 * operator: a right at exactly the left's timestamp is admissible; ties
 * among equal-timestamp rights break by rightOrder — last wins backward,
 * first wins forward.
 */
object StreamingAsof {

  /** Tagged union of both sides with key/ts/ro columns, watermarked. */
  private def tagged(left: DataFrame, leftTs: String,
                     right: DataFrame, rightTs: String,
                     keys: Seq[(String, String)], rightOrder: Seq[String],
                     watermarkDelay: String): (DataFrame, StructType, StructType, StructType) = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key pair")
    require(rightOrder.nonEmpty,
      "rightOrder must name tie-break column(s) for equal right timestamps")
    require(left.schema(leftTs).dataType == TimestampType &&
      right.schema(rightTs).dataType == TimestampType,
      "streaming as-of needs TimestampType event-time columns (the watermark clock)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")

    val lStructT = StructType(left.schema.fields)
    val rStructT = StructType(right.schema.fields)
    val roType = StructType(rightOrder.map(c => right.schema(c)).toIndexedSeq)

    def prep(df: DataFrame, ts: String, ks: Seq[String], isLeft: Boolean): DataFrame = {
      val self = struct(df.columns.toIndexedSeq.map(df.col): _*)
      // null event times have no place on a watermark clock: drop them
      // rather than NPE in the state machine
      df.filter(df.col(ts).isNotNull).select(
        (if (isLeft) self else lit(null).cast(lStructT)).as("_l"),
        (if (isLeft) lit(null).cast(rStructT) else self).as("_r"),
        struct(ks.zipWithIndex.map { case (k, i) => df.col(k).as(s"k$i") }: _*).as("__k"),
        df.col(ts).as("__ts"),
        lit(if (isLeft) 1 else 0).as("__tag"),
        (if (isLeft) lit(null).cast(roType)
         else struct(rightOrder.map(df.col): _*)).as("__ro"))
    }

    val u = prep(left, leftTs, keys.map(_._1), isLeft = true)
      .unionByName(prep(right, rightTs, keys.map(_._2), isLeft = false))
      .withWatermark("__ts", watermarkDelay)
    (u, lStructT, rStructT, roType)
  }

  private def unpair(paired: DataFrame, left: DataFrame, right: DataFrame,
                     inner: Boolean): DataFrame = {
    val kept = if (inner) paired.filter(col("_r").isNotNull) else paired
    kept.select(
      left.columns.toIndexedSeq.map(c => col(s"_l.$c").as(c)) ++
        right.columns.toIndexedSeq.map(c => col(s"_r.$c").as(c)): _*)
  }

  def asofBackward(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keys: Seq[(String, String)],
                   rightOrder: Seq[String],
                   toleranceMs: Option[Long] = None,
                   watermarkDelay: String = "0 seconds",
                   inner: Boolean = false): DataFrame = {
    val (u, lStructT, rStructT, _) =
      tagged(left, leftTs, right, rightTs, keys, rightOrder, watermarkDelay)
    val pairSchema = StructType(Seq(
      StructField("_l", lStructT), StructField("_r", rStructT)))

    // state: (pending lefts (tsMs, left), right history (tsMs, right, ro))
    implicit val stEnc: Encoder[(List[(Long, Row)], List[(Long, Row, Row)])] =
      Encoders.kryo[(List[(Long, Row)], List[(Long, Row, Row)])]
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(pairSchema)

    val tsIdx = u.schema.fieldIndex("__ts")
    val tagIdx = u.schema.fieldIndex("__tag")
    val lIdx = u.schema.fieldIndex("_l")
    val rIdx = u.schema.fieldIndex("_r")
    val roIdx = u.schema.fieldIndex("__ro")
    val tol = toleranceMs

    // max by (ts, rightOrder): the winning right among candidates
    def later(a: (Long, Row, Row), b: (Long, Row, Row)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && EventOrder.compareSeqs(a._3.toSeq, b._3.toSeq) > 0)
    def best(cands: List[(Long, Row, Row)]): Row =
      cands.reduceOption((x, y) => if (later(x, y)) x else y).map(_._2).orNull

    // native struct key (KeyedRows): the state exchange partitions on the
    // __k column itself and checkpoint keys are UnsafeRows, not kryo blobs
    val paired = KeyedRows.byStructCol(u, "__k")
      .flatMapGroupsWithState[(List[(Long, Row)], List[(Long, Row, Row)]), Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, it: Iterator[Row], state: GroupState[(List[(Long, Row)], List[(Long, Row, Row)])]) =>
          val st = state.getOption.getOrElse(
            (List.empty[(Long, Row)], List.empty[(Long, Row, Row)]))
          // buffer-append the batch (List :+ would copy the whole list per
          // record — quadratic on a hot key)
          val pendingBuf = scala.collection.mutable.ListBuffer.from(st._1)
          val rightsBuf = scala.collection.mutable.ListBuffer.from(st._2)
          it.foreach { rec =>
            val ts = rec.getTimestamp(tsIdx).getTime
            if (rec.getInt(tagIdx) == 1) pendingBuf += ((ts, rec.getStruct(lIdx)))
            else rightsBuf += ((ts, rec.getStruct(rIdx), rec.getStruct(roIdx)))
          }
          val w = state.getCurrentWatermarkMs()
          // a left matures once the watermark passes it STRICTLY: while
          // w < ts an equal-timestamp right can still be admitted (the
          // late-drop predicate is ts <= watermark, evaluated against the
          // PREVIOUS batch's watermark), so waiting for w > ts keeps
          // equal-timestamp rights admissible
          val (mature, stillPending) = pendingBuf.toList.partition(_._1 < w)
          val allRights = rightsBuf.toList
          val outs = mature.sortBy(_._1).map { case (lts, l) =>
            val cands = allRights.filter(r =>
              r._1 <= lts && tol.forall(t => r._1 >= lts - t))
            Row(l, best(cands))
          }
          // compact: of the rights at-or-below the watermark, only the
          // latest can win for any future (necessarily later) left; with
          // a tolerance, a right older than watermark - tolerance cannot
          // match ANY future left (all have ts > watermark) — drop it
          val (old, fresh) = allRights.partition(_._1 <= w)
          val keptOld = old.reduceOption((x, y) => if (later(x, y)) x else y)
            .filter(r => tol.forall(t => r._1 >= w - t)).toList
          val rights = keptOld ++ fresh
          val pending = stillPending
          if (pending.isEmpty && rights.isEmpty) state.remove()
          else {
            state.update((pending, rights))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(pending.map(_._1).min, state.getCurrentWatermarkMs() + 1))
            else tol.foreach { t =>
              // no lefts waiting: wake once every currently-held right has
              // aged past the tolerance horizon, so an idle key's state
              // reaches empty and is removed. Without a tolerance the
              // single compacted right is legitimately needed forever —
              // the reference's own forever-groups enrichment default.
              state.setTimeoutTimestamp(math.max(
                rights.map(_._1).max + t + 1, state.getCurrentWatermarkMs() + 1))
            }
          }
          outs.iterator
      }(stEnc, outEnc)
      .toDF()

    unpair(paired, left, right, inner)
  }

  /** Forward as-of: earliest right in `[leftTs, leftTs + toleranceMs]`,
    * first-wins ties on (ts, rightOrder). The mirror of `asofBackward`'s
    * state machine — see the object scaladoc for the maturity argument.
    * `toleranceMs` is required: it is the horizon that lets unmatched
    * lefts (and their state) finalize. */
  def asofForward(left: DataFrame, leftTs: String,
                  right: DataFrame, rightTs: String,
                  keys: Seq[(String, String)],
                  rightOrder: Seq[String],
                  toleranceMs: Long,
                  watermarkDelay: String = "0 seconds",
                  inner: Boolean = false): DataFrame = {
    require(toleranceMs >= 0L,
      "streaming forward as-of needs a non-negative tolerance horizon (ms)")
    val (u, lStructT, rStructT, _) =
      tagged(left, leftTs, right, rightTs, keys, rightOrder, watermarkDelay)
    val pairSchema = StructType(Seq(
      StructField("_l", lStructT), StructField("_r", rStructT)))

    implicit val stEnc: Encoder[(List[(Long, Row)], List[(Long, Row, Row)])] =
      Encoders.kryo[(List[(Long, Row)], List[(Long, Row, Row)])]
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(pairSchema)

    val tsIdx = u.schema.fieldIndex("__ts")
    val tagIdx = u.schema.fieldIndex("__tag")
    val lIdx = u.schema.fieldIndex("_l")
    val rIdx = u.schema.fieldIndex("_r")
    val roIdx = u.schema.fieldIndex("__ro")
    val tol = toleranceMs

    // min by (ts, rightOrder): the winning right among candidates
    def earlier(a: (Long, Row, Row), b: (Long, Row, Row)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && EventOrder.compareSeqs(a._3.toSeq, b._3.toSeq) < 0)
    def candidate(rights: List[(Long, Row, Row)], lts: Long): Option[(Long, Row, Row)] =
      rights.filter(r => r._1 >= lts && r._1 <= lts + tol)
        .reduceOption((x, y) => if (earlier(x, y)) x else y)
    // a left's match is FINAL once the watermark strictly passes its
    // finality bound: candidate ts (no earlier/equal-ts right can still
    // arrive and beat it — even a tie, since first-wins ties need the
    // watermark past the tie timestamp) or, with no candidate, ts + tol
    // (no admissible right can ever arrive)
    def bound(rights: List[(Long, Row, Row)], lts: Long): Long =
      candidate(rights, lts).map(_._1).getOrElse(lts + tol)

    val paired = KeyedRows.byStructCol(u, "__k")
      .flatMapGroupsWithState[(List[(Long, Row)], List[(Long, Row, Row)]), Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, it: Iterator[Row], state: GroupState[(List[(Long, Row)], List[(Long, Row, Row)])]) =>
          val st = state.getOption.getOrElse(
            (List.empty[(Long, Row)], List.empty[(Long, Row, Row)]))
          val pendingBuf = scala.collection.mutable.ListBuffer.from(st._1)
          val rightsBuf = scala.collection.mutable.ListBuffer.from(st._2)
          it.foreach { rec =>
            val ts = rec.getTimestamp(tsIdx).getTime
            if (rec.getInt(tagIdx) == 1) pendingBuf += ((ts, rec.getStruct(lIdx)))
            else rightsBuf += ((ts, rec.getStruct(rIdx), rec.getStruct(roIdx)))
          }
          val w = state.getCurrentWatermarkMs()
          val allRights = rightsBuf.toList
          val (mature, stillPending) =
            pendingBuf.toList.partition { case (lts, _) => bound(allRights, lts) < w }
          val outs = mature.sortBy(_._1).map { case (lts, l) =>
            Row(l, candidate(allRights, lts).map(_._2).orNull)
          }
          // compact: Spark drops input rows with ts <= watermark as late
          // (WatermarkSupport builds a LessThanOrEqual predicate), so any
          // future left has lts STRICTLY above w and its admissible rights
          // have ts >= lts > w — a right at-or-below the watermark is only
          // needed while a PENDING left can still match it
          val rights = allRights.filter(r =>
            r._1 > w || stillPending.exists { case (lts, _) =>
              r._1 >= lts && r._1 <= lts + tol
            })
          if (stillPending.isEmpty && rights.isEmpty) state.remove()
          else {
            state.update((stillPending, rights))
            if (stillPending.nonEmpty)
              state.setTimeoutTimestamp(math.max(
                stillPending.map { case (lts, _) => bound(rights, lts) }.min + 1,
                state.getCurrentWatermarkMs() + 1))
            else
              // only unmatched-by-any-left rights remain: wake once the
              // watermark passes the last of them so the key's state empties
              state.setTimeoutTimestamp(math.max(
                rights.map(_._1).max + 1, state.getCurrentWatermarkMs() + 1))
          }
          outs.iterator
      }(stEnc, outEnc)
      .toDF()

    unpair(paired, left, right, inner)
  }
}
