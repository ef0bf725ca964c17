package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * As-of (temporal point-in-time) join — an operator Spark lacks natively:
 * enrich each left row with the single most recent right row at or before
 * the left's timestamp (per key, optionally within a tolerance window).
 * The naive formulation — range join + per-left argmax — plans as a
 * nested-loop or an exploding range join; kdb's `aj`, pandas'
 * `merge_asof`, and DuckDB's `ASOF JOIN` all special-case it for the same
 * reason.
 *
 * Lowering (the same union+window engine as `EnrichmentJoins`, keyed by
 * the JOIN key and ordered by EVENT TIME rather than arrival order): tag
 * both sides, union, ONE shuffle on the key, then a running
 * `last(right, ignoreNulls)` over (ts, tag, rightOrder) with rights
 * sorting before lefts on timestamp ties — so an equal-timestamp right IS
 * visible to the left (inclusive `<=`, matching DuckDB's `>=` convention).
 * No pair materialization: a left never meets more than one right.
 *
 * Tolerance is a post-check, not a range join: the running match is the
 * most recent right overall, so if IT falls outside `[leftTs - tolerance,
 * leftTs]` every earlier right does too — null-fill (left) or drop
 * (inner) is exact.
 *
 * 100 TB posture: one hash shuffle on the key + a sort within key
 * partitions (spillable); a hot key serializes its own timeline on one
 * task — the same per-key bound as the reference's keyed co-process
 * functions and our enrichment joins. Salt or pre-aggregate upstream if a
 * single key exceeds an executor's spill budget.
 *
 * Milan analog: `leftJoin` enrichment (latest-right-so-far,
 * `runtime/LeftJoinKeyedCoProcessFunction.scala:47`) keyed by arrival
 * order; as-of generalizes it to an explicit time axis + tolerance.
 */
object AsofJoins {

  /** Match direction, for API surfaces that take it as a parameter
    * (`MStream.asofJoin`): `Backward` = latest right at-or-before
    * (kdb `aj`, the default everywhere), `Forward` = earliest right
    * at-or-after (pandas `merge_asof(direction="forward")`). */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /** Backward as-of join. `keys` pairs (leftKeyCol, rightKeyCol);
    * `rightOrder` breaks timestamp ties among rights (LAST in ascending
    * order wins — pass a unique column for determinism). Column names of
    * the two inputs must be disjoint (project first). Timestamps are any
    * orderable numeric/temporal column; `tolerance` is in the same units
    * as the timestamp columns — except TimestampType, where it is
    * MILLISECONDS (matching the streaming lowering, so one MStream
    * program means one thing in both modes). For the forward direction
    * see `asofForward`. Rights with a null timestamp are dropped
    * (they would otherwise sort first and masquerade as "oldest");
    * null-timestamp lefts emit unmatched. */
  def asofBackward(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keys: Seq[(String, String)],
                   rightOrder: Seq[String],
                   tolerance: Option[Long] = None,
                   inner: Boolean = false): DataFrame =
    asofImpl(left, leftTs, right, rightTs, keys, rightOrder, tolerance, inner,
      forward = false)

  /** Forward as-of join (pandas `merge_asof(direction="forward")`): the
    * EARLIEST right at-or-after each left's timestamp, per key, optionally
    * within `tolerance` ahead. Ties among equal-timestamp rights break
    * FIRST-wins on (ts, rightOrder) — the mirror of backward's last-wins.
    * Same one-shuffle union+window lowering, with the frame looking
    * forward. */
  def asofForward(left: DataFrame, leftTs: String,
                  right: DataFrame, rightTs: String,
                  keys: Seq[(String, String)],
                  rightOrder: Seq[String],
                  tolerance: Option[Long] = None,
                  inner: Boolean = false): DataFrame =
    asofImpl(left, leftTs, right, rightTs, keys, rightOrder, tolerance, inner,
      forward = true)

  /** Duration-typed tolerance — the unit-safe overload. Valid ONLY when
    * the timestamp columns are TimestampType (the Duration converts to the
    * millisecond axis both lowerings share); numeric ts columns must pass
    * a Long in column units via the primary signature, because a Duration
    * has no defined conversion onto an arbitrary numeric axis (a column
    * switched from long-ns to TimestampType would otherwise silently
    * reinterpret the same number as ms). */
  def asofBackward(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keys: Seq[(String, String)],
                   rightOrder: Seq[String],
                   tolerance: java.time.Duration): DataFrame =
    asofImpl(left, leftTs, right, rightTs, keys, rightOrder,
      Some(durationMs(left, leftTs, tolerance)), inner = false, forward = false)

  /** Duration-typed tolerance for the forward direction — see the
    * backward overload for the unit contract. */
  def asofForward(left: DataFrame, leftTs: String,
                  right: DataFrame, rightTs: String,
                  keys: Seq[(String, String)],
                  rightOrder: Seq[String],
                  tolerance: java.time.Duration): DataFrame =
    asofImpl(left, leftTs, right, rightTs, keys, rightOrder,
      Some(durationMs(left, leftTs, tolerance)), inner = false, forward = true)

  private def durationMs(left: DataFrame, leftTs: String,
                         tolerance: java.time.Duration): Long = {
    require(left.schema(leftTs).dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"Duration tolerance requires TimestampType timestamp columns " +
        s"(got ${left.schema(leftTs).dataType} for '$leftTs'); for numeric " +
        "timestamp columns pass a Long tolerance in column units")
    require(!tolerance.isNegative, "tolerance must be non-negative")
    tolerance.toMillis
  }

  private def asofImpl(left: DataFrame, leftTs: String,
                       right: DataFrame, rightTs: String,
                       keys: Seq[(String, String)],
                       rightOrder: Seq[String],
                       tolerance: Option[Long],
                       inner: Boolean,
                       forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key pair")
    require(rightOrder.nonEmpty,
      "rightOrder must name tie-break column(s) for equal right timestamps")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"timestamp columns must share a type, got ${left.schema(leftTs).dataType} " +
        s"vs ${right.schema(rightTs).dataType}")
    val internal = Set("__l", "__r", "__k", "__ts", "__tag", "__ro")
    val clash = (left.columns.toSet ++ right.columns.toSet).intersect(internal)
    require(clash.isEmpty, s"inputs must not contain internal columns: $clash")

    val lStructT = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rStructT = org.apache.spark.sql.types.StructType(right.schema.fields)
    // rights carry their tie-break values; lefts carry a type-matched null
    // (at equal (ts, tag) lefts only ever compare among themselves)
    val roType = org.apache.spark.sql.types.StructType(
      rightOrder.map(c => right.schema(c)).toIndexedSeq)

    // equal-timestamp rights must be VISIBLE to the left: in a backward
    // frame (ending at the left) rights sort before lefts; in a forward
    // frame (starting at the left) lefts sort before rights
    val (lTag, rTag) = if (forward) (0, 1) else (1, 0)
    val lp = left.select(
      struct(left.columns.toIndexedSeq.map(left.col): _*).as("__l"),
      lit(null).cast(rStructT).as("__r"),
      struct(keys.zipWithIndex.map { case ((lk, _), i) => left.col(lk).as(s"k$i") }: _*).as("__k"),
      left.col(leftTs).as("__ts"),
      lit(lTag).as("__tag"),
      lit(null).cast(roType).as("__ro"))
    // a null-ts right would sort FIRST (nulls-first asc) and become the
    // running match for lefts that have no genuine predecessor — drop it
    val rp = right.filter(right.col(rightTs).isNotNull).select(
      lit(null).cast(lStructT).as("__l"),
      struct(right.columns.toIndexedSeq.map(right.col): _*).as("__r"),
      struct(keys.zipWithIndex.map { case ((_, rk), i) => right.col(rk).as(s"k$i") }: _*).as("__k"),
      right.col(rightTs).as("__ts"),
      lit(rTag).as("__tag"),
      struct(rightOrder.map(right.col): _*).as("__ro"))

    val W = org.apache.spark.sql.expressions.Window
    // BOTH directions use the running [unboundedPreceding, currentRow]
    // frame — Spark executes it in one linear pass per key, whereas an
    // unbounded-FOLLOWING frame re-aggregates from each row to the
    // partition end (O(n²) on a hot key). Forward is expressed by sorting
    // DESCENDING: the running `last` then yields the earliest right
    // at-or-after the left, and `__ro` descending makes equal-timestamp
    // ties break first-wins — the exact mirror of backward's last-wins.
    // Null-ts lefts must emit unmatched in BOTH directions: nulls sort
    // FIRST, so a null-ts left's running frame holds no real rights.
    val ordered =
      if (forward)
        W.partitionBy(col("__k")).orderBy(
          col("__ts").desc_nulls_first, col("__tag").desc, col("__ro").desc)
      else
        W.partitionBy(col("__k")).orderBy(
          col("__ts").asc, col("__tag").asc, col("__ro").asc)
    val w = ordered.rowsBetween(W.unboundedPreceding, 0)

    // backward: LAST right at-or-before (latest, last-wins ties);
    // forward (desc): running last = FIRST right at-or-after (earliest,
    // first-wins ties) — equal-ts rights sort before the left in both
    // (tag asc with rights=0 backward, tag desc with rights=1 forward)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val withMatch = lp.unionByName(rp)
      .withColumn("__m", matchedRaw)
      .filter(col("__l").isNotNull)
    // TimestampType cannot subtract a bigint under ANSI; compare on epoch
    // millis there (tolerance is then ms, matching the streaming lowering)
    def tsVal(c: Column): Column =
      if (left.schema(leftTs).dataType == org.apache.spark.sql.types.TimestampType)
        unix_millis(c)
      else c
    val inTol: Column = tolerance match {
      case None => col("__m").isNotNull
      case Some(t) =>
        val m = tsVal(col("__m").getField(rightTs))
        val l = tsVal(col("__ts"))
        col("__m").isNotNull &&
          (if (forward) m <= l + lit(t) else m >= l - lit(t))
    }
    val paired = withMatch
      .withColumn("__mr", when(inTol, col("__m")).otherwise(lit(null).cast(rStructT)))
    val kept = if (inner) paired.filter(col("__mr").isNotNull) else paired
    kept.select(
      left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
        right.columns.toIndexedSeq.map(c => col(s"__mr.$c").as(c)): _*)
  }
}
