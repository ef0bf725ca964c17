package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.api.MStream

/**
 * Milan's enrichment joins, Spark-first.
 *
 * Reference semantics (`runtime/LeftJoinKeyedCoProcessFunction.scala:47-75`,
 * `FullJoinKeyedCoProcessFunction.scala:51-92`,
 * `LeftInnerJoinKeyedCoProcessFunction.scala:48`):
 *  - LeftEnrichment: a left arrival pairs with the latest right arrival of
 *    the same key (or null); right arrivals emit nothing.
 *  - FullEnrichment: any arrival pairs with the latest arrival of the other
 *    side (either may be null).
 *  - LeftInner: lefts buffer until a right satisfying the condition exists;
 *    each left emits exactly once.
 *
 * The join condition is split exactly like the reference's
 * `JoinPreconditionExtractor` / `JoinKeyExpressionExtractor` /
 * `KeySelectorExtractor` (milan-scala-compiler trees package), but on
 * Catalyst expressions: single-side conjuncts become pushed-down filters,
 * cross-side equalities become the shuffle key, anything else is a residual
 * applied at pairing time. Non-equi joins (no equality conjunct) are
 * rejected, as in the reference (`ConnectedStreamsGenerator.scala:50`).
 *
 * Batch lowering: tag both sides, union, and compute "latest other side"
 * with a window over the arrival order — ONE shuffle on the join key, no
 * join node, no state blowup; per-key ordering scales to any number of
 * keys (the sort is within key partitions). Streaming lowering lives in
 * `graft.streaming.StatefulJoins`.
 */
object EnrichmentJoins {
  sealed trait Kind
  case object LeftEnrichment extends Kind
  case object FullEnrichment extends Kind
  case object LeftInner extends Kind

  private val L = "_l"
  private val R = "_r"

  /** Name prefixes used to tag which side a column reference belongs to.
    * Spark 4 `Column`s are plan-agnostic (unresolved by name), so side
    * membership can't come from exprIds; tagging by name also makes
    * self-joins (both sides derived from one source) unambiguous. */
  private val LTag = "__L__"
  private val RTag = "__R__"

  /** Split a join condition's conjuncts by which side they reference. */
  final case class Split(
      leftPreIdx: Seq[Int], rightPreIdx: Seq[Int],
      equiIdx: Seq[Int], residualIdx: Seq[Int],
      leftKeys: Seq[Expression], rightKeys: Seq[Expression])

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  private def refNames(e: Expression): Seq[String] =
    e.collect { case a: Attribute => a.name }

  private def allTagged(e: Expression, tag: String): Boolean = {
    val ns = refNames(e); ns.nonEmpty && ns.forall(_.startsWith(tag))
  }

  /** Rewrite tagged references back to plain column names. */
  private def untag(e: Expression): Expression = e.transform {
    case a: Attribute if a.name.startsWith(LTag) =>
      UnresolvedAttribute.quoted(a.name.stripPrefix(LTag))
    case a: Attribute if a.name.startsWith(RTag) =>
      UnresolvedAttribute.quoted(a.name.stripPrefix(RTag))
  }

  /** Rewrite tagged references to fields of the given parent structs. */
  private def retag(e: Expression, lParent: String, rParent: String): Expression = e.transform {
    case a: Attribute if a.name.startsWith(LTag) =>
      UnresolvedAttribute(Seq(lParent, a.name.stripPrefix(LTag)))
    case a: Attribute if a.name.startsWith(RTag) =>
      UnresolvedAttribute(Seq(rParent, a.name.stripPrefix(RTag)))
  }

  private[graft] def splitCondition(cond: Expression): Split = {
    val cs = conjuncts(cond)
    var (lp, rp, eq, res) = (Vector[Int](), Vector[Int](), Vector[Int](), Vector[Int]())
    var (lk, rk) = (Vector[Expression](), Vector[Expression]())
    cs.zipWithIndex.foreach { case (c, i) =>
      if (allTagged(c, LTag)) lp :+= i
      else if (allTagged(c, RTag)) rp :+= i
      else c match {
        case EqualTo(a, b) if allTagged(a, LTag) && allTagged(b, RTag) =>
          eq :+= i; lk :+= untag(a); rk :+= untag(b)
        case EqualTo(a, b) if allTagged(b, LTag) && allTagged(a, RTag) =>
          eq :+= i; lk :+= untag(b); rk :+= untag(a)
        case _ => res :+= i
      }
    }
    require(eq.nonEmpty, "Non-keyed enrichment joins are not supported (no cross-side equality conjunct)")
    Split(lp, rp, eq, res, lk, rk)
  }

  def build(left: MStream, right: MStream,
            kind: Kind,
            cond: (String => Column, String => Column) => Column,
            lenientResidual: Boolean = false): JoinedMStream = {
    require(left.eventOrder.nonEmpty && right.eventOrder.nonEmpty,
      "enrichment joins need orderedBy(...) on both sides in batch mode")
    val lDf = left.df
    val rDf = right.df

    // Resolve the tagged condition against a (never-executed) cross-join of
    // both sides so we get a real Catalyst tree with typed attributes.
    val lTaggedDf = lDf.select(lDf.columns.toIndexedSeq.map(c => lDf(c).as(LTag + c)): _*)
    val rTaggedDf = rDf.select(rDf.columns.toIndexedSeq.map(c => rDf(c).as(RTag + c)): _*)
    val taggedCond = ColumnBridge.analyzedExpr(
      lTaggedDf.crossJoin(rTaggedDf), cond(n => col(LTag + n), n => col(RTag + n)))
    val split = splitCondition(taggedCond)
    val taggedConjuncts = conjuncts(taggedCond)

    def sideCol(i: Int): Column = ColumnBridge.column(untag(taggedConjuncts(i)))
    val leftPre  = split.leftPreIdx.map(sideCol).reduceOption(_ && _)
    val rightPre = split.rightPreIdx.map(sideCol).reduceOption(_ && _)
    val lKeyCols = split.leftKeys.map(ColumnBridge.column)
    val rKeyCols = split.rightKeys.map(ColumnBridge.column)

    // Residual conjuncts, rebuilt against the paired structs by renaming
    // each side's references to fields of the given parent struct columns.
    def residualFor(lParent: String, rParent: String): Option[Column] =
      if (split.residualIdx.isEmpty) None
      else Some(split.residualIdx
        .map(i => ColumnBridge.column(retag(taggedConjuncts(i), lParent, rParent)))
        .reduce(_ && _))

    val lp = leftPre.map(lDf.filter).getOrElse(lDf)
    val rp = rightPre.map(rDf.filter).getOrElse(rDf)
    val lStructT = org.apache.spark.sql.types.StructType(lp.schema.fields)
    val rStructT = org.apache.spark.sql.types.StructType(rp.schema.fields)

    // Streaming inputs: same program, stateful lowering. Residuals apply
    // post-pairing for left-enrichment (all outputs are left arrivals, so
    // a native projection suffices); for full/left-inner the residual
    // changes PAIRING itself (which side nulls, whether a left keeps
    // waiting), so it evaluates inside the keyed state machine — the
    // reference applies its post-condition in every co-process function
    // the same way (`FullJoinKeyedCoProcessFunction.scala:51-92`).
    if (lp.isStreaming || rp.isStreaming) {
      val residCol = residualFor(L, R)
      val paired0 = graft.streaming.StreamingRowJoins.enrichmentJoin(
        lp, rp, lKeyCols, rKeyCols, left.eventOrder, right.eventOrder,
        kind match {
          case LeftEnrichment => graft.streaming.StreamingJoins.LeftEnrichment
          case FullEnrichment => graft.streaming.StreamingJoins.FullEnrichment
          case LeftInner      => graft.streaming.StreamingJoins.LeftInner
        },
        residual = if (kind == LeftEnrichment) None else residCol,
        lenientResidual = lenientResidual)
      val paired = (kind, residCol) match {
        case (LeftEnrichment, Some(resid)) =>
          paired0.select(col(L),
            when(col(R).isNotNull && resid, col(R)).otherwise(lit(null).cast(rStructT)).as(R))
        case _ => paired0
      }
      return new JoinedMStream(withLineage(paired, kind, left.name), lStructT, rStructT, left.name)
    }

    val keyNames = lKeyCols.indices.map(i => s"_k$i")
    val ordNames = left.eventOrder.indices.map(i => s"_o$i")
    val lTagged = lp.select(
      struct(lp.columns.toIndexedSeq.map(lp.col): _*).as(L) +:
      lit(null).cast(rStructT).as(R) +:
      (lKeyCols.zip(keyNames).map { case (c, n) => c.as(n) } ++
       left.eventOrder.zip(ordNames).map { case (c, n) => lp.col(c).as(n) } :+
       lit(1).as("_tag")): _*)
    val rTagged = rp.select(
      lit(null).cast(lStructT).as(L) +:
      struct(rp.columns.toIndexedSeq.map(rp.col): _*).as(R) +:
      (rKeyCols.zip(keyNames).map { case (c, n) => c.as(n) } ++
       right.eventOrder.zip(ordNames).map { case (c, n) => rp.col(c).as(n) } :+
       lit(0).as("_tag")): _*)
    val u = lTagged.unionByName(rTagged)

    // rights sort before lefts at equal arrival order, so a left sees a
    // same-instant right (matches the reference's arrival interleaving).
    val ord = ordNames.map(col) :+ col("_tag")
    val wPast = Window.partitionBy(keyNames.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val paired: DataFrame = kind match {
      case LeftEnrichment =>
        val withLast = u.withColumn("__lastr", last(col(R), ignoreNulls = true).over(wPast))
        val lefts = withLast.filter(col("_tag") === 1)
        val rOut = residualFor(L, "__lastr") match {
          case Some(resid) => when(resid, col("__lastr")).otherwise(lit(null).cast(rStructT))
          case None        => col("__lastr")
        }
        lefts.select(col(L), rOut.as(R))
      case FullEnrichment =>
        val withLast = u
          .withColumn("__lastl", last(col(L), ignoreNulls = true).over(wPast))
          .withColumn("__lastr", last(col(R), ignoreNulls = true).over(wPast))
        val resid = residualFor("__lastl", "__lastr")
        resid match {
          case Some(p) if !lenientResidual =>
            // reference-strict (the default): an arrival whose
            // (lastLeft, lastRight) pair fails the residual emits NOTHING
            // (`FullJoinKeyedCoProcessFunction.scala:57-79` collects only
            // inside `if (postCondition(...))`). A null side makes the
            // residual NULL, which filters — unless the residual itself
            // is null-tolerant (e.g. `r IS NULL OR ...`).
            withLast.filter(p).select(col("__lastl").as(L), col("__lastr").as(R))
          case Some(p) => // lenient: failing pair keeps the arriving side
            val lOut = when(col("_tag") === 1, col(L))
              .otherwise(when(p, col("__lastl")).otherwise(lit(null).cast(lStructT)))
            val rOut = when(col("_tag") === 0, col(R))
              .otherwise(when(p, col("__lastr")).otherwise(lit(null).cast(rStructT)))
            withLast.select(lOut.as(L), rOut.as(R))
          case None =>
            withLast.select(col("__lastl").as(L), col("__lastr").as(R))
        }
      case LeftInner =>
        val resid = residualFor(L, "__r")
        resid match {
          case None =>
            val wFut = Window.partitionBy(keyNames.map(col): _*).orderBy(ord: _*)
              .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            u.withColumn("__lastr", last(col(R), ignoreNulls = true).over(wPast))
              .withColumn("__nextr", first(col(R), ignoreNulls = true).over(wFut))
              .filter(col("_tag") === 1)
              .select(col(L), coalesce(col("__lastr"), col("__nextr")).as(R))
              .filter(col(R).isNotNull)
          case Some(_) =>
            // General (residual) path: the latest-prior right counts only if
            // it satisfies the residual; otherwise the left waits for the
            // first future right that does. A naive waiting×future-rights
            // join materializes w×r pairs on a hot key before keeping 1, so
            // the search runs in order-bucketed ROUNDS over a rights-only
            // sequence number: each waiting left first joins its next 16
            // rights, the still-unmatched its next 512, and the (rare)
            // remainder proceeds in FIXED chunks of `residualChunk` rights
            // per round — never an unbounded per-left scan. A left whose
            // key has no rights beyond its scanned horizon leaves the loop
            // (left-inner semantics: it emits nothing), so adversarial
            // never-matching lefts on a hot key terminate after scanning
            // that key's rights once, in bounded slices, instead of
            // materializing a stuck×all-rights cross in one task.
            val lefts = u.filter(col("_tag") === 1)
              .withColumn("__lastr", last(col(R), ignoreNulls = true).over(wPast))
              // rights seen so far: a future right is one with seq > this
              .withColumn("__nr", count(col(R)).over(wPast))
            val residPrev = residualFor(L, "__lastr").get
            val immediate = lefts.filter(col("__lastr").isNotNull && residPrev)
              .select(col(L), col("__lastr").as(R))
            val waiting = lefts.filter(col("__lastr").isNull || !residPrev)
              .select(col(L) +: col("__nr") +: keyNames.map(col): _*)
            val wRight = Window.partitionBy(keyNames.map(col): _*).orderBy(ord: _*)
            val rights = u.filter(col("_tag") === 0)
              .withColumn("__rn", row_number().over(wRight))
              .select((col(R).as("__r") +: col("__rn") +:
                keyNames.map(c => col(c).as(s"r$c"))): _*)
            val residFut = residualFor(L, "__r").get
            val keyEq = keyNames.map(k => col(k) === col(s"r$k")).reduce(_ && _)
            def matchRound(w: DataFrame, lo: Column, hi: Column): DataFrame =
              w.join(rights, keyEq && col("__rn") > lo && col("__rn") <= hi && residFut,
                  "inner")
                .withColumn("__rk", row_number().over(
                  Window.partitionBy(col(L)).orderBy(col("__rn"))))
                .filter(col("__rk") === 1)
                .select(col(L), col("__r").as(R))
            def unmatched(w: DataFrame, m: DataFrame): DataFrame =
              w.join(m.select(col(L).as("__ml")), col(L) <=> col("__ml"), "left_anti")
            val m1 = matchRound(waiting, col("__nr"), col("__nr") + 16)
            val w2 = unmatched(waiting, m1)
            val m2 = matchRound(w2, col("__nr") + 16, col("__nr") + 512)
            // remainder loop: stuck lefts carry their key's rights extent;
            // each round is one bounded chunk, checkpointed so the (small,
            // monotonically shrinking) stuck set doesn't re-derive the
            // whole upstream per round. NOTE this makes a residual
            // left-inner join EAGER when any left is still unmatched after
            // 512 future rights (driver-looped jobs at build time) — the
            // common case checkpoints once, finds the stuck set empty, and
            // never iterates, leaving NOTHING pinned. Every intermediate
            // (superseded stuck frames, the final empty stuck frame,
            // per-chunk match checkpoints) unpersists here; if the loop
            // matched anything, the chunks consolidate into ONE pinned
            // frame registered with graft.api.Pinned for App-level release
            // (the returned plan references it, so it cannot drop earlier).
            val chunk = lDf.sparkSession.conf
              .get("graft.join.residualChunk", "65536").toLong
            require(chunk > 0, s"graft.join.residualChunk must be positive, got $chunk")
            // release is RDD-level: Dataset.unpersist only talks to the
            // CacheManager and silently IGNORES localCheckpoint blocks, so
            // every checkpoint captures its pinned ids (exactly, off its
            // own LogicalRDD node) and frees them through the RDD
            // handles — the same mechanics as connectedComponents/buildVocab
            val sc = lDf.sparkSession.sparkContext
            def cpTracked(d: DataFrame): (DataFrame, Set[Int]) =
              graft.api.Pinned.checkpointTracked(d)
            def unpersistIds(ids: Set[Int]): Unit =
              graft.api.Pinned.unpersist(sc, ids)
            val maxRn = rights.groupBy(keyNames.map(k => col(s"r$k")): _*)
              .agg(max(col("__rn")).as("__maxrn"))
            var (stuck, stuckIds) = cpTracked(unmatched(w2, m2).join(maxRn, keyEq, "inner")
              .filter(col("__maxrn") > col("__nr") + 512)
              .select(col(L) +: col("__nr") +: col("__maxrn") +: keyNames.map(col): _*))
            var acc = immediate.unionByName(m1).unionByName(m2)
            var chunkIds = Set.empty[Int]
            var round = 0L
            while (!stuck.isEmpty) {
              val lo = col("__nr") + 512 + lit(round * chunk)
              val (m, mIds) = cpTracked(matchRound(stuck, lo, lo + chunk))
              chunkIds ++= mIds
              acc = acc.unionByName(m)
              val prevIds = stuckIds
              val next = cpTracked(unmatched(stuck, m)
                .filter(col("__maxrn") > col("__nr") + 512 + lit((round + 1L) * chunk)))
              stuck = next._1; stuckIds = next._2
              unpersistIds(prevIds)
              round += 1L
            }
            unpersistIds(stuckIds) // the final stuck frame is empty
            if (chunkIds.nonEmpty) {
              // consolidate the per-chunk checkpoints into the ONE frame
              // the returned plan references; register it for caller-side
              // release (graft.api.Pinned), free the chunks now
              val (consolidated, accIds) = cpTracked(acc)
              graft.api.Pinned.register(lDf.sparkSession, accIds)
              unpersistIds(chunkIds)
              acc = consolidated
            }
            acc
        }
    }
    new JoinedMStream(withLineage(paired, kind, left.name), lStructT, rStructT, left.name)
  }

  /** Opt-in lineage (active when the running configuration bound a lineage
    * sink, Milan `ApplicationConfiguration.addLineageSink`): the paired
    * frame gains a content-hash `record_id` — which `select`/`selectAll`
    * carry into the join output — and one (output_id → input_id) edge per
    * present side registers with the session recorder. Input ids equal
    * `Lineage.withRecordId` of each input row (a struct hashes as its
    * fields), so edges correlate with ids minted upstream. */
  private def withLineage(paired: DataFrame, kind: Kind, name: String): DataFrame =
    graft.api.Lineage.current(paired.sparkSession) match {
      case None => paired
      case Some(rec) =>
        graft.api.Lineage.record(rec, s"$kind:$name", paired,
          idCols = Seq(col(L), col(R)),
          inputIds = Seq(
            when(col(L).isNotNull, xxhash64(col(L))),
            when(col(R).isNotNull, xxhash64(col(R)))))
    }

  /**
   * Milan stream ⋈ windowed-stream join (`LeftWindowedJoin`,
   * `program/JoinExpressions.scala:210`; used with `recordWindow(n)` for
   * latest-n-per-key lookups, see `bodaboda/BodaApp.scala:46-59`): each
   * left record sees the last `n` right records of its key at its arrival
   * point. Same single-shuffle union+window lowering; the right window is
   * a bounded ring-buffer aggregate (`functions.BoundedLastList`) over the
   * running frame — at most `n` elements of state per key regardless of
   * how many rights precede, so a hot key with millions of rights never
   * materializes more than `n` rows per output (the streaming path in
   * `StreamingJoins` bounds state the same way).
   */
  def buildWindowed(left: MStream, right: MStream, n: Int,
                    cond: (String => Column, String => Column) => Column): WindowJoinedMStream = {
    require(left.eventOrder.nonEmpty && right.eventOrder.nonEmpty,
      "windowed joins need orderedBy(...) on both sides in batch mode")
    val lDf = left.df
    val rDf = right.df
    val lTaggedDf = lDf.select(lDf.columns.toIndexedSeq.map(c => lDf(c).as(LTag + c)): _*)
    val rTaggedDf = rDf.select(rDf.columns.toIndexedSeq.map(c => rDf(c).as(RTag + c)): _*)
    val taggedCond = ColumnBridge.analyzedExpr(
      lTaggedDf.crossJoin(rTaggedDf), cond(nm => col(LTag + nm), nm => col(RTag + nm)))
    val split = splitCondition(taggedCond)
    require(split.residualIdx.isEmpty, "windowed joins support only equi-key + preconditions")
    val taggedConjuncts = conjuncts(taggedCond)
    def sideCol(i: Int): Column = ColumnBridge.column(untag(taggedConjuncts(i)))
    val lp = split.leftPreIdx.map(sideCol).reduceOption(_ && _).map(lDf.filter).getOrElse(lDf)
    val rp = split.rightPreIdx.map(sideCol).reduceOption(_ && _).map(rDf.filter).getOrElse(rDf)
    val lKeyCols = split.leftKeys.map(ColumnBridge.column)
    val rKeyCols = split.rightKeys.map(ColumnBridge.column)

    val lStructT = org.apache.spark.sql.types.StructType(lp.schema.fields)
    val rStructT = org.apache.spark.sql.types.StructType(rp.schema.fields)
    val keyNames = lKeyCols.indices.map(i => s"_k$i")
    val ordNames = left.eventOrder.indices.map(i => s"_o$i")
    val lTagged = lp.select(
      struct(lp.columns.toIndexedSeq.map(lp.col): _*).as(L) +:
      lit(null).cast(rStructT).as(R) +:
      (lKeyCols.zip(keyNames).map { case (c, nm) => c.as(nm) } ++
       left.eventOrder.zip(ordNames).map { case (c, nm) => lp.col(c).as(nm) } :+
       lit(1).as("_tag")): _*)
    val rTagged = rp.select(
      lit(null).cast(lStructT).as(L) +:
      struct(rp.columns.toIndexedSeq.map(rp.col): _*).as(R) +:
      (rKeyCols.zip(keyNames).map { case (c, nm) => c.as(nm) } ++
       right.eventOrder.zip(ordNames).map { case (c, nm) => rp.col(c).as(nm) } :+
       lit(0).as("_tag")): _*)
    val u = lTagged.unionByName(rTagged)
    val ord = ordNames.map(col) :+ col("_tag")
    val wPast = Window.partitionBy(keyNames.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tailN = ColumnBridge.column(
      graft.functions.BoundedLastList(ColumnBridge.expr(col(R)), n).toAggregateExpression())
    val lefts = u.withColumn("_rwin", tailN.over(wPast))
      .filter(col("_tag") === 1)
      .select(col(L), col("_rwin"))
    new WindowJoinedMStream(lefts, left.name)
  }
}

/** Milan `LeftJoinedWindowedStream` (`lang/JoinedWindowedStream.scala:16`):
  * left records paired with the window contents of the right stream,
  * awaiting `apply`. */
final class WindowJoinedMStream(paired: DataFrame, name: String) {
  /** Milan windowed-join `apply` (`lang/JoinedWindowedStream.scala:26`):
    * project from the left record and the array of right records. */
  def select(f: (String => Column, Column) => Seq[Column]): MStream =
    new MStream(paired.select(f(c => col(s"_l.$c"), col("_rwin")): _*), Nil, Nil, name)
}

/** Milan `JoinedStream` (`lang/JoinedStream.scala:21`): the paired sides as
  * nullable structs awaiting `select`/`selectAll`. */
final class JoinedMStream(
    val paired: DataFrame,
    lType: org.apache.spark.sql.types.StructType,
    rType: org.apache.spark.sql.types.StructType,
    name: String) {

  /** When the lineage recorder was active at build time, the paired frame
    * carries a `record_id` that projections must keep exposing. */
  private def withRecordId(cols: Seq[Column]): Seq[Column] =
    if (paired.columns.contains("record_id")) cols :+ col("record_id") else cols

  /** Milan join `select` (`lang/JoinedStream.scala:105`): project from both
    * sides; unmatched side reads as null (reference null semantics). */
  def select(f: (String => Column, String => Column) => Seq[Column]): MStream =
    new MStream(paired.select(
      withRecordId(f(c => col(s"_l.$c"), c => col(s"_r.$c"))): _*), Nil, Nil, name)

  /** Milan `selectAll()` (`lang/JoinedStream.scala:43`): concat both sides'
    * fields, renaming right-side collisions (TypeJoiner semantics). */
  def selectAll(): MStream = {
    val lNames = lType.fieldNames.toSeq
    val cols = lNames.map(c => col(s"_l.$c").as(c)) ++
      rType.fieldNames.toSeq.map { c =>
        val out = if (lNames.contains(c)) s"right_$c" else c
        col(s"_r.$c").as(out)
      }
    new MStream(paired.select(withRecordId(cols): _*), Nil, Nil, name)
  }
}
