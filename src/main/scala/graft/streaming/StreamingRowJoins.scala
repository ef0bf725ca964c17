package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression, Predicate}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/**
 * Serializable evaluator for a residual join condition over a `(_l, _r)`
 * pair row: the Column is analyzed and bound to the pair schema on the
 * driver; the compiled predicate and the Row->InternalRow serializer
 * materialize lazily per executor. Null evaluates to false, matching the
 * batch lowering's `when(resid, ...)` null semantics.
 */
final class PairPredicate(bound: Expression, schema: StructType) extends Serializable {
  @transient private lazy val toInternal =
    ExpressionEncoder(RowEncoder.encoderFor(schema)).createSerializer()
  @transient private lazy val pred = Predicate.create(bound)
  def apply(l: Row, r: Row): Boolean = pred.eval(toInternal(Row(l, r)))
}

object PairPredicate {
  /** Resolve `cond` (references `_l`/`_r` struct fields) against the pair
    * schema and bind it for raw InternalRow evaluation. */
  def bind(spark: org.apache.spark.sql.SparkSession, pairSchema: StructType,
           cond: Column): PairPredicate = {
    val dummy = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], pairSchema)
    val analyzed = ColumnBridge.analyzedExpr(dummy, cond)
    val bound = BindReferences.bindReference(analyzed, ColumnBridge.output(dummy))
    new PairPredicate(bound, pairSchema)
  }
}

/**
 * Untyped (Row-based) streaming enrichment joins, so the SAME `MStream`
 * join program lowers to `flatMapGroupsWithState` when its inputs are
 * streaming DataFrames (batch inputs take the union+window lowering in
 * `EnrichmentJoins`). Output schema matches the batch lowering: nullable
 * `_l`/`_r` structs awaiting `select`/`selectAll`.
 *
 * `residual` is the cross-side non-equi part of the join condition,
 * applied INSIDE the keyed state machine at pairing time — the same
 * EVALUATION point as the reference's co-process post-conditions
 * (milan `FullJoinKeyedCoProcessFunction.scala:51-92`,
 * `ConnectedStreamsGenerator.scala:70-75`). Emission on a failing pair:
 * left-inner matches the reference exactly (the left stays buffered until
 * a right actually satisfying the condition arrives). Full enrichment is
 * reference-strict BY DEFAULT: an arrival whose (lastLeft, lastRight)
 * pair fails the residual emits NOTHING, exactly the reference's
 * `collect` only inside `if (postCondition(...))`
 * (`FullJoinKeyedCoProcessFunction.scala:57-79`); a null other side makes
 * a residual that references it evaluate to null = fail, unless the
 * residual is explicitly null-tolerant. `lenientResidual = true`
 * (JoinBuilder `.lenient()`) restores the SQL-outer-join-style face:
 * the failing pair keeps the arriving side and nulls the other.
 */
object StreamingRowJoins {
  import StreamingJoins.{FullEnrichment, Kind, LeftEnrichment, LeftInner}

  def enrichmentJoin(lp: DataFrame, rp: DataFrame,
                     lKeys: Seq[org.apache.spark.sql.Column], rKeys: Seq[org.apache.spark.sql.Column],
                     lOrder: Seq[String], rOrder: Seq[String],
                     kind: Kind, residual: Option[Column] = None,
                     lenientResidual: Boolean = false): DataFrame = {
    val lStructT = StructType(lp.schema.fields)
    val rStructT = StructType(rp.schema.fields)
    val pairSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("_l", lStructT),
      org.apache.spark.sql.types.StructField("_r", rStructT)))
    val residPred: Option[PairPredicate] =
      residual.map(PairPredicate.bind(lp.sparkSession, pairSchema, _))

    def prep(df: DataFrame, keys: Seq[org.apache.spark.sql.Column], order: Seq[String],
             isLeft: Boolean): DataFrame = {
      val self = struct(df.columns.toIndexedSeq.map(df.col): _*)
      // positional aliases inside the key/seq structs: the two sides'
      // key/order COLUMNS may be named differently (l.user_id = r.uid),
      // and unionByName aligns nested struct fields by name — mismatched
      // field names would fail analysis even though positions agree
      df.select(
        (if (isLeft) self else lit(null).cast(lStructT)).as("_l"),
        (if (isLeft) lit(null).cast(rStructT) else self).as("_r"),
        struct(keys.zipWithIndex.map { case (c, i) => c.as(s"_k$i") }: _*).as("__k"),
        struct(order.zipWithIndex.map { case (c, i) => df.col(c).as(s"_o$i") }: _*).as("__seq"),
        lit(if (isLeft) 1 else 0).as("__tag"))
    }

    val u = prep(lp, lKeys, lOrder, isLeft = true)
      .unionByName(prep(rp, rKeys, rOrder, isLeft = false))

    implicit val stEnc: Encoder[(Row, Row, List[Row])] = Encoders.kryo[(Row, Row, List[Row])]
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(pairSchema)

    val seqIdx = u.schema.fieldIndex("__seq")
    val tagIdx = u.schema.fieldIndex("__tag")
    val lIdx = u.schema.fieldIndex("_l")
    val rIdx = u.schema.fieldIndex("_r")

    // Typed row ordering: order-struct values compared natively (EventOrder),
    // then tag — rights (0) before lefts (1) at equal seq.
    val seqOrdering: Ordering[Row] = (x: Row, y: Row) => {
      val c = EventOrder.compareSeqs(x.getStruct(seqIdx).toSeq, y.getStruct(seqIdx).toSeq)
      if (c != 0) c else java.lang.Integer.compare(x.getInt(tagIdx), y.getInt(tagIdx))
    }

    // native struct key (KeyedRows): the state exchange partitions on the
    // __k column itself and checkpoint keys are UnsafeRows, not kryo blobs
    KeyedRows.byStructCol(u, "__k")
      .flatMapGroupsWithState[(Row, Row, List[Row]), Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Row, it: Iterator[Row], state: GroupState[(Row, Row, List[Row])]) =>
          var (lastL, lastR, pending) = state.getOption.getOrElse((null: Row, null: Row, List.empty[Row]))
          // residual holds for a pair (true when no residual was given)
          def ok(l: Row, r: Row): Boolean = residPred.forall(p => p(l, r))
          val outs = scala.collection.mutable.ArrayBuffer.empty[Row]
          it.toSeq.sorted(seqOrdering).foreach { rec =>
            if (rec.getInt(tagIdx) == 1) { // left arrival
              val l = rec.getStruct(lIdx)
              lastL = l
              kind match {
                case LeftEnrichment => outs += Row(l, lastR)
                case FullEnrichment =>
                  if (!lenientResidual) {
                    // reference-strict: emit only when the post-condition
                    // holds for (arriving left, lastRight); a null right
                    // fails any residual that references it
                    if (ok(l, lastR)) outs += Row(l, lastR)
                  } else {
                    // lenient: failing residual keeps the arriving side,
                    // nulls the other
                    outs += Row(l, if (lastR != null && ok(l, lastR)) lastR else null)
                  }
                case LeftInner =>
                  if (lastR != null && ok(l, lastR)) outs += Row(l, lastR)
                  else pending :+= l
              }
            } else { // right arrival
              val r = rec.getStruct(rIdx)
              lastR = r
              kind match {
                case LeftEnrichment => ()
                case FullEnrichment =>
                  if (!lenientResidual) {
                    if (ok(lastL, r)) outs += Row(lastL, r)
                  } else {
                    outs += Row(if (lastL != null && ok(lastL, r)) lastL else null, r)
                  }
                case LeftInner =>
                  val (matched, stillWaiting) = pending.partition(l => ok(l, r))
                  matched.foreach(l => outs += Row(l, r))
                  pending = stillWaiting
              }
            }
          }
          state.update((lastL, lastR, pending))
          outs.iterator
      }(stEnc, outEnc)
      .toDF()
  }
}
