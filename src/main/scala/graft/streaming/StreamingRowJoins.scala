package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/**
 * Untyped (Row-based) streaming enrichment joins, so the SAME `MStream`
 * join program lowers to `flatMapGroupsWithState` when its inputs are
 * streaming DataFrames (batch inputs take the union+window lowering in
 * `EnrichmentJoins`). Output schema matches the batch lowering: nullable
 * `_l`/`_r` structs awaiting `select`/`selectAll`.
 */
object StreamingRowJoins {
  import StreamingJoins.{FullEnrichment, Kind, LeftEnrichment, LeftInner}

  def enrichmentJoin(lp: DataFrame, rp: DataFrame,
                     lKeys: Seq[org.apache.spark.sql.Column], rKeys: Seq[org.apache.spark.sql.Column],
                     lOrder: Seq[String], rOrder: Seq[String],
                     kind: Kind): DataFrame = {
    val lStructT = StructType(lp.schema.fields)
    val rStructT = StructType(rp.schema.fields)
    val pairSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("_l", lStructT),
      org.apache.spark.sql.types.StructField("_r", rStructT)))

    def prep(df: DataFrame, keys: Seq[org.apache.spark.sql.Column], order: Seq[String],
             isLeft: Boolean): DataFrame = {
      val self = struct(df.columns.toIndexedSeq.map(df.col): _*)
      df.select(
        (if (isLeft) self else lit(null).cast(lStructT)).as("_l"),
        (if (isLeft) lit(null).cast(rStructT) else self).as("_r"),
        struct(keys: _*).as("__k"),
        struct(order.map(df.col): _*).as("__seq"),
        lit(if (isLeft) 1 else 0).as("__tag"))
    }

    val u = prep(lp, lKeys, lOrder, isLeft = true)
      .unionByName(prep(rp, rKeys, rOrder, isLeft = false))

    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(u.schema)
    implicit val keyEnc: Encoder[Seq[Any]] = Encoders.kryo[Seq[Any]]
    implicit val stEnc: Encoder[(Row, Row, List[Row])] = Encoders.kryo[(Row, Row, List[Row])]
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(pairSchema)

    val kIdx = u.schema.fieldIndex("__k")
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

    u.groupByKey(r => r.getStruct(kIdx).toSeq)(keyEnc)
      .flatMapGroupsWithState[(Row, Row, List[Row]), Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Seq[Any], it: Iterator[Row], state: GroupState[(Row, Row, List[Row])]) =>
          var (lastL, lastR, pending) = state.getOption.getOrElse((null: Row, null: Row, List.empty[Row]))
          val outs = scala.collection.mutable.ArrayBuffer.empty[Row]
          it.toSeq.sorted(seqOrdering).foreach { rec =>
            if (rec.getInt(tagIdx) == 1) { // left arrival
              val l = rec.getStruct(lIdx)
              lastL = l
              kind match {
                case LeftEnrichment | FullEnrichment => outs += Row(l, lastR)
                case LeftInner =>
                  if (lastR != null) outs += Row(l, lastR) else pending :+= l
              }
            } else { // right arrival
              val r = rec.getStruct(rIdx)
              lastR = r
              kind match {
                case LeftEnrichment => ()
                case FullEnrichment => outs += Row(lastL, r)
                case LeftInner =>
                  pending.foreach(l => outs += Row(l, r))
                  pending = Nil
              }
            }
          }
          state.update((lastL, lastR, pending))
          outs.iterator
      }(stEnc, outEnc)
      .toDF()
  }
}
