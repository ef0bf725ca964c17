package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Untyped (Row-based) streaming lowerings for MStream's stateful scans, so
 * the same program runs streaming when its input does (batch takes the
 * window-function lowering in `operators.Scans`). One record per
 * micro-batch reproduces the reference's per-record traces; within a
 * batch, records fold in event-order (typed comparison via [[EventOrder]]).
 */
object StreamingRowScans {

  /** Native-column grouping (see [[KeyedRows]]): the state exchange
    * partitions on the named key columns and the checkpoint key format is
    * Spark's UnsafeRow, not a kryo blob. */
  private def keyed(df: DataFrame, keys: Seq[String]) = KeyedRows.byNames(df, keys)

  sealed trait RunKind
  case object RSum extends RunKind
  case object RMean extends RunKind
  case object RProduct extends RunKind
  case object RCount extends RunKind

  /** Running aggregate per key: one output per input record, input row +
    * running value appended as `as`. Output type mirrors the batch window
    * lowering: `sum` over an integral column stays BIGINT (no 2^53 double
    * precision loss); mean/product are DOUBLE (Spark's `avg` buffers a
    * double sum for non-decimal inputs, `product` is always double);
    * count is BIGINT. Decimal args fold as double (documented deviation —
    * batch sum(decimal) widens the decimal instead). */
  def running(df: DataFrame, keys: Seq[String], order: Seq[String],
              arg: Column, kind: RunKind, as: String): DataFrame = {
    val argType =
      if (kind == RCount) LongType else df.select(arg).schema.head.dataType
    val sumLong = kind == RSum && (argType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    val prep = df.withColumn("__arg",
      if (kind == RCount) lit(0L)
      else if (sumLong) arg.cast("long")
      else arg.cast("double"))
    val outSchema = StructType(df.schema.fields :+
      StructField(as, if (kind == RCount || sumLong) LongType else DoubleType))
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    // primitive product state: native tuple encoder — like the grouping
    // keys, the checkpoint payload format is then UnsafeRow, not kryo
    implicit val stEnc: Encoder[(Double, Long, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaLong)
    val oIdx = order.map(prep.schema.fieldIndex)
    val argIdx = prep.schema.fieldIndex("__arg")
    val n0 = df.schema.length
    keyed(prep, keys).flatMapGroupsWithState[(Double, Long, Long), Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: Row, it: Iterator[Row], state: GroupState[(Double, Long, Long)]) =>
        var (accD, accL, n) = state.getOption.getOrElse(
          (if (kind == RProduct) 1.0d else 0.0d, 0L, 0L))
        val outs = it.toSeq.sorted(EventOrder.rowOrdering(oIdx)).map { r =>
          n += 1
          if (sumLong) accL += r.getLong(argIdx)
          else if (kind != RCount) {
            val a = r.getDouble(argIdx)
            accD = kind match {
              case RProduct => accD * a
              case _        => accD + a
            }
          }
          val value: Any = kind match {
            case RSum     => if (sumLong) accL else accD
            case RMean    => accD / n
            case RProduct => accD
            case RCount   => n
          }
          Row.fromSeq(r.toSeq.take(n0) :+ value)
        }
        state.update((accD, accL, n))
        outs.iterator
    }.toDF()
  }

  /** maxBy/minBy: emit the input record only on strict improvement. The
    * arg keeps its native type — comparison is typed, so Longs above 2^53
    * and negative values compare exactly. */
  def argCompare(df: DataFrame, keys: Seq[String], order: Seq[String],
                 arg: Column, isMax: Boolean): DataFrame = {
    val prep = df.withColumn("__arg", arg)
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(df.schema)
    implicit val stEnc: Encoder[Option[Any]] = Encoders.kryo[Option[Any]]
    val oIdx = order.map(prep.schema.fieldIndex)
    val argIdx = prep.schema.fieldIndex("__arg")
    val n0 = df.schema.length
    keyed(prep, keys).flatMapGroupsWithState[Option[Any], Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: Row, it: Iterator[Row], state: GroupState[Option[Any]]) =>
        var best = state.getOption.flatten
        val outs = it.toSeq.sorted(EventOrder.rowOrdering(oIdx)).flatMap { r =>
          val a = r.get(argIdx)
          val beats = best.forall { b =>
            val c = EventOrder.compareValues(a, b)
            if (isMax) c > 0 else c < 0
          }
          if (beats) { best = Some(a); Some(Row.fromSeq(r.toSeq.take(n0))) } else None
        }
        state.update(best)
        outs.iterator
    }.toDF()
  }

  /** Trailing-n record window per key: ring buffer in state, kind-tagged
    * aggregates appended per arrival (Milan `recordWindow(n)`). */
  def recordWindow(df: DataFrame, keys: Seq[String], order: Seq[String], n: Int,
                   aggs: Seq[(RunKind, String, String)]): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ aggs.map { case (kind, _, as) =>
      StructField(as, if (kind == RCount) LongType else DoubleType)
    })
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    implicit val stEnc: Encoder[List[Row]] = Encoders.kryo[List[Row]]
    val oIdx = order.map(df.schema.fieldIndex)
    val aIdx = aggs.map { case (kind, in, _) => (kind, df.schema.fieldIndex(in)) }
    keyed(df, keys).flatMapGroupsWithState[List[Row], Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: Row, it: Iterator[Row], state: GroupState[List[Row]]) =>
        var buf = state.getOption.getOrElse(Nil)
        val outs = it.toSeq.sorted(EventOrder.rowOrdering(oIdx)).map { r =>
          buf = (buf :+ r).takeRight(n)
          val vals = aIdx.map { case (kind, i) =>
            def ds = buf.map(b => b.get(i) match {
              case d: Double => d; case l: Long => l.toDouble
              case x: Int => x.toDouble; case f: Float => f.toDouble
            })
            // Any, not the numeric lub: Scala would widen the Long count
            // to Double and break the BIGINT column
            val v: Any = kind match {
              case RSum => ds.sum
              case RMean => ds.sum / buf.size
              case RProduct => ds.product
              case RCount => buf.size.toLong
            }
            v
          }
          Row.fromSeq(r.toSeq ++ vals)
        }
        state.update(buf)
        outs.iterator
    }.toDF()
  }

  /** last(): latest record per key, re-emitted per arrival (update
    * semantics at micro-batch granularity). State stores the typed order
    * values of the best-so-far record. */
  def lastRecord(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(df.schema)
    implicit val stEnc: Encoder[Option[Seq[Any]]] = Encoders.kryo[Option[Seq[Any]]]
    val oIdx = order.map(df.schema.fieldIndex)
    keyed(df, keys).flatMapGroupsWithState[Option[Seq[Any]], Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: Row, it: Iterator[Row], state: GroupState[Option[Seq[Any]]]) =>
        val sorted = it.toSeq.sorted(EventOrder.rowOrdering(oIdx))
        val prevBest = state.getOption.flatten
        val latest = sorted.lastOption.filter(r =>
          prevBest.forall(p => EventOrder.compareSeqs(EventOrder.values(r, oIdx), p) > 0))
        latest.foreach(r => state.update(Some(EventOrder.values(r, oIdx))))
        latest.iterator
    }.toDF()
  }
}
