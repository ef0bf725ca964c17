package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/**
 * Untyped (Row-based) streaming lowerings for MStream's stateful scans, so
 * the same program runs streaming when its input does (batch takes the
 * window-function lowering in `operators.Scans`). One record per
 * micro-batch reproduces the reference's per-record traces; within a
 * batch, records fold in event-order.
 */
object StreamingRowScans {

  /** Zero-padded order encoding shared with the row joins: keeps numeric
    * and chronological order under string comparison. */
  private[graft] def orderKey(row: Row, idx: Seq[Int]): String =
    idx.map { i =>
      row.get(i) match {
        case l: Long => f"$l%020d"
        case n: Int => f"$n%020d"
        case t: java.sql.Timestamp => f"${t.getTime}%020d"
        case other => String.valueOf(other)
      }
    }.mkString("|")

  private def keyed(df: DataFrame, keys: Seq[String]) = {
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(df.schema)
    implicit val keyEnc: Encoder[Seq[Any]] = Encoders.kryo[Seq[Any]]
    val kIdx = keys.map(df.schema.fieldIndex)
    df.groupByKey(r => kIdx.map(r.get(_)): Seq[Any])(keyEnc)
  }

  sealed trait RunKind
  case object RSum extends RunKind
  case object RMean extends RunKind
  case object RProduct extends RunKind
  case object RCount extends RunKind

  /** Running aggregate per key: one output per input record, input row +
    * running value appended as `as`. */
  def running(df: DataFrame, keys: Seq[String], order: Seq[String],
              arg: Column, kind: RunKind, as: String): DataFrame = {
    val prep = df.withColumn("__arg", if (kind == RCount) lit(0.0d) else arg.cast("double"))
    val outSchema = StructType(df.schema.fields :+
      StructField(as, if (kind == RCount) LongType else DoubleType))
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    implicit val stEnc: Encoder[(Double, Long)] = Encoders.kryo[(Double, Long)]
    val oIdx = order.map(prep.schema.fieldIndex)
    val argIdx = prep.schema.fieldIndex("__arg")
    val n0 = df.schema.length
    keyed(prep, keys).flatMapGroupsWithState[(Double, Long), Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: Seq[Any], it: Iterator[Row], state: GroupState[(Double, Long)]) =>
        var (acc, n) = state.getOption.getOrElse(
          (if (kind == RProduct) 1.0d else 0.0d, 0L))
        val outs = it.toSeq.sortBy(orderKey(_, oIdx)).map { r =>
          val a = r.getDouble(argIdx)
          n += 1
          acc = kind match {
            case RSum | RMean => acc + a
            case RProduct     => acc * a
            case RCount       => acc
          }
          val value: Any = kind match {
            case RSum | RProduct => acc
            case RMean           => acc / n
            case RCount          => n
          }
          Row.fromSeq(r.toSeq.take(n0) :+ value)
        }
        state.update((acc, n))
        outs.iterator
    }.toDF()
  }

  /** maxBy/minBy: emit the input record only on strict improvement. */
  def argCompare(df: DataFrame, keys: Seq[String], order: Seq[String],
                 arg: Column, isMax: Boolean): DataFrame = {
    val prep = df.withColumn("__arg", arg.cast("double"))
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(df.schema)
    implicit val stEnc: Encoder[Option[Double]] = Encoders.kryo[Option[Double]]
    val oIdx = order.map(prep.schema.fieldIndex)
    val argIdx = prep.schema.fieldIndex("__arg")
    val n0 = df.schema.length
    keyed(prep, keys).flatMapGroupsWithState[Option[Double], Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: Seq[Any], it: Iterator[Row], state: GroupState[Option[Double]]) =>
        var best = state.getOption.flatten
        val outs = it.toSeq.sortBy(orderKey(_, oIdx)).flatMap { r =>
          val a = r.getDouble(argIdx)
          val beats = best.forall(b => if (isMax) a > b else a < b)
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
      (_: Seq[Any], it: Iterator[Row], state: GroupState[List[Row]]) =>
        var buf = state.getOption.getOrElse(Nil)
        val outs = it.toSeq.sortBy(orderKey(_, oIdx)).map { r =>
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
    * semantics at micro-batch granularity). */
  def lastRecord(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    implicit val outEnc: Encoder[Row] = RowEncoder.encoderFor(df.schema)
    implicit val stEnc: Encoder[Option[String]] = Encoders.kryo[Option[String]]
    val oIdx = order.map(df.schema.fieldIndex)
    keyed(df, keys).flatMapGroupsWithState[Option[String], Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: Seq[Any], it: Iterator[Row], state: GroupState[Option[String]]) =>
        val sorted = it.toSeq.sortBy(orderKey(_, oIdx))
        val prevBest = state.getOption.flatten
        val latest = sorted.lastOption.filter(r =>
          prevBest.forall(orderKey(r, oIdx) > _))
        latest.foreach(r => state.update(Some(orderKey(r, oIdx))))
        latest.iterator
    }.toDF()
  }
}
