package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, KeyValueGroupedDataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/**
 * Native-struct grouping keys for the keyed-state operators
 * (`StreamingRowScans`, `StreamingRowJoins`, `StreamingAsof`,
 * `operators.Scans` streaming branches).
 *
 * These previously grouped with `Encoders.kryo[Seq[Any]]`, which had two
 * costs: the state exchange partitioned on an opaque binary blob (no
 * codegen'd hashing, no exchange/partitioning reuse), and — worse — the
 * STATE-STORE KEY FORMAT was kryo's byte layout of a Scala collection, so
 * any Spark/kryo/Scala upgrade that shifts those bytes silently orphans
 * every checkpointed state row (old keys no longer compare equal to new
 * ones). Grouping on the actual key columns via `groupBy(...).as[Row, Row]`
 * makes the grouping attributes named, typed columns: the exchange hashes
 * them natively and the checkpoint key is Spark's own stable UnsafeRow
 * layout. The reference likewise keys its co-process state on typed key
 * tuples (milan `generator/ConnectedStreamsGenerator.scala:11-84`,
 * `keyBy`), never on serialized blobs. Kryo remains only for state
 * PAYLOADS, which are transient within a single run's store format.
 */
object KeyedRows {

  /** Group `df` for keyed state on the named key columns (no key-side
    * lambda: the grouping expressions are the columns themselves). A
    * zero-column key (global group — inherently one state partition) keys
    * on a constant INT so the key encoder stays non-empty. */
  def byNames(df: DataFrame, keys: Seq[String]): KeyValueGroupedDataset[Row, Row] = {
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(df.schema)
    if (keys.isEmpty) {
      val keyEnc: Encoder[Row] = RowEncoder.encoderFor(
        StructType(Seq(StructField("__gk", IntegerType, nullable = false))))
      df.groupByKey(_ => Row(0))(keyEnc)
    } else {
      val keyEnc: Encoder[Row] =
        RowEncoder.encoderFor(StructType(keys.map(df.schema(_)).toIndexedSeq))
      df.groupBy(keys.map(df.col): _*).as[Row, Row](keyEnc, rowEnc)
    }
  }

  /** Group `df` for keyed state on an existing struct column that already
    * holds the key tuple (the `__k` column the tagged-union lowerings
    * build). The struct is a single native grouping attribute. */
  def byStructCol(df: DataFrame, structCol: String): KeyValueGroupedDataset[Row, Row] = {
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(df.schema)
    val keyEnc: Encoder[Row] =
      RowEncoder.encoderFor(StructType(Seq(df.schema(structCol))))
    df.groupBy(df.col(structCol)).as[Row, Row](keyEnc, rowEnc)
  }
}
