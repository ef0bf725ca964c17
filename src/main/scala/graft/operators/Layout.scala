package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators for scan pruning at scale. Parquet keeps min/max
 * statistics per file and row group; Spark prunes row groups whose stats
 * exclude a pushed filter. A table written in arrival order has every
 * file spanning the whole key domain — nothing prunes. Z-ORDERING
 * (Morton-curve clustering, the Delta/Databricks `OPTIMIZE ZORDER BY`
 * capability absent from OSS Spark) interleaves the bits of several
 * bucketed columns into one key and range-partitions + sorts by it, so
 * each output file covers a small hyper-rectangle of the combined domain
 * and selective filters on ANY prefix-free subset of the z-columns skip
 * most files — the multi-column generalization of sorting by one column.
 *
 * Determinism contract (oracle-checkable): per column, buckets are the
 * SQ8-style affine clamp `clamp(floor((x - lo) * (2^bits - 1) / (hi -
 * lo)), 0, 2^bits - 1)` over the exact min/max (one aggregation pass,
 * a constant-size driver artifact), and the z-key interleaves bucket
 * bits column-major from bit 0: `zkey = Σ_b Σ_i bit_b(col_i) << (b *
 * n + i)`. Everything is built from codegen'd built-in expressions —
 * no UDF, no custom expression needed.
 */
object Layout {
  /** Max columns × bits that fit a signed 64-bit z-key. ONE source of
    * truth — `Program.validate` delegates here for the zorder node. */
  private[graft] def checkDims(n: Int, bits: Int): Unit = {
    require(n >= 1 && n <= 4, s"zorder needs 1-4 columns, got $n")
    require(bits >= 1 && bits <= 16, s"zorder needs bits in [1,16], got $bits")
    require(n * bits <= 62, s"zorder key would overflow: $n cols x $bits bits")
  }

  /** The interleaved Morton key over pre-bucketed long columns (each in
    * `[0, 2^bits)`), column-major from bit 0. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    checkDims(buckets.size, bits)
    val n = buckets.size
    (0 until bits).flatMap { b =>
      buckets.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Affine bucket of `x` into `[0, 2^bits)` under pinned [lo, hi] —
    * the SQ8 clamp formula, so the oracle reproduces every bucket. */
  def bucketOf(x: Column, lo: Double, hi: Double, bits: Int): Column = {
    val levels = (1L << bits) - 1
    if (hi == lo) lit(0L)
    else least(greatest(floor((x.cast("double") - lit(lo)) * lit(levels.toDouble) /
      lit(hi - lo)), lit(0.0)), lit(levels.toDouble)).cast("long")
  }

  /** The order-preserving double face of a z-column. Date and timestamp
    * types are not castable to double in Spark SQL, so they convert
    * explicitly: days since epoch for dates, microseconds since epoch
    * for timestamps (NTZ reads via a timestamp cast — the session-zone
    * offset is a monotonic shift, which is all affine bucketing needs). */
  private def asOrderedDouble(c: Column, dt: org.apache.spark.sql.types.DataType,
                              name: String): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType => c.cast("double")
      case DateType => unix_date(c).cast("double")
      case TimestampType => unix_micros(c).cast("double")
      case TimestampNTZType => unix_micros(c.cast(TimestampType)).cast("double")
      case other => throw new IllegalArgumentException(
        s"zorder: column '$name' must be numeric or date/time " +
          s"(affine range bucketing), got $other")
    }
  }

  /** The z-key column for `df`'s numeric/date/time `cols`: one min/max
    * aggregation pass pins the per-column ranges (constant-size driver
    * artifact), then the key is a pure codegen'd projection. */
  def zkey(df: DataFrame, cols: Seq[String], bits: Int = 12): Column = {
    checkDims(cols.size, bits)
    val ordered = cols.map(c => asOrderedDouble(col(c), df.schema(c).dataType, c))
    val aggs = cols.zip(ordered).flatMap { case (c, oc) =>
      Seq(min(oc).as(s"__lo_$c"), max(oc).as(s"__hi_$c")) }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val buckets = cols.zip(ordered).zipWithIndex.map { case ((c, oc), i) =>
      require(!r.isNullAt(2 * i) && !r.isNullAt(2 * i + 1),
        s"zorder: column '$c' has no non-null values to range over")
      bucketOf(oc, r.getDouble(2 * i), r.getDouble(2 * i + 1), bits)
    }
    interleave(buckets, bits)
  }

  /** Cluster `df` for multi-dimensional scan pruning: range-partition by
    * the z-key into `numFiles` partitions and sort within each, so a
    * subsequent parquet write carries tight per-file min/max stats on
    * every z-column. The range exchange samples the z-key (one extra
    * job), exactly like `ORDER BY` — the price of balanced files.
    *
    * The input plan executes multiple times (the min/max aggregation,
    * the range sample, and whatever consumes the result) — persist an
    * expensive upstream before clustering, as the clusterBy sink does. */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
               bits: Int = 12): DataFrame = {
    require(numFiles >= 1, s"zorder needs numFiles >= 1, got $numFiles")
    val key = zkey(df, cols, bits)
    // a collision-proof working name: the input may itself carry __zkey
    // (e.g. a re-clustered frame that materialized its key)
    val kc = Iterator.from(0).map(i => s"__zkey$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(kc, key)
      .repartitionByRange(numFiles, col(kc))
      .sortWithinPartitions(kc)
      .drop(kc)
  }
}
