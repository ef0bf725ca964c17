package graft.streaming

import org.apache.spark.sql.Row

/**
 * Typed event-order comparison shared by the streaming stateful scans
 * (`StreamingRowScans`) and row joins (`StreamingRowJoins`). The reference
 * folds per-key state in arrival order (milan
 * `runtime/ScanProcessFunction.scala:17`); within a micro-batch we
 * reproduce that order by sorting on the user's `orderedBy` columns.
 * Values compare with their native orderings — the previous zero-padded
 * string encoding reversed negative numbers (`"-…05" < "-…10"`) and
 * mis-ordered fractional types (`"10.5" < "9.5"`).
 */
object EventOrder {

  /** Compare two column values with per-type numeric ordering. Nulls sort
    * first, matching Spark's default ascending null ordering. */
  def compareValues(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: Long, y: Long)       => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)         => java.lang.Integer.compare(x, y)
    case (x: Short, y: Short)     => java.lang.Short.compare(x, y)
    case (x: Byte, y: Byte)       => java.lang.Byte.compare(x, y)
    case (x: Double, y: Double)   => java.lang.Double.compare(x, y)
    case (x: Float, y: Float)     => java.lang.Float.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: String, y: String)   => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: BigDecimal, y: BigDecimal)                     => x.compare(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp)     => x.compareTo(y)
    case (x: java.time.Instant, y: java.time.Instant)       => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date)               => x.compareTo(y)
    case (x: java.time.LocalDate, y: java.time.LocalDate)   => x.compareTo(y)
    // mixed numeric widths (e.g. after a union widened one side)
    case (x: java.lang.Number, y: java.lang.Number) =>
      new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString))
    case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
  }

  /** Lexicographic comparison over order-column value sequences. */
  def compareSeqs(a: Seq[Any], b: Seq[Any]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = compareValues(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  /** Order-column values of a row, for typed state storage (replaces the
    * string keys previously persisted in GroupState). */
  def values(row: Row, idx: Seq[Int]): Seq[Any] = idx.map(row.get).toList

  /** Ordering over rows by the given order-column indexes. */
  def rowOrdering(idx: Seq[Int]): Ordering[Row] =
    (x: Row, y: Row) => compareSeqs(values(x, idx), values(y, idx))
}
