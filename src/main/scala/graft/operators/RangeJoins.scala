package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join — an operator Spark lacks natively: a join
 * whose only cross-side predicate is a range (`s <= pt AND pt <= e`) plans
 * as BroadcastNestedLoopJoin, i.e. all pairs, which dies at scale the
 * moment the broadcast side stops fitting (and is quadratic regardless).
 *
 * Lowering: BUCKETIZE the domain into fixed-width cells. Every interval
 * explodes to the cells it covers (replication = interval length /
 * bucketWidth, bounded by the caller's width choice); every point lands in
 * exactly ONE cell, so each matching (point, interval) pair meets in
 * exactly one join bucket — an equi-join on the cell key followed by the
 * exact range filter, no dedup step. The classic bucketized range-join
 * rewrite OLAP engines apply (same idea as Spark's own range-join hints in
 * its Delta-adjacent optimizers).
 *
 * Cell keys are `c - pmod(c, w)` (aligned starts) — pure long arithmetic,
 * exact for any epoch scale including nanoseconds (no double division).
 * Empty intervals (e < s) match nothing and are dropped.
 */
object RangeJoins {

  private def cell(c: Column, w: Long): Column = c - pmod(c, lit(w))

  /** Inner-join `points` to every row of `intervals` whose
    * `[startCol, endCol]` (inclusive) contains `pointCol`. Column names of
    * the two inputs must be disjoint and must not include the internal
    * `__pcell`/`__icell` names (project first). `bucketWidth` should be on
    * the order of the typical interval length: shorter wastes replication,
    * longer wastes post-filtering.
    *
    * Replication bound: an interval spanning L domain units explodes to
    * ceil(L / bucketWidth) + 1 cells. An interval longer than
    * `maxCellsPerInterval` buckets fails the job with a clear error rather
    * than silently materializing an enormous (ultimately > 2^31-element,
    * which Spark rejects) cell array — pick a wider bucket or split the
    * outlier intervals upstream. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long, maxCellsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxCellsPerInterval > 0, "maxCellsPerInterval must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    val internal = Set("__pcell", "__icell")
    val clash = (points.columns.toSet ++ intervals.columns.toSet).intersect(internal)
    require(clash.isEmpty, s"inputs must not contain internal columns: $clash")
    val p = points.withColumn("__pcell", cell(col(pointCol), bucketWidth))
    val cellStart = cell(col(startCol), bucketWidth)
    val cellEnd = cell(col(endCol), bucketWidth)
    val nCells = (cellEnd - cellStart) / bucketWidth + 1
    // the error expression feeds the explode, so pruning cannot drop it;
    // it fires only on offending rows
    val cells = when(nCells > maxCellsPerInterval,
        raise_error(concat(lit(s"pointInInterval: interval of "),
          nCells.cast("string"),
          lit(s" cells exceeds maxCellsPerInterval=$maxCellsPerInterval " +
            s"at bucketWidth=$bucketWidth; widen the bucket or split long intervals")))
          .cast("array<bigint>"))
      .otherwise(sequence(cellStart, cellEnd, lit(bucketWidth)))
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__icell", explode(cells))
    p.join(iv, col("__pcell") === col("__icell") &&
        col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__pcell", "__icell")
  }
}
