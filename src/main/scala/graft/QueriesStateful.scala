package graft

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/**
 * Milan §2.4 enrichment joins, §2.5 windows, §2.6 stateful scans as
 * driver-checkable queries over the `events` stream table. Arrival order is
 * (ts_ns, event_id) — unique and deterministic — standing in for the
 * reference's implicit stream arrival order (its event compiler pushes
 * records synchronously; batch needs the order explicit).
 *
 * Every oracle reproduces the reference semantics *independently* in DuckDB
 * window SQL, so a match checks the semantics, not our own lowering.
 */
/** Output row of q_window_apply (column names match the oracle). */
case class WindowMedianRow(w_start: Long, event_type: String, n_events: Long, med_value: Double)

object QueriesStateful {

  /** Milan `leftJoin` — left-enrichment: a click pairs with the latest
    * same-user purchase seen so far, or null
    * (reference: `runtime/LeftJoinKeyedCoProcessFunction.scala:47-75`). */
  def qLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
    val purchases = ev.where(col("event_type") === "purchase")
    clicks.leftJoin(purchases).on((l, r) => l("user_id") === r("user_id"))
      .select((l, r) => Seq(
        l("event_id").as("event_id"), l("user_id").as("user_id"),
        l("value").as("click_value"), r("value").as("latest_purchase")))
      .df
  }

  val qLeftJoinSql: String =
    """WITH tagged AS (
         SELECT event_id, user_id, value AS click_value,
                epoch_ns(ts) AS o0, event_id AS o1, 1 AS tag, NULL::DOUBLE AS rvalue
         FROM events WHERE event_type='click'
         UNION ALL
         SELECT NULL, user_id, NULL, epoch_ns(ts), event_id, 0, value
         FROM events WHERE event_type='purchase')
       SELECT event_id, user_id, click_value,
         last_value(rvalue IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY o0, o1, tag
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS latest_purchase
       FROM tagged QUALIFY tag=1"""

  /** Milan `fullJoin` — either side's arrival pairs with the latest arrival
    * of the other side (`runtime/FullJoinKeyedCoProcessFunction.scala:51-92`). */
  def qFullJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
    val purchases = ev.where(col("event_type") === "purchase")
    clicks.fullJoin(purchases).on((l, r) => l("user_id") === r("user_id"))
      .select((l, r) => Seq(
        coalesce(l("user_id"), r("user_id")).as("user_id"),
        l("event_id").as("l_event_id"), l("value").as("l_value"),
        r("event_id").as("r_event_id"), r("value").as("r_value")))
      .df
  }

  val qFullJoinSql: String =
    """WITH tagged AS (
         SELECT user_id, epoch_ns(ts) AS o0, event_id AS o1, 1 AS tag,
                event_id AS l_eid, value AS l_val, NULL::BIGINT AS r_eid, NULL::DOUBLE AS r_val
         FROM events WHERE event_type='click'
         UNION ALL
         SELECT user_id, epoch_ns(ts), event_id, 0, NULL, NULL, event_id, value
         FROM events WHERE event_type='purchase')
       SELECT user_id,
         last_value(l_eid IGNORE NULLS) OVER w AS l_event_id,
         last_value(l_val IGNORE NULLS) OVER w AS l_value,
         last_value(r_eid IGNORE NULLS) OVER w AS r_event_id,
         last_value(r_val IGNORE NULLS) OVER w AS r_value
       FROM tagged
       WINDOW w AS (PARTITION BY user_id ORDER BY o0, o1, tag
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""

  /** Milan `leftInnerJoin` — lefts buffer until a matching right exists;
    * each left emits exactly once
    * (`runtime/LeftInnerJoinKeyedCoProcessFunction.scala:48`). */
  def qLeftInnerJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
    val purchases = ev.where(col("event_type") === "purchase")
    clicks.leftInnerJoin(purchases).on((l, r) => l("user_id") === r("user_id"))
      .select((l, r) => Seq(
        l("event_id").as("event_id"), l("user_id").as("user_id"),
        r("value").as("purchase_value")))
      .df
  }

  val qLeftInnerJoinSql: String =
    """WITH tagged AS (
         SELECT event_id, user_id, epoch_ns(ts) AS o0, event_id AS o1, 1 AS tag,
                NULL::DOUBLE AS rvalue
         FROM events WHERE event_type='click'
         UNION ALL
         SELECT NULL, user_id, epoch_ns(ts), event_id, 0, value
         FROM events WHERE event_type='purchase'),
       w AS (
         SELECT *,
           last_value(rvalue IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY o0, o1, tag
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_r,
           first_value(rvalue IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY o0, o1, tag
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_r
         FROM tagged)
       SELECT event_id, user_id, coalesce(last_r, next_r) AS purchase_value
       FROM w WHERE tag=1 AND coalesce(last_r, next_r) IS NOT NULL"""

  /** Milan `maxBy` — emit a record only when it strictly beats the running
    * max per key ("Milan Operations.md" MaxBy: emit on change only). */
  def qMaxBy(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type").maxBy(col("value"))
      .map(col("event_id"), col("event_type"), col("value"))
      .df

  val qMaxBySql: String =
    """SELECT event_id, event_type, value FROM (
         SELECT event_id, event_type, value,
           max(value) OVER (PARTITION BY event_type ORDER BY epoch_ns(ts), event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run
         FROM events)
       WHERE run IS NULL OR value > run"""

  /** Milan `sumBy` — running per-key sum, one output per input record
    * (`runtime/ArgScanProcessFunction.scala`). */
  def qSumBy(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id").sumBy(col("value"), "running_sum")
      .map(col("event_id"), col("user_id"), round(col("running_sum"), 4).as("running_sum"))
      .df

  val qSumBySql: String =
    """SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
       FROM events"""

  /** Milan `last()` — final record per key (`runtime/LastOperators.scala`). */
  def qLast(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id").last()
      .map(col("user_id"), col("event_id"), col("value"))
      .df

  val qLastSql: String =
    """SELECT user_id, event_id, value FROM events
       QUALIFY row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts) DESC, event_id DESC) = 1"""

  final case class ScanCount(user_id: Long, event_id: Long, n: Long)

  /** Milan generic `scan` (`lang/Stream.scala:176`) — arbitrary running
    * state per key; here a running event count so DuckDB can oracle it. */
  def qScan(spark: SparkSession, dir: String): DataFrame = {
    implicit val enc = Encoders.product[ScanCount]
    Tables.events(spark, dir)
      .groupBy("user_id")
      .scanRows(0L) { (s, row) =>
        val n = s + 1
        (n, Some(ScanCount(row.getAs[Long]("user_id"), row.getAs[Long]("event_id"), n)))
      }
      .df
  }

  val qScanSql: String =
    """SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS n
       FROM events"""

  /** Milan `tumblingWindow` after `groupBy` — (key, window) aggregation
    * (`lang/GroupedStream.scala:61`), exact ns arithmetic. */
  def qTumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .tumblingWindowExact(col("ts_ns"), 3600L * 1000000000L)
      .select("w_start",
        count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"))
      .df

  val qTumblingWindowSql: String =
    """SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000 AS w_start, event_type,
         count(*) AS cnt, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2"""

  /** Milan `slidingWindow` — overlapping windows (2h size, 1h slide), each
    * record in two windows (`lang/Stream.scala:219`). */
  def qSlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .slidingWindowExact(col("ts_ns"), 7200L * 1000000000L, 3600L * 1000000000L)
      .select("w_start",
        count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"))
      .df

  val qSlidingWindowSql: String =
    """SELECT event_type, k * 3600000000000 AS w_start, count(*) AS cnt,
         round(sum(value), 2) AS sum_value
       FROM events, LATERAL (SELECT unnest(generate_series(
              epoch_ns(ts) // 3600000000000 - 1,
              epoch_ns(ts) // 3600000000000))) AS t(k)
       GROUP BY 1, 2"""

  /** Milan `recordWindow(n)` — trailing-n-records window per key, aggregate
    * emitted per record (`lang/GroupedStream.scala:46`). */
  def qRecordWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id").recordWindow(5)
      .select((sum(_: org.apache.spark.sql.Column), "value", "trail_sum"))
      .map(col("event_id"), col("user_id"), round(col("trail_sum"), 4).as("trail_sum"))
      .df

  val qRecordWindowSql: String =
    """SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS trail_sum
       FROM events"""

  /** Milan `GroupedStream.flatMap` with a nested stream pipeline
    * (`lang/GroupOperations.scala:33`, `GroupBySample.scala:22-27`): the
    * inner where+sumBy scope automatically to the group key. */
  def qFlatmapNested(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .flatMap(g => g.where(col("event_type") === "click").sumBy(col("value"), "run"))
      .map(col("event_id"), col("user_id"), round(col("run"), 4).as("run"))
      .df

  val qFlatmapNestedSql: String =
    """SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run
       FROM events WHERE event_type='click'"""

  /** Milan stream ⋈ record-window join (`LeftWindowedJoin` +
    * `recordWindow(2)`): each click sees the sum of its user's last two
    * purchase values at arrival time. */
  def qWindowJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
    val purchases = ev.where(col("event_type") === "purchase")
    clicks.leftJoinWindow(purchases, 2).on((l, r) => l("user_id") === r("user_id"))
      .select((l, rwin) => Seq(
        l("event_id").as("event_id"), l("user_id").as("user_id"),
        round(aggregate(transform(rwin, r => r.getField("value")), lit(0.0d), (s, x) => s + x), 4)
          .as("sum_last2")))
      .df
  }

  val qWindowJoinSql: String =
    """SELECT c.event_id, c.user_id,
         (SELECT round(coalesce(sum(v), 0), 4) FROM (
            SELECT p.value AS v FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
              AND (epoch_ns(p.ts), p.event_id) < (epoch_ns(c.ts), c.event_id)
            ORDER BY epoch_ns(p.ts) DESC, p.event_id DESC LIMIT 2)) AS sum_last2
       FROM events c WHERE c.event_type = 'click'"""

  /** Session windows (parity-plus): per-user sessions with a 30-minute
    * gap; sessions extend while consecutive events are under the gap. */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .sessionWindow(col("ts"), "30 minutes")
      .select("sess_start",
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .df

  val qSessionWindowSql: String =
    """WITH o AS (SELECT user_id, value, epoch_us(ts) AS tus, event_id FROM events),
       s AS (SELECT *, CASE WHEN tus - lag(tus) OVER
               (PARTITION BY user_id ORDER BY tus, event_id) >= 1800000000
             THEN 1 ELSE 0 END AS brk FROM o),
       t AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             FROM s)
       SELECT min(tus) AS sess_start, user_id, count(*) AS n_events,
              round(sum(value), 2) AS sum_value
       FROM t GROUP BY user_id, sess"""

  /** Milan window `apply` — an arbitrary function over the full window
    * contents at close (`lang/WindowedStreams.scala:37`,
    * `runtime/TimeWindowFlatMapProcessWindowFunction.scala:16`): per-window
    * median, not expressible as a single Spark aggregate without sorting
    * the window. The oracle is DuckDB's own `median` (interpolated at even
    * counts, matching the (a+b)/2 midpoint here). */
  def qWindowApply(spark: SparkSession, dir: String): DataFrame = {
    implicit val enc = Encoders.product[WindowMedianRow]
    Tables.events(spark, dir)
      .groupBy("event_type")
      .tumblingWindowExact(col("ts_ns"), 3600L * 1000000000L)
      .applyRows[WindowMedianRow]("w_start") { (head, rows) =>
        val vs = rows.map(_.getAs[Double]("value")).toArray
        java.util.Arrays.sort(vs)
        val n = vs.length
        val med = if (n % 2 == 1) vs(n / 2) else (vs(n / 2 - 1) + vs(n / 2)) / 2.0
        Seq(WindowMedianRow(head.getAs[Long]("w_start"), head.getAs[String]("event_type"),
          n.toLong, BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.df
  }

  /** Salted two-stage aggregation (hot-key mitigation): partial per
    * (key, salt), final per key. The salt is nondeterministic
    * (partition-dependent) but the merged result is exact for algebraic
    * aggregates — integer cents keep the sum order-insensitive, so the
    * plain GROUP BY oracle matches bit-for-bit. */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedAgg(
      Tables.events(spark, dir).df
        .withColumn("cents", round(col("value") * 100).cast("long")),
      Seq("event_type"), saltFactor = 8,
      partials = Seq(sum(col("cents")).as("pc"), count(lit(1)).as("pn"),
        min(col("value")).as("pmin"), max(col("value")).as("pmax")),
      finals = Seq(sum(col("pc")).as("cents"), sum(col("pn")).as("n_events"),
        min(col("pmin")).as("min_value"), max(col("pmax")).as("max_value")))

  val qSaltedAggSql: String =
    """SELECT event_type, sum(round(value * 100)::BIGINT)::BIGINT AS cents,
         count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
       FROM events GROUP BY event_type"""

  /** Milan `reduce` (Scan/Reduce family): whole-stream fold to one value
    * per key. The fold keeps exact integer cents so it is order-insensitive
    * and engine-portable. */
  def qReduce(spark: SparkSession, dir: String): DataFrame = {
    implicit val enc = Encoders.product[(Long, Long, Long)]
    // cents precomputed with Spark round (HALF_UP away from zero — the
    // same rule DuckDB's round applies); JVM Math.round rounds -x.5
    // toward +inf and would diverge on negative values
    Tables.events(spark, dir)
      .addFields("cents" -> round(col("value") * 100).cast("long"))
      .groupBy("user_id")
      .reduceRows((0L, 0L, 0L)) { case ((_, n, cents), r) =>
        (r.getAs[Long]("user_id"), n + 1, cents + r.getAs[Long]("cents"))
      }
      .map(col("_1").as("user_id"), col("_2").as("n_events"), col("_3").as("cents"))
      .df
  }

  val qReduceSql: String =
    """SELECT user_id, count(*) AS n_events,
         sum(round(value * 100)::BIGINT)::BIGINT AS cents
       FROM events GROUP BY user_id"""

  val qWindowApplySql: String =
    """SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000 AS w_start, event_type,
         count(*) AS n_events, round(median(value), 4) AS med_value
       FROM events GROUP BY 1, 2"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_apply" -> (qWindowApply _),
    "q_session_window" -> (qSessionWindow _),
    "q_leftjoin" -> (qLeftJoin _),
    "q_fulljoin" -> (qFullJoin _),
    "q_leftinnerjoin" -> (qLeftInnerJoin _),
    "q_maxby" -> (qMaxBy _),
    "q_sumby" -> (qSumBy _),
    "q_last" -> (qLast _),
    "q_scan" -> (qScan _),
    "q_reduce" -> (qReduce _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_tumbling_window" -> (qTumblingWindow _),
    "q_sliding_window" -> (qSlidingWindow _),
    "q_recordwindow" -> (qRecordWindow _),
    "q_flatmap_nested" -> (qFlatmapNested _),
    "q_window_join" -> (qWindowJoin _)
  )

  val sql: Map[String, String] = Map(
    "q_window_apply" -> qWindowApplySql,
    "q_leftjoin" -> qLeftJoinSql,
    "q_fulljoin" -> qFullJoinSql,
    "q_leftinnerjoin" -> qLeftInnerJoinSql,
    "q_maxby" -> qMaxBySql,
    "q_sumby" -> qSumBySql,
    "q_last" -> qLastSql,
    "q_scan" -> qScanSql,
    "q_reduce" -> qReduceSql,
    "q_salted_agg" -> qSaltedAggSql,
    "q_tumbling_window" -> qTumblingWindowSql,
    "q_sliding_window" -> qSlidingWindowSql,
    "q_recordwindow" -> qRecordWindowSql,
    "q_session_window" -> qSessionWindowSql,
    "q_flatmap_nested" -> qFlatmapNestedSql,
    "q_window_join" -> qWindowJoinSql
  )
}
