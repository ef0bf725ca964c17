package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.api.MStream

case class Med(k: String, w: Long, median: Double)

/** Window `apply` (arbitrary function over window contents), join
  * `selectAll` rename semantics, and streaming update-mode aggregation. */
class WindowApplySpec extends SparkSpec {
  import spark.implicits._

  test("window apply computes an arbitrary function (median) per (key, window)") {
    val df = Seq(
      ("a", 5L, 1.0), ("a", 7L, 9.0), ("a", 8L, 5.0), // window 0
      ("a", 15L, 2.0), ("b", 16L, 4.0)                // window 10
    ).toDF("k", "t", "v")
    val out = new MStream(df, Seq("t"))
      .groupBy("k")
      .tumblingWindowExact(col("t"), 10L)
      .applyRows[Med]("w") { (head, rows) =>
        val vs = rows.map(_.getAs[Double]("v")).toArray.sorted
        Seq(Med(head.getAs[String]("k"), head.getAs[Long]("w"), vs(vs.length / 2)))
      }.df.as[Med].collect().toSet
    assert(out == Set(Med("a", 0L, 5.0), Med("a", 10L, 2.0), Med("b", 10L, 4.0)))
  }

  test("selectAll concatenates both sides, renaming right collisions") {
    val l = new MStream(Seq((1L, "x", 10L)).toDF("id", "k", "v"), Seq("v", "id"))
    val r = new MStream(Seq((2L, "x", 5L)).toDF("id", "k", "v"), Seq("v", "id"))
    val out = l.leftJoin(r).on((a, b) => a("k") === b("k")).selectAll()
    assert(out.df.columns.toSeq ==
      Seq("id", "k", "v", "right_id", "right_k", "right_v"))
    val row = out.df.collect().head
    assert(row.getLong(0) == 1L && row.getLong(3) == 2L)
  }

  test("streaming grouped select emits updated aggregates per micro-batch (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = in.toDF().groupBy("k").agg(sum(col("v")).as("total"))
    val name = s"agg_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(Ev("a", 1, 2.0)); q.processAllAvailable()
      val first = spark.table(name).as[(String, Double)].collect().toList
      assert(first == List(("a", 2.0)), "first arrival emits the aggregate")
      in.addData(Ev("a", 2, 3.0)); q.processAllAvailable()
      val all = spark.table(name).as[(String, Double)].collect().toList
      assert(all.contains(("a", 5.0)), "next arrival re-emits the UPDATED aggregate (Milan per-record semantics at batch granularity)")
    } finally q.stop()
  }
}
