package graft

import org.apache.spark.sql.functions._
import graft.api.MStream

/** Direct coverage for the remaining MStream surface: toField, typed
  * flatMap, grouped mapStreams, minBy, and the running-aggregate family. */
class ApiCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def ev = new MStream(
    Seq(("a", 1L, 4.0), ("a", 2L, 2.0), ("a", 3L, 1.0), ("b", 4L, 5.0))
      .toDF("k", "t", "v"), Seq("t"))

  test("toField wraps records as one named struct field") {
    val out = ev.toField("rec")
    assert(out.df.columns.toSeq == Seq("rec"))
    assert(out.df.select(col("rec.k"), col("rec.v")).collect().length == 4)
  }

  test("flatMapTyped expands records") {
    val out = ev.flatMapTyped(r => Seq.fill(r.getAs[Long]("t").toInt)(r.getAs[String]("k")))
    assert(out.df.count() == 1 + 2 + 3 + 4)
  }

  test("mapStreams transforms each group's stream, key preserved") {
    val out = ev.groupBy("k")
      .mapStreams(s => s.where(col("v") > 1.5))
      .select(count(lit(1)).as("n"))
      .df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 2L), ("b", 1L)))
  }

  test("minBy emits only when the running min strictly improves") {
    val out = ev.groupBy("k").minBy(col("v"))
      .df.select("k", "t").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L)))
  }

  test("reduceRows folds each key to ONE final value in arrival order") {
    val out = ev.groupBy("k")
      .reduceRows(("", 0.0)) { case ((ks, acc), r) =>
        (r.getAs[String]("k"), acc * 10 + r.getAs[Double]("v")) // order-sensitive fold
      }.df.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("a", 421.0), ("b", 5.0)), "one output per key, folded 4->2->1")
    // unkeyed: one global value, order across keys by t
    val g = ev.reduceRows(0.0)((acc, r) => acc * 10 + r.getAs[Double]("v"))
      .df.collect().map(_.getDouble(0)).toSeq
    assert(g == Seq(4215.0))
  }

  test("running meanBy/productBy/countBy fold per key in arrival order") {
    val out = ev.groupBy("k")
      .meanBy(col("v"), "mean").df
    val a = out.filter(col("k") === "a").orderBy("t")
      .select("mean").collect().map(_.getDouble(0)).toSeq
    assert(a == Seq(4.0, 3.0, 7.0 / 3))
    val prod = ev.groupBy("k").productBy(col("v"), "p").df
      .filter(col("k") === "a").orderBy("t").select("p").collect().map(_.getDouble(0)).toSeq
    assert(prod == Seq(4.0, 8.0, 8.0))
    val cnt = ev.groupBy("k").countBy("n").df
      .filter(col("k") === "a").orderBy("t").select("n").collect().map(_.getLong(0)).toSeq
    assert(cnt == Seq(1L, 2L, 3L))
  }

  test("MStream.asofJoin routes batch inputs and rejects mixed batch/stream") {
    val lefts = new MStream(Seq((1L, 1L, 10L)).toDF("l_id", "l_k", "l_ts"), Seq("l_ts"))
    val rights = new MStream(
      Seq((1L, 1L, 4L, 1.5), (2L, 1L, 8L, 2.5), (3L, 1L, 12L, 3.5))
        .toDF("r_id", "r_k", "r_ts", "r_v"), Seq("r_ts"))
    val got = lefts.asofJoin(rights, "l_ts", "r_ts", Seq("l_k" -> "r_k"), Seq("r_id"))
      .df.select("l_id", "r_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)),
      "batch path: latest right at-or-before t10 is r2@t8")
    implicit val sqlCtx = spark.sqlContext
    val streamed = new MStream(
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
        .toDF().toDF("r_id", "r_k", "r_ts"), Seq("r_ts"))
    intercept[IllegalArgumentException] {
      lefts.asofJoin(streamed, "l_ts", "r_ts", Seq("l_k" -> "r_k"), Seq("r_id"))
    }
  }
}
