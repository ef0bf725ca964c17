package graft

import org.apache.spark.sql.functions._
import graft.operators.GroupTopK

/** `GroupTopK.topKPerKey`: result parity with the window formulation
  * (including the ascending-id tie-break), the named contract error on a
  * non-integral id, and the plan shape that justifies the operator — a
  * bounded-heap aggregate, never a per-group window sort. */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (0L until 200L)
    .map(i => (i, s"g${i % 5}", (i * 37 % 11).toDouble)).toDF("id", "grp", "v")

  test("topKPerKey equals the window formulation, ties by ascending id") {
    val got = GroupTopK.topKPerKey(rows, Seq("grp"), "id", col("v"), k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val want = rows
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy(col("v").desc, col("id"))))
      .filter(col("rank") <= 4)
      .select(col("grp"), col("id"), col("v").as("score"), col("rank").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // groups with heavy ties (v repeats every 11 ids) exercise the
    // tie-break; each group yields exactly k rows
    assert(got.groupBy(_._1).forall(_._2.size == 4))
  }

  test("a group smaller than k yields all its rows") {
    val small = Seq((1L, "a", 2.0), (2L, "a", 1.0), (3L, "b", 9.0))
      .toDF("id", "grp", "v")
    val got = GroupTopK.topKPerKey(small, Seq("grp"), "id", col("v"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 1L)))
  }

  test("NULL-score rows are excluded (aggregate null semantics, documented)") {
    val withNulls = Seq(
      (1L, "a", Some(2.0)), (2L, "a", Some(1.0)),
      (3L, "a", None), (4L, "a", None)).toDF("id", "grp", "v")
    val got = GroupTopK.topKPerKey(withNulls, Seq("grp"), "id", col("v"), k = 3)
      .collect().map(_.getLong(1)).toSet
    // the window formulation would rank a null row 3rd; the aggregate
    // contract drops both null rows instead
    assert(got == Set(1L, 2L), got.toString)
  }

  test("grouping keys named 'pos'/'col' don't capture the explode columns") {
    // posexplode's default output names are pos/col; a user key with
    // either name must survive untouched (round-10 advice)
    val df = Seq((1L, "a", "x", 2.0), (2L, "a", "x", 1.0), (3L, "b", "y", 9.0))
      .toDF("id", "pos", "col", "v")
    val got = GroupTopK.topKPerKey(df, Seq("pos", "col"), "id", col("v"), k = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
      .toSet
    assert(got == Set(("a", "x", 1L, 1L), ("b", "y", 3L, 1L)), got.toString)
  }

  test("idCol inside keys is rejected with a named contract error") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "grp", "v")
    val e = intercept[IllegalArgumentException](
      GroupTopK.topKPerKey(df, Seq("grp", "id"), "id", col("v"), 2))
    assert(e.getMessage.contains("collides"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      GroupTopK.topKPerKey(df, Seq("grp"), "id", col("v"), 2, scoreAs = "rank"))
    assert(e2.getMessage.contains("collides"), e2.getMessage)
  }

  test("non-integral id is rejected with the contract error") {
    val bad = Seq(("x", "a", 1.0)).toDF("id", "grp", "v")
    val e = intercept[IllegalArgumentException](
      GroupTopK.topKPerKey(bad, Seq("grp"), "id", col("v"), 2))
    assert(e.getMessage.contains("must be integral"), e.getMessage)
  }

  test("streaming update-mode continuous top-k converges to the batch answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.api.{App, Program}
    import graft.api.Program._
    implicit val sqlCtx = spark.sqlContext
    // the document face: a streaming groupBy aggregation is legitimate
    // for topkPerKey (update mode re-emits a group's refreshed top-k)
    val json = Program.toJson(Doc(
      nodes = Seq(External("in"),
        TopKPerKey("tk", "in", Seq("grp"), "id", "v", 2, "score")),
      outputs = Seq("tk")))
    val allRows = rows.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val in = MemoryStream[(Long, String, Double)]
    val name = s"topk_stream_${System.nanoTime()}"
    val running = App.run(spark, new App.Config()
        .setSource("in", App.Source("list", rows = Some(
          in.toDF().toDF("id", "grp", "v"))))
        .addSink("tk", App.Sink("memory", outputMode = "update",
          queryName = Some(name))))(
      Program.interpret(Program.fromJson(json)))
    val q = running.collect { case App.StreamingOutput("tk", sq) => sq }.head
    try {
      allRows.grouped(50).foreach(g => in.addData(g: _*))
      q.processAllAvailable()
      // update mode re-emits refreshed rows; the LATEST emission per
      // (grp, rank) is the converged answer
      val latest = spark.table(name)
        .withColumn("__emit", monotonically_increasing_id())
        .collect()
        .groupBy(r => (r.getString(0), r.getLong(3)))
        .map { case (_, rs) => val r = rs.maxBy(_.getLong(4))
          (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)) }.toSet
      val batch = GroupTopK.topKPerKey(rows, Seq("grp"), "id", col("v"), 2)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(latest == batch,
        s"continuous top-k must converge to the batch answer:\n$latest\nvs\n$batch")
    } finally q.stop()
  }

  test("the plan is a bounded-heap aggregate, not a window sort") {
    // string form: the AQE wrapper hides the inner plan from collect()
    val plan = GroupTopK.topKPerKey(rows, Seq("grp"), "id", col("v"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no per-group window sort allowed:\n$plan")
    assert(!plan.contains("Sort"), s"no sort anywhere:\n$plan")
    // partial + final ObjectHashAggregate around one exchange: the map
    // side bounds each group's contribution to k rows
    assert(plan.contains("partial_graft_top"),
      s"expected a map-side partial bounded-heap aggregate:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final bounded-heap aggregate:\n$plan")
  }
}
