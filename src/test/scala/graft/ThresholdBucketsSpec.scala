package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.TextOps

/** Frozen-thresholds CCNet bucketing (`perplexityBucketThresholds` /
  * `bucketByThresholds`): cuts reproduce the reference tiling away from
  * tie boundaries, the apply is stateless and dual-mode (streaming ==
  * batch), null language/score/unknown-language semantics, and the v9
  * program nodes round-trip. */
class ThresholdBucketsSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (0L, "a b a b c a b", "en"), (1L, "a b a b a", "en"),
    (2L, "c c c c d c", "en"), (3L, "x y z w", "en"),
    (5L, "a b c a b c a b c", "en"), (6L, "b a c b a", "en"),
    (7L, "a a b b c c", "fr"), (8L, "c b a c b", "fr"),
    (9L, "a b c x", "fr"), (10L, "x x y y", "fr"))

  test("cuts freeze the tiling; applying them back reproduces it away from ties") {
    try {
      val docs = ref.toDF("doc_id", "text", "lang")
      val model = docs.filter(col("lang") === "en")
      val tiles = TextOps.perplexityBucketsAgainst(docs, model,
        "doc_id", "text", "lang", "text", buckets = 3)
      val thr = TextOps.perplexityBucketThresholds(docs, model,
        "doc_id", "text", "lang", "text", buckets = 3)
      val cuts = thr.collect().map(r =>
        (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(cuts.keys.map(_._2).toSet.subsetOf(Set(1, 2)),
        "terciles freeze two cuts per language")
      // cut_b really is the min score of bucket b, and cuts are monotone
      val byBucket = tiles.filter(col("bucket").isNotNull)
        .groupBy(col("lang"), col("bucket")).agg(min(col("avg_logprob")).as("m"))
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
      cuts.foreach { case (k, c) => assert(byBucket(k) == c, s"cut $k") }
      cuts.groupBy(_._1._1).foreach { case (lang, cs) =>
        if (cs.size == 2) assert(cs((lang, 1)) >= cs((lang, 2)), s"monotone $lang")
      }
      // re-applying the frozen cuts to the SAME scored population gives
      // back the tiling wherever no score value straddles a boundary
      val scored = tiles.select(col("doc_id"), col("lang"),
        col("avg_logprob"), col("bucket").as("__want"))
      val applied = TextOps.bucketByThresholds(
        MStream(scored), thr, "lang", "avg_logprob").df
      val boundary = tiles.filter(col("bucket").isNotNull)
        .groupBy(col("lang"), col("avg_logprob")).agg(count_distinct(col("bucket")).as("nb"))
        .filter(col("nb") > 1).select(col("lang"), col("avg_logprob"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      applied.collect().foreach { r =>
        val k = (r.getString(r.fieldIndex("lang")),
          if (r.isNullAt(r.fieldIndex("avg_logprob"))) Double.NaN
          else r.getDouble(r.fieldIndex("avg_logprob")))
        val want = if (r.isNullAt(r.fieldIndex("__want"))) None
          else Some(r.getInt(r.fieldIndex("__want")))
        val got = if (r.isNullAt(r.fieldIndex("bucket"))) None
          else Some(r.getInt(r.fieldIndex("bucket")))
        if (want.isEmpty) assert(got.isEmpty, "unscored doc keeps NULL bucket")
        else if (!boundary.contains(k))
          assert(got == want, s"non-boundary doc reassigns identically: $r")
      }
    } finally graft.api.Pinned.release(spark)
  }

  test("apply semantics: unknown language and null score take NULL; null lang is a group") {
    val thr = Seq(("en", 1, -1.0), ("en", 2, -2.0),
      (null.asInstanceOf[String], 1, -1.5)).toDF("lang", "bucket", "cut")
    val docs = Seq(
      (1L, "en", Some(-0.5)),  // above cut_1 -> 1
      (2L, "en", Some(-1.0)),  // exactly cut_1 -> 1 (strictly-below rule)
      (3L, "en", Some(-1.7)),  // between -> 2
      (4L, "en", Some(-9.0)),  // below all -> 3
      (5L, "zz", Some(-0.5)),  // unknown language -> NULL
      (6L, "en", None),        // unscored -> NULL
      (7L, null.asInstanceOf[String], Some(-2.0))) // null lang group -> 2 (one cut)
      .toDF("doc_id", "lang", "score")
    val got = TextOps.bucketByThresholds(MStream(docs), thr, "lang", "score")
      .df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("bucket"))) None
         else Some(r.getInt(r.fieldIndex("bucket"))))).toMap
    assert(got == Map(1L -> Some(1), 2L -> Some(1), 3L -> Some(2),
      4L -> Some(3), 5L -> None, 6L -> None, 7L -> Some(2)))
  }

  test("streaming apply == batch apply; zero state rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val thr = Seq(("en", 1, -1.0), ("en", 2, -2.0)).toDF("lang", "bucket", "cut")
    val rows = Seq((1L, "en", -0.5), (2L, "en", -1.5), (3L, "en", -3.0),
      (4L, "fr", -0.1))
    try {
      val batch = TextOps.bucketByThresholds(
        MStream(rows.toDF("doc_id", "lang", "score")), thr, "lang", "score")
        .df.collect().toSet
      val in = MemoryStream[(Long, String, Double)]
      val out = TextOps.bucketByThresholds(
        MStream(in.toDF().toDF("doc_id", "lang", "score")), thr, "lang", "score")
      assert(out.df.isStreaming)
      in.addData(rows.take(2): _*)
      in.addData(rows.drop(2): _*)
      val name = s"thr_${System.nanoTime()}"
      val q = out.df.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        assert(q.lastProgress == null ||
          q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
          "thresholds apply is stateless")
        assert(spark.table(name).collect().toSet == batch, "streaming == batch")
      } finally q.stop()
    } finally graft.api.Pinned.release(spark)
  }

  test("PplThresholds/BucketApply nodes: v9 stamp, codec identity, capture == direct API") {
    import graft.api.{App, Program}
    import graft.api.Program._
    val d = Doc(
      nodes = Seq(External("in"), External("r"),
        PplThresholds("t", "in", "r", "doc_id", "text", "lang", "text",
          buckets = 4, order = 3, discount = 0.6, minCount = 2L,
          broadcastModel = Some(false)),
        BucketApply("a", "in", "t", "lang", "avg_logprob")),
      outputs = Seq("t", "a"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":9"), "thresholds nodes stamp format version 9")
    assert(Program.fromJson(json) == d, "codec is the identity")
    val bad = intercept[IllegalArgumentException](Program.fromJson(Program.toJson(
      Doc(Seq(External("in"), External("r"),
        PplThresholds("t", "in", "r", "doc_id", "text", "lang", "text",
          buckets = 1)), Seq("t")))))
    assert(bad.getMessage.contains("buckets >= 2"), bad.getMessage)
    try {
      val docsDf = ref.toDF("doc_id", "text", "lang")
      val inRec = Program.Rec.external("in", MStream(docsDf))
      val rRec = Program.Rec.external("r", MStream(docsDf))
      val thrRec = inRec.perplexityBucketThresholds(rRec,
        "doc_id", "text", "lang", "text").as("t")
      val cap = Program.capture(thrRec)
      assert(Program.fromJson(Program.toJson(cap)) == cap)
      val config = new App.Config()
        .setSource("in", App.Source("list", rows = Some(docsDf)))
        .setSource("r", App.Source("list", rows = Some(docsDf)))
        .addSink("t", App.Sink("memory"))
      Program.validate(cap, spark, config)
      val out = App.runProgram(spark, config, Program.toJson(cap))
        .collectFirst { case App.BatchOutput("t", o) => o }.get
      val direct = TextOps.perplexityBucketThresholds(docsDf, docsDf,
        "doc_id", "text", "lang", "text")
      assert(out.collect().toSet == direct.collect().toSet,
        "document execution equals the direct API")
    } finally graft.api.Pinned.release(spark)
  }

  test("bucketByRank: generic tiling equals the window-ntile definition; nulls handled") {
    import org.apache.spark.sql.expressions.Window
    // hot group (en holds most rows), a null group, null scores, ties
    val rows = (0 until 90).map(i => (i.toLong, Option("en"), Option((i % 11).toDouble / 7.0))) ++
      (0 until 8).map(i => (200L + i, Option("fr"), Option(i.toDouble))) ++
      (0 until 5).map(i => (300L + i, Option.empty[String], Option(1.5))) ++
      Seq((400L, Option("en"), Option.empty[Double]), (401L, Option.empty[String], Option.empty[Double]))
    val df = rows.toDF("id", "g", "s")
    try {
      val got = graft.pipeline.TextOps.bucketByRank(df, "g", "s", "id", buckets = 4)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(r.fieldIndex("bucket"))) None
           else Some(r.getInt(r.fieldIndex("bucket"))))).toMap
      val want = df.withColumn("bucket",
          when(col("s").isNotNull, ntile(4).over(
            Window.partitionBy(col("g"), col("s").isNull)
              .orderBy(col("s").desc, col("id")))))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(r.fieldIndex("bucket"))) None
           else Some(r.getInt(r.fieldIndex("bucket"))))).toMap
      assert(got == want, "distributed rank tiling == the window-ntile definition")
      assert(got(400L).isEmpty && got(401L).isEmpty, "null scores take a NULL bucket")
      assert(got(300L).nonEmpty, "a null group tiles on its own")
    } finally graft.api.Pinned.release(spark)
  }

  test("RankBuckets node: v9 stamp, codec identity, capture == direct API") {
    import graft.api.{App, Program}
    import graft.api.Program._
    val d = Doc(Seq(External("in"),
      RankBuckets("b", "in", "lang", "score", "doc_id", 4)), Seq("b"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":9") && Program.fromJson(json) == d)
    val bad = intercept[IllegalArgumentException](Program.fromJson(Program.toJson(
      Doc(Seq(External("in"), RankBuckets("b", "in", "lang", "score", "doc_id", 1)),
        Seq("b")))))
    assert(bad.getMessage.contains("buckets >= 2"), bad.getMessage)
    try {
      val docsDf = Seq((1L, "en", 0.5), (2L, "en", 0.1), (3L, "en", 0.9),
        (4L, "fr", 0.3)).toDF("doc_id", "lang", "score")
      val cap = Program.capture(
        Program.Rec.external("in", MStream(docsDf))
          .bucketByRank("lang", "score", "doc_id", buckets = 2).as("b"))
      assert(Program.fromJson(Program.toJson(cap)) == cap)
      val config = new App.Config()
        .setSource("in", App.Source("list", rows = Some(docsDf)))
        .addSink("b", App.Sink("memory"))
      Program.validate(cap, spark, config)
      val out = App.runProgram(spark, config, Program.toJson(cap))
        .collectFirst { case App.BatchOutput("b", o) => o }.get
      val direct = graft.pipeline.TextOps.bucketByRank(docsDf, "lang", "score",
        "doc_id", 2)
      assert(out.collect().toSet == direct.collect().toSet,
        "document execution equals the direct API")
    } finally graft.api.Pinned.release(spark)
  }

  test("contracts: artifact shape and bucket-column collision") {
    val thr = Seq(("en", 1, -1.0)).toDF("lang", "bucket", "cut")
    val bad = Seq(("en", 1)).toDF("lang", "bucket")
    assert(intercept[IllegalArgumentException](TextOps.bucketByThresholds(
      MStream(Seq((1L, "en", 0.1)).toDF("doc_id", "lang", "score")),
      bad, "lang", "score")).getMessage.contains("cut"))
    assert(intercept[IllegalArgumentException](TextOps.bucketByThresholds(
      MStream(Seq((1L, "en", 0.1, 9)).toDF("doc_id", "lang", "score", "bucket")),
      thr, "lang", "score")).getMessage.contains("already carries"))
  }
}
