package graft

import org.apache.spark.sql.functions._
import graft.api.{App, Lineage}

/** Auto-wired lineage (Milan `ApplicationConfiguration.addLineageSink`,
  * `application/ApplicationConfiguration.scala:111`; join emission
  * `runtime/LeftJoinKeyedCoProcessFunction.scala:85-91`): binding a lineage
  * sink on the config makes joins and running scans expose `record_id` and
  * write (op, output_id, input_id) edges — no manual plumbing. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def idsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Lineage.withRecordId(df).select(col(df.columns.head), col("record_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("lineage sink auto-wires enrichment join edges") {
    val lefts = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "t")
    val rights = Seq((100L, "a", 5L)).toDF("rid", "rk", "rt")
    val config = new App.Config()
      .setSource("l", App.Source("list", rows = Some(lefts), order = Seq("t", "id")))
      .setSource("r", App.Source("list", rows = Some(rights), order = Seq("rt", "rid")))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> in("l").leftJoin(in("r"))
        .on((l, r) => l("k") === r("rk"))
        .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid"))))
    }
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get

    assert(out.columns.contains("record_id"),
      "join output exposes the record id when lineage is on")
    val outIds = out.select("record_id").collect().map(_.getLong(0)).toSet
    val e = edges.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(e.forall(_._1.startsWith("LeftEnrichment")), s"op label, got $e")
    assert(e.map(_._2) == outIds, "every edge links an actual output record")

    // expected edge set: matched left -> {left id, right id}; unmatched -> {left id}
    val lIds = idsOf(lefts)
    val rIds = idsOf(rights)
    val byOut = out.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))).toSeq
    val expected = byOut.flatMap { case (lid, rid, outId) =>
      (outId, lIds(lid)) +: rid.toSeq.map(r => (outId, rIds(r)))
    }.toSet
    assert(e.map(x => (x._2, x._3)) == expected,
      "edges are exactly output -> present-side input ids")
    assert(e.size == 3, "matched left contributes 2 edges, unmatched 1")
  }

  test("lineage sink auto-wires as-of join and running-scan edges") {
    val purchases = Seq((1L, 7L, 100L), (2L, 8L, 50L)).toDF("pid", "pu", "pts")
    val clicks = Seq((10L, 7L, 90L)).toDF("cid", "cu", "cts")
    val values = Seq((1L, 2.0, 1L), (2L, 3.0, 2L)).toDF("vid", "v", "vt")
    val config = new App.Config()
      .setSource("p", App.Source("list", rows = Some(purchases)))
      .setSource("c", App.Source("list", rows = Some(clicks)))
      .setSource("v", App.Source("list", rows = Some(values), order = Seq("vt")))
      .addSink("asof", App.Sink("memory"))
      .addSink("sums", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map(
        "asof" -> in("p").asofJoin(in("c"), "pts", "cts",
          keys = Seq("pu" -> "cu"), rightOrder = Seq("cid")),
        "sums" -> in("v").sumBy(col("v"), "running"))
    }
    val asof = running.collectFirst { case App.BatchOutput("asof", df) => df }.get
    val sums = running.collectFirst { case App.BatchOutput("sums", df) => df }.get
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(asof.columns.contains("record_id") && sums.columns.contains("record_id"))
    // as-of: purchase 1 matched click 10 (2 edges), purchase 2 unmatched (1)
    val asofEdges = edges.filter(_._1.startsWith("asofJoin"))
    assert(asofEdges.size == 3)
    assert(asofEdges.map(_._3).toSet ==
      (idsOf(purchases).values.toSet + idsOf(clicks)(10L)))
    // scan: one edge per record, inputs are exactly the source records
    val scanEdges = edges.filter(_._1.startsWith("RSum"))
    assert(scanEdges.size == 2)
    assert(scanEdges.map(_._3) == idsOf(values).values.toSet)
    assert(scanEdges.map(_._2) ==
      sums.select("record_id").collect().map(_.getLong(0)).toSet)
  }

  test("streaming program lineage: edges flow to a streaming lineage sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, String, Long)]
    val rIn = MemoryStream[(Long, String, Long)]
    val outName = s"lin_out_${System.nanoTime()}"
    val linName = s"lin_edges_${System.nanoTime()}"
    val config = new App.Config()
      .setSource("l", App.Source("list",
        rows = Some(lIn.toDF().toDF("id", "k", "t")), order = Seq("t", "id")))
      .setSource("r", App.Source("list",
        rows = Some(rIn.toDF().toDF("rid", "rk", "rt")), order = Seq("rt", "rid")))
      .addSink("out", App.Sink("memory", outputMode = "append",
        queryName = Some(outName)))
      .addLineageSink(App.Sink("memory", queryName = Some(linName)))
    val running = App.run(spark, config) { in =>
      Map("out" -> in("l").leftJoin(in("r"))
        .on((l, r) => l("k") === r("rk"))
        .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid"))))
    }
    val queries = running.collect { case App.StreamingOutput(n, q) => n -> q }.toMap
    assert(queries.keySet == Set("out", "__lineage"),
      "lineage rides as a second streaming query")
    try {
      rIn.addData((100L, "a", 5L))
      lIn.addData((1L, "a", 10L), (2L, "b", 20L))
      queries.values.foreach(_.processAllAvailable())
      val out = spark.table(outName).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2)))
      assert(out.map(x => (x._1, x._2)).toSet == Set((1L, 100L), (2L, -1L)))
      val edges = spark.table(linName).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(edges.length == 3, s"matched left: 2 edges, unmatched: 1 — got ${edges.toSeq}")
      assert(edges.map(_._2).toSet == out.map(_._3).toSet,
        "edge output ids are the streaming join's record_ids")
      val lIds = idsOf(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "k", "t"))
      val rIds = idsOf(Seq((100L, "a", 5L)).toDF("rid", "rk", "rt"))
      assert(edges.map(_._3).toSet == Set(lIds(1L), lIds(2L), rIds(100L)),
        "input ids hash-match the source records")
    } finally queries.values.foreach(_.stop())
  }

  test("streaming scan lineage: running-aggregate edges flow per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double, Long)]
    val outName = s"scan_out_${System.nanoTime()}"
    val linName = s"scan_edges_${System.nanoTime()}"
    val config = new App.Config()
      .setSource("v", App.Source("list",
        rows = Some(in.toDF().toDF("vid", "v", "vt")), order = Seq("vt")))
      .addSink("sums", App.Sink("memory", outputMode = "append",
        queryName = Some(outName)))
      .addLineageSink(App.Sink("memory", queryName = Some(linName)))
    val running = App.run(spark, config) { s =>
      Map("sums" -> s("v").sumBy(col("v"), "running"))
    }
    val queries = running.collect { case App.StreamingOutput(n, q) => n -> q }.toMap
    try {
      in.addData((1L, 2.0, 1L), (2L, 3.0, 2L))
      in.addData((3L, 4.0, 3L))
      queries.values.foreach(_.processAllAvailable())
      val out = spark.table(outName).collect()
      assert(out.length == 3 && out.map(_.schema.fieldNames.contains("record_id")).forall(identity))
      val edges = spark.table(linName).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(edges.length == 3, "one edge per scanned record, across micro-batches")
      val expectedInputs = idsOf(
        Seq((1L, 2.0, 1L), (2L, 3.0, 2L), (3L, 4.0, 3L)).toDF("vid", "v", "vt")).values.toSet
      assert(edges.map(_._3).toSet == expectedInputs,
        "streaming scan input ids hash-match the source records")
      assert(edges.map(_._2).toSet ==
        out.map(_.getAs[Long]("record_id")).toSet)
    } finally queries.values.foreach(_.stop())
  }

  test("groupSelect emits fan-in edges: every input record links to its group's output") {
    val values = Seq((1L, "a", 2.0), (2L, "a", 3.0), (3L, "b", 5.0)).toDF("vid", "k", "v")
    val config = new App.Config()
      .setSource("v", App.Source("list", rows = Some(values)))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> in("v").groupBy("k").select(sum(col("v")).as("total")))
    }
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(out.columns.contains("record_id"), "aggregate output exposes record_id")
    val outIdByKey = out.collect().map(r => r.getString(0) -> r.getAs[Long]("record_id")).toMap
    assert(edges.forall(_._1.startsWith("GroupSelect")))
    assert(edges.size == 3, "one fan-in edge per contributing input record")
    val inputIds = idsOf(values)
    val expected = Set(
      (outIdByKey("a"), inputIds(1L)), (outIdByKey("a"), inputIds(2L)),
      (outIdByKey("b"), inputIds(3L)))
    assert(edges.map(e => (e._2, e._3)) == expected,
      "edges are exactly output-group -> contributing input ids")
  }

  test("tumbling windowSelect emits fan-in edges per (window, key) group") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // windows of 10s: rows at 1s,9s share window [0,10); row at 15s is [10,20)
    val events = Seq((1L, "a", t(1)), (2L, "a", t(9)), (3L, "a", t(15)))
      .toDF("eid", "k", "ts")
    val config = new App.Config()
      .setSource("e", App.Source("list", rows = Some(events)))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> in("e").groupBy("k")
        .tumblingWindow(col("ts"), "10 seconds")
        .select("win", count(lit(1)).as("n")))
    }
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(out.columns.contains("record_id"))
    assert(edges.forall(_._1.startsWith("WindowSelect")))
    assert(edges.size == 3, "one edge per input event")
    val byN = out.collect().map(r => r.getAs[Long]("n") -> r.getAs[Long]("record_id")).toMap
    val inputIds = idsOf(events)
    assert(edges.map(e => (e._2, e._3)) == Set(
        (byN(2L), inputIds(1L)), (byN(2L), inputIds(2L)), (byN(1L), inputIds(3L))),
      "events 1,2 fan into the [0,10) window output, event 3 into [10,20)")
  }

  test("streaming groupSelect lineage: fan-in edges flow per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val outName = s"gs_out_${System.nanoTime()}"
    val linName = s"gs_edges_${System.nanoTime()}"
    val config = new App.Config()
      .setSource("v", App.Source("list", rows = Some(in.toDF().toDF("vid", "k", "v"))))
      .addSink("out", App.Sink("memory", outputMode = "complete",
        queryName = Some(outName)))
      .addLineageSink(App.Sink("memory", queryName = Some(linName)))
    val running = App.run(spark, config) { s =>
      Map("out" -> s("v").groupBy("k").select(sum(col("v")).as("total")))
    }
    val queries = running.collect { case App.StreamingOutput(n, q) => n -> q }.toMap
    try {
      in.addData((1L, "a", 2.0), (2L, "b", 5.0))
      in.addData((3L, "a", 3.0))
      queries.values.foreach(_.processAllAvailable())
      val edges = spark.table(linName).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(edges.length == 3, "edges append across micro-batches, one per input")
      val inputIds = idsOf(
        Seq((1L, "a", 2.0), (2L, "b", 5.0), (3L, "a", 3.0)).toDF("vid", "k", "v"))
      assert(edges.map(_._3).toSet == inputIds.values.toSet,
        "input ids hash-match the streamed records")
      val outIds = spark.table(outName).collect().map(_.getAs[Long]("record_id")).toSet
      assert(edges.map(_._2).toSet == outIds,
        "edge output ids match the aggregate's group-identity record_ids")
    } finally queries.values.foreach(_.stop())
  }

  test("concurrent runs on one session keep separate recorders (no cross-talk)") {
    import scala.concurrent.{Await, Future, Promise}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val values = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("vid", "k", "v")
    // gate both program builds to overlap: each waits for the other to
    // have STARTED building before finishing its own build
    val aStarted = Promise[Unit](); val bStarted = Promise[Unit]()
    def runOne(tag: String, started: Promise[Unit], other: Promise[Unit]) = Future {
      val config = new App.Config()
        .setSource("v", App.Source("list", rows = Some(values)))
        .addSink("out", App.Sink("memory"))
        .addLineageSink(App.Sink("memory"))
      App.run(spark, config) { in =>
        started.success(())
        Await.result(other.future, 30.seconds)
        Map("out" -> in("v").withName(tag).groupBy("k")
          .select(sum(col("v")).as("total")))
      }.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
        .collect().map(_.getString(0)).toSet
    }
    val fa = runOne("runA", aStarted, bStarted)
    val fb = runOne("runB", bStarted, aStarted)
    val (opsA, opsB) = (Await.result(fa, 60.seconds), Await.result(fb, 60.seconds))
    assert(opsA == Set("GroupSelect:runA") && opsB == Set("GroupSelect:runB"),
      s"each run's lineage sink sees only its own ops, got A=$opsA B=$opsB")
  }

  test("without a lineage sink nothing changes: no record_id, no recorder leak") {
    val lefts = Seq((1L, "a", 10L)).toDF("id", "k", "t")
    val rights = Seq((100L, "a", 5L)).toDF("rid", "rk", "rt")
    val config = new App.Config()
      .setSource("l", App.Source("list", rows = Some(lefts), order = Seq("t", "id")))
      .setSource("r", App.Source("list", rows = Some(rights), order = Seq("rt", "rid")))
      .addSink("out", App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> in("l").leftJoin(in("r"))
        .on((l, r) => l("k") === r("rk"))
        .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid"))))
    }
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    assert(!out.columns.contains("record_id"))
    assert(running.size == 1, "no __lineage output")
    assert(Lineage.current(spark).isEmpty, "recorder removed after run")
  }

  // ---- curation drops: droppedBecause provenance --------------------------

  /** Doc-key hash — the dedup operators' record-id convention (the
    * dropped record never appears in the output, so identity is the id
    * column alone, hashed like every other record-id). */
  private def keyHash(id: Long): Long =
    spark.range(1).select(xxhash64(struct(lit(id)))).head().getLong(0)

  test("deduplicateCorpus emits droppedBecause edges to each cluster's survivor") {
    import graft.api.MStream
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),       // exact dup -> 1
      (3L, "pack my box with five dozen liquor jugs right now"),
      (4L, "the quick brown fox jumps over the lazy dog today extra"), // near dup -> 1
      (5L, "sphinx of black quartz judge my vow said the king"))
      .toDF("doc_id", "text")
    val config = new App.Config()
      .setSource("docs", App.Source("list", rows = Some(docs)))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> new MStream(graft.pipeline.Dedup.deduplicateCorpus(
        in("docs").df, "doc_id", "text", k = 16, bands = 8, threshold = 0.6)))
    }
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges == Set(
      ("droppedBecause:deduplicateCorpus", keyHash(2L), keyHash(1L)),
      ("droppedBecause:deduplicateCorpus", keyHash(4L), keyHash(1L))),
      s"each dropped doc links to its cluster survivor, got $edges")
    graft.api.Pinned.release(spark)
  }

  private val dropRef = Seq(
    (900L, "the quick brown fox jumps over the lazy dog today"),
    (901L, "pack my box with five dozen liquor jugs right now"))
    .toDF("doc_id", "text")

  private val dropArrivals = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"), // matches 900
    (2L, "a completely different sentence about nothing that matches here"),
    (3L, "pack my box with five dozen liquor jugs right now")) // matches 901

  test("dedupAgainstCorpus batch emits droppedBecause edges to the matching reference docs") {
    import graft.api.MStream
    val config = new App.Config()
      .setSource("arrivals", App.Source("list",
        rows = Some(dropArrivals.toDF("doc_id", "text"))))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> graft.pipeline.Dedup.dedupAgainstCorpus(
        in("arrivals"), dropRef, "doc_id", "text", k = 16, bands = 8, threshold = 0.8))
    }
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L))
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges == Set(
      ("droppedBecause:dedupAgainstCorpus", keyHash(1L), keyHash(900L)),
      ("droppedBecause:dedupAgainstCorpus", keyHash(3L), keyHash(901L))),
      s"dropped arrivals link to the reference docs that matched them, got $edges")
    graft.api.Pinned.release(spark)
  }

  test("dedupAgainstCorpus streaming: droppedBecause edges flow per micro-batch") {
    import graft.api.MStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val outName = s"drop_out_${System.nanoTime()}"
    val linName = s"drop_edges_${System.nanoTime()}"
    val config = new App.Config()
      .setSource("arrivals", App.Source("list",
        rows = Some(in.toDF().toDF("doc_id", "text"))))
      .addSink("out", App.Sink("memory", outputMode = "append",
        queryName = Some(outName)))
      .addLineageSink(App.Sink("memory", queryName = Some(linName)))
    val running = App.run(spark, config) { ins =>
      Map("out" -> graft.pipeline.Dedup.dedupAgainstCorpus(
        ins("arrivals"), dropRef, "doc_id", "text", k = 16, bands = 8, threshold = 0.8))
    }
    val queries = running.collect { case App.StreamingOutput(n, q) => n -> q }.toMap
    assert(queries.keySet == Set("out", "__lineage"))
    try {
      in.addData(dropArrivals.take(2): _*)
      in.addData(dropArrivals.drop(2): _*)
      queries.values.foreach(_.processAllAvailable())
      assert(spark.table(outName).select("doc_id").collect()
        .map(_.getLong(0)).toSet == Set(2L))
      // a pair surfacing via several band keys may repeat its edge — set
      val edges = spark.table(linName).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(edges == Set(
        ("droppedBecause:dedupAgainstCorpus", keyHash(1L), keyHash(900L)),
        ("droppedBecause:dedupAgainstCorpus", keyHash(3L), keyHash(901L))),
        s"streaming drop edges match the batch face, got $edges")
    } finally queries.values.foreach(_.stop())
    graft.api.Pinned.release(spark)
  }

  test("scrubDuplicateLines emits droppedBecause edges to each line's first occurrence") {
    def lineHash(doc: Long, pos: Int): Long =
      spark.range(1).select(xxhash64(struct(lit(doc), lit(pos)))).head().getLong(0)
    val docs = Seq(
      (1L, "unique opening line one\nshared footer line here"),
      (2L, "another distinct first line\nshared footer line here"),
      (3L, "shared footer line here\nlast unique content line"))
      .toDF("doc_id", "text")
    val config = new App.Config()
      .setSource("docs", App.Source("list", rows = Some(docs)))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> new graft.api.MStream(graft.pipeline.Dedup.scrubDuplicateLines(
        in("docs").df, "doc_id", "text", minWords = 3)))
    }
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    assert(out.select("doc_id", "n_dropped").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 0L), (2L, 1L), (3L, 1L)))
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // the footer's first occurrence is (doc 1, pos 1); drops at (2,1), (3,0)
    assert(edges == Set(
      ("droppedBecause:scrubDuplicateLines", lineHash(2L, 1), lineHash(1L, 1)),
      ("droppedBecause:scrubDuplicateLines", lineHash(3L, 0), lineHash(1L, 1))),
      s"each scrubbed line links to its surviving first occurrence, got $edges")
  }

  // ---- cycles: round-granularity provenance DAG ---------------------------

  /** Content hash of an (id, x) row — the record-id convention. */
  private def rowHash(id: Long, x: Long): Long =
    Seq((id, x)).toDF("id", "x")
      .select(xxhash64(col("id"), col("x"))).head().getLong(0)
  private def cycleGroupId(name: String, round: Int): Long =
    spark.range(1).select(xxhash64(lit(s"cycle:$name"), lit(round))).head().getLong(0)

  private def cycleDoc: String = {
    import graft.api.Program
    import graft.api.Program._
    Program.toJson(Doc(
      nodes = Seq(
        External("seed"),
        BeginCycle("chain", "seed", 20),
        MapCols("shift", "chain", Seq(Field("id", "id"), Field("x div 10", "x"))),
        Where("fb", "shift", "x > 0"),
        CloseCycle("out", "chain", "fb")),
      outputs = Seq("out")))
  }

  /** Run the digit-shift cycle doc on seeds {(1,250),(2,7)} under a
    * lineage sink and return the (op, output_id, input_id) edge set. */
  private def cycleEdges(strategy: String): Set[(String, Long, Long)] = {
    import graft.api.Program
    val config = new App.Config()
      .setSource("seed", App.Source("list",
        rows = Some(Seq((1L, 250L), (2L, 7L)).toDF("id", "x"))))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
      .setTuning("graft.cycle.strategy", strategy)
    val running = App.run(spark, config)(
      Program.interpret(Program.fromJson(cycleDoc)))
    val out = running.collectFirst { case App.BatchOutput("out", df) => df }.get
    assert(out.as[(Long, Long)].collect().toSet ==
      Set((1L, 250L), (1L, 25L), (1L, 2L), (2L, 7L)), "fixpoint unchanged")
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    graft.api.Pinned.release(spark) // drop the run's retained round frames
    edges
  }

  test("naive batch cycle emits per-round fan-in edges back to the seeds") {
    val (g1, g2) = (cycleGroupId("chain", 1), cycleGroupId("chain", 2))
    val (s1, s2) = (rowHash(1L, 250L), rowHash(2L, 7L))
    val (r25, r2) = (rowHash(1L, 25L), rowHash(1L, 2L))
    // naive frontier = the full accumulation: round 1 consumed the seeds,
    // round 2 consumed seeds + (1,25); fresh rows chain through the groups
    assert(cycleEdges("naive") == Set(
      ("cycleRound:chain", g1, s1), ("cycleRound:chain", g1, s2),
      ("cycle:chain", r25, g1),
      ("cycleRound:chain", g2, s1), ("cycleRound:chain", g2, s2),
      ("cycleRound:chain", g2, r25),
      ("cycle:chain", r2, g2)))
  }

  test("delta batch cycle emits frontier-only fan-in edges") {
    val (g1, g2) = (cycleGroupId("chain", 1), cycleGroupId("chain", 2))
    val (s1, s2) = (rowHash(1L, 250L), rowHash(2L, 7L))
    val (r25, r2) = (rowHash(1L, 25L), rowHash(1L, 2L))
    // semi-naive frontier = the previous round's delta only
    assert(cycleEdges("delta") == Set(
      ("cycleRound:chain", g1, s1), ("cycleRound:chain", g1, s2),
      ("cycle:chain", r25, g1),
      ("cycleRound:chain", g2, r25),
      ("cycle:chain", r2, g2)))
  }

  test("streaming channel cycle emits re-entry edges under the feedback records' ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types._
    import graft.api.Program
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft_cycle_lin").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType)))
    val (src, snk) = graft.operators.Cycles.feedbackChannel(dir, schema)
    val outName = s"cycle_lin_out_${System.nanoTime()}"
    val linName = s"cycle_lin_edges_${System.nanoTime()}"
    val running = App.run(spark, new App.Config()
        .setSource("seed", App.Source("list", rows = Some(in.toDF().toDF("id", "x"))))
        .setSource("__cycle_chain", src)
        .addSink("__cycle_chain", snk)
        .addSink("out", App.Sink("memory", outputMode = "append",
          queryName = Some(outName)))
        .addLineageSink(App.Sink("memory", outputMode = "append",
          queryName = Some(linName))))(
      Program.interpret(Program.fromJson(cycleDoc)))
    val qs = running.collect { case App.StreamingOutput(_, q) => q }
    try {
      in.addData((1L, 250L))
      var tries = 0
      while (spark.table(outName).count() < 3 && tries < 60) {
        qs.foreach(_.processAllAvailable()); Thread.sleep(100); tries += 1
      }
      // feedback records (x > 0 after shift): (1,25) and (1,2) re-enter —
      // their re-entry edges carry the records' own content hashes, the
      // same ids the body's operators would emit them under
      val reentry = spark.table(linName)
        .filter(col("op") === "cycleReentry:chain")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      val expect = Set(rowHash(1L, 25L), rowHash(1L, 2L)).map(h => (h, h))
      assert(reentry == expect,
        s"one identity edge per re-entrant record, got $reentry")
    } finally qs.foreach(_.stop())
  }
}
