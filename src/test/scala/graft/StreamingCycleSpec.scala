package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.App
import graft.operators.Cycles

/** Streaming cycle via the managed sink→source feedback channel
  * (`Cycles.feedbackChannel`) — the reference's own documented fallback for
  * feedback edges Structured Streaming can't express natively
  * (`bodaboda/BodaApp.scala:62-66`). */
class StreamingCycleSpec extends SparkSpec {
  import spark.implicits._

  test("records re-enter through the feedback channel until the predicate stops them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val seed = MemoryStream[(Long, Int)]
    val dir = java.nio.file.Files.createTempDirectory("graft_cycle_ch").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("hops", IntegerType)))
    val (fbSource, fbSink) = Cycles.feedbackChannel(dir, schema)
    val outName = s"cycle_out_${System.nanoTime()}"
    val config = new App.Config()
      .setSource("seed", App.Source("list", rows = Some(seed.toDF().toDF("id", "hops"))))
      .setSource("feedback", fbSource)
      .addSink("loop", fbSink)
      .addSink("out", App.Sink("memory", outputMode = "append", queryName = Some(outName)))
    val running = App.run(spark, config) { in =>
      // one traversal of the loop body: increment the hop counter
      val bumped = in("seed").union(in("feedback"))
        .map(col("id"), (col("hops") + 1).as("hops"))
      Map("out" -> bumped, "loop" -> bumped.where(col("hops") < 3))
    }
    val loopQ = running.collect { case App.StreamingOutput("loop", q) => q }.head
    val outQ = running.collect { case App.StreamingOutput("out", q) => q }.head
    try {
      seed.addData((1L, 0), (2L, 0))
      // drain the self-loop to quiescence; the observer tails the same channel
      var tries = 0
      while (spark.table(outName).count() < 6 && tries < 60) {
        loopQ.processAllAvailable(); outQ.processAllAvailable()
        Thread.sleep(100); tries += 1
      }
      val got = spark.table(outName).as[(Long, Int)].collect().toSet
      assert(got == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2), (2L, 3)),
        "each record makes exactly 3 traversals; every re-entry bumps hops")
    } finally { loopQ.stop(); outQ.stop() }
  }

  test("one cycle document runs batch (fixpoint) and streaming (channel) to the same set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.api.Program
    import graft.api.Program._
    implicit val sqlCtx = spark.sqlContext
    // per-record base-10 shift chain: x, x div 10, ... while > 0
    val json = Program.toJson(Doc(
      nodes = Seq(
        External("seed"),
        BeginCycle("chain", "seed", 20),
        MapCols("shift", "chain", Seq(Field("id", "id"), Field("x div 10", "x"))),
        Where("fb", "shift", "x > 0"),
        CloseCycle("out", "chain", "fb")),
      outputs = Seq("out")))
    val rows = Seq((1L, 420L), (2L, 7L), (3L, 1030L))
    val expect = Set((1L, 420L), (1L, 42L), (1L, 4L), (2L, 7L),
      (3L, 1030L), (3L, 103L), (3L, 10L), (3L, 1L))

    val batchOut = App.run(spark, new App.Config()
        .setSource("seed", App.Source("list", rows = Some(rows.toDF("id", "x"))))
        .addSink("out", App.Sink("memory")))(
      Program.interpret(Program.fromJson(json)))
      .collectFirst { case App.BatchOutput("out", df) => df }.get
    assert(batchOut.as[(Long, Long)].collect().toSet == expect,
      "batch lowering computes the set fixpoint")

    val in = MemoryStream[(Long, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft_cycle_doc").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("x", LongType)))
    val (src, snk) = Cycles.feedbackChannel(dir, schema)
    val outName = s"cycle_doc_out_${System.nanoTime()}"
    val running = App.run(spark, new App.Config()
        .setSource("seed", App.Source("list", rows = Some(in.toDF().toDF("id", "x"))))
        .setSource("__cycle_chain", src)
        .addSink("__cycle_chain", snk)
        .addSink("out", App.Sink("memory", outputMode = "append",
          queryName = Some(outName))))(
      Program.interpret(Program.fromJson(json)))
    val qs = running.collect { case App.StreamingOutput(_, q) => q }
    try {
      in.addData(rows: _*)
      var tries = 0
      while (spark.table(outName).count() < expect.size && tries < 60) {
        qs.foreach(_.processAllAvailable()); Thread.sleep(100); tries += 1
      }
      assert(spark.table(outName).as[(Long, Long)].collect().toSet == expect,
        "the same artifact yields the same record set through the channel")
    } finally qs.foreach(_.stop())
  }

  test("reference TestFlinkGenCycle: the add-one-stop-at-ten loop outputs exactly 2..10") {
    // TestFlinkGenCycle.scala:15-39 — seed IntRecord(1), body map(i+1)
    // then where(i <= 10), closeCycle on the filtered stream; expected
    // output = exactly the nine records 2..10. The reference observes the
    // MAPPED+FILTERED stream, so the graft document applies the same
    // map+filter once more past the fixpoint: body(fix {1..10}) = {2..10}.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.api.Program
    import graft.api.Program._
    implicit val sqlCtx = spark.sqlContext
    val json = Program.toJson(Doc(
      nodes = Seq(
        External("seed"),
        BeginCycle("c", "seed", 20),
        MapCols("inc", "c", Seq(Field("i + 1", "i"))),
        Where("fb", "inc", "i <= 10"),
        CloseCycle("out", "c", "fb"),
        MapCols("inc2", "out", Seq(Field("i + 1", "i"))),
        Where("final", "inc2", "i <= 10")),
      outputs = Seq("final")))
    val expect = (2 to 10).map(_.toLong).toSeq

    // batch face: set fixpoint, then the observed node
    val batch = App.run(spark, new App.Config()
        .setSource("seed", App.Source("list", rows = Some(Seq(Tuple1(1L)).toDF("i"))))
        .addSink("final", App.Sink("memory")))(
      Program.interpret(Program.fromJson(json)))
      .collectFirst { case App.BatchOutput("final", df) => df }.get
    assert(batch.as[Long].collect().sorted.toSeq == expect,
      "batch fixpoint observes the reference's nine records 2..10")

    // streaming face: the same document through the feedback channel
    val in = MemoryStream[Long]
    val dir = java.nio.file.Files.createTempDirectory("graft_cycle_ref").toString
    val schema = StructType(Seq(StructField("i", LongType)))
    val (src, snk) = Cycles.feedbackChannel(dir, schema)
    val outName = s"cycle_ref_out_${System.nanoTime()}"
    val running = App.run(spark, new App.Config()
        .setSource("seed", App.Source("list", rows = Some(in.toDF().toDF("i"))))
        .setSource("__cycle_c", src)
        .addSink("__cycle_c", snk)
        .addSink("final", App.Sink("memory", outputMode = "append",
          queryName = Some(outName))))(
      Program.interpret(Program.fromJson(json)))
    val qs = running.collect { case App.StreamingOutput(_, q) => q }
    try {
      in.addData(1L)
      var tries = 0
      while (spark.table(outName).count() < expect.size && tries < 60) {
        qs.foreach(_.processAllAvailable()); Thread.sleep(100); tries += 1
      }
      assert(spark.table(outName).as[Long].collect().sorted.toSeq == expect,
        "the channel trace emits each of 2..10 exactly once, like the reference")
    } finally qs.foreach(_.stop())
  }

  test("join-body cycle (semi-naive path) computes reachability over static edges") {
    import graft.api.{MStream, Program}
    import graft.api.Program._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    // linear body with a head-dependent enrichment join → delta evaluation:
    // F(Δ) = Δ ⨝ edges, one hop per round, old facts never re-derived
    val doc = Doc(
      nodes = Seq(
        External("seeds"), External("edges"),
        BeginCycle("reach", "seeds", 20),
        Join("step", "leftInner", "reach", "edges", "l.id = r.src",
          Seq(Field("r.dst", "id"))),
        CloseCycle("out", "reach", "step")),
      outputs = Seq("out"))
    val out = Program.interpret(doc)(
      n => if (n == "seeds") new MStream(seeds, Seq("id"))
           else new MStream(edges, Seq("src", "dst")))("out")
    assert(out.df.as[Long].collect().toSet == Set(1L, 2L, 3L, 4L),
      "the fixpoint reaches every node on the chain exactly once")
  }

  test("graft.cycle.strategy overrides the fixpoint strategy; delta rejects nonlinear bodies") {
    import graft.api.{MStream, Program}
    import graft.api.Program._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val doc = Doc(
      nodes = Seq(
        External("seeds"), External("edges"),
        BeginCycle("reach", "seeds", 20),
        Join("step", "leftInner", "reach", "edges", "l.id = r.src",
          Seq(Field("r.dst", "id"))),
        CloseCycle("out", "reach", "step")),
      outputs = Seq("out"))
    def run(): Set[Long] = Program.interpret(doc)(
      n => if (n == "seeds") new MStream(seeds, Seq("id"))
           else new MStream(edges, Seq("src", "dst")))("out")
      .df.as[Long].collect().toSet
    // join body → auto picks delta; forcing naive must agree
    spark.conf.set("graft.cycle.strategy", "naive")
    try assert(run() == Set(1L, 2L, 3L), "forced-naive join body computes the fixpoint")
    finally spark.conf.unset("graft.cycle.strategy")
    assert(run() == Set(1L, 2L, 3L), "auto (delta) agrees")

    // nonlinear body (distinct breaks union-distributivity) + forced delta → reject
    val nonlinear = Doc(
      nodes = Seq(
        External("seeds"),
        BeginCycle("c", "seeds", 5),
        Distinct("d", "c"),
        CloseCycle("out", "c", "d")),
      outputs = Seq("out"))
    spark.conf.set("graft.cycle.strategy", "delta")
    try {
      val e = intercept[IllegalArgumentException](
        Program.interpret(nonlinear)(_ => new MStream(seeds, Seq("id")))("out"))
      assert(e.getMessage.contains("linear"), "forced delta on a nonlinear body rejects")
    } finally spark.conf.unset("graft.cycle.strategy")
  }

  test("delta and naive fixpoints agree on a seeded random functional graph") {
    import graft.api.MStream
    import graft.operators.Cycles
    import org.apache.spark.sql.functions._
    // functional graph: every node has exactly one successor — reachability
    // from seeds via a broadcast-joined step, run through BOTH strategies
    val rnd = new scala.util.Random(42)
    val n = 60
    val succ = (0L until n.toLong).map(i => (i, rnd.nextInt(n).toLong))
    val edges = succ.toDF("src", "dst")
    val seeds = Seq(Tuple1(0L), Tuple1(17L), Tuple1(44L)).toDF("id")
    def step(cur: MStream): MStream = MStream(
      cur.df.join(broadcast(edges), col("id") === col("src"))
        .select(col("dst").as("id")))
    val viaDelta = Cycles.iterateDelta(MStream(seeds), 100)(step)
      .df.as[Long].collect().toSet
    val viaNaive = Cycles.iterate(MStream(seeds), 100)(cur =>
      cur.union(step(cur)).distinct())
      .df.as[Long].collect().toSet
    assert(viaDelta == viaNaive, "both strategies compute the same least fixpoint")
    assert(viaDelta.contains(0L) && viaDelta.size >= 3, "seeds are in the fixpoint")
  }
}
