package graft

import org.apache.spark.sql.functions._
import graft.api.{MStream, Pinned}

/** Checkpoint lifecycle: operators that localCheckpoint intermediates must
  * unpersist every superseded frame before returning, and anything the
  * RETURNED plan still references must be registered with [[Pinned]] for
  * caller-side release — a long-lived service must not accumulate
  * BlockManager blocks per built query. */
class CheckpointHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def pinnedNow(): Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Async unpersist: poll until the diff against `before` satisfies `ok`. */
  private def settle(before: Set[Int])(ok: Set[Int] => Boolean): Set[Int] = {
    val deadline = System.nanoTime() + 10e9.toLong
    var diff = pinnedNow().diff(before)
    while (!ok(diff) && System.nanoTime() < deadline) { Thread.sleep(50); diff = pinnedNow().diff(before) }
    diff
  }

  test("checkpointTracked elides the copy for a bare, still-persisted LogicalRDD") {
    val df = spark.range(100).toDF("id")
    val (cp1, ids1) = graft.api.Pinned.checkpointTracked(df)
    // a bare pinned frame re-tracks WITHOUT a second checkpoint: same
    // frame, same RDD ids (the chained-covered-ops elision)
    val (cp2, ids2) = graft.api.Pinned.checkpointTracked(cp1)
    assert(cp2 eq cp1, "bare persisted LogicalRDD is reused, not re-copied")
    assert(ids2 == ids1, "elision returns the original pinned ids")
    // any DERIVED plan over the pinned frame still materializes its own
    // checkpoint (semantic equality through a projection is not decidable)
    val (cp3, ids3) = graft.api.Pinned.checkpointTracked(cp1.filter(col("id") >= 0))
    assert(!(cp3 eq cp1) && ids3.nonEmpty && ids3.intersect(ids1).isEmpty,
      "derived plans re-checkpoint")
    // an UNPERSISTED LogicalRDD (raw RDD frame) is not elidable: its
    // lineage is arbitrary and nothing pins its blocks
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L))),
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType))
    val (cp4, ids4) = graft.api.Pinned.checkpointTracked(raw)
    assert(!(cp4 eq raw) && ids4.nonEmpty, "unpersisted LogicalRDD still checkpoints")
    graft.api.Pinned.unpersist(spark.sparkContext, ids1 ++ ids3 ++ ids4)
  }

  test("common-case residual left-inner join pins nothing after build") {
    val before = pinnedNow()
    val lefts = new MStream(
      Seq((1L, "a", 1L, 1.0), (2L, "a", 3L, 2.0), (3L, "b", 5L, 9.0))
        .toDF("id", "k", "t", "need"), Seq("t", "id"))
    val rights = new MStream(
      Seq((10L, "a", 2L, 5.0), (11L, "a", 4L, 40.0)).toDF("rid", "rk", "rt", "rv"),
      Seq("rt", "rid"))
    val out = lefts.leftInnerJoin(rights)
      .on((l, r) => l("k") === r("rk") && r("rv") >= l("need"))
      .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid")))
      .df.collect()
    assert(out.nonEmpty)
    val left = settle(before)(_.isEmpty)
    assert(left.isEmpty, s"no pinned blocks survive the common residual path, got $left")
  }

  test("adversarial residual loop consolidates matches into one released-on-demand frame") {
    val prev = spark.conf.getOption("graft.join.residualChunk")
    spark.conf.set("graft.join.residualChunk", "100")
    try {
      val before = pinnedNow()
      val lefts = new MStream(
        Seq((1L, "hot", 10L, 800.0), (2L, "hot", 20L, 950.0))
          .toDF("id", "k", "t", "need"), Seq("t", "id"))
      val rights = new MStream(
        (1L to 1000L).map(i => (2000L + i, "hot", 100L + i, i.toDouble))
          .toDF("rid", "rk", "rt", "rv"), Seq("rt", "rid"))
      val joined = lefts.leftInnerJoin(rights)
        .on((l, r) => l("k") === r("rk") && r("rv") >= l("need"))
        .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid")))
      assert(joined.df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2800L), (2L, 2950L)), "loop answers stay correct under consolidation")
      // per-chunk and stuck-set intermediates are gone; only the single
      // consolidated matches frame (registered with Pinned) remains
      val afterBuild = settle(before)(_.size <= 1)
      assert(afterBuild.size <= 1,
        s"chunk/stuck checkpoints released, one consolidated frame at most: $afterBuild")
      assert(Pinned.registered(spark).nonEmpty,
        "the consolidated frame is registered for caller-side release")
      Pinned.release(spark)
      val end = settle(before)(_.isEmpty)
      assert(end.isEmpty, s"Pinned.release drops the consolidated frame, got $end")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("graft.join.residualChunk", v)
        case None => spark.conf.unset("graft.join.residualChunk")
      }
    }
  }

  test("per-run scopes release only their own frames") {
    import graft.api.Pinned
    val before = pinnedNow()
    var out1: org.apache.spark.sql.DataFrame = null
    var out2: org.apache.spark.sql.DataFrame = null
    // two runs' registrations, each in its own scope (what concurrent
    // App.run invocations on one session produce)
    val s1 = Pinned.scoped(spark) { s =>
      out1 = Seq((1L, "a")).toDF("id", "v").localCheckpoint()
      Pinned.register(spark, Pinned.idsOf(out1))
      assert(Pinned.registered(spark) == Pinned.idsOf(out1),
        "inside a scope, registered() reads the scope")
      s
    }
    val s2 = Pinned.scoped(spark) { s =>
      out2 = Seq((2L, "b")).toDF("id", "v").localCheckpoint()
      Pinned.register(spark, Pinned.idsOf(out2))
      s
    }
    assert(s1.registered.intersect(s2.registered).isEmpty,
      "exact id attribution: scopes never claim each other's checkpoints")
    s1.release()
    settle(before)(d => d.intersect(s1.registered).isEmpty)
    // run 2's still-unexecuted plan survives run 1's release
    assert(out2.collect().map(_.getLong(0)).toSeq == Seq(2L),
      "releasing one run's pins must not free another run's frames")
    s2.release()
    val end = settle(before)(_.isEmpty)
    assert(end.isEmpty, s"both scopes drained, got $end")
    assert(Pinned.registered(spark).isEmpty, "nothing fell back to the session registry")
  }

  test("cross-scope elided reuse: releasing one holder keeps the other's blocks") {
    import graft.api.Pinned
    val before = pinnedNow()
    // scope A pins a frame; scope B's checkpointTracked ELIDES the copy
    // (bare persisted LogicalRDD) and registers the SAME id — the
    // round-15 documented hazard, now refcounted
    var cp: org.apache.spark.sql.DataFrame = null
    var ids: Set[Int] = null
    val sA = Pinned.scoped(spark) { s =>
      val t = Pinned.checkpointTracked(spark.range(50).toDF("id"))
      cp = t._1; ids = t._2
      Pinned.register(spark, ids)
      s
    }
    val sB = Pinned.scoped(spark) { s =>
      val (cp2, ids2) = Pinned.checkpointTracked(cp)
      assert((cp2 eq cp) && ids2 == ids, "scope B reuses A's pinned frame")
      Pinned.register(spark, ids2)
      s
    }
    sA.release()
    Thread.sleep(200)
    assert(ids.subsetOf(pinnedNow()),
      "A's release must not free blocks B still holds")
    assert(cp.count() == 50L, "B's plan still executes after A releases")
    sB.release()
    val end = settle(before)(d => d.intersect(ids).isEmpty)
    assert(end.intersect(ids).isEmpty, s"last holder's release frees the blocks, got $end")
    // double-release of the SAME holder stays a no-op (drain() empties)
    sB.release()
    // and a plain unscoped register/release pair still frees exactly once
    val (cp3, ids3) = Pinned.checkpointTracked(spark.range(7).toDF("id"))
    Pinned.register(spark, ids3)
    Pinned.register(spark, ids3) // set no-op: must NOT double-retain
    Pinned.release(spark)
    val end2 = settle(before)(d => d.intersect(ids3).isEmpty)
    assert(end2.intersect(ids3).isEmpty,
      "re-registering the same id in one registry does not double-retain")
  }

  test("releasePinnedAfterRun drains two sequential eager-batch runs without manual release") {
    import graft.api.{App, Pinned}
    val before = pinnedNow()
    val outDir = java.nio.file.Files.createTempDirectory("graft_autorelease").toString
    def runOnce(tag: Int): Unit = {
      val lefts = Seq((1L, "hot", 10L, 800.0), (2L, "hot", 20L, 950.0))
        .toDF("id", "k", "t", "need")
      val rights = (1L to 1000L).map(i => (2000L + i, "hot", 100L + i, i.toDouble))
        .toDF("rid", "rk", "rt", "rv")
      val config = new App.Config()
        .setSource("lefts", App.Source(format = "memory", rows = Some(lefts),
          order = Seq("t", "id")))
        .setSource("rights", App.Source(format = "memory", rows = Some(rights),
          order = Seq("rt", "rid")))
        .addSink("joined", App.Sink(format = "parquet", path = Some(s"$outDir/run$tag"),
          mode = "overwrite"))
        .setTuning("graft.join.residualChunk", "100")
        .releasePinnedAfterRun()
      val outs = App.run(spark, config) { ins =>
        Map("joined" -> ins("lefts").leftInnerJoin(ins("rights"))
          .on((l, r) => l("k") === r("rk") && r("rv") >= l("need"))
          .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid"))))
      }
      assert(outs.nonEmpty)
      assert(spark.read.parquet(s"$outDir/run$tag").count() == 2L,
        "the sink consumed the plan before auto-release")
    }
    runOnce(1)
    runOnce(2)
    val left = settle(before)(_.isEmpty)
    assert(left.isEmpty,
      s"sequential auto-released runs strand no pinned blocks, got $left")
    assert(Pinned.registered(spark).isEmpty,
      "auto-release leaves nothing in the session registry")
  }

  test("releasePinnedAfterRun drains a streaming run when its last query terminates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.api.App
    implicit val sqlCtx = spark.sqlContext
    val before = pinnedNow()
    val ref = Seq((100L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val outName = s"pin_stream_${System.nanoTime()}"
    val config = new App.Config()
      .setSource("docs", App.Source("list", rows = Some(in.toDF().toDF("doc_id", "text"))))
      .addSink("out", App.Sink("memory", outputMode = "append", queryName = Some(outName)))
      .releasePinnedAfterRun()
    val running = App.run(spark, config) { ins =>
      // pins the broadcast reference band index + shingle sets at build
      Map("out" -> graft.pipeline.Dedup.dedupAgainstCorpus(ins("docs"), ref,
        "doc_id", "text", k = 16, bands = 8, threshold = 0.8))
    }
    val q = running.collect { case App.StreamingOutput(_, sq) => sq }.head
    try {
      assert(pinnedNow().diff(before).nonEmpty,
        "the reference artifacts are pinned while the query runs")
      in.addData((1L, "a fresh unrelated document about streams"))
      q.processAllAvailable()
      assert(spark.table(outName).count() == 1L)
    } finally q.stop()
    val left = settle(before)(_.isEmpty)
    assert(left.isEmpty,
      s"query termination drains the run's pinned reference frames, got $left")
  }
}
