package graft

import org.apache.spark.sql.functions._
import graft.api.{Metrics, MStream}
import graft.operators.Cycles

/** Cycle (batch fixpoint) and observe()-based metrics. */
class CycleMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("batch cycle iterates to a fixpoint (transitive closure)") {
    // edges of a chain 1->2->3->4; closure adds 1->3,1->4,2->4
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val closure = Cycles.iterate(MStream(edges), maxIterations = 10) { cur =>
      val joined = cur.df.as("a").join(edges.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      MStream(cur.df.unionByName(joined).distinct())
    }
    assert(closure.df.count() == 6, "chain of 4 nodes has 6 closure edges")
  }

  test("iterate's fingerprint witness catches count-preserving non-monotone steps") {
    // a rotating step: {k} -> {k+1 mod 5}, always 3 rows — under a
    // count-only witness round 2 would falsely "converge" (3 == 3) and
    // return a non-fixpoint; the (count, xor-hash) fingerprint keeps
    // iterating until maxIterations
    def rotate(cur: MStream): MStream =
      MStream(cur.df.select(((col("k") + 1) % 5).as("k")))
    var rounds = 0
    val out = Cycles.iterate(MStream(Seq(0, 1, 2).toDF("k")), maxIterations = 7) { cur =>
      rounds += 1; rotate(cur)
    }
    assert(rounds == 7, s"non-monotone count-preserving step must never " +
      s"satisfy the fingerprint witness, stopped after $rounds rounds")
    // 7 rotations of {0,1,2} mod 5 = {2,3,4}
    assert(out.df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3, 4))
    // and a genuine fixpoint still terminates early, checkpoint on or off
    for (cp <- Seq(true, false)) {
      var n = 0
      val fixed = Cycles.iterate(MStream(Seq(1, 2).toDF("k")),
          maxIterations = 10, checkpoint = cp) { cur =>
        n += 1; MStream(cur.df.unionByName(Seq(1, 2, 3).toDF("k")).distinct())
      }
      assert(fixed.df.count() == 3 && n < 10,
        s"monotone step converges via the fingerprint (checkpoint=$cp, rounds=$n)")
    }
  }

  test("checkpoint cadence > 1: skipped rounds keep the live checkpoint readable") {
    // at cadence 3, rounds 1-2 are plans over the seed, round 3
    // checkpoints, rounds 4-5 are plans over round 3's checkpoint — which
    // must NOT be released until round 6 supersedes it (regression: the
    // old supersede-every-round release freed it under the skipped
    // rounds' still-referenced plans -> CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
    spark.conf.set("graft.cycle.checkpointCadence", "3")
    try {
      val edges = Seq((1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)).toDF("src", "dst")
      val closure = Cycles.iterate(MStream(edges), maxIterations = 12) { cur =>
        val joined = cur.df.as("a").join(edges.as("b"), col("a.dst") === col("b.src"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
        MStream(cur.df.unionByName(joined).distinct())
      }
      assert(closure.df.count() == 21, "chain of 7 nodes has 21 closure edges")
      graft.api.Pinned.release(spark)
    } finally spark.conf.unset("graft.cycle.checkpointCadence")
  }

  test("weekly window offset aligns windows to the requested weekday") {
    import java.time.DayOfWeek
    import graft.api.TimeWindows
    assert(TimeWindows.weeklyOffset(DayOfWeek.THURSDAY) == "0 days")
    assert(TimeWindows.weeklyOffset(DayOfWeek.MONDAY) == "4 days")
    val dayNs = 86400L * 1000000000L
    // 1970-01-05 was a Monday; a weekly window offset for Monday must make
    // that instant a window start
    val off = TimeWindows.weeklyOffsetUnits(DayOfWeek.MONDAY, dayNs)
    assert((4L * dayNs - off) % (7L * dayNs) == 0)
  }

  test("lineage: record ids are deterministic; join outputs link to input ids") {
    import graft.api.Lineage
    val in = Lineage.withRecordId(Seq(("a", 1), ("b", 2)).toDF("k", "v"), "in_id")
    val in2 = Lineage.withRecordId(Seq(("a", 1), ("b", 2)).toDF("k", "v"), "in_id")
    assert(in.collect().map(_.getLong(2)).toSet == in2.collect().map(_.getLong(2)).toSet,
      "content-hash ids reproduce across runs")
    val out = Lineage.withRecordId(
      in.select(col("k"), col("v"), col("in_id"), (col("v") * 10).as("v10")), "out_id")
    val e = Lineage.edges(out, "out_id", Seq("in_id"))
    assert(e.columns.toSeq == Seq("output_id", "input_id") && e.count() == 2)
  }

  test("observed metrics are evaluated in-plan and reach the collector") {
    val collector = new Metrics.Collector(spark)
    try {
      val s = Metrics.observe(MStream(Seq(1.0, 2.0, 3.0).toDF("v")),
        "obs1", "cnt" -> count(lit(1)), "total" -> sum(col("v")))
      s.df.collect()
      // listener delivery is asynchronous with respect to collect()
      var tries = 0
      while (collector.get("obs1").isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val m = collector.get("obs1").get
      assert(m("cnt") == 3L && m("total") == 6.0)
    } finally collector.close()
  }
}
