package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.operators.Skew

/** Salted two-stage aggregation equals direct aggregation; hot-key bounds
  * of the enrichment-join window path. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("enrichment join on one hot key: per-key sort completes, bound is the hot KEY not the corpus") {
    // The batch enrichment-join lowering is a single window over the join
    // key (EnrichmentJoins.build): per-key processing is serial — the same
    // bound as the reference's keyed co-process functions — but the sort
    // happens WITHIN key partitions, so one hot key bounds one task, never
    // the corpus. 50k lefts + 5k rights on one key, a handful elsewhere.
    val lefts = ((1L to 50000L).map(i => ("hot", i * 2, i)) ++
      Seq(("cold", 2L, 1L), ("cool", 4L, 2L))).toDF("k", "seq", "v")
    val rights = ((1L to 5000L).map(i => ("hot", i * 20 + 1, i * 100)) ++
      Seq(("cold", 1L, 7L))).toDF("k", "seq", "w")
    val joined = new MStream(lefts, Seq("seq"))
      .leftJoin(new MStream(rights, Seq("seq")))
      .on((l, r) => l("k") === r("k"))
      .select((l, r) => Seq(l("k").as("k"), l("seq").as("ls"), r("w").as("rw")))
    // completion + spot correctness: left seq=2000 (hot) sees the latest
    // right with rseq <= 2000, i.e. i=99 -> w=9900; cold left sees w=7
    val rows = joined.df.collect()
    assert(rows.length == 50002)
    val bySeq = rows.map(r => (r.getString(0), r.getLong(1)) -> Option(r.get(2))).toMap
    assert(bySeq(("hot", 2000L)) == Some(9900L))
    assert(bySeq(("cold", 2L)) == Some(7L))
    assert(bySeq(("cool", 4L)) == None)
    // plan shape: ONE exchange, partitioned on the join key, feeding a
    // window sort within partitions — no per-pair join node
    val plan = joined.df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "window lowering expected")
    assert(plan.contains("hashpartitioning(_k0"), "exchange on the join key")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "no join node: enrichment is a window, w x r pairs never materialize")
  }

  test("saltedAgg matches direct groupBy for algebraic aggregates") {
    // one pathologically hot key
    val df = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      Seq(("a", 5L), ("a", 7L), ("b", 1L))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedAgg(df, Seq("k"), saltFactor = 8,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn"), max("v").as("pm")),
      finals = Seq(sum("ps").as("s"), sum("pn").as("n"), max("pm").as("m")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == direct)
  }
}
