package graft

case class PlanShapeDoc(doc_id: Long, text: String, lang: String,
                        source: String, n_chars: Long)

/**
 * Pins the physical-plan properties the 100 TB posture depends on, so a
 * refactor that silently loses a pushdown, a broadcast, or a hash-join
 * hint fails here rather than in a cluster. Asserts are on plan STRINGS
 * of the driver-facing queries at sf0.001 — coarse on purpose (exact
 * operator trees churn across Spark versions; these properties must not).
 */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("TypedStream lambda filters block parquet pushdown; the Column bridge restores it") {
    import spark.implicits._
    val ds = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .as[PlanShapeDoc]
    def planOf(t: graft.api.TypedStream[PlanShapeDoc]): String =
      t.ds.queryExecution.executedPlan.toString
    // lambda face: the closure is opaque — no filter reaches the scan,
    // and the typed boundary deserializes every row
    val lam = planOf(graft.api.TypedStream[PlanShapeDoc](ds, _.doc_id).where(_.lang == "en"))
    assert(lam.contains("PushedFilters: []"),
      s"a JVM closure must not (and cannot) push down:\n$lam")
    assert(lam.contains("newInstance(class graft.PlanShapeDoc"),
      s"the lambda face constructs an object per row to invoke the closure:\n$lam")
    // Column bridge: same typed stream, predicate reaches PushedFilters
    val bridged = planOf(graft.api.TypedStream[PlanShapeDoc](ds, _.doc_id)
      .where(org.apache.spark.sql.functions.col("lang") === "en"))
    assert(bridged.contains("EqualTo(lang,en)"),
      s"the Column overload must reach the parquet scan:\n$bridged")
    assert(!bridged.contains("newInstance"),
      "the Column face stays relational — no object construction")
  }

  test("TypedStream.mapTo prunes the scan to the projected columns; lambda map cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ds = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .as[PlanShapeDoc]
    // lambda map: Catalyst sees an opaque closure over the whole record —
    // every column is read to build the object
    val lam = graft.api.TypedStream[PlanShapeDoc](ds, _.doc_id)
      .map(d => (d.doc_id, d.n_chars), (o: (Long, Long)) => o._1)
      .ds.queryExecution.executedPlan.toString
    assert(lam.contains("text"), s"the lambda face reads every column:\n$lam")
    // mapTo: the §2.8 CreateInstance form as Columns — the projection is
    // IR, so ReadSchema shrinks to exactly the referenced columns
    val bridged = graft.api.TypedStream[PlanShapeDoc](ds, _.doc_id)
      .mapTo[(Long, Long)](_._1)(col("doc_id").as("_1"), col("n_chars").as("_2"))
      .ds.queryExecution.executedPlan.toString
    assert(bridged.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"mapTo must prune the scan to the projected columns:\n$bridged")
    assert(!bridged.contains("newInstance(class graft.PlanShapeDoc"),
      "mapTo stays relational — no per-row source-object construction")
  }

  test("q_where pushes its predicate into the parquet scan and prunes columns") {
    val p = plan("q_where")
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"),
      "filter must reach the scan")
    assert(!p.contains("l_extendedprice"), "unreferenced columns must be pruned")
  }

  test("q_join3 broadcasts both dimension tables") {
    val p = plan("q_join3")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "customer and nation joins must broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_repetition is a zero-shuffle projection over the scan") {
    val p = plan("q_repetition")
    assert(!p.contains("Exchange"),
      "repetition features must not shuffle: the WordGramStats pass is per-row")
    assert(p.contains("graft_gram_stats"), "the codegen'd stats expression must be in-plan")
  }

  test("q_dedup_exact shuffles an 8-byte hash, never the text") {
    val p = plan("q_dedup_exact")
    assert(p.contains("xxhash64"), "group key must be the 64-bit text hash")
  }

  test("q_ngram_jaccard keeps the hinted hash join for the pair stage") {
    val p = plan("q_ngram_jaccard")
    // the only nested-loop allowed is the ONE-ROW occupancy crossJoin; the
    // corpus-sized pair join must stay the hinted shuffled hash join
    assert(p.contains("ShuffledHashJoin"), "pair join must honor the shuffle_hash hint")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      "no nested-loop beyond the broadcast one-row occupancy aggregate")
  }

  test("q_ann_topk aggregates top-k map-side (ObjectHashAggregate) with a broadcast probe side") {
    val p = plan("q_ann_topk")
    assert(p.contains("ObjectHashAggregate"),
      "BoundedTopK must run as a partial-capable object hash aggregate")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "the small query side must broadcast")
  }

  test("q_decontaminate broadcasts the eval-set grams") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "eval n-gram set must broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_window_apply exchanges on native key columns, not an opaque encoded key") {
    val p = plan("q_window_apply")
    assert(p.contains("hashpartitioning(w_start"),
      "exchange must partition on the real window column")
    assert(!p.toLowerCase.contains("kryo"))
  }

  test("q_asof_join lowers to union + window — no join operator at all") {
    val p = plan("q_asof_join")
    assert(p.contains("Window"), "the running-match window must be present")
    assert(!p.contains("Join"), "an as-of must never materialize pairs")
  }

  test("q_asof_fwd (forward direction) keeps the same no-join window shape") {
    val p = plan("q_asof_fwd")
    assert(p.contains("Window"), "the running-match window must be present")
    assert(!p.contains("Join"), "an as-of must never materialize pairs")
    // the forward direction must use the LINEAR running frame (descending
    // sort), never unbounded-FOLLOWING — Spark executes that frame by
    // re-aggregating each row to the partition end: O(n^2) on a hot key
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      "forward as-of must not plan an unbounded-following frame")
    assert(p.toLowerCase.contains("unboundedpreceding"),
      "forward as-of runs on the running [unboundedPreceding, current] frame")
  }

  test("q_bm25 is two corpus scans (stats + scoring), no token shuffle") {
    val p = plan("q_bm25")
    // the floor for corpus-stat-then-score without caching: one pass
    // computes (N, avgdl, df*), one pass scores — the exploded
    // formulation's three differently-filtered scans defeated ReuseExchange
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      "per-term tf columns must keep BM25 at two corpus scans")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the one-row stats aggregate must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "no corpus-sized shuffle join in the score stage")
  }

  test("q_encode broadcasts the vocabulary to the token join") {
    val p = plan("q_encode")
    assert(p.contains("BroadcastHashJoin"), "the maxSize-bounded vocab must broadcast")
    assert(!p.contains("SortMergeJoin"), "tokens must not shuffle against the vocab")
  }

  test("q_repeated_spans: two scans (hash pass + guard), windows partitioned") {
    val p = plan("q_repeated_spans")
    // one corpus scan feeds the positional-hash window stage (checkpointed
    // at build); one pruned scan re-tokenizes candidate docs for the text
    // guard. The agg+self-join shape this replaced re-derived the corpus
    // stage per consumer: 42 scans across the two span plans, now 6.
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      "span detection must stay at two corpus scans")
    assert(p.contains("Window"), "islands assemble on a per-doc window")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "all span joins are equi joins")
  }

  test("q_span_scrub adds no corpus re-scan beyond its span sub-pipeline") {
    val p = plan("q_span_scrub")
    assert("Scan parquet".r.findAllIn(p).size <= 4,
      "scrub = span pipeline (2 scans) + docs join + span-list reread")
  }

  test("q_editdist keeps the LSH band join on exchanges, no nested loop") {
    val p = plan("q_editdist")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "candidate generation must stay an equi-join on band keys")
  }

  test("q_dsir scores through two BROADCAST model joins with partial aggregation") {
    val p = plan("q_dsir")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "both bucket-count model tables must broadcast")
    assert(p.contains("partial_sum"),
      "the per-doc log-ratio sum must combine map-side")
  }

  test("q_token_freq is join-free: the sketch rides the plan as a literal") {
    val p = plan("q_token_freq")
    // ONE join is allowed: the left join resurrecting token-less docs.
    // The MODEL must not add any — no sketch-table join, no cross join.
    val joins = "BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin"
      .r.findAllIn(p).size
    assert(joins <= 1,
      s"the count-min model must be a literal, not a joined table ($joins joins)")
  }

  test("q_heavy_hitters builds the sketch with map-side partial aggregation") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("partial_graft_count_min"),
      "the sketch must partial-aggregate per partition (one table per " +
        "partition over the shuffle, never a row per token)")
  }

  test("q_line_scrub shuffles line hashes, never line text, for the dedup key") {
    val p = plan("q_line_scrub")
    assert(p.contains("xxhash64"), "dedup keys on the 8-byte line hash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
