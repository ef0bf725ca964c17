package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextOps}

/** Maximal exact-substring mining (`Dedup.maximalRepeats`): targeted
  * cases for extension, clipping, containment pruning and the
  * covered-union coincidence with `scrubRepeatedSpans`; the randomized
  * brute-fold equivalence lives in MaximalRepeatsProps. */
class MaximalRepeatsSpec extends SparkSpec {
  import spark.implicits._

  private def h(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)

  private def run(docs: Seq[(Long, String)], l: Int, e: Int,
                  minDocs: Int = 2): Set[(Long, Long, Long, Long)] =
    try {
      Dedup.maximalRepeats(docs.toDF("doc_id", "text"), "doc_id", "text",
          minLen = l, maxExtend = e, minDocs = minDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    } finally graft.api.Pinned.release(spark)

  test("variable-length extension: the shared passage reports its full extent once per doc") {
    // "b c d e f" (5 tokens) is shared verbatim; the 2-gram anchors inside
    // it are contained in the leftmost anchor's span and pruned
    val docs = Seq(
      (1L, "x b c d e f y"),
      (2L, "z z b c d e f"),
      (3L, "q r s t u v w"))
    val got = run(docs, l = 2, e = 8)
    assert(got == Set(
      (1L, 1L, 5L, h("b c d e f")),
      (2L, 2L, 5L, h("b c d e f"))))
  }

  test("bounded extension clips deterministically at minLen + maxExtend") {
    val passage = (1 to 9).map(i => s"t$i").mkString(" ") // 9 shared tokens
    val docs = Seq((1L, s"a $passage"), (2L, s"b $passage c"))
    // E = 3: anchors can reach at most 2 + 3 = 5 tokens; the clipped
    // spans staircase (each window extends 3 past itself) and the prune
    // keeps every strictly-growing endpoint
    val got = run(docs, l = 2, e = 3)
    assert(got.forall(_._3 <= 5L), s"clip bound violated: $got")
    assert(got.filter(_._1 == 1L).map(s => s._2 + s._3).max == 10L,
      "clipped spans still cover the passage tail")
    // with a budget covering the passage, one span per doc
    val full = run(docs, l = 2, e = 16)
    assert(full == Set(
      (1L, 1L, 9L, h(passage)), (2L, 1L, 9L, h(passage))))
  }

  test("partner consistency: runs of individually-duplicated grams do not merge") {
    // "a b c" shared by 1,2; "c d e" shared by 1,3 — doc 1 has every
    // 3-gram of "a b c d e" duplicated EXCEPT "b c d" which no partner
    // shares, so no 5-token span exists (repeatedSpans at k=3 would
    // merge positions 0..2 into one span; maximal repeats must not)
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c y"),
      (3L, "z c d e w"))
    val got = run(docs, l = 3, e = 8)
    assert(got == Set(
      (1L, 0L, 3L, h("a b c")), (1L, 2L, 3L, h("c d e")),
      (2L, 1L, 3L, h("a b c")), (3L, 1L, 3L, h("c d e"))),
      s"got $got")
  }

  test("within-doc partner can extend a cross-doc anchor; minDocs filters anchors") {
    // "a b" occurs in docs 1 and 2 (anchor qualifies); doc 1 repeats
    // "a b c" twice internally — the extension partner is in-doc
    val docs = Seq(
      (1L, "a b c q a b c"),
      (2L, "a b z"))
    val got = run(docs, l = 2, e = 4)
    assert(got.contains((1L, 0L, 3L, h("a b c"))) &&
      got.contains((1L, 4L, 3L, h("a b c"))),
      s"in-doc partner extends the cross-doc anchor: $got")
    // "b c" occurs only in doc 1 (twice): fails minDocs = 2 as an ANCHOR
    assert(!got.exists(s => s._4 == h("b c")), s"got $got")
    val md3 = run(docs, l = 2, e = 4, minDocs = 3)
    assert(md3.isEmpty, "no gram spans 3 docs")
  }

  test("covered union of maximal repeats == scrubRepeatedSpans at k = minLen") {
    val docs = Seq(
      (1L, "x b c d e f y b c"),
      (2L, "z b c d e f"),
      (3L, "b c q d e f"),
      (4L, "u v w"),
      (5L, ""))
    val df = docs.toDF("doc_id", "text")
    try {
      val spans = Dedup.maximalRepeats(df, "doc_id", "text", 2, 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val covered: Map[Long, Set[Long]] = spans.groupBy(_._1).map { case (d, ss) =>
        d -> ss.flatMap(s => s._2 until (s._2 + s._3)).toSet
      }
      val viaSpans = docs.map { case (id, t) =>
        val ws = t.split("\\s+").filter(_.nonEmpty).toSeq
        val kept = ws.zipWithIndex.collect {
          case (w, i) if !covered.getOrElse(id, Set.empty).contains(i.toLong) => w
        }
        id -> (kept.size.toLong, h(kept.mkString(" ")))
      }.toMap
      val scrub = Dedup.scrubRepeatedSpans(df, "doc_id", "text", k = 2, minDocs = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(viaSpans == scrub,
        "the scrub face of maximal repeats IS scrubRepeatedSpans at k = minLen")
    } finally graft.api.Pinned.release(spark)
  }

  test("span_hash is the portable polyHash of the span text") {
    val docs = Seq((1L, "p q r s"), (2L, "p q r t"))
    val got = run(docs, l = 2, e = 4)
    assert(got == Set((1L, 0L, 3L, h("p q r")), (2L, 0L, 3L, h("p q r"))))
    val viaExpr = spark.range(1)
      .select(TextOps.polyHash(lit("p q r"))).head().getLong(0)
    assert(viaExpr == h("p q r"), "test hash mirrors the production expression")
  }

  test("ExactSubstr node: v9 stamp, codec identity, capture == direct API") {
    import graft.api.{App, MStream, Program}
    import graft.api.Program._
    val d = Doc(Seq(External("in"),
      ExactSubstr("x", "in", "doc_id", "text", 6, 12, 3)), Seq("x"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":9"), "exactSubstr stamps format version 9")
    assert(Program.fromJson(json) == d, "codec is the identity")
    val bad = intercept[IllegalArgumentException](Program.fromJson(Program.toJson(
      Doc(Seq(External("in"), ExactSubstr("x", "in", "doc_id", "text", 1, 12)),
        Seq("x")))))
    assert(bad.getMessage.contains("minLen"), bad.getMessage)
    try {
      val docsDf = Seq((1L, "x b c d e f y"), (2L, "z z b c d e f"))
        .toDF("doc_id", "text")
      val cap = Program.capture(
        Program.Rec.external("in", MStream(docsDf))
          .maximalRepeats("doc_id", "text", minLen = 2, maxExtend = 8).as("x"))
      assert(Program.fromJson(Program.toJson(cap)) == cap)
      val config = new App.Config()
        .setSource("in", App.Source("list", rows = Some(docsDf)))
        .addSink("x", App.Sink("memory"))
      Program.validate(cap, spark, config)
      val out = App.runProgram(spark, config, Program.toJson(cap))
        .collectFirst { case App.BatchOutput("x", o) => o }.get
      val direct = Dedup.maximalRepeats(docsDf, "doc_id", "text", 2, 8)
      assert(out.collect().toSet == direct.collect().toSet,
        "document execution equals the direct API")
    } finally graft.api.Pinned.release(spark)
  }

  test("contracts: parameter bounds and batch-only") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException](
      Dedup.maximalRepeats(df, "doc_id", "text", 1, 4)).getMessage.contains("minLen"))
    assert(intercept[IllegalArgumentException](
      Dedup.maximalRepeats(df, "doc_id", "text", 2, 0)).getMessage.contains("maxExtend"))
    assert(intercept[IllegalArgumentException](
      Dedup.maximalRepeats(df, "doc_id", "text", 2, 4, minDocs = 1)).getMessage.contains("minDocs"))
  }
}
