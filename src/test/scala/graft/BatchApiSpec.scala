package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.{Dedup, Multimodal, Similarity, TextOps}

/**
 * Batch API units: enrichment-join condition splitting (precondition /
 * equi-key / residual, reference `JoinPreconditionExtractor` +
 * `JoinKeyExpressionExtractor` semantics), residual join paths not covered
 * by the driver oracle, and pipeline operator edge cases.
 */
class BatchApiSpec extends SparkSpec {
  import spark.implicits._

  private def lstream = new MStream(
    Seq((1L, "a", 1.0, 1L), (2L, "a", 5.0, 3L), (3L, "b", 2.0, 5L))
      .toDF("id", "k", "v", "t"), Seq("t", "id"))

  private def rstream = new MStream(
    Seq((10L, "a", 100.0, 2L), (11L, "a", 7.0, 4L), (12L, "c", 1.0, 6L))
      .toDF("rid", "rk", "rv", "rt"), Seq("rt", "rid"))

  test("left enrichment pairs each left with the latest prior right of its key") {
    val out = lstream.leftJoin(rstream).on((l, r) => l("k") === r("rk"))
      .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid")))
      .df.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(out == Set((1L, None), (2L, Some(10L)), (3L, None)))
  }

  test("preconditions push down; residuals filter the pairing") {
    // precondition: right rv < 50 removes rid=10; residual: r.rv > l.v
    val out = lstream.leftJoin(rstream)
      .on((l, r) => l("k") === r("rk") && r("rv") < 50.0 && r("rv") > l("v"))
      .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid")))
      .df.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    // id=2 (t=3, v=5): latest prior right passing precondition is none (rid10 filtered,
    // rid11 arrives at t=4) → None. id=1: no prior right → None.
    assert(out == Set((1L, None), (2L, None), (3L, None)))
  }

  test("left inner with residual: left waits for the first future right that satisfies it") {
    val out = lstream.leftInnerJoin(rstream)
      .on((l, r) => l("k") === r("rk") && r("rv") < 50.0)
      .select((l, r) => Seq(l("id").as("id"), r("rid").as("rid")))
      .df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // id=1 (t=1): rid10 fails residual→wait→rid11 (t=4) matches; id=2 (t=3): same;
    // id=3 key b: no right ever → absent
    assert(out == Set((1L, 11L), (2L, 11L)))
  }

  test("non-equi join conditions are rejected like the reference") {
    val e = intercept[IllegalArgumentException] {
      lstream.leftJoin(rstream).on((l, r) => l("v") < r("rv"))
    }
    assert(e.getMessage.contains("Non-keyed"))
  }

  test("uniqueBy keeps the latest record per extracted value") {
    val s = new MStream(
      Seq(("u1", "x", 1L, 1.0), ("u1", "x", 2L, 9.0), ("u2", "x", 1L, 4.0))
        .toDF("u", "typ", "t", "v"), Seq("t"))
    val out = s.uniqueBy(Seq("u", "typ"), Seq("t"))
      .df.collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(("u1", 2L, 9.0), ("u2", 1L, 4.0)))
  }

  test("wordShingles handles short documents") {
    val df = Seq((1L, "a b"), (2L, "a b c d")).toDF("id", "text")
    val out = df.select(col("id"), TextOps.wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(out(1L) == Set.empty[String])
    assert(out(2L) == Set("a b c", "b c d"))
  }

  test("minhash LSH finds exact duplicates and skips unrelated docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words about spark catalyst tungsten codegen shuffles")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDup(docs, "doc_id", "text", k = 16, bands = 4, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("brute-force top-k ranks by cosine") {
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = embs.filter(col("vec_id") === 0).select(col("vec_id").as("q_id"), col("embedding"))
    val out = Similarity.bruteForceTopK(embs, q, "vec_id", "embedding", "q_id", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toList.sortBy(_._2)
    assert(out.map(_._1) == List(1L, 2L), "nearest first, self excluded")
  }

  test("multimodal frame sampling slices the payload without decoding") {
    val df = Multimodal.withFakeMedia(Seq((1L, "abcdefgh")).toDF("id", "text"), "text")
    val frames = Multimodal.frameSample(df, 4).select("frames")
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.map(new String(_, "UTF-8")).mkString == "abcdefgh",
      "frames tile the payload")
  }

  test("multimodal decode stub is partition-parallel and deterministic") {
    val df = Multimodal.withFakeMedia(
      Seq((1L, "aa"), (2L, "zzzz")).toDF("id", "text").repartition(2), "text")
    val out = Multimodal.decodeBatched(df, "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2, 97.0), (2L, 4, 122.0)))
  }

  test("multimodal native byteFeatures equals the batched codec path") {
    val df = Multimodal.withFakeMedia(
      Seq((1L, "hello world"), (2L, ""), (3L, "Zz!")).toDF("id", "text"), "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    assert(rows(Multimodal.byteFeatures(df, "id")) == rows(Multimodal.decodeBatched(df, "id")))
  }
}
