package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Similarity, TextOps}

/** Hybrid BM25 + ANN retrieval fused by reciprocal rank
  * (`hybridRrfRetrieve`) — pinned to a fusion reference computed from
  * the two leg operators themselves (so the fusion arithmetic, top-k
  * and tie-break are what is under test), plus the single-leg
  * degenerate case, the node codec, and the contract errors. */
class HybridRrfSpec extends SparkSpec {
  import spark.implicits._

  // 8 docs; embeddings engineered so cosine neighborhoods differ from
  // lexical ones (text clusters 0-3 vs 4-7, vectors follow parity)
  private val docs = (0L until 8L).map { i =>
    val text =
      if (i < 4) s"alpha beta gamma token$i shared words here"
      else s"delta epsilon zeta token$i shared words here"
    val vec = Seq.tabulate(6)(d => math.sin(0.7 * ((i % 2) * 3 + d) + 0.1 * i))
    (i, text, vec)
  }
  private def corpusDf = docs.toDF("doc_id", "text", "embedding")
  private def queriesDf = corpusDf.where(col("doc_id") < 3)
    .select(col("doc_id").as("q_id"),
      concat_ws(" ", slice(TextOps.words(col("text")), 1, 3)).as("q_text"),
      col("embedding").as("q_vec"))

  /** RRF-fuse two rank maps and take top-k per query (exact doubles,
    * ties by ascending doc id) — the definitional reference. */
  private def fuseRef(bm: Map[(Long, Long), Long], ann: Map[(Long, Long), Long],
                      k: Int, kRrf: Long = 60L): Map[(Long, Long), (Double, Long)] =
    (bm.keySet ++ ann.keySet).toSeq
      .map { qd =>
        qd -> (bm.get(qd).map(r => 1.0 / (kRrf + r)).getOrElse(0.0) +
          ann.get(qd).map(r => 1.0 / (kRrf + r)).getOrElse(0.0))
      }
      .groupBy(_._1._1)
      .flatMap { case (_, xs) =>
        xs.sortBy { case ((_, d), s) => (-s, d) }.take(k).zipWithIndex.map {
          case ((qd, s), i) =>
            // Spark round() is HALF_UP BigDecimal rounding
            qd -> ((BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, (i + 1).toLong))
        }
      }

  private def legMaps(k: Int): (Map[(Long, Long), Long], Map[(Long, Long), Long]) = {
    val bm = TextOps.bm25Retrieve(corpusDf, "doc_id", "text",
        queriesDf.select(col("q_id"), col("q_text")), "q_id", "q_text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val ann = Similarity.bruteForceTopKPartial(
        corpusDf.select(col("doc_id"), col("embedding")),
        queriesDf.select(col("q_id"), col("q_vec").as("embedding")),
        "doc_id", "embedding", "q_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    (bm, ann)
  }

  test("fusion == RRF over the two leg operators' ranks; ties break by id") {
    val k = 5
    val got = TextOps.hybridRrfRetrieve(corpusDf, "doc_id", "text", "embedding",
        queriesDf, "q_id", "q_text", "q_vec", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val (bm, ann) = legMaps(k)
    assert(bm.nonEmpty && ann.nonEmpty, "both legs retrieve on this corpus")
    // docs on only one leg exist (lexical and cosine neighborhoods differ)
    assert((bm.keySet -- ann.keySet).nonEmpty || (ann.keySet -- bm.keySet).nonEmpty,
      "corpus exercises the single-leg term")
    assert(got == fuseRef(bm, ann, k), s"fused output:\n$got\nvs reference")
  }

  test("BM25-empty query degenerates to the ANN leg alone") {
    // a query whose words index nothing: BM25 leg contributes no rows
    val qs = queriesDf.where(col("q_id") === 0L)
      .select(col("q_id"), lit("zzz qqq xxx").as("q_text"), col("q_vec"))
    val k = 4
    val got = TextOps.hybridRrfRetrieve(corpusDf, "doc_id", "text", "embedding",
        qs, "q_id", "q_text", "q_vec", k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val ann = Similarity.bruteForceTopKPartial(
        corpusDf.select(col("doc_id"), col("embedding")),
        qs.select(col("q_id"), col("q_vec").as("embedding")),
        "doc_id", "embedding", "q_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    assert(got == fuseRef(Map.empty, ann, k),
      "ANN-only fusion is the ANN ranking under the RRF transform")
  }

  test("HybridRrf node: v10 stamp, codec identity, document run == direct API") {
    import graft.api.{App, Program}
    import graft.api.Program._
    val d = Doc(Seq(External("c"), External("q"),
      HybridRrf("a", "c", "q", "doc_id", "text", "embedding",
        "q_id", "q_text", "q_vec", k = 5, legK = 7, kRrf = 10)), Seq("a"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":10") && Program.fromJson(json) == d)
    val bad = intercept[IllegalArgumentException](Program.fromJson(Program.toJson(
      Doc(Seq(External("c"), External("q"),
        HybridRrf("a", "c", "q", "doc_id", "text", "embedding",
          "q_id", "q_text", "q_vec", k = 5, kRrf = 0)), Seq("a")))))
    assert(bad.getMessage.contains("kRrf"), bad.getMessage)
    val cap = Program.capture(
      Program.Rec.external("c", graft.api.MStream(corpusDf))
        .hybridRrfRetrieve(Program.Rec.external("q", graft.api.MStream(queriesDf)),
          "doc_id", "text", "embedding", "q_id", "q_text", "q_vec", k = 5).as("a"))
    assert(Program.fromJson(Program.toJson(cap)) == cap)
    val config = new App.Config()
      .setSource("c", App.Source("list", rows = Some(corpusDf)))
      .setSource("q", App.Source("list", rows = Some(queriesDf)))
      .addSink("a", App.Sink("memory"))
    Program.validate(cap, spark, config)
    val ran = App.runProgram(spark, config, Program.toJson(cap))
      .collectFirst { case App.BatchOutput("a", o) => o }.get
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val direct = TextOps.hybridRrfRetrieve(corpusDf, "doc_id", "text", "embedding",
        queriesDf, "q_id", "q_text", "q_vec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(ran == direct, "document execution equals the direct API")
  }

  test("IVF-routed dense leg: fusion == RRF over bm25 + Ivf.search ranks") {
    val k = 5
    val cents = graft.pipeline.Ivf.train(
      corpusDf.select(col("doc_id"), col("embedding")),
      "doc_id", "embedding", k = 3, iters = 2)
    val got = TextOps.hybridRrfRetrieve(corpusDf, "doc_id", "text", "embedding",
        queriesDf, "q_id", "q_text", "q_vec", k = k,
        ivfCentroids = Some(cents), nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val (bm, _) = legMaps(k)
    val ivf = graft.pipeline.Ivf.search(
        corpusDf.select(col("doc_id"), col("embedding")),
        queriesDf.select(col("q_id"), col("q_vec").as("embedding")),
        "doc_id", "embedding", "q_id", cents, topK = k, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    assert(got == fuseRef(bm, ivf, k),
      s"IVF-leg fusion:\n$got\nvs reference over bm25 + Ivf.search")
    // nProbe < nlist: the routed leg really is a SUBSET view (differs
    // from brute force on this engineered corpus) — otherwise the test
    // proves nothing about routing
    val brute = Similarity.bruteForceTopKPartial(
        corpusDf.select(col("doc_id"), col("embedding")),
        queriesDf.select(col("q_id"), col("q_vec").as("embedding")),
        "doc_id", "embedding", "q_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    assert(ivf != brute, "probing 2 of 3 cells must differ from brute force here")
  }

  test("HybridRrf IVF node face: v11 stamp, in-call training run == direct API") {
    import graft.api.{App, Program}
    import graft.api.Program._
    val d = Doc(Seq(External("c"), External("q"),
      HybridRrf("a", "c", "q", "doc_id", "text", "embedding",
        "q_id", "q_text", "q_vec", k = 5, ivfCells = 3, nProbe = 2)), Seq("a"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":11") && Program.fromJson(json) == d)
    val bad = intercept[IllegalArgumentException](Program.fromJson(Program.toJson(
      Doc(Seq(External("c"), External("q"),
        HybridRrf("a", "c", "q", "doc_id", "text", "embedding",
          "q_id", "q_text", "q_vec", k = 5, ivfCells = 3)), Seq("a")))))
    assert(bad.getMessage.contains("nProbe"), bad.getMessage)
    val cap = Program.capture(
      Program.Rec.external("c", graft.api.MStream(corpusDf))
        .hybridRrfRetrieve(Program.Rec.external("q", graft.api.MStream(queriesDf)),
          "doc_id", "text", "embedding", "q_id", "q_text", "q_vec", k = 5,
          ivfCells = 3, nProbe = 2).as("a"))
    assert(Program.fromJson(Program.toJson(cap)) == cap)
    val config = new App.Config()
      .setSource("c", App.Source("list", rows = Some(corpusDf)))
      .setSource("q", App.Source("list", rows = Some(queriesDf)))
      .addSink("a", App.Sink("memory"))
    Program.validate(cap, spark, config)
    val ran = App.runProgram(spark, config, Program.toJson(cap))
      .collectFirst { case App.BatchOutput("a", o) => o }.get
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val cents = graft.pipeline.Ivf.train(
      corpusDf.select(col("doc_id"), col("embedding")),
      "doc_id", "embedding", k = 3, iters = 2)
    val direct = TextOps.hybridRrfRetrieve(corpusDf, "doc_id", "text", "embedding",
        queriesDf, "q_id", "q_text", "q_vec", k = 5,
        ivfCentroids = Some(cents), nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(ran == direct, "in-call IVF training equals the direct API")
  }

  test("contracts: k, legK, kRrf bounds and batch-only") {
    assert(intercept[IllegalArgumentException](TextOps.hybridRrfRetrieve(
      corpusDf, "doc_id", "text", "embedding", queriesDf,
      "q_id", "q_text", "q_vec", k = 3, nProbe = 2))
      .getMessage.contains("IVF routing"), "nProbe without a codebook")
    assert(intercept[IllegalArgumentException](TextOps.hybridRrfRetrieve(
      corpusDf, "doc_id", "text", "embedding", queriesDf,
      "q_id", "q_text", "q_vec", k = 0)).getMessage.contains("k > 0"))
    assert(intercept[IllegalArgumentException](TextOps.hybridRrfRetrieve(
      corpusDf, "doc_id", "text", "embedding", queriesDf,
      "q_id", "q_text", "q_vec", k = 3, legK = -1)).getMessage.contains("legK"))
    assert(intercept[IllegalArgumentException](TextOps.hybridRrfRetrieve(
      corpusDf, "doc_id", "text", "embedding", queriesDf,
      "q_id", "q_text", "q_vec", k = 3, kRrf = 0)).getMessage.contains("kRrf"))
  }
}
