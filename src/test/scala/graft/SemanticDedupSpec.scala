package graft

import org.apache.spark.sql.functions._
import graft.api.App
import graft.pipeline.{Dedup, Ivf}

/** SemDeDup-style semantic dedup: within-cell transitive pruning with the
  * min-id survivor, the documented cross-cell recall trade, an equi-join
  * plan (no product join), and droppedBecause lineage. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def axis(i: Int, eps: Float): Array[Float] = {
    val v = Array.fill(4)(eps); v(i) = 1.0f; v
  }

  test("within-cell near-dups collapse transitively to the min id; distinct cells survive") {
    // ids ordered so k-means init (4 lowest ids) seeds one centroid per
    // cluster. cluster 0: ids 10,50,51 mutually ~1.0 cosine; cluster 1:
    // 20,52; cluster 2: 30 alone; cluster 3: 40 alone
    val embs = Seq(
      (10L, axis(0, 0.01f)), (50L, axis(0, 0.02f)), (51L, axis(0, 0.03f)),
      (20L, axis(1, 0.01f)), (52L, axis(1, 0.02f)),
      (30L, axis(2, 0.01f)), (40L, axis(3, 0.01f)))
      .toDF("vec_id", "embedding")
    val cents = Ivf.train(embs, "vec_id", "embedding", k = 4, iters = 2)
    val out = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, threshold = 0.9)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"semantic dedup must join on the cell id, not all-pairs:\n$plan")
    assert(out.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 20L, 30L, 40L),
      "each semantic group keeps its minimum id")

    // keep-best on the same clusters: score by id, the MAX id survives
    // each cluster instead of the min (singletons untouched)
    val best = Dedup.semanticDedupKeepBest(embs, "vec_id", "embedding", cents,
        threshold = 0.9, scoreCol = col("vec_id") * 1.0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(51L, 52L, 30L, 40L),
      s"keep-best must elect the max-score member per cluster: $best")

    // the SemanticDedupBest document node lowers to the same election
    import graft.api.{MStream, Program}
    val node = Program.Rec.external("in", MStream(embs))
      .semanticDedupBest(Program.Rec.external("cents", MStream(cents)),
        "vec_id", "embedding", threshold = 0.9, score = "vec_id * 1.0")
      .stream.df.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(node == best, "document-node lowering diverged from the direct API")
  }

  test("cross-cell near-dups are NOT candidates (the SemDeDup recall trade)") {
    // hand-built codebook splits two similar vectors into different cells
    val cents = Seq((0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.8, 0.6, 0.0, 0.0)))
      .toDF("cid", "cv")
    val a = Array(1.0f, 0.05f, 0f, 0f)   // nearest cell 0
    val b = Array(0.85f, 0.52f, 0f, 0f)  // nearest cell 1; cos(a,b) ~ 0.88
    val embs = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, threshold = 0.8)
    assert(out.count() == 2,
      "similar vectors in different cells both survive — documented recall boundary")
  }

  test("hot-cell triangle cover: identical clusters, work spread over salted buckets") {
    // one cell deliberately captures most of the corpus (the skew case);
    // with cellCap forced tiny the salted cover engages — survivors must
    // be IDENTICAL to the uncapped plan (exact pair cover), including the
    // keep-best election on top of the same clusters.
    val rnd = new scala.util.Random(7)
    // 60 vectors near axis 0 in 3 near-dup families + 30 spread over the
    // other axes; ids shuffled so salts don't follow family structure
    val hot = (0 until 60).map { i =>
      val fam = i % 3
      val v = Array.fill(4)(0.001f * fam + 0.0005f * (i / 3)); v(0) = 1.0f
      (100L + i, v)
    }
    val cold = (0 until 30).map { i =>
      (500L + i, axis(1 + i % 3, 0.001f * (i / 3)))
    }
    val embs = rnd.shuffle(hot ++ cold).toDF("vec_id", "embedding")
    val cents = Ivf.train(embs, "vec_id", "embedding", k = 4, iters = 2)

    def run(cap: String): (Set[Long], Set[Long]) = {
      spark.conf.set("graft.semdedup.cellCap", cap)
      try {
        val plain = Dedup.semanticDedup(embs, "vec_id", "embedding", cents,
          threshold = 0.999).select("vec_id").collect().map(_.getLong(0)).toSet
        val best = Dedup.semanticDedupKeepBest(embs, "vec_id", "embedding", cents,
            threshold = 0.999, scoreCol = col("vec_id") * 1.0)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (plain, best)
      } finally spark.conf.unset("graft.semdedup.cellCap")
    }
    val (unCapped, unCappedBest) = run(cap = "1000000")
    val (capped, cappedBest) = run(cap = "5") // hot cell (60) -> s = 12
    assert(capped == unCapped, "salted cover must not change the cluster set")
    assert(cappedBest == unCappedBest, "keep-best election unchanged under the cover")
    assert(unCapped.nonEmpty && unCapped.size < 90, "scenario must actually dedup")
  }

  test("semanticDedupAuto equals the fixed-k face at the derived k") {
    val embs = (0 until 90).map { i =>
      (i.toLong, axis(i % 3, 0.001f * (i / 3)))
    }.toDF("vec_id", "embedding")
    val auto = Dedup.semanticDedupAuto(embs, "vec_id", "embedding",
      threshold = 0.99, targetCellSize = 20, iters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val k = Ivf.cellsFor(90L, 20L)
    val cents = Ivf.train(embs, "vec_id", "embedding", k, iters = 2)
    val fixed = Dedup.semanticDedup(embs, "vec_id", "embedding", cents,
      threshold = 0.99).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(auto == fixed, "auto face must equal fixed-k at k = cellsFor(n, target)")
    assert(auto.size < 90, "scenario must actually dedup")
  }

  test("semanticDedupAuto on an empty corpus returns it unchanged") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupAuto(empty, "vec_id", "embedding", threshold = 0.99)
    assert(out.schema == empty.schema && out.count() == 0,
      "no training pass, no misleading empty-codebook error")
  }

  test("droppedBecause lineage names the surviving representative") {
    val embs = Seq(
      (10L, axis(0, 0.01f)), (50L, axis(0, 0.02f)),
      (20L, axis(1, 0.01f)))
      .toDF("vec_id", "embedding")
    val cents = Ivf.train(embs, "vec_id", "embedding", k = 2, iters = 2)
    def keyHash(id: Long): Long =
      spark.range(1).select(xxhash64(struct(lit(id)))).head().getLong(0)
    val config = new App.Config()
      .setSource("emb", App.Source("list", rows = Some(embs)))
      .addSink("out", App.Sink("memory"))
      .addLineageSink(App.Sink("memory"))
    val running = App.run(spark, config) { in =>
      Map("out" -> new graft.api.MStream(Dedup.semanticDedup(
        in("emb").df, "vec_id", "embedding", cents, threshold = 0.9)))
    }
    val edges = running.collectFirst { case App.BatchOutput("__lineage", df) => df }.get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges == Set(("droppedBecause:semanticDedup", keyHash(50L), keyHash(10L))),
      s"dropped 50 links to survivor 10, got $edges")
    graft.api.Pinned.release(spark)
  }
}
