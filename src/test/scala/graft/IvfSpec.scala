package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Ivf, Similarity}

/** IVF index: clustered data trains separating centroids; probing one
  * cell returns the same nearest neighbor as brute force. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  // three tight clusters near the axes of R^4
  private def clustered = (0 until 30).map { i =>
    val axis = i % 3
    val base = Array.fill(4)(0.05 * ((i * 7) % 5))
    base(axis) = 10.0 + (i / 3) * 0.01
    (i.toLong, base.map(_.toFloat))
  }.toDF("vec_id", "embedding")

  test("IVF with nProbe=1 matches brute force on well-separated clusters") {
    val embs = clustered
    val centroids = Ivf.train(embs, "vec_id", "embedding", k = 3, iters = 3)
    assert(centroids.count() == 3)
    val queries = embs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val ivf = Ivf.search(embs, queries, "vec_id", "embedding", "q_id",
      centroids, topK = 1, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopKPartial(embs, queries, "vec_id", "embedding", "q_id", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf == brute, "in-cluster nearest neighbor found while scanning one cell")
  }

  test("bulk face (broadcastQueries=false) equals the default face, salted and not") {
    // the bulk regime shuffles both sides on the cell id and guards hot
    // cells with the asymmetric SaltedIndex cover; results (ranks
    // included) must match the broadcast face exactly — with a tiny
    // cellCap every cell is hot, so the salted path is exercised too
    val embs = clustered
    val centroids = Ivf.train(embs, "vec_id", "embedding", k = 3, iters = 3)
    val queries = embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def rows(bq: Boolean) = Ivf.search(embs, queries, "vec_id", "embedding",
        "q_id", centroids, topK = 4, nProbe = 2, broadcastQueries = bq)
      .collect().map(_.toString).sorted.toSeq
    val base = rows(bq = true)
    assert(rows(bq = false) == base, "bulk face must equal the broadcast face")
    spark.conf.set("graft.semdedup.cellCap", "2")
    try assert(rows(bq = false) == base,
      "salted hot-cell bulk face must equal the broadcast face")
    finally spark.conf.unset("graft.semdedup.cellCap")
  }

  test("zero-norm vectors match nothing instead of throwing (ANSI divide-by-zero)") {
    // cosine on an all-zero embedding is undefined; under Spark's default
    // ANSI mode the naive division would kill the job. try_divide makes
    // the cosine NULL, which every threshold gate and BOTH top-k faces
    // (bounded heap skips null scores; the window face filters them)
    // exclude — so the zero vector ranks nowhere, is no one's neighbor,
    // and both id-type faces agree.
    val embs = clustered.union(
      Seq((999L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding"))
    val centroids = Ivf.train(clustered, "vec_id", "embedding", k = 3, iters = 2)
    val queries = embs.filter(col("vec_id") < 3 || col("vec_id") === 999L)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val heapFace = Ivf.search(embs, queries, "vec_id", "embedding", "q_id",
      centroids, topK = 3, nProbe = 3).collect()
    assert(!heapFace.exists(r => r.getLong(0) == 999L || r.getLong(1) == 999L),
      "zero-norm vector must appear as neither query nor neighbor")
    val windowFace = Ivf.search(
      embs.select(col("vec_id").cast("string").as("vec_id"), col("embedding")),
      queries.select(col("q_id").cast("string").as("q_id"), col("embedding")),
      "vec_id", "embedding", "q_id", centroids, topK = 3, nProbe = 3).collect()
    assert(heapFace.map(r => (r.getLong(0).toString, r.getLong(1).toString,
        r.getDouble(2), r.getInt(3))).toSet ==
      windowFace.map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getInt(3))).toSet,
      "heap and window faces must agree in the presence of zero-norm vectors")
    val brute = Similarity.bruteForceTopK(embs, queries, "vec_id", "embedding", "q_id", 3)
      .collect()
    assert(!brute.exists(r => r.getLong(0) == 999L || r.getLong(1) == 999L),
      "brute-force window face excludes zero-norm vectors too")
  }

  test("measured recall@10 on the real embeddings rises with nProbe") {
    // measure, don't guess: the probe budget is THE recall knob of the
    // IVF design — pin the measured curve on real data so an assignment
    // or search regression shows as a recall drop, not just a perf shift
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = Ivf.train(embs, "vec_id", "embedding", k = 16, iters = 2)
    val queries = embs.orderBy("vec_id").limit(30)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val truth = Similarity.bruteForceTopKPartial(
        embs, queries, "vec_id", "embedding", "q_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val got = Ivf.search(embs, queries, "vec_id", "embedding", "q_id",
          centroids, topK = 10, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    val r1 = recallAt(1); val r4 = recallAt(4); val r16 = recallAt(16)
    info(f"IVF recall@10 (k=16 cells, 1000 vecs): nProbe=1 $r1%.3f, 4 $r4%.3f, 16 $r16%.3f")
    assert(r1 <= r4 + 1e-9 && r4 <= r16 + 1e-9,
      s"recall must be monotone in the probe budget: $r1, $r4, $r16")
    assert(r16 >= 0.999, s"probing every cell must recover brute force, got $r16")
    assert(r4 >= 0.6, s"a quarter of the cells should recover most neighbors, got $r4")
  }

  test("loop assignment (beyond LiteralCells) is bit-identical to the literal path") {
    // 300 cells > LiteralCells=256 forces the compiled-loop face through
    // the public surface; the literal face is invoked directly. Distances
    // include exact ties (duplicate centroids) to pin the lower-cid rule.
    val rnd = new scala.util.Random(42)
    val dim = 8
    val cent = {
      val b = Vector.newBuilder[(Int, Seq[Double])]
      var prev: Seq[Double] = null
      (0 until 300).foreach { c =>
        val v = if (c % 7 == 3 && prev != null) prev
          else Seq.fill(dim)(rnd.nextDouble() * 4 - 2)
        b += (c -> v); prev = v
      }
      b.result()
    }
    assert(cent.size > Ivf.LiteralCells)
    val pts = (0 until 200).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 4 - 2))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val lit1 = pts.select(col("id"), Ivf.nearestCidLiteral(col("v"), cent).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val loop1 = pts.select(col("id"), Ivf.nearestCidLoop(col("v"), cent).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lit1 == loop1, "nearest-cell assignment diverged between lowerings")
    val litP = pts.select(col("id"), Ivf.probeCidsLiteral(col("v"), cent, 5).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val loopP = pts.select(col("id"),
        graft.functions.VectorFunctions.nearestCells(col("v"), cent, 5).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(litP == loopP, "probe-cell lists diverged between lowerings")
    // nProbe beyond k returns all cells in both lowerings
    val litAll = pts.limit(5).select(Ivf.probeCidsLiteral(col("v"), cent.take(3), 9).as("p"))
      .collect().map(_.getSeq[Int](0))
    val loopAll = pts.limit(5).select(
        graft.functions.VectorFunctions.nearestCells(col("v"), cent.take(3), 9).as("p"))
      .collect().map(_.getSeq[Int](0))
    assert(litAll.toSeq == loopAll.toSeq)
    assert(litAll.forall(_.size == 3))
  }

  test("large-codebook projection stays inside whole-stage codegen") {
    val rnd = new scala.util.Random(7)
    val cent: Seq[(Int, Seq[Double])] =
      (0 until 512).map(c => c -> Seq.fill(8)(rnd.nextDouble()))
    // spark.range, not a local Seq: a LocalRelation constant-folds the
    // whole projection away and there is no codegen stage to assert on
    val pts = spark.range(10).select(col("id"),
      array((0 until 8).map(i => (col("id") + i).cast("double")): _*).as("v"))
    val exec = pts.select(Ivf.nearestCidLoop(col("v"), cent).as("cid"))
      .queryExecution.executedPlan
    assert(exec.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.WholeStageCodegenExec]),
      s"loop assignment fell out of whole-stage codegen:\n$exec")
  }

  test("searchIngest: streaming probe equals the batch face, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val embs = clustered
    val centroids = Ivf.train(embs, "vec_id", "embedding", k = 3, iters = 3)
    val queryRows = (0 until 9).map { i =>
      val axis = i % 3
      val v = Array.fill(4)(0.01 * i)
      v(axis) = 10.0 + i * 0.005
      (100L + i, v.map(_.toFloat))
    }
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))

    val batch = Ivf.searchIngest(
      graft.api.MStream(queryRows.toDF("q_id", "embedding")), embs,
      "vec_id", "embedding", "q_id", centroids, topK = 3, nProbe = 2)
    assert(!batch.df.isStreaming)
    val b = batch.df.collect().map(key).toSet
    assert(b.nonEmpty && b.map(_._1).size == 9, "every query finds neighbors")

    val in = MemoryStream[(Long, Array[Float])]
    val out = Ivf.searchIngest(
      graft.api.MStream(in.toDF().toDF("q_id", "embedding")), embs,
      "vec_id", "embedding", "q_id", centroids, topK = 3, nProbe = 2)
    assert(out.df.isStreaming)
    val name = s"ivf_ing_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      queryRows.grouped(4).foreach(g => in.addData(g: _*))
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "streaming probe is stateless")
      assert(spark.table(name).collect().map(key).toSet == b,
        "streaming top-k, ranks, and rounded cosines equal the batch face")
    } finally q.stop()
    graft.api.Pinned.release(spark)
  }

  test("cellsFor keeps cell population ~constant as the corpus grows") {
    assert(Ivf.cellsFor(0L, 8192L) == 1)
    assert(Ivf.cellsFor(8192L, 8192L) == 1)
    assert(Ivf.cellsFor(8193L, 8192L) == 2)
    // 100x the corpus -> 100x the cells (the scale contract)
    assert(Ivf.cellsFor(81920000L, 8192L) == 100 * Ivf.cellsFor(819200L, 8192L))
    // the driver-artifact clamp engages past maxCells
    assert(Ivf.cellsFor(Long.MaxValue, 8192L) == 65536)
    intercept[IllegalArgumentException](Ivf.cellsFor(10L, 0L))
  }
}
