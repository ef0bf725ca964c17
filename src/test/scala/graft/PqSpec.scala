package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pq

/** Product quantization: codebook training invariants, ADC against the
  * definitional per-pair sum, and exactness on a codeword-exact corpus
  * (recall-complete by construction — quantization is lossless there, so
  * ADC ordering must equal the true squared-L2 ordering). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def rngVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Double])] = {
    val r = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Seq.fill(dim)(r.nextDouble() * 2 - 1)))
  }

  test("training: deterministic, contiguous cids, codes in range, partition-stable") {
    val data = rngVecs(60, 8, seed = 11)
    val df = data.toDF("vec_id", "embedding")
    val b1 = Pq.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    def canon(b: org.apache.spark.sql.DataFrame) =
      b.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
    assert(canon(b1) ==
      canon(Pq.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)),
      "re-training on the same frame is bit-deterministic")
    // a different partitioning reorders the VectorSum partial sums: the
    // centroids agree to fp accumulation noise, not bit-exactly (same
    // contract as Ivf.train — the oracle runs against ONE fixed layout)
    val c1 = canon(b1)
    val c2 = canon(Pq.train(df.repartition(7), "vec_id", "embedding", m = 2, ksub = 4, iters = 2))
    assert(c1.keySet == c2.keySet && c1.forall { case (k, v) =>
      v.zip(c2(k)).forall { case (a, b) => math.abs(a - b) < 1e-9 } },
      "codebooks are partition-stable to accumulation noise")
    val books = Pq.collectBooks(b1)
    assert(books.size == 2 && books.forall(_.map(_._1) == (0 until 4)))
    val codes = Pq.encode(df, "vec_id", "embedding", b1)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(codes.length == 60 &&
      codes.forall { case (_, cs) => cs.size == 2 && cs.forall(c => c >= 0 && c < 4) })
  }

  test("ADC equals the definitional per-pair lookup sum") {
    val data = rngVecs(40, 8, seed = 23)
    val df = data.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 1)
    val books = Pq.collectBooks(cb)
    val sd = 4
    def sub(v: Seq[Double], j: Int) = v.slice(j * sd, (j + 1) * sd)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
    def codeOf(v: Seq[Double], j: Int): Int =
      books(j).minBy { case (cid, cv) => (d2(sub(v, j), cv), cid) }._1
    val queries = df.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val got = Pq.adcTopK(df, queries, "vec_id", "embedding", "q_id", cb, topK = 40)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val byId = data.toMap
    for (q <- 0L until 3L; x <- data.map(_._1) if x != q) {
      val expect = (0 until 2).map { j =>
        // the LUT entry is |q_j|^2 - 2 q_j.c + |c|^2, summed in j order
        val c = books(j)(codeOf(byId(x), j))._2
        val qj = sub(byId(q), j)
        qj.foldLeft(0.0)((s, v) => s + v * v) -
          2.0 * qj.zip(c).foldLeft(0.0) { case (s, (a, b)) => s + a * b } +
          c.foldLeft(0.0)((s, v) => s + v * v)
      }.sum
      assert(math.abs(got((q, x)) - expect) < 1e-6,
        s"ADC($q,$x): ${got((q, x))} vs reference $expect")
    }
  }

  test("IVFADC: all-cells probe equals exhaustive ADC; plan is equi-join only") {
    val data = rngVecs(80, 8, seed = 31)
    val df = data.toDF("vec_id", "embedding")
    val cents = graft.pipeline.Ivf.train(df, "vec_id", "embedding", k = 4, iters = 2)
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    val queries = df.where(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // probing EVERY cell makes the candidate set the whole corpus:
    // IVFADC must equal the exhaustive ADC face exactly
    val routed = Pq.ivfAdcTopK(df, queries, "vec_id", "embedding", "q_id",
      cents, cb, topK = 10, nProbe = 4)
    assert(rows(routed) ==
      rows(Pq.adcTopK(df, queries, "vec_id", "embedding", "q_id", cb, topK = 10)),
      "all-cells IVFADC == exhaustive ADC")
    val plan = routed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "IVFADC candidates come from the cell equi-join, never a product join")
    // the non-broadcast face (cid-bucketed corpus at scale) agrees
    assert(rows(Pq.ivfAdcTopK(df, queries, "vec_id", "embedding", "q_id",
      cents, cb, topK = 10, nProbe = 4, broadcastCorpus = false)) == rows(routed))
    // ... and with a tiny cellCap every cell is hot, so the SaltedIndex
    // cover engages — results (ranks included) must not change
    spark.conf.set("graft.semdedup.cellCap", "4")
    try assert(rows(Pq.ivfAdcTopK(df, queries, "vec_id", "embedding", "q_id",
      cents, cb, topK = 10, nProbe = 4, broadcastCorpus = false)) == rows(routed),
      "salted hot-cell IVFADC must equal the unsalted face")
    finally spark.conf.unset("graft.semdedup.cellCap")
    graft.api.Pinned.release(spark)
  }

  test("ivfAdcIngest: streaming equals batch, stateless, both corpus faces") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val data = rngVecs(60, 8, seed = 41)
    val df = data.toDF("vec_id", "embedding")
    val cents = graft.pipeline.Ivf.train(df, "vec_id", "embedding", k = 3, iters = 2)
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    val qRows = data.take(4).map { case (i, v) => (i, v) }
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val batch = Pq.ivfAdcIngest(
      graft.api.MStream(qRows.toDF("q_id", "embedding")), df,
      "vec_id", "embedding", "q_id", cents, cb, topK = 5, nProbe = 3)
    assert(!batch.df.isStreaming)
    val b = rows(batch.df)
    assert(b.nonEmpty && b == rows(Pq.ivfAdcTopK(df, qRows.toDF("q_id", "embedding"),
      "vec_id", "embedding", "q_id", cents, cb, topK = 5, nProbe = 3)))

    for (bc <- Seq(true, false)) {
      val in = MemoryStream[(Long, Seq[Double])]
      val out = Pq.ivfAdcIngest(
        graft.api.MStream(in.toDF().toDF("q_id", "embedding")), df,
        "vec_id", "embedding", "q_id", cents, cb, topK = 5, nProbe = 3,
        broadcastCorpus = bc)
      assert(out.df.isStreaming)
      val name = s"pq_ing_${bc}_${System.nanoTime()}"
      val q = out.df.writeStream.format("memory").queryName(name)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      try {
        in.addData(qRows.take(2).map { case (i, v) => (i, v.toSeq) }: _*)
        in.addData(qRows.drop(2).map { case (i, v) => (i, v.toSeq) }: _*)
        q.processAllAvailable()
        assert(q.lastProgress == null ||
          q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
          "compressed search at ingest is stateless")
        assert(rows(spark.table(name)) == b,
          s"streaming (broadcastCorpus=$bc) equals the batch face")
      } finally q.stop()
    }
    graft.api.Pinned.release(spark)
  }

  test("measured ADC recall@10 on the real embeddings rises with codebook size") {
    // measure, don't guess: sub-codebook size is PQ's recall knob — pin
    // the measured curve on real data (the sibling of IvfSpec's
    // recall-vs-nProbe sweep)
    import org.apache.spark.sql.functions.col
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.orderBy("vec_id").limit(20)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val truth = graft.pipeline.Similarity.bruteForceTopKPartial(
        embs, queries, "vec_id", "embedding", "q_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(ksub: Int): Double = {
      val cb = Pq.train(embs, "vec_id", "embedding", m = 8, ksub = ksub, iters = 2)
      val got = Pq.adcTopK(embs, queries, "vec_id", "embedding", "q_id", cb, topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.api.Pinned.release(spark)
      (truth & got).size.toDouble / truth.size
    }
    val r4 = recallAt(4); val r16 = recallAt(16)
    info(f"PQ ADC recall@10 (m=8, 1000 vecs): ksub=4 $r4%.3f, ksub=16 $r16%.3f")
    // these embeddings are near-uniform random — the hardest case for PQ
    // (measured: ~0.14 at ksub=4, ~0.33 at ksub=16). Pin the measured
    // reality: a finer codebook must recover clearly more, and a
    // regression that collapses ADC to noise (recall ~ k/N = 0.01)
    // fails the floor
    assert(r16 >= r4 + 0.1,
      s"a 4x finer codebook must lift recall: $r4 -> $r16")
    assert(r16 >= 0.2, s"ADC must beat noise-level recall by far, got $r16")
  }

  test("beyond-literal LUT (> 256 entries) is bit-identical to the literal staging") {
    // synthetic (sub, cid, cv) books with m=2, ksub=160 -> 320 LUT entries:
    // adcTopKCoded takes the PqLut loop face; the same search under
    // per-subspace 128-entry sub-books (built from the SAME codewords,
    // literal face) cannot compare directly, so parity is pinned at the
    // LUT-column level: loop expression vs staged literal arithmetic on
    // the same frame, elementwise bit-equal
    val r = new scala.util.Random(9)
    val m = 2; val ksub = 160; val sd = 4
    val books: IndexedSeq[Seq[(Int, Seq[Double])]] = IndexedSeq.fill(m)(
      (0 until ksub).map(c => c -> Seq.fill(sd)(r.nextDouble() * 2 - 1)))
    val qs = rngVecs(20, m * sd, seed = 77).toDF("q_id", "embedding")
      .select(col("q_id"), col("embedding").cast("array<double>").as("__qv"))
    val loop = qs.select(col("q_id"), graft.functions.VectorFunctions
        .pqLut(col("__qv"), books.map(_.map(_._2)), sd).as("__lut"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Double](1)).toMap
    // literal staging replicated exactly as Pq.withLut builds it
    val staged = qs
      .select(col("q_id") +: col("__qv") +: books.indices.map(j =>
        slice(col("__qv"), j * sd + 1, sd).as(s"__q$j")): _*)
      .select(col("q_id") +: books.indices.flatMap(j => Seq(col(s"__q$j"),
        graft.pipeline.Similarity.dot(col(s"__q$j"), col(s"__q$j")).as(s"__qq$j"))): _*)
    val lits = books.zipWithIndex.flatMap { case (b, j) =>
      b.map { case (_, cv) =>
        var cc = 0.0; cv.foreach(x => cc += x * x)
        col(s"__qq$j") - lit(2.0) * graft.pipeline.Similarity.dot(
          col(s"__q$j"), typedLit(cv)) + lit(cc)
      }
    }
    val literal = staged.select(col("q_id"), array(lits: _*).as("__lut"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Double](1)).toMap
    assert(loop.keySet == literal.keySet)
    loop.foreach { case (k, v) =>
      assert(v == literal(k), s"LUT diverged for query $k") }

    // and the public face end-to-end: >256-entry books route through the
    // loop LUT and still rank a codeword-exact corpus exactly
    val bases = IndexedSeq.fill(8)(Seq.fill(m * sd)(r.nextDouble() * 2 - 1))
    val corpus = (0L until 40L).map(i => (i, bases((i % 8).toInt))).toDF("vec_id", "embedding")
    val cbBig = books.zipWithIndex
      .flatMap { case (b, j) => b.map { case (c, v) => (j, c, v) } }
      .toDF("sub", "cid", "cv")
    val hits = Pq.adcTopKCoded(
      Pq.encode(corpus, "vec_id", "embedding", cbBig),
      corpus.where(col("vec_id") === 0).select(col("vec_id").as("q_id"), col("embedding")),
      "vec_id", "embedding", "q_id", cbBig, topK = 5)
    assert(hits.count() == 5, "loop-LUT search returns the requested top-k")
  }

  test("codeword-exact corpus: ADC ordering equals true squared-L2 ordering") {
    // four distinct base vectors at ids 0..3 (the deterministic init picks
    // them), repeated across the corpus: Lloyd fixes the codewords at the
    // bases, quantization is lossless, ADC == exact distance
    val r = new scala.util.Random(5)
    val bases = Seq.fill(4)(Seq.fill(8)(r.nextDouble() * 2 - 1))
    val data = (0L until 40L).map(i => (i, bases((i % 4).toInt)))
    val df = data.toDF("vec_id", "embedding")
    val cb = Pq.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    val queries = df.where(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val got = Pq.adcTopK(df, queries, "vec_id", "embedding", "q_id", cb, topK = 39)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) }
    val exact = data.filter(_._1 != 0L)
      .map { case (i, v) => (i, d2(bases(0), v)) }
      .sortBy { case (i, d) => (d, i) }
    assert(got.map(_._1).toSeq == exact.map(_._1),
      "lossless quantization: ADC ranking equals the exact ranking")
    got.zip(exact).foreach { case ((_, adc, _), (_, ed)) =>
      assert(math.abs(adc - ed) < 1e-6, s"ADC $adc vs exact $ed") }
  }
}
