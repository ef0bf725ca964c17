package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization for compressed ANN (Jégou, Douze & Schmid 2011,
 * "Product Quantization for Nearest Neighbor Search"): each vector splits
 * into `m` contiguous sub-vectors, each subspace gets its own small
 * k-means codebook (`ksub` codewords), and a vector's compressed form is
 * its `m` codeword ids — dim×4 bytes shrink to m small ints. Search uses
 * asymmetric distance computation (ADC): per query, ONE `m × ksub` table
 * of exact sub-distances to every codeword, then each corpus row scores
 * with `m` table lookups instead of a dim-length dot product.
 *
 * This is the 100 TB shape for embedding search: the corpus at rest is
 * codes (≈32× smaller at m=4, ksub≤256 over 64 float dims), the scan is
 * lookup-bound, and the codebooks are driver-sized literal artifacts like
 * [[Ivf]]'s (the two compose: IVF cells prune candidates, PQ codes score
 * them — `adcTopK` here is the exhaustive-ADC face that carries the
 * oracle). Training follows [[Ivf.train]]'s discipline — deterministic
 * lowest-id initialization, literal-codebook assignment expressions, one
 * corpus scan per Lloyd round for ALL subspaces (the per-subspace
 * assignments explode into (sub, cid, sub-vector) rows whose lengths sum
 * to the original dim — same bytes shuffled as one [[graft.functions.VectorSum]]
 * pass), and a shuffle of only `m × ksub` partial-sum rows per round.
 */
object Pq {

  /** LUT-size threshold between the two per-query lookup-table lowerings,
    * DEFINED AS [[Ivf.LiteralCells]] (not merely equal to it): the
    * probe-explode and LUT constructs share one projection in the IVFADC
    * query plans, and the whole-family-flips-together guarantee of the
    * per-projection `extraInline` budget is only structural if the two
    * dispatches compare against the same ceiling. Up to this many m×ksub
    * entries the table is a literal `array(...)` of staged column
    * expressions (fully unrolled codegen — fastest for the small-m
    * defaults); above it the literal formulation hits the Janino method
    * ceiling and the table lowers to the compiled-loop
    * [[graft.functions.PqLut]] expression (codebooks as one reference
    * object, constant bytecode at any size). Bit-identical entries either
    * way (PqSpec + the PqLut property). */
  private[graft] val LiteralLutEntries: Int = Ivf.LiteralCells

  /** Sub-quantizer assignment with the literal/loop dispatch on the TOTAL
    * inline budget across all m sub-codebooks: each book alone may sit
    * under [[Ivf.LiteralCells]] (so `nearestCid`'s per-book dispatch
    * would pick the literal face), but the m assignments land in ONE
    * projection, and the combined generated code is what must respect
    * the Janino method ceiling — m=8 × ksub=64 literal faces measured
    * blowing the 64 KB limit, dropping the whole encode stage out of
    * whole-stage codegen (the StressBench `pqlut512` probe).
    * `extraInline` counts literal entries from OTHER constructs staged in
    * the same projection (the coarse IVF assignment in [[ivfAdcTopK]]'s
    * coded plan) — the budget is per generated method, not per construct.
    * Bit-identical either way (the loop face is property-pinned against
    * the literal). */
  private def subCid(books: IndexedSeq[Seq[(Int, Seq[Double])]], j: Int,
                     sub: Column, extraInline: Int = 0): Column =
    if (books.iterator.map(_.size).sum + extraInline > Ivf.LiteralCells)
      Ivf.nearestCidLoop(sub, books(j))
    else Ivf.nearestCid(sub, books(j))

  private def lutColsLiteral(books: IndexedSeq[Seq[(Int, Seq[Double])]]): Seq[Column] =
    books.zipWithIndex.flatMap { case (b, j) =>
      val qj = col(s"__q$j")
      b.map { case (_, cv) =>
        var cc = 0.0
        cv.foreach(x => cc += x * x) // driver fold, left-to-right like DotProduct
        col(s"__qq$j") - lit(2.0) * Similarity.dot(qj, typedLit(cv)) + lit(cc)
      }
    }

  /** Stage `__lut` — the flattened m×ksub ADC table, sub-major and
    * codeword-ascending — onto a frame carrying the query vector as
    * `__qv`. `carry` columns pass through; `extra` columns (which may
    * reference `__qv`, e.g. the IVF probe explode) evaluate in the final
    * select. Literal staging below [[LiteralLutEntries]] (slice each
    * sub-vector once, |q_j|² once, every entry then references columns —
    * smaller codegen, one copy); the [[graft.functions.PqLut]] loop
    * expression above it. `extraInline` counts literal entries the
    * `extra` columns themselves stage into the final select (the
    * [[Ivf.probeCids]] explode in [[ivfAdcTopK]]) — the Janino budget is
    * per projection, so the LUT dispatch must see them. */
  private def withLut(q: DataFrame, books: IndexedSeq[Seq[(Int, Seq[Double])]],
                      carry: Seq[String], extra: Seq[Column],
                      extraInline: Int = 0): DataFrame = {
    val sd = books.head.head._2.size
    val cs = carry.map(col)
    if (books.iterator.map(_.size).sum + extraInline > LiteralLutEntries)
      return q.select(cs ++ (graft.functions.VectorFunctions
        .pqLut(col("__qv"), books.map(_.map(_._2)), sd).as("__lut") +: extra): _*)
    q
      .select(cs ++ (col("__qv") +: books.indices.map(j =>
        slice(col("__qv"), j * sd + 1, sd).as(s"__q$j"))): _*)
      .select(cs ++ (col("__qv") +: books.indices.flatMap(j =>
        Seq(col(s"__q$j"), Similarity.dot(col(s"__q$j"), col(s"__q$j")).as(s"__qq$j")))): _*)
      .select(cs ++ (array(lutColsLiteral(books): _*).as("__lut") +: extra): _*)
  }

  /** Train the `m` sub-codebooks. Output (sub, cid, cv) — `cv` has
    * dim/m elements; collect with [[collectBooks]]. */
  def train(embs: DataFrame, idCol: String, vecCol: String,
            m: Int, ksub: Int, iters: Int): DataFrame = {
    require(m >= 1 && m <= 64, s"m=$m subspaces: keep 1..64")
    require(ksub >= 1 && ksub <= 256,
      s"ksub=$ksub: PQ codes are small ints by design; keep ksub <= 256")
    require(iters >= 0, s"iters=$iters must be non-negative")
    val spark = embs.sparkSession
    import spark.implicits._
    val pts = embs.select(col(idCol).as("__pid"),
        col(vecCol).cast("array<double>").as("__pv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val firstDim = pts.select(size(col("__pv"))).limit(1).collect()
      require(firstDim.nonEmpty, "Pq.train: the corpus has no vectors")
      val dim = firstDim.head.getInt(0)
      require(dim % m == 0, s"vector dim $dim is not divisible by m=$m subspaces")
      val sd = dim / m
      def subv(j: Int, c: Column): Column = slice(c, j * sd + 1, sd)
      // deterministic init: the ksub lowest ids' sub-vectors, like Ivf
      val init = pts.orderBy("__pid").limit(ksub).collect().map(_.getSeq[Double](1))
      var books: IndexedSeq[Seq[(Int, Seq[Double])]] = (0 until m).map { j =>
        init.zipWithIndex.map { case (v, i) => (i, v.slice(j * sd, (j + 1) * sd)) }.toSeq
      }
      var it = 0
      while (it < iters) {
        // ONE corpus scan updates every subspace: slice each sub-vector
        // ONCE into a column (the assignment expression then references an
        // attribute, not m×ksub re-slices — smaller codegen, one copy),
        // explode m (sub, cid, sub-vector) structs per row — total
        // exploded payload equals the original vector — then partial-sum
        // per (sub, cid)
        val rows = pts
          .select((0 until m).map(j => subv(j, col("__pv")).as(s"__s$j")): _*)
          .select(explode(array((0 until m).map { j =>
            struct(lit(j).as("sub"),
              subCid(books, j, col(s"__s$j")).as("cid"),
              col(s"__s$j").as("sv"))
          }: _*)).as("__a"))
          .select(col("__a.sub"), col("__a.cid"), col("__a.sv"))
          .groupBy(col("sub"), col("cid"))
          .agg(graft.functions.VectorFunctions.vectorSum(col("sv")).as("__s"),
            count(col("sv")).as("__n"))
          .collect()
        books = (0 until m).map { j =>
          rows.filter(_.getInt(0) == j).map { r =>
            val n = r.getLong(3).toDouble
            (r.getInt(1), r.getSeq[Double](2).map(_ / n))
          }.toSeq.sortBy(_._1)
        }
        it += 1
      }
      books.zipWithIndex
        .flatMap { case (b, j) => b.map { case (c, v) => (j, c, v) } }
        .toDF("sub", "cid", "cv")
    } finally pts.unpersist(blocking = false)
  }

  /** Collect a (sub, cid, cv) codebook frame to the driver artifact,
    * indexed by subspace; enforces the contiguous-cid invariant ADC
    * lookup tables rely on (an empty training cell would leave a hole —
    * fail loudly, don't mis-index). */
  def collectBooks(codebooks: DataFrame): IndexedSeq[Seq[(Int, Seq[Double])]] = {
    val rows = codebooks.select(col("sub"), col("cid"), col("cv").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    require(rows.nonEmpty, "PQ codebook frame is empty — train() first")
    val m = rows.map(_._1).max + 1
    (0 until m).map { j =>
      val b = rows.filter(_._1 == j).map(r => (r._2, r._3)).toSeq.sortBy(_._1)
      require(b.map(_._1) == (0 until b.size),
        s"PQ codebook subspace $j has non-contiguous cids ${b.map(_._1)} " +
          "(an empty training cell?) — retrain with smaller ksub or more data")
      b
    }
  }

  /** PQ-encode: each vector becomes its `m` codeword ids — the
    * compressed at-rest representation. Pure literal-codebook projection,
    * no shuffle. */
  def encode(embs: DataFrame, idCol: String, vecCol: String,
             codebooks: DataFrame): DataFrame =
    encodeWith(embs, idCol, vecCol, collectBooks(codebooks))

  private def encodeWith(embs: DataFrame, idCol: String, vecCol: String,
                         books: IndexedSeq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val sd = books.head.head._2.size
    val v = col(vecCol).cast("array<double>")
    embs
      .select(col(idCol) +:
        books.indices.map(j => slice(v, j * sd + 1, sd).as(s"__s$j")): _*)
      .select(col(idCol),
        array(books.indices.map(j =>
          subCid(books, j, col(s"__s$j"))): _*).as("codes"))
  }

  /** Exhaustive ADC top-k: per query one `m × ksub` lookup table of exact
    * sub-distances (flattened sub-major, codeword-ascending), corpus rows
    * score with `m` array lookups summed in fixed subspace order (fp
    * determinism), bounded top-k per query via the map-side
    * [[graft.functions.BoundedTopK]] heap — the shuffle carries
    * queries × k rows. `adc` is the approximate SQUARED L2 distance
    * (ascending = nearest), ties on the lower id. Queries are broadcast
    * (the probe set is small by contract); compose with [[Ivf]] cells to
    * prune the corpus side at cluster scale.
    *
    * The corpus is encoded ONCE and materialized (pinned local
    * checkpoint, caller-releasable via `Pinned.release`) — that is PQ's
    * deployment shape (codes are the at-rest artifact; at cluster scale
    * persist [[encode]]'s output as a table and call [[adcTopKCoded]]),
    * and it keeps the assignment expression out of the scoring join,
    * where it would leave whole-stage codegen (measured 22× slower on a
    * 10× sf0.1 corpus). */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, qIdCol: String, codebooks: DataFrame,
              topK: Int): DataFrame = {
    val books = collectBooks(codebooks)
    val (enc, ids) = graft.api.Pinned.checkpointTracked(
      encodeWith(corpus, idCol, vecCol, books))
    graft.api.Pinned.register(corpus.sparkSession, ids)
    adcTopKCodedWith(enc, queries, idCol, vecCol, qIdCol, books, topK)
  }

  /** [[adcTopK]] over a PRE-ENCODED corpus `(idCol, codes)` — the
    * cluster-scale entry point: encode once, persist the codes table,
    * score every probe batch against it. */
  def adcTopKCoded(coded: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, qIdCol: String, codebooks: DataFrame,
                   topK: Int): DataFrame =
    adcTopKCodedWith(coded, queries, idCol, vecCol, qIdCol,
      collectBooks(codebooks), topK)

  /** IVF + PQ (Jégou et al.'s IVFADC): the coarse IVF cells prune
    * candidates, the PQ codes score them — the canonical billion-scale
    * composition. The corpus materializes ONCE as (id, cid, codes)
    * (coarse cell + compressed codes, pinned); each query explodes to
    * its `nProbe` nearest cells (literal-codebook expression, no
    * shuffle), equi-joins the coded corpus on the cell id — no product
    * join anywhere — and ADC-scores only the joined candidates.
    * `broadcastCorpus = false` for a cid-bucketed corpus table at
    * cluster scale, as [[Ivf.searchIngest]]. Recall follows the probed
    * cells: with every near neighbor's cell probed the result equals
    * [[adcTopK]] exactly (PqSpec pins this). */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, qIdCol: String, centroids: DataFrame,
                 codebooks: DataFrame, topK: Int, nProbe: Int,
                 broadcastCorpus: Boolean = true): DataFrame = {
    require(topK >= 1 && nProbe >= 1, s"need topK/nProbe >= 1, got $topK/$nProbe")
    val cent = Ivf.collectCodebook(centroids)
    val books = collectBooks(codebooks)
    val m = books.size
    val sd = books.head.head._2.size
    // coarse assignment + m sub-assignments land in ONE projection (and
    // the probe explode shares the LUT's) — each dispatch budgets the
    // projection total, not its own entries alone
    val lutTotal = books.iterator.map(_.size).sum
    val v = col(vecCol).cast("array<double>")
    val codedPlan = corpus
      .select(col(idCol) +: v.as("__pv") +:
        books.indices.map(j => slice(v, j * sd + 1, sd).as(s"__s$j")): _*)
      .select(col(idCol),
        Ivf.nearestCid(col("__pv"), cent, extraInline = lutTotal).as("cid"),
        array(books.indices.map(j =>
          subCid(books, j, col(s"__s$j"), extraInline = cent.size)): _*).as("codes"))
    // shuffled face: hot IVF cells of the pinned coded corpus are salted
    // at pin time (SaltedIndex — the stream-static/hot-cell cover)
    val (coded, hotCells, ids) =
      if (broadcastCorpus) {
        val (c, i) = graft.api.Pinned.checkpointTracked(codedPlan)
        (c, None, i)
      } else {
        val cap = Dedup.capConf(
          corpus.sparkSession, "graft.semdedup.cellCap", 8192L)
        val (c, hot, i) = SaltedIndex.pin(codedPlan, "cid", col(idCol), cap)
        (c, Some(hot), i)
      }
    graft.api.Pinned.register(corpus.sparkSession, ids)
    val q0 = withLut(
      queries.select(col(qIdCol), col(vecCol).cast("array<double>").as("__qv")),
      books, Seq(qIdCol),
      Seq(explode(Ivf.probeCids(col("__qv"), cent, nProbe,
        extraInline = lutTotal)).as("cid")),
      extraInline = cent.size)
    val q = hotCells match {
      case None => q0
      case Some(hot) => SaltedIndex.replicate(q0, hot, "cid")
    }
    val offs = books.map(_.size).scanLeft(0)(_ + _)
    val adc = (0 until m).map(j =>
        element_at(col("__lut"), lit(offs(j) + 1) + element_at(col("codes"), j + 1)))
      .reduce(_ + _)
    q.join(if (broadcastCorpus) broadcast(coded) else coded,
        if (broadcastCorpus) Seq("cid") else Seq("cid", "__sg"))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol).cast("long").as("__id"), (-adc).as("__s"))
      .groupBy(col(qIdCol))
      .agg(graft.functions.VectorFunctions.topKByScore(col("__id"), col("__s"), topK)
        .as("__top"))
      .select(col(qIdCol), posexplode(col("__top")))
      .select(col(qIdCol), col("col.id").as(idCol),
        round(-col("col.cos"), 6).as("adc"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Dual-mode [[ivfAdcTopK]] — compressed similarity search at ingest:
    * query vectors arrive as a stream and probe a STATIC IVF+PQ-indexed
    * corpus. Batch delegates to `ivfAdcTopK`; streaming pins the coded
    * corpus once (id, cell, codes — the compressed index), explodes each
    * arriving query to its nProbe cells (literal-codebook expression, no
    * shuffle), equi-joins the pinned codes on the cell id, ADC-scores
    * the candidates, and takes the exact top-k per query in the
    * stateless per-batch combine — zero state-store rows, the
    * [[Ivf.searchIngest]] shape over 32×-smaller corpus bytes.
    * `broadcastCorpus = false` for a cid-bucketed codes table at cluster
    * scale. Queries whose probed cells are empty produce no output in
    * either mode (inner join). */
  def ivfAdcIngest(queries: graft.api.MStream, corpus: DataFrame,
                   idCol: String, vecCol: String, qIdCol: String,
                   centroids: DataFrame, codebooks: DataFrame,
                   topK: Int, nProbe: Int,
                   broadcastCorpus: Boolean = true): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val df = queries.df
    if (!df.isStreaming)
      return new graft.api.MStream(
        ivfAdcTopK(corpus, df, idCol, vecCol, qIdCol, centroids, codebooks,
          topK, nProbe, broadcastCorpus),
        queries.eventOrder, queries.contextKeys, queries.name)
    require(topK >= 1 && nProbe >= 1, s"need topK/nProbe >= 1, got $topK/$nProbe")
    val cent = Ivf.collectCodebook(centroids)
    val books = collectBooks(codebooks)
    val m = books.size
    val sd = books.head.head._2.size
    // per-projection inline budget, as in ivfAdcTopK
    val lutTotal = books.iterator.map(_.size).sum
    val v = col(vecCol).cast("array<double>")
    val codedPlan = corpus
      .select(col(idCol).as("__pid") +: v.as("__pv") +:
        books.indices.map(j => slice(v, j * sd + 1, sd).as(s"__s$j")): _*)
      .select(col("__pid"),
        Ivf.nearestCid(col("__pv"), cent, extraInline = lutTotal).as("cid"),
        array(books.indices.map(j =>
          subCid(books, j, col(s"__s$j"), extraInline = cent.size)): _*).as("codes"))
    // shuffled face: salted pinned index (see ivfAdcTopK)
    val (coded, hotCells, ids) =
      if (broadcastCorpus) {
        val (c, i) = graft.api.Pinned.checkpointTracked(codedPlan)
        (c, None, i)
      } else {
        val cap = Dedup.capConf(
          df.sparkSession, "graft.semdedup.cellCap", 8192L)
        val (c, hot, i) = SaltedIndex.pin(codedPlan, "cid", col("__pid"), cap)
        (c, Some(hot), i)
      }
    graft.api.Pinned.register(df.sparkSession, ids)
    val q0 = withLut(
      df.select(col(qIdCol).as("__qid"), col(vecCol).cast("array<double>").as("__qv")),
      books, Seq("__qid"),
      Seq(explode(Ivf.probeCids(col("__qv"), cent, nProbe,
        extraInline = lutTotal)).as("cid")),
      extraInline = cent.size)
    val q = hotCells match {
      case None => q0
      case Some(hot) => SaltedIndex.replicate(q0, hot, "cid")
    }
    val offs = books.map(_.size).scanLeft(0)(_ + _)
    val adc = (0 until m).map(j =>
        element_at(col("__lut"), lit(offs(j) + 1) + element_at(col("codes"), j + 1)))
      .reduce(_ + _)
    val scored = q
      .join(if (broadcastCorpus) broadcast(coded) else coded,
        if (broadcastCorpus) Seq("cid") else Seq("cid", "__sg"))
      .filter(col("__pid") =!= col("__qid"))
      // long ids, matching the batch face's BoundedTopK contract
      .select(col("__qid"), col("__pid").cast("long").as("__pid"), adc.as("__adc"))
    val qType = df.schema(qIdCol).dataType
    val outT = StructType(Seq(
      StructField("__qid", qType), StructField("__pid", LongType),
      StructField("__adc", DoubleType), StructField("rn", IntegerType, nullable = false)))
    val outEnc: Encoder[Row] = RowEncoder.encoderFor(outT)
    val pidIdx = scored.schema.fieldIndex("__pid")
    val adcIdx = scored.schema.fieldIndex("__adc")
    val k = topK
    // (adc asc, pid asc) — the batch BoundedTopK's exact order, so both
    // faces pick identical top-k sets and ranks
    val ord = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val c = java.lang.Double.compare(a.getDouble(adcIdx), b.getDouble(adcIdx))
        if (c != 0) c
        else a.get(pidIdx).asInstanceOf[Comparable[Any]].compareTo(b.get(pidIdx))
      }
    }
    val out = graft.streaming.PerBatchCombine(scored, Seq("__qid"), outEnc) {
        (key: Row, it: Iterator[Row]) =>
          val heap = new java.util.PriorityQueue[Row](k + 1, ord.reverse)
          it.foreach { r => heap.add(r); if (heap.size > k) heap.poll() }
          val top = Array.fill(heap.size)(heap.poll()).reverse
          top.iterator.zipWithIndex.map { case (r, i) =>
            Row(key.get(0), r.get(pidIdx), r.getDouble(adcIdx), i + 1)
          }
      }
      .select(col("__qid").as(qIdCol), col("__pid").as(idCol),
        round(col("__adc"), 6).as("adc"), col("rn"))
    new graft.api.MStream(out, queries.eventOrder, queries.contextKeys, queries.name)
  }

  private def adcTopKCodedWith(enc: DataFrame, queries: DataFrame, idCol: String,
                               vecCol: String, qIdCol: String,
                               books: IndexedSeq[Seq[(Int, Seq[Double])]],
                               topK: Int): DataFrame = {
    require(topK >= 1, s"topK=$topK must be positive")
    val m = books.size
    val q = withLut(
      queries.select(col(qIdCol), col(vecCol).cast("array<double>").as("__qv")),
      books, Seq(qIdCol), Nil)
    val offs = books.map(_.size).scanLeft(0)(_ + _)
    val adc = (0 until m).map(j =>
        element_at(col("__lut"), lit(offs(j) + 1) + element_at(col("codes"), j + 1)))
      .reduce(_ + _)
    enc.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol).cast("long").as("__id"), (-adc).as("__s"))
      .groupBy(col(qIdCol))
      .agg(graft.functions.VectorFunctions.topKByScore(col("__id"), col("__s"), topK)
        .as("__top"))
      .select(col(qIdCol), posexplode(col("__top")))
      .select(col(qIdCol), col("col.id").as(idCol),
        round(-col("col.cos"), 6).as("adc"), (col("pos") + 1).cast("int").as("rn"))
  }
}
