package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.api.MStream

/** The SAME MStream scan program lowers to keyed state when the input is
  * a streaming DataFrame. */
class StreamingMStreamScanSpec extends SparkSpec {
  import spark.implicits._

  private def drive[T](df: org.apache.spark.sql.DataFrame)(feed: (() => Seq[Row]) => Unit): Unit = {
    val name = s"mss_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try feed(() => { q.processAllAvailable(); spark.table(name).collect().toSeq })
    finally q.stop()
  }
  private type Row = org.apache.spark.sql.Row

  test("streaming sumBy emits running sums per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = new MStream(in.toDF(), Seq("seq"))
      .groupBy("k").sumBy(col("v"), "run")
    assert(out.df.isStreaming)
    drive(out.df) { emitted =>
      in.addData(Ev("a", 1, 5.0), Ev("a", 2, 3.0))
      in.addData(Ev("a", 3, 2.0), Ev("b", 4, 1.0))
      val got = emitted().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet
      assert(got == Set(("a", 1L, 5.0), ("a", 2L, 8.0), ("a", 3L, 10.0), ("b", 4L, 1.0)))
    }
  }

  test("streaming dedupBy drops repeated fingerprints across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = new MStream(in.toDF(), Seq("seq"))
      .addFields("fp" -> graft.pipeline.TextOps.polyHash(col("k")))
      .dedupBy(Seq("fp"))
    assert(out.df.isStreaming)
    drive(out.df) { emitted =>
      in.addData(Ev("a", 1, 5.0), Ev("a", 2, 3.0), Ev("b", 3, 1.0))
      in.addData(Ev("a", 4, 9.0), Ev("c", 5, 2.0)) // 'a' already seen last batch
      val got = emitted().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == Set(("a", 1L), ("b", 3L), ("c", 5L)),
        "first record per fingerprint survives; dedup state spans batches")
    }
  }

  test("MStream tumbling window aggregates a watermarked stream in update mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TEv]
    val out = new MStream(in.toDF(), Seq("ts"))
      .withWatermark("ts", "10 seconds")
      .groupBy("k")
      .tumblingWindow(col("ts"), "10 seconds")
      .select("w", sum(col("v")).as("total"))
    assert(out.df.isStreaming)
    val name = s"msw_${System.nanoTime()}"
    val q = out.df.select(col("w.start").cast("long").as("ws"), col("k"), col("total"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    try {
      def t(s: Long) = new java.sql.Timestamp(s * 1000)
      in.addData(TEv("a", t(1), 1.0), TEv("a", t(3), 2.0), TEv("b", t(12), 4.0))
      q.processAllAvailable()
      val got = spark.table(name).as[(Long, String, Double)].collect().toSet
      assert(got == Set((0L, "a", 3.0), (10L, "b", 4.0)))
    } finally q.stop()
  }

  test("streaming recordWindow(3) emits trailing-window aggregates per arrival") {
    import graft.streaming.StreamingRowScans.{RCount, RSum}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = new MStream(in.toDF(), Seq("seq"))
      .groupBy("k").recordWindow(3)
      .selectRunning((RSum, "v", "tsum"), (RCount, "v", "tn"))
    assert(out.df.isStreaming)
    val name = s"msrw_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Ev("a", 1, 1.0), Ev("a", 2, 2.0))
      in.addData(Ev("a", 3, 4.0), Ev("a", 4, 8.0))
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(1), r.getDouble(3), r.getLong(4))).toSet
      assert(got == Set((1L, 1.0, 1L), (2L, 3.0, 2L), (3L, 7.0, 3L), (4L, 14.0, 3L)),
        "ring buffer trails 3 records across batches")
    } finally q.stop()
  }

  test("selectRunning matches window-frame lowering in batch") {
    import graft.streaming.StreamingRowScans.RSum
    val batch = new MStream(
      Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 4.0), ("a", 4L, 8.0)).toDF("k", "seq", "v"),
      Seq("seq"))
      .groupBy("k").recordWindow(3)
      .selectRunning((RSum, "v", "tsum"))
      .df.orderBy("seq").select("tsum").collect().map(_.getDouble(0)).toSeq
    assert(batch == Seq(1.0, 3.0, 7.0, 14.0))
  }

  test("streaming uniqueBy keeps the latest record per value in update mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = new MStream(in.toDF(), Seq("seq")).uniqueBy(Seq("k"), Seq("seq"))
    assert(out.df.isStreaming)
    val name = s"msu_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(Ev("a", 1, 5.0), Ev("a", 2, 3.0), Ev("b", 3, 1.0))
      q.processAllAvailable()
      val got = spark.table(name).as[Ev].collect().toSet
      assert(got == Set(Ev("a", 2, 3.0), Ev("b", 3, 1.0)), "latest per key retained")
      in.addData(Ev("a", 4, 9.0))
      q.processAllAvailable()
      assert(spark.table(name).as[Ev].collect().toSet ==
        Set(Ev("a", 4, 9.0), Ev("b", 3, 1.0)), "state updates across batches")
    } finally q.stop()
  }

  test("streaming near-dup ingest matches batch deduplicateCorpus survivors") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while seventeen green parrots " +
      "recite ancient poetry beneath flickering neon signs as midnight trains rattle through " +
      "forgotten stations carrying letters nobody will ever read toward cities slowly sinking " +
      "into warm coastal fog banks tonight"
    val docs = Seq(
      (1L, base),                    // survivor of its group
      (2L, base),                    // exact dup of 1
      (3L, base.replace("tonight", "today")), // one trailing word changed: ~3 of ~40
                                     // shingles differ -> jaccard >= 0.9 and per-bit
                                     // simhash delta too small to flip any bit
      (4L, "completely different words about spark catalyst tungsten codegen shuffles at scale"),
      (5L, "tiny doc"),              // < 3 words: exact-hash path
      (6L, "tiny doc"),              // exact dup of 5
      (7L, "other thing"))           // distinct short doc
    val batchSurvivors = graft.pipeline.Dedup.deduplicateCorpus(
      docs.toDF("doc_id", "text"), "doc_id", "text", k = 16, bands = 8, threshold = 0.7)
      .collect().map(_.getLong(0)).toSet
    val in = MemoryStream[(Long, String)]
    val out = graft.pipeline.Dedup.ingestNearDup(
      new MStream(in.toDF().toDF("doc_id", "text"), Seq("doc_id")), "doc_id", "text")
    assert(out.df.isStreaming)
    drive(out.df) { emitted =>
      // id-ordered arrival, duplicates in SEPARATE micro-batches: within a
      // batch dropDuplicates' survivor pick is contractually arbitrary;
      // across batches first-wins is guaranteed, making survivor identity
      // equal the batch path's cluster-min
      in.addData(docs(0))
      in.addData(docs(1), docs(2))
      in.addData(docs(3), docs(4))
      in.addData(docs(5), docs(6))
      val streamed = emitted().map(_.getLong(0)).toSet
      assert(streamed == batchSurvivors,
        s"streaming survivors $streamed != batch survivors $batchSurvivors")
    }
  }

  test("streaming reduceRows re-emits each key's latest fold per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = new MStream(in.toDF(), Seq("seq")).groupBy("k")
      .reduceRows(("", 0.0)) { case ((_, acc), r) =>
        (r.getAs[String]("k"), acc + r.getAs[Double]("v"))
      }
    assert(out.df.isStreaming)
    drive(out.df) { emitted =>
      in.addData(Ev("a", 1, 5.0), Ev("a", 2, 3.0))
      assert(emitted().map(r => (r.getString(0), r.getDouble(1))).toSet == Set(("a", 8.0)))
      in.addData(Ev("a", 3, 2.0), Ev("b", 4, 1.0))
      val got = emitted().map(r => (r.getString(0), r.getDouble(1)))
      assert(got.toSet == Set(("a", 8.0), ("a", 10.0), ("b", 1.0)),
        "state persists across batches; latest fold re-emits")
    }
  }

  test("streaming maxBy emits only on improvement; last re-emits the latest") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val mx = new MStream(in.toDF(), Seq("seq")).groupBy("k").maxBy(col("v"))
    drive(mx.df) { emitted =>
      in.addData(Ev("a", 1, 5.0))
      in.addData(Ev("a", 2, 3.0))
      in.addData(Ev("a", 3, 9.0))
      assert(emitted().map(_.getLong(1)).toSet == Set(1L, 3L))
    }
    val in2 = MemoryStream[Ev]
    val lst = new MStream(in2.toDF(), Seq("seq")).groupBy("k").last()
    drive(lst.df) { emitted =>
      in2.addData(Ev("a", 1, 5.0))
      assert(emitted().map(_.getLong(1)).toSet == Set(1L))
      in2.addData(Ev("a", 2, 3.0))
      assert(emitted().map(_.getLong(1)).toSet == Set(1L, 2L),
        "each batch re-emits the latest (update semantics per batch)")
    }
  }

  test("banded ingestNearDup collapses hamming<=k near-dups across batches; streaming == batch") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = "the quick brown fox jumps over the lazy dog again and again for testing purposes only"
    val t1 = t0.replace("lazy", "hazy") // near-dup of t0 (one word)
    val t2 = "completely different content about spark structured streaming state stores and checkpoints"
    val docs = Seq(
      NdDoc(1, t0, 1), NdDoc(2, t1, 2), NdDoc(3, t2, 3),
      NdDoc(4, t0, 4), // exact copy of doc 1, later batch
      NdDoc(5, "", 5), NdDoc(6, "", 6), // featureless equal -> 6 drops
      NdDoc(7, "short", 7)) // featureless but distinct text -> survives
    val maxH = 6

    // the impl's signature rule, collected once, drives a naive reference
    val h = graft.functions.VectorFunctions.wordShingleHashes(col("text"), 3)
    val sigCol = when(size(h) >= 1,
      graft.functions.VectorFunctions.simhashBits(h, 63)).otherwise(xxhash64(col("text")))
    val sigs = docs.toDF().select(col("id"), sigCol.as("sig"), (size(h) < 1).as("short"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // preconditions that make the test meaningful: a REAL near (not exact)
    // collapse within budget, and the unrelated doc outside it
    assert(ham(sigs(1L)._1, sigs(2L)._1) >= 1 && ham(sigs(1L)._1, sigs(2L)._1) <= maxH,
      s"fixture: t1 must be within budget of t0 (got ${ham(sigs(1L)._1, sigs(2L)._1)})")
    assert(ham(sigs(1L)._1, sigs(3L)._1) > maxH,
      s"fixture: t2 must be outside the budget (got ${ham(sigs(1L)._1, sigs(3L)._1)})")
    // drop rule reference: a doc drops iff ANY earlier doc (kept or
    // dropped) is within the budget
    val expected = docs.sortBy(_.seq).foldLeft((Set.empty[Long], Vector.empty[NdDoc])) {
      case ((keep, seen), d) =>
        val (sg, sh) = sigs(d.id)
        val isDup = seen.exists { e =>
          val (s2, sh2) = sigs(e.id)
          sh2 == sh && (if (sh) s2 == sg else ham(s2, sg) <= maxH)
        }
        (if (isDup) keep else keep + d.id, seen :+ d)
    }._1
    assert(expected == Set(1L, 3L, 5L, 7L), s"fixture sanity: got $expected")

    // streaming, split across micro-batches so collapse crosses batch state
    val in = MemoryStream[NdDoc]
    val out = graft.pipeline.Dedup.ingestNearDup(
      new MStream(in.toDF(), Seq("seq")), "id", "text", maxHamming = maxH)
    assert(out.df.isStreaming)
    drive(out.df) { emitted =>
      in.addData(NdDoc(1, t0, 1), NdDoc(2, t1, 2), NdDoc(3, t2, 3))
      in.addData(NdDoc(4, t0, 4), NdDoc(5, "", 5))
      in.addData(NdDoc(6, "", 6), NdDoc(7, "short", 7))
      val got = emitted().map(_.getLong(0)).toSet
      assert(got == expected,
        "survivors = docs with no earlier neighbor within the hamming budget")
    }

    // batch lowering of the SAME program agrees
    val b = graft.pipeline.Dedup.ingestNearDup(
      new MStream(docs.toDF(), Seq("seq")), "id", "text", maxHamming = maxH)
    assert(b.df.select("id").collect().map(_.getLong(0)).toSet == expected,
      "batch banded ingest matches the streaming survivors")
  }

  test("banded streaming ingest survives null-text rows (featureless class, no NPE)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[NdDoc]
    val out = graft.pipeline.Dedup.ingestNearDup(
      new MStream(in.toDF(), Seq("seq")), "id", "text", maxHamming = 4)
    drive(out.df) { emitted =>
      in.addData(NdDoc(1, null, 1), NdDoc(2, "real document text here padded out", 2))
      in.addData(NdDoc(3, null, 3)) // second null-text doc, later batch
      val got = emitted().map(_.getLong(0)).toSet
      assert(got == Set(1L, 2L),
        "null-text docs take the featureless class: first survives, later dup drops")
    }
  }

  test("banded batch drop rule equals the naive reference over randomized corpora") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val h = graft.functions.VectorFunctions.wordShingleHashes(col("text"), 3)
    val sigCol = when(size(h) >= 1,
      graft.functions.VectorFunctions.simhashBits(h, 63)).otherwise(xxhash64(col("text")))
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // small vocab + short docs force near/exact signature collisions
      val docs = (1L to 60L).map { i =>
        val n = 2 + rnd.nextInt(6) // 2..7 words; under 3 -> featureless path
        NdDoc(i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), i)
      }
      val maxH = 1 + rnd.nextInt(10)
      val sigs = docs.toDF().select(col("id"), sigCol.as("sig"), (size(h) < 1).as("short"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      val expected = docs.sortBy(_.seq).foldLeft((Set.empty[Long], Vector.empty[NdDoc])) {
        case ((keep, seen), d) =>
          val (sg, sh) = sigs(d.id)
          val isDup = seen.exists { e =>
            val (s2, sh2) = sigs(e.id)
            sh2 == sh && (if (sh) s2 == sg
                          else java.lang.Long.bitCount(s2 ^ sg) <= maxH)
          }
          (if (isDup) keep else keep + d.id, seen :+ d)
      }._1
      val got = graft.pipeline.Dedup.ingestNearDup(
          new MStream(docs.toDF(), Seq("seq")), "id", "text", maxHamming = maxH)
        .df.select("id").collect().map(_.getLong(0)).toSet
      assert(got == expected, s"seed=$seed maxH=$maxH: " +
        s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("banded batch ingest: a massive exact-duplicate group cannot explode the pair stage") {
    // 5000 identical docs + 2 distinct ones: the distinct-signature
    // collapse must reduce the pigeonhole band join to 3 signature rows
    // (naively the identical group alone would make ~12.5M pairs x 9
    // chunks); completion in bounded time + the exact survivor set is the
    // behavioral pin
    val big = (1L to 5000L).map(i => NdDoc(i, "the same exact document text repeated verbatim many times over", i)) ++
      Seq(NdDoc(6001L, "a completely different first document about streams", 6001L),
          NdDoc(6002L, "and another unrelated second one about state stores", 6002L))
    import spark.implicits._
    val out = graft.pipeline.Dedup.ingestNearDup(
      new MStream(big.toDF(), Seq("seq")), "id", "text", maxHamming = 8)
    val got = out.df.select("id").collect().map(_.getLong(0)).toSet
    assert(got.contains(1L) && !got.exists(i => i > 1L && i <= 5000L),
      "one survivor for the duplicate group — its first element")
    assert(got.size <= 3 && got.contains(1L),
      "survivors: the group rep plus distinct docs not within the budget of it")
  }

  test("banded batch ingest survives an uncollapsible fat bucket: distinct signatures, all pairwise close") {
    // the skew case the distinct-signature collapse CANNOT absorb: 1500
    // docs that all differ (distinct signatures) but are pairwise within a
    // few bits — pigeonhole buckets go fat and the sweep relies on AQE
    // skew-splitting of the hinted shuffled hash join. Completion in
    // bounded time + exact agreement with the naive quadratic fold is the
    // behavioral pin.
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again for testing purposes only just fine"
    val docs = (1L to 1500L).map { i =>
      // flip one word deterministically: texts are distinct, signatures
      // nearly identical
      NdDoc(i, base + " variant" + (i % 37), i)
    }
    val maxH = 8
    val h = graft.functions.VectorFunctions.wordShingleHashes(col("text"), 3)
    val sigCol = when(size(h) >= 1,
      graft.functions.VectorFunctions.simhashBits(h, 63)).otherwise(xxhash64(col("text")))
    val df = docs.toDF()
    val sigs = df.select(col("id"), sigCol.as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "earlier doc within budget" counts every prior doc, kept OR dropped
    val expected = docs.foldLeft((Set.empty[Long], Vector.empty[Long])) {
      case ((keep, seen), d) =>
        val isDup = seen.exists(s => java.lang.Long.bitCount(sigs(s) ^ sigs(d.id)) <= maxH)
        (if (isDup) keep else keep + d.id, seen :+ d.id)
    }._1
    val got = graft.pipeline.Dedup.ingestNearDup(
        new MStream(df, Seq("seq")), "id", "text", maxHamming = maxH)
      .df.select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"fat-bucket sweep must match the naive fold: missing=${expected -- got} extra=${got -- expected}")
  }

  test("banded state version guard: stale checkpoint fails with a migration message, current passes") {
    graft.pipeline.Dedup.requireBandedStateVersion(
      graft.pipeline.Dedup.BandedStateVersion) // current version is silent
    val e = intercept[IllegalStateException](
      graft.pipeline.Dedup.requireBandedStateVersion(
        graft.pipeline.Dedup.BandedStateVersion + 1))
    assert(e.getMessage.contains("checkpointLocation"),
      s"the error tells the operator what to do, got: ${e.getMessage}")
    assert(e.getMessage.contains("state format changed"))
  }

  test("banded ingest withinWatermark evicts bucket signatures past the horizon, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val tDup = "the quick brown fox jumps over the lazy dog again and again for testing purposes only"
    val tA = "a completely different first document about structured streaming state stores"
    val tB = "and yet another unrelated piece of text concerning watermark semantics entirely"
    val in = MemoryStream[NdTDoc]
    val out = graft.pipeline.Dedup.ingestNearDup(
      new MStream(in.toDF(), Seq("seq")).withWatermark("ts", "10 seconds"),
      "id", "text", maxHamming = 3, withinWatermark = true)
    assert(out.df.isStreaming)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val name = s"bw_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def ids() = { q.processAllAvailable(); spark.table(name).collect().map(_.getLong(0)).toSet }
      in.addData(NdTDoc(1, tDup, t(0), 1), NdTDoc(2, tDup, t(1), 2))
      assert(ids() == Set(1L), "in-horizon duplicate drops")
      // watermark after batch 1 = 1s - 10s: signature still live
      in.addData(NdTDoc(3, tDup, t(100), 3))
      assert(ids() == Set(1L), "duplicate within the horizon still drops " +
        "(and refreshes its signature's event time to 100s)")
      // advance the watermark to 190s via an unrelated doc: tDup's
      // signature (last seen 100s) is now past the horizon
      in.addData(NdTDoc(4, tA, t(200), 4))
      assert(ids() == Set(1L, 4L))
      in.addData(NdTDoc(5, tDup, t(300), 5))
      assert(ids() == Set(1L, 4L, 5L),
        "the evicted signature no longer suppresses a late re-arrival — " +
          "forever-state would have dropped doc 5")
      // retention vs eviction in ONE batch at watermark 990 (doc 6 below
      // advanced it): tA last seen 200s -> evicted -> its duplicate
      // survives; tB last seen 1000s -> retained -> its duplicate drops
      in.addData(NdTDoc(6, tB, t(1000), 6))
      assert(ids() == Set(1L, 4L, 5L, 6L))
      in.addData(NdTDoc(7, tA, t(1005), 7), NdTDoc(8, tB, t(1010), 8))
      assert(ids() == Set(1L, 4L, 5L, 6L, 7L),
        "horizon is per signature: stale tA re-emits, fresh tB still dedups")
      // bounded state: bucket rows track the live signatures (4 chunk
      // buckets per non-short signature at maxHamming=3), and a pruned
      // signature costs nothing on its bucket's next visit — state never
      // grows with the number of documents ever ingested
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3 * 4,
        s"bucket state bounded by live signatures x chunks, got $stateRows rows")
    } finally q.stop()
  }
}

case class NdDoc(id: Long, text: String, seq: Long)
case class NdTDoc(id: Long, text: String, ts: java.sql.Timestamp, seq: Long)
