package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/**
 * The shared hot-key triangle cover (`Dedup.saltedSelfJoin`) must be an
 * EXACT redistribution: for every call site (MinHash LSH bands, SimHash
 * pigeonhole chunks — SemDeDup cells are pinned by SemanticDedupSpec),
 * the pair set under a tiny cap equals the uncapped plain self-join's,
 * pair by pair. These are the two joins round 11's verdict flagged as the
 * last uncapped quadratic-task members of the banded-dedup family.
 */
class SaltedSelfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withCap[T](cap: String)(body: => T): T = {
    spark.conf.set("graft.dedup.bandCap", cap)
    try body finally spark.conf.unset("graft.dedup.bandCap")
  }

  test("saltedSelfJoin: exact pair cover on hot keys, long and string ids") {
    // key 0 holds 60 rows (hot under cap=7 -> s=9), key 1 holds 25
    // (hot -> s=4), key 2 holds 5 (not hot): mixed regime in one frame
    val rows = (0 until 90).map { i =>
      val key = if (i < 60) 0 else if (i < 85) 1 else 2
      (i.toLong, s"id_$i", key)
    }
    val df = rows.toDF("id", "sid", "key")
    def pairs(idCol: String, cap: Long): Set[(String, String)] =
      Dedup.saltedSelfJoin(df, "key", idCol, cap)
        .select(least(col(s"a.$idCol"), col(s"b.$idCol")).cast("string"),
          greatest(col(s"a.$idCol"), col(s"b.$idCol")).cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expectLong = rows.combinations(2).collect {
      case Seq(a, b) if a._3 == b._3 =>
        (math.min(a._1, b._1).toString, math.max(a._1, b._1).toString)
    }.toSet
    assert(pairs("id", cap = 1000000L) == expectLong, "plain join baseline")
    val capped = pairs("id", cap = 7L)
    assert(capped == expectLong, "triangle cover must generate the exact pair set")
    // string ids: salts come from xxhash64 of the string; order is lexicographic
    val expectStr = rows.combinations(2).collect {
      case Seq(a, b) if a._3 == b._3 =>
        if (a._2 < b._2) (a._2, b._2) else (b._2, a._2)
    }.toSet
    assert(pairs("sid", cap = 7L) == expectStr, "string-id cover exact")
    // no duplicates either: the cover generates each pair EXACTLY once
    val withDups = Dedup.saltedSelfJoin(df, "key", "id", 7L)
      .select(col("a.id"), col("b.id")).collect()
    assert(withDups.length == expectLong.size, "each pair generated exactly once")
  }

  test("lshCandidates: boilerplate-hot band redistributes with identical candidates") {
    // 70 identical docs (every band identical -> one hot band per band
    // index) + 20 distinct docs; cap=6 forces the cover on the hot bands
    val docs = ((0 until 70).map(i => (i.toLong, "shared boilerplate header terms of service apply to all pages")) ++
      (0 until 20).map(i => (200L + i, s"unique document number $i with its own words and content $i")))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", k = 12)
    def cands(cap: String): Set[(Long, Long)] = withCap(cap) {
      Dedup.lshCandidates(sig, "doc_id", k = 12, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val un = cands("1000000")
    val capped = cands("6")
    assert(un.nonEmpty && un.size >= 70 * 69 / 2, "hot band must pair all identical docs")
    assert(capped == un, "cover must not change the candidate set")
    // full pipeline: verified near-dup pairs also identical under the cap
    def verified(cap: String): Set[(Long, Long, Double)] = withCap(cap) {
      Dedup.minhashNearDup(docs, "doc_id", "text", k = 12, bands = 4, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(verified("6") == verified("1000000"), "verified pair set unchanged")
  }

  test("simhashPairs: hot pigeonhole chunk redistributes with identical pairs") {
    // near-identical docs share chunk values; 50 close variants force hot
    // chunks under cap=5
    val docs = ((0 until 50).map(i => (i.toLong, s"the quick brown fox jumps over the lazy dog again and again variant $i")) ++
      (0 until 15).map(i => (100L + i, s"completely different content cluster about topic $i and subject matter $i")))
      .toDF("doc_id", "text")
    def pairs(cap: String): Set[(Long, Long, Int)] = withCap(cap) {
      Dedup.simhashNearDup(docs, "doc_id", "text", bits = 32, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val un = pairs("1000000")
    val capped = pairs("5")
    assert(un.nonEmpty, "scenario must produce near-dup pairs")
    assert(capped == un, "pigeonhole cover must not change the pair set")
  }

  test("banded ingest (batch): hot chunk redistributes with identical survivors") {
    // NEAR-identical but DISTINCT docs sharing pigeonhole chunks: the
    // distinct-signature collapse cannot bound these (every signature is
    // distinct), so only the triangle cover keeps a hot chunk from going
    // quadratic in one task. Survivor sets must be identical — the pair
    // set is, and the min-rank election is orientation-free.
    val docs = ((0 until 60).map(i =>
        (i.toLong, s"the quick brown fox jumps over the lazy dog shared body text variant $i")) ++
      (0 until 15).map(i => (100L + i, s"entirely different subject matter number $i about topic $i")))
      .toDF("id", "text")
    def survivors(cap: String): Set[Long] = withCap(cap) {
      Dedup.ingestNearDup(new graft.api.MStream(docs, Seq("id")), "id", "text",
          maxHamming = 8)
        .df.select("id").collect().map(_.getLong(0)).toSet
    }
    val un = survivors("1000000")
    assert(un.size < 75, "scenario must actually collapse near-dups")
    assert(survivors("4") == un, "chunk cover must not change the survivor set")
  }

  test("hyperplaneNearDup: hot sign code redistributes with identical pairs") {
    import scala.util.Random
    // 50 near-parallel vectors share every table's code (the hot band);
    // 12 scattered vectors provide cold buckets
    val rnd = new Random(7)
    val vecs = ((0 until 50).map(i =>
        (i.toLong, Array(1.0f, 0.001f * i, 0.002f * i, 0.01f))) ++
      (0 until 12).map(i => (100L + i,
        Array.fill(4)(rnd.nextFloat() * 2f - 1f))))
      .toDF("vec_id", "embedding")
    def pairs(cap: String): Set[(Long, Long)] = withCap(cap) {
      Dedup.hyperplaneNearDup(vecs, "vec_id", "embedding",
          bits = 8, tables = 2, threshold = 0.9)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val un = pairs("1000000")
    assert(un.size >= 50 * 49 / 2, "parallel vectors must all pair")
    assert(pairs("5") == un, "code cover must not change the verified pair set")
  }

  test("bucketedNearDup: hot hyperplane bucket redistributes with identical pairs") {
    import scala.util.Random
    val rnd = new Random(11)
    val vecs = ((0 until 40).map(i =>
        (i.toLong, Array(1.0f, 0.001f * i, 0.002f * i, 0.01f))) ++
      (0 until 10).map(i => (100L + i,
        Array.fill(4)(rnd.nextFloat() * 2f - 1f))))
      .toDF("vec_id", "embedding")
    def pairs(cap: String): Set[(Long, Long, Double)] = withCap(cap) {
      graft.pipeline.Similarity.bucketedNearDup(vecs, "vec_id", "embedding",
          planes = 6, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val un = pairs("1000000")
    assert(un.nonEmpty, "scenario must produce near-dup pairs")
    assert(pairs("5") == un, "bucket cover must not change the pair set")
  }

  test("capped band join reuses ONE exchange for both sides (AQE-final plan)") {
    // The cover's two join sides are byte-identical subtrees BY DESIGN:
    // the orientation predicate references both sides in every conjunct so
    // no side-local filter can be pushed down and break the symmetry, and
    // the shuffle_hash hint keeps AQE from downgrading to broadcast (a
    // broadcast build side cannot reuse the probe's shuffle). Result: the
    // banded projection + window count + explode is planned, shuffled, and
    // materialized ONCE — the asymmetric lhs/rhs variant this replaced
    // planned up to 4 independent copies of the upstream and measured 2x
    // slower on q_minhash_dedup at sf0.1. Assert on the AQE-FINAL executed
    // plan: static explain of an adaptive plan shows neither reuse nor the
    // final join strategy.
    val docs = ((0 until 70).map(i => (i.toLong, "shared boilerplate header terms of service apply to all pages")) ++
      (0 until 20).map(i => (200L + i, s"unique document number $i with its own words and content $i")))
      .toDF("doc_id", "text")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withCap("6") {
      val sig = Dedup.minhashSignature(docs, "doc_id", "text", k = 12)
      val df = Dedup.lshCandidates(sig, "doc_id", k = 12, bands = 4)
      df.collect()
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      assert(p.contains("ReusedExchange"),
        s"both cover sides must read ONE materialized exchange:\n$p")
      assert(p.contains("ShuffledHashJoin"),
        s"the pair join must stay the hinted shuffled hash join:\n$p")
      assert("Scan parquet|LocalTableScan".r.findAllIn(p).size <= 1,
        s"the banded projection must be built once, not once per side:\n$p")
      // AQE-COALESCING pin: the pair shuffle carries only ids + 8-byte
      // keys, so a quadratic-BY-PAIRS stage looks tiny by bytes and the
      // coalescer would merge every bucket the cover just distributed
      // back into ONE task (observed: one 180s+ task at the 10x probe).
      // The explicit-width repartition has REPARTITION_BY_NUM origin,
      // which CoalesceShufflePartitions must not touch — assert both the
      // origin survived into the executed plan and, behaviorally, that
      // the join still reads the full configured width (AQE would have
      // coalesced this tiny exchange to 1 without the pin).
      assert(p.contains("REPARTITION_BY_NUM"),
        s"pair-join exchange must keep its explicit-width origin:\n$p")
      // plain collect does not descend into completed query stages — recurse
      def deepCollect(plan: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        plan.flatMap {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            q +: deepCollect(q.plan)
          case x => Seq(x)
        }
      val joinWidth = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          deepCollect(a.executedPlan).collectFirst {
            case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
              j.outputPartitioning.numPartitions
          }
        case _ => None
      }
      assert(joinWidth.contains(spark.sessionState.conf.numShufflePartitions),
        s"pair join must not be partition-coalesced below the pinned width, got $joinWidth")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("saltedCrossJoin: exact bipartite cover, mixed regimes") {
    // key 0: 40 left × 25 right (both sides hot under cap=7); key 1:
    // 3 left × 30 right (right-only hot); key 2: 5 × 4 (cold); key 3:
    // left-only (no pairs); key 4: right-only (no pairs)
    // key 5 shares RAW id values across the corpora — the composite
    // (side, id) uid must still generate those cross pairs (a plain
    // id-ordered predicate would silently drop the id-equal ones)
    val left = ((0 until 40).map(i => (i.toLong, 0)) ++
      (100 until 103).map(i => (i.toLong, 1)) ++
      (200 until 205).map(i => (i.toLong, 2)) ++
      (300 until 304).map(i => (i.toLong, 3)) ++
      (400 until 403).map(i => (i.toLong, 5))).toDF("id", "key")
    val right = ((1000 until 1025).map(i => (i.toLong, 0)) ++
      (1100 until 1130).map(i => (i.toLong, 1)) ++
      (1200 until 1204).map(i => (i.toLong, 2)) ++
      (1300 until 1302).map(i => (i.toLong, 4)) ++
      (400 until 403).map(i => (i.toLong, 5))).toDF("id", "key")
    def pairs(cap: Long): Seq[(Long, Long)] =
      Dedup.saltedCrossJoin(left, right, "key", "id", cap)
        .select(col("l_id"), col("r_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lrows = left.collect().map(r => (r.getLong(0), r.getInt(1)))
    val rrows = right.collect().map(r => (r.getLong(0), r.getInt(1)))
    val expect = (for { (l, kl) <- lrows; (r, kr) <- rrows if kl == kr }
      yield (l, r)).toSet
    val plain = pairs(1000000L)
    assert(plain.toSet == expect && plain.size == expect.size, "plain-join baseline")
    val capped = pairs(7L)
    assert(capped.toSet == expect, "bipartite cover must generate the exact cross pair set")
    assert(capped.size == expect.size, "each cross pair generated exactly once")
  }

  test("crossCorpusNearDup: boilerplate-hot band redistributes with identical pairs") {
    // 50 arriving + 45 reference docs all sharing the same boilerplate
    // (every band hot on both sides) + distinct docs on each side
    val newDocs = ((0 until 50).map(i => (i.toLong, "shared boilerplate header terms of service apply to all pages")) ++
      (0 until 10).map(i => (500L + i, s"fresh arrival number $i with its own words and content $i")))
      .toDF("doc_id", "text")
    val refDocs = ((0 until 45).map(i => (1000L + i, "shared boilerplate header terms of service apply to all pages")) ++
      (0 until 8).map(i => (2000L + i, s"reference document $i about another subject entirely $i")))
      .toDF("doc_id", "text")
    def pairs(cap: String): Set[(Long, Long, Double)] = withCap(cap) {
      Dedup.crossCorpusNearDup(newDocs, refDocs, "doc_id", "text",
          k = 12, bands = 4, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val un = pairs("1000000")
    assert(un.size >= 50 * 45, "hot band must pair every boilerplate arrival with every boilerplate ref")
    assert(pairs("5") == un, "bipartite cover must not change the verified pair set")
  }

  test("embeddingDedupAgainstCorpusIvf: shuffled face under tiny cap == broadcast face") {
    import scala.util.Random
    val rnd = new Random(3)
    // one dominant direction -> one hot IVF cell holding most vectors on
    // both sides; scattered vectors fill other cells
    val mk = (i: Int, base: Array[Float]) => (i.toLong, base)
    val hotDir = Array(1.0f, 0.02f, 0.01f, 0.0f)
    val vecs = ((0 until 40).map(i => mk(i, hotDir.map(x => x + 0.001f * i))) ++
      (0 until 12).map(i => mk(100 + i, Array.fill(4)(rnd.nextFloat() * 2f - 1f))))
      .toDF("vec_id", "embedding")
    val arrivals = vecs.where(col("vec_id") % 3 === 0)
    val ref = vecs.where(col("vec_id") % 3 =!= 0)
    val cents = graft.pipeline.Ivf.train(ref, "vec_id", "embedding", k = 3, iters = 2)
    def survivors(bcast: Boolean, cap: String): Set[Long] = {
      spark.conf.set("graft.semdedup.cellCap", cap)
      try Dedup.embeddingDedupAgainstCorpusIvf(
          graft.api.MStream(arrivals), ref, "vec_id", "embedding",
          threshold = 0.9, cents, nProbe = 3, broadcastRef = bcast)
        .df.select("vec_id").collect().map(_.getLong(0)).toSet
      finally spark.conf.unset("graft.semdedup.cellCap")
    }
    val viaBroadcast = survivors(bcast = true, cap = "1000000")
    assert(viaBroadcast.size < arrivals.count(), "scenario must drop some arrivals")
    assert(survivors(bcast = false, cap = "4") == viaBroadcast,
      "covered shuffled face must match the broadcast face")
  }

  test("streaming ingest vs hot-banded reference: salted pinned index, same survivors") {
    // the stream-static sibling of the bipartite cover: 60 reference docs
    // share every band (hot under cap=4) — the pinned index is salted at
    // pin time, arrivals replicate to all salts via the broadcast
    // hot-band table, and the survivor set must equal the batch face's
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val boiler = "shared boilerplate header terms of service apply to all pages"
    val ref = ((0 until 60).map(i => (1000L + i, boiler)) ++
      (0 until 8).map(i => (2000L + i, s"reference doc $i about topic $i entirely")))
      .toDF("doc_id", "text")
    val arriving = Seq(
      (1L, boiler),                                              // dup of the hot band -> dropped
      (2L, "a genuinely new document about something original"), // survives
      (3L, boiler),                                              // dropped
      (4L, "another fresh arrival with novel words and content"))// survives
    def batchFace(): Set[Long] = withCap("4") {
      Dedup.dedupAgainstCorpus(graft.api.MStream(arriving.toDF("doc_id", "text")),
          ref, "doc_id", "text", k = 12, bands = 4, threshold = 0.8)
        .df.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withCap("4") {
      val mem = MemoryStream[(Long, String)]
      val out = Dedup.dedupAgainstCorpus(
        graft.api.MStream(mem.toDF().toDF("doc_id", "text")), ref,
        "doc_id", "text", k = 12, bands = 4, threshold = 0.8, broadcastRef = false)
      val name = s"hotband_${System.nanoTime()}"
      val q = out.df.select("doc_id")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        arriving.grouped(2).foreach(batch => mem.addData(batch: _*))
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
          "the salted shuffled face stays stateless")
        assert(spark.table(name).collect().map(_.getLong(0)).toSet == batchFace(),
          "salted-index streaming face must equal the batch face")
      } finally q.stop()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      graft.api.Pinned.release(spark)
    }
  }

  test("streaming IVF faces vs hot cell: salted pinned corpus, same results") {
    // stream-static siblings of the hot-cell cover: one IVF cell holds
    // most of the reference/corpus vectors (hot under cellCap=4); the
    // pinned frame is salted at pin time and arrivals/queries replicate
    // via the broadcast hot-cell table. Results must equal the batch
    // faces exactly (top-k ranks included).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import scala.util.Random
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(19)
    val hotDir = Array(1.0f, 0.02f, 0.01f, 0.0f)
    val corpus = ((0 until 30).map(i => (i.toLong, hotDir.map(x => x + 0.001f * i))) ++
      (0 until 8).map(i => (100L + i, Array.fill(4)(rnd.nextFloat() * 2f - 1f))))
      .toDF("vec_id", "embedding")
    val cents = graft.pipeline.Ivf.train(corpus, "vec_id", "embedding", k = 3, iters = 2)
    val queryRows = (0 until 6).map(i =>
      (500L + i, hotDir.map(x => x + 0.0005f * i)))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("graft.semdedup.cellCap", "4")
    try {
      // searchIngest: streaming shuffled+salted == batch
      def skey(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
      val batchTopK = graft.pipeline.Ivf.searchIngest(
        graft.api.MStream(queryRows.toDF("q_id", "embedding")), corpus,
        "vec_id", "embedding", "q_id", cents, topK = 3, nProbe = 2)
        .df.collect().map(skey).toSet
      val qin = MemoryStream[(Long, Array[Float])]
      val sOut = graft.pipeline.Ivf.searchIngest(
        graft.api.MStream(qin.toDF().toDF("q_id", "embedding")), corpus,
        "vec_id", "embedding", "q_id", cents, topK = 3, nProbe = 2,
        broadcastCorpus = false)
      val n1 = s"hotcell_s_${System.nanoTime()}"
      val q1 = sOut.df.writeStream.format("memory").queryName(n1)
        .outputMode(OutputMode.Append()).start()
      try {
        queryRows.grouped(3).foreach(g => qin.addData(g: _*))
        q1.processAllAvailable()
        assert(spark.table(n1).collect().map(skey).toSet == batchTopK,
          "salted searchIngest must equal the batch face (ranks included)")
      } finally q1.stop()

      // embeddingDedupAgainstCorpusIvf: streaming shuffled+salted == batch
      val arrivals = (0 until 6).map(i => (700L + i,
        if (i % 2 == 0) hotDir.map(x => x + 0.0002f * i)          // near-dups -> dropped
        else Array.fill(4)(rnd.nextFloat() * 2f - 1f)))           // scattered -> survive
      val batchSurv = graft.pipeline.Dedup.embeddingDedupAgainstCorpusIvf(
        graft.api.MStream(arrivals.toDF("vec_id", "embedding")), corpus,
        "vec_id", "embedding", 0.95, cents, nProbe = 2, broadcastRef = false)
        .df.select("vec_id").collect().map(_.getLong(0)).toSet
      val ain = MemoryStream[(Long, Array[Float])]
      val dOut = graft.pipeline.Dedup.embeddingDedupAgainstCorpusIvf(
        graft.api.MStream(ain.toDF().toDF("vec_id", "embedding")), corpus,
        "vec_id", "embedding", 0.95, cents, nProbe = 2, broadcastRef = false)
      val n2 = s"hotcell_d_${System.nanoTime()}"
      val q2 = dOut.df.select("vec_id").writeStream.format("memory").queryName(n2)
        .outputMode(OutputMode.Append()).start()
      try {
        arrivals.grouped(2).foreach(g => ain.addData(g: _*))
        q2.processAllAvailable()
        assert(q2.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
          "the salted IVF ingest stays stateless")
        assert(spark.table(n2).collect().map(_.getLong(0)).toSet == batchSurv,
          "salted-index streaming survivors must equal the batch face")
      } finally q2.stop()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("graft.semdedup.cellCap")
      graft.api.Pinned.release(spark)
    }
  }

  test("cap=0: explicit escape is the PLAIN join — identical pairs, no cover machinery") {
    // For bounded corpora / trusted key entropy the cover's window count
    // is one extra full shuffle of the banded projection even when no key
    // is hot (steady-state BenchOne r13: 1.4-2.9x on the sf0.1 band-join
    // queries). cap=0 must (a) keep the exact pair set and (b) plan the
    // plain key-equal id-ordered join: no window count, no salt buckets.
    val docs = ((0 until 70).map(i => (i.toLong, "shared boilerplate header terms of service apply to all pages")) ++
      (0 until 20).map(i => (200L + i, s"unique document number $i with its own words and content $i")))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", k = 12)
    def cands(cap: String) = withCap(cap) {
      Dedup.lshCandidates(sig, "doc_id", k = 12, bands = 4)
    }
    val un = cands("1000000").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val escaped = cands("0")
    assert(escaped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == un,
      "cap=0 must produce the plain self-join's exact candidate set")
    val lp = escaped.queryExecution.optimizedPlan.toString
    assert(!lp.contains("window") && !lp.contains("Window") && !lp.contains("__bx"),
      s"cap=0 must skip the cover machinery (window count, salt buckets):\n$lp")
    // the covered plan DOES carry them — the assertion above is meaningful
    val lpCov = cands("6").queryExecution.optimizedPlan.toString
    assert(lpCov.contains("__bx"), "covered plan must carry the salt buckets")
    // bipartite face: same escape through saltedCrossJoin
    val left = (0 until 30).map(i => (i.toLong, i % 3)).toDF("id", "key")
    val right = (100 until 125).map(i => (i.toLong, i % 3)).toDF("id", "key")
    def cross(cap: Long) = Dedup.saltedCrossJoin(left, right, "key", "id", cap)
      .select(col("l_id"), col("r_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cross(0L) == cross(1000000L), "cap=0 cross join must keep the exact pair set")
    // SaltedIndex face: cellCap=0 search results equal the covered ones
    val hotDir = Array(1.0f, 0.02f, 0.01f, 0.0f)
    val corpus = (0 until 30).map(i => (i.toLong, hotDir.map(x => x + 0.001f * i)))
      .toDF("vec_id", "embedding")
    val cents = graft.pipeline.Ivf.train(corpus, "vec_id", "embedding", k = 2, iters = 1)
    val qs = (0 until 4).map(i => (500L + i, hotDir.map(x => x + 0.0005f * i)))
      .toDF("q_id", "embedding")
    def hits(cap: String): Set[String] = {
      spark.conf.set("graft.semdedup.cellCap", cap)
      try graft.pipeline.Ivf.search(corpus, qs, "vec_id", "embedding", "q_id",
          cents, topK = 3, nProbe = 1, broadcastQueries = false)
        .collect().map(_.toString).toSet
      finally { spark.conf.unset("graft.semdedup.cellCap"); graft.api.Pinned.release(spark) }
    }
    assert(hits("0") == hits("4"), "cellCap=0 salted-index escape must keep the exact top-k")
  }

  test("bandCap conf: named errors on malformed values, accepts beyond-int") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", k = 4)
    def run(): Unit =
      Dedup.lshCandidates(sig, "doc_id", k = 4, bands = 2).collect()
    withCap("10000000000")(run()) // > Int.MaxValue: legal since the cap is a Long
    val bad = intercept[IllegalArgumentException](withCap("not-a-number")(run()))
    assert(bad.getMessage.contains("graft.dedup.bandCap"))
    val neg = intercept[IllegalArgumentException](withCap("-3")(run()))
    assert(neg.getMessage.contains("graft.dedup.bandCap"))
  }
}
