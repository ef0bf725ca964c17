package graft

import graft.plans.GraftExtensions

/** The native expressions are reachable from SQL after registration. */
class SqlFunctionSpec extends SparkSpec {

  test("registered graft_* functions evaluate from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_norm(array(3.0d, 4.0d)) AS n,
                graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
                graft_polyhash('ab') AS h,
                size(graft_shingle_hashes3('a b c d')) AS ns
      """).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
    assert(r.getLong(3) == ('a' * 31 + 'b').toLong)
    assert(r.getInt(4) == 2)
  }

  test("round-3 additions: char shingles, simhash, byte mean, thresholded jaccard") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT size(graft_char_shingle_hashes4('abcdef')) AS nc,
                graft_simhash32(array(1L, 3L)) AS sh,
                graft_byte_mean(cast('ab' AS BINARY)) AS bm,
                graft_jaccard_at_least(array(1L, 2L, 3L), array(2L, 3L, 4L), 0.5) AS ok,
                graft_jaccard_at_least(array(1L, 2L, 3L), array(7L, 8L, 9L), 0.5) AS cut
      """).collect().head
    assert(r.getInt(0) == 3)
    // bits 0 of 1 and 3 agree (set), bit 1 splits 1-vs-1 -> majority not > 0
    assert(r.getLong(1) == 1L)
    assert(math.abs(r.getDouble(2) - (('a' + 'b') / 2.0)) < 1e-9)
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    assert(r.getDouble(4) == -1.0, "disjoint sets abandon below threshold")
  }

  test("count-min sketch: ample width recovers exact counts; partitioning-invariant") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vf = graft.functions.VectorFunctions
    val words = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(9)("gamma") ++ Seq("delta")
    // heavy hitters at >= 1/10 of the 75 tokens: alpha, beta, gamma
    val docs = words.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
    val hh = graft.pipeline.TextOps
      .heavyHitters(docs, "text", depth = 4, width = 2048, minFracInv = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // 2048 buckets vs 4 distinct words: collisions impossible to matter
    // across ALL 4 rows, so estimates are exact and the set is exact
    assert(hh == Map("alpha" -> 40L, "beta" -> 25L, "gamma" -> 9L))
    // the SQL-registered aggregate agrees regardless of partitioning
    val toks = words.toDF("w").repartition(13)
      .select(vf.polyHashNative(col("w")).as("h"))
    toks.createOrReplaceTempView("cms_toks")
    val sk = spark.sql("SELECT graft_count_min(h) AS sk FROM cms_toks")
      .collect().head.getSeq[Long](0)
    val ref = graft.functions.CountMinUtil.reference(
      words.map(w => graft.functions.PolyHashUtil.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(w))), 4, 2048)
    assert(sk == ref.toSeq)
  }

  test("count-min accepts arbitrary bigint hashes (negative xxhash64 included)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vf = graft.functions.VectorFunctions
    // xxhash64 values span the full signed-64 range; a signed % would
    // produce a negative bucket and crash the aggregate's array update
    val words = Seq.fill(12)("alpha") ++ Seq.fill(5)("beta") ++ Seq("gamma")
    val toks = words.toDF("w").select(xxhash64(col("w")).as("h"))
    val hs = toks.collect().map(_.getLong(0)).toSeq
    assert(hs.exists(_ < 0L), "test premise: at least one negative hash")
    val sk = toks.agg(vf.countMin(col("h"), 4, 64).as("sk"))
    val est = sk.select(
        vf.countMinEstimate(col("sk"), lit(hs.head), 4, 64).as("e"),
        col("sk"))
      .collect().head
    assert(est.getLong(0) >= 12L, "estimate is an upper bound on the true count")
    assert(est.getSeq[Long](1) ==
      graft.functions.CountMinUtil.reference(hs, 4, 64).toSeq,
      "aggregate and Scala reference must bucket identically for raw hashes")
  }

  test("round-4 addition: graft_vec_sum aggregates elementwise from SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((0, Seq(1.0, 2.0)), (0, Seq(3.0, 4.0)), (1, Seq(5.0, 6.0)))
      .toDF("g", "v").createOrReplaceTempView("vecs")
    val rows = spark.sql(
      "SELECT g, graft_vec_sum(v) AS s FROM vecs GROUP BY g ORDER BY g")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(rows.toSeq == Seq((0, Seq(4.0, 6.0)), (1, Seq(5.0, 6.0))))
  }
}
