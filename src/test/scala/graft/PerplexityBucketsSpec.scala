package graft

import org.apache.spark.sql.Row
import graft.pipeline.TextOps

/** CCNet perplexity bucketing (`TextOps.perplexityBuckets`): equal-depth
  * per-language tiles over the LM score with a total-order tiebreak,
  * unscored documents in a NULL bucket that never disturbs the tiling. */
class PerplexityBucketsSpec extends SparkSpec {
  import spark.implicits._

  // ten scorable docs per language plus one sub-2-token doc; two
  // languages so the partitioning is exercised
  private def corpus: Seq[(Long, String, String)] = {
    val base = Seq(
      "the cat sat on the mat", "the cat sat on the rug",
      "the dog sat on the mat", "a dog ran over the hill",
      "the cat ran over the hill", "a cat sat on a mat",
      "the dog ran over a hill", "a dog sat on the rug",
      "the cat sat on a hill", "a dog ran on the mat")
    base.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") } ++
      base.zipWithIndex.map { case (t, i) => (100L + i, t + " encore", "fr") } :+
      (50L, "solo", "en") :+ (150L, "seul", "fr")
  }

  private def run(): Map[Long, Row] =
    TextOps.perplexityBuckets(corpus.toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("per-language tiles are equal-depth over scored docs only; unscored take NULL") {
    val rows = run()
    for (lang <- Seq("en", "fr")) {
      val scored = rows.values.filter(r =>
        r.getString(1) == lang && !r.isNullAt(r.fieldIndex("avg_logprob"))).toSeq
      assert(scored.size == 10)
      val counts = scored.groupBy(_.getInt(scored.head.fieldIndex("bucket")))
        .view.mapValues(_.size).toMap
      assert(counts == Map(1 -> 4, 2 -> 3, 3 -> 3), s"$lang tiles: $counts")
    }
    assert(rows(50L).isNullAt(rows(50L).fieldIndex("bucket")))
    assert(rows(150L).isNullAt(rows(150L).fieldIndex("bucket")))
  }

  test("bucket order follows (score desc, id) exactly") {
    val rows = run().values.filter(r =>
      r.getString(1) == "en" && !r.isNullAt(r.fieldIndex("avg_logprob"))).toSeq
    val ordered = rows.sortBy(r =>
      (-r.getDouble(r.fieldIndex("avg_logprob")), r.getLong(0)))
    val buckets = ordered.map(r => r.getInt(r.fieldIndex("bucket")))
    assert(buckets == buckets.sorted,
      s"tiles must be contiguous in the (score desc, id) order: $buckets")
    assert(buckets.head == 1 && buckets.last == 3)
  }

  test("closed-form tile formula equals the ntile window for every population shape") {
    // the distributed rewrite replaces ntile().over(partitionBy(lang))
    // with rank + the PRODUCTION closed form (TextOps.closedFormNtile —
    // not a test-local copy); pin it against Spark's own NTile for
    // every (population, buckets) shape incl. n < k, n % k == 0, n == 1
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (k <- Seq(2, 3, 4, 5, 7)) {
      val rows = for (n <- 1 to 25; r <- 1 to n) yield (n.toLong, r.toLong)
      val df = rows.toDF("__n", "__r")
      val bad = df
        .withColumn("__want", ntile(k).over(
          Window.partitionBy("__n").orderBy("__r")))
        .withColumn("__got", TextOps.closedFormNtile(k))
        .filter(col("__got") =!= col("__want"))
        .collect()
      assert(bad.isEmpty, s"k=$k mismatches: ${bad.take(5).mkString(", ")}")
    }
  }

  test("production tile expression matches the definitional tiling on random large shapes") {
    // the div/mod edge regions past the exhaustive n <= 25 grid (large n,
    // n < k, n % k == 0), driven through the PRODUCTION expression —
    // boundary ranks of every tile plus random interior ranks per shape
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(14)
    val shapes = Seq((10000L, 64), (9984L, 64), (63L, 64), (1L, 64), (10000L, 3)) ++
      Seq.fill(40)((1L + rnd.nextInt(10000).toLong, 1 + rnd.nextInt(64)))
    def defTile(n: Long, k: Long, r: Long): Long = {
      val big = n % k; val base = n / k
      if (r <= big * (base + 1)) (r - 1) / (base + 1) + 1
      else big + (r - 1 - big * (base + 1)) / base + 1
    }
    for ((n, k) <- shapes) {
      val bounds = (1L to k.toLong).flatMap { t =>
        val hi = math.min(n, t * (n / k) + math.min(t, n % k))
        Seq(hi, hi + 1)
      }.filter(r => r >= 1 && r <= n)
      val ranks = (bounds ++ Seq.fill(20)(1L + rnd.nextInt(n.toInt).toLong)).distinct
      val df = ranks.map(r => (n, r)).toDF("__n", "__r")
      val got = df.withColumn("__got", TextOps.closedFormNtile(k))
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
      ranks.foreach { r =>
        assert(got(r).toLong == defTile(n, k, r), s"n=$n k=$k r=$r")
      }
    }
  }

  test("assignment is invariant under input partitioning") {
    val df = corpus.toDF("doc_id", "text", "lang")
    val a = TextOps.perplexityBuckets(df.repartition(1), "doc_id", "text", "lang")
      .collect().map(r => r.toSeq.toList).toSet
    val b = TextOps.perplexityBuckets(df.repartition(17), "doc_id", "text", "lang")
      .collect().map(r => r.toSeq.toList).toSet
    assert(a == b)
  }
}
