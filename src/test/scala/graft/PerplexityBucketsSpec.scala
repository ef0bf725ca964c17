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
    // with rank + this closed form; pin it against Spark's own NTile for
    // every (population, buckets) shape incl. n < k, n % k == 0, n == 1
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    for (k <- Seq(2, 3, 4, 5, 7)) {
      val rows = for (n <- 1 to 25; r <- 1 to n) yield (n.toLong, r.toLong)
      val df = rows.toDF("__n", "__r")
      val formula = expr(
        s"""CASE WHEN __r <= (__n % $k) * ((__n div $k) + 1)
              THEN (__r - 1) div ((__n div $k) + 1) + 1
              ELSE (__n % $k)
                   + ((__r - 1 - (__n % $k) * ((__n div $k) + 1))
                      div (__n div $k)) + 1
            END""").cast("int")
      val bad = df
        .withColumn("__want", ntile(k).over(
          Window.partitionBy("__n").orderBy("__r")))
        .withColumn("__got", formula)
        .filter(col("__got") =!= col("__want"))
        .collect()
      assert(bad.isEmpty, s"k=$k mismatches: ${bad.take(5).mkString(", ")}")
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
