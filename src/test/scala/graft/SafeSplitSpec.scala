package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Sampling}

/** Leakage-safe split (`Sampling.leakageSafeSplit`): near-dup clusters
  * never straddle the split, unpaired documents keep their plain
  * `assignSplit` band, and the assignment is partitioning-invariant. */
class SafeSplitSpec extends SparkSpec {
  import spark.implicits._

  // three near-identical docs (pairwise jaccard >= 0.8) + fresh docs
  private val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet grey town"
  private val docs = Seq(
    (1L, base), (2L, base + " x"), (3L, base + " y"),
    (10L, "completely different words appear in this sentence about nothing else"),
    (11L, "another standalone document with its own fresh content and phrasing"),
    (12L, "yet another unrelated piece of text that matches no other document"))

  private val bands = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1)

  private def split(parts: Int = 1): Map[Long, String] = {
    val df = docs.toDF("doc_id", "text").repartition(parts)
    val pairs = Dedup.minhashNearDup(df, "doc_id", "text", 16, 8, 0.8)
    Sampling.leakageSafeSplit(df, "doc_id", pairs, "id_a", "id_b",
        bands, salt = "s1")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("every member of a near-dup cluster lands in the same band") {
    val s = split()
    assert(Set(s(1L), s(2L), s(3L)).size == 1,
      s"cluster {1,2,3} straddles the split: $s")
  }

  test("unpaired documents keep their plain assignSplit band") {
    val s = split()
    val plain = Sampling.assignSplit(docs.toDF("doc_id", "text"),
        col("doc_id"), bands, salt = "s1")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (id <- Seq(10L, 11L, 12L))
      assert(s(id) == plain(id), s"unpaired doc $id moved bands")
  }

  test("assignment is invariant under input partitioning") {
    assert(split(1) == split(23))
    graft.api.Pinned.release(spark)
  }

  test("a corpus already carrying a cluster_id column passes through untouched") {
    val df = docs.toDF("doc_id", "text")
      .withColumn("cluster_id", concat(lit("user-"), col("doc_id")))
    val pairs = Dedup.minhashNearDup(df.drop("cluster_id"), "doc_id", "text", 16, 8, 0.8)
    val out = Sampling.leakageSafeSplit(df, "doc_id", pairs, "id_a", "id_b",
      bands, salt = "s1")
    assert(out.columns.count(_ == "cluster_id") == 1, "user column clobbered or dropped")
    val kept = out.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.forall { case (id, _) => kept(id) == s"user-$id" },
      s"user cluster_id values rewritten: $kept")
    // and the split itself is the same as without the user column
    val s = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s == split(), "user cluster_id column changed the assignment")
    graft.api.Pinned.release(spark)
  }

  test("non-long-castable pair ids fail by name instead of degenerating to a plain split") {
    import spark.implicits._
    val df = Seq(("docA", "t1"), ("docB", "t2")).toDF("doc_id", "text")
    val pairs = Seq(("docA", "docB")).toDF("id_a", "id_b")
    val e = intercept[Exception] {
      Sampling.leakageSafeSplit(df, "doc_id", pairs, "id_a", "id_b",
        bands, salt = "s1").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("not long-castable")),
      s"expected the named connectedComponents error, got: $e")
  }
}
