package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Distributed connected components (large-star/small-star) vs a
  * sequential union-find over the same edges — random graphs, worst-case
  * chains (max rounds), cliques, and empties. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)], clue: String): Unit = {
    val df = edges.toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(df, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges), clue)
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 40 + rnd.nextInt(40)
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
        (a, b)
      }.filter { case (a, b) => a != b }
      check(edges, s"trial $trial")
    }
  }

  test("long chain (worst case for label propagation) converges") {
    check((0L until 63L).map(i => (i, i + 1)), "64-node chain = one cluster")
  }

  test("chain ordered against the grain still finds the min root") {
    check((0L until 63L).map(i => (63L - i, 62L - i)), "reversed chain")
  }

  test("clique and disjoint pairs") {
    val clique = for (i <- 0L until 8L; j <- (i + 1) until 8L) yield (i, j)
    check(clique ++ Seq((100L, 101L), (200L, 201L)), "clique + islands")
  }

  test("deduplicateCorpus keeps one survivor per exact+near duplicate group") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),                         // representative (min id of its group)
      (2L, base),                         // exact dup of 1
      (3L, base + " extra"),              // near dup of 1/2 (chains via 1)
      (4L, "completely different words about spark catalyst tungsten codegen shuffles"),
      (5L, "short doc"),                  // < 3 words after dedup: no shingles
      (6L, "short doc")                   // exact dup of 5, caught by hash path
    ).toDF("doc_id", "text")
    val survivors = Dedup.deduplicateCorpus(docs, "doc_id", "text",
      k = 16, bands = 8, threshold = 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 4L, 5L), "transitive group {1,2,3} -> 1; {5,6} -> 5")
  }

  test("keep-best dedup elects with string ids and all-NULL-score clusters") {
    // round-10 advice: the election used -col(node) (numeric-only) and a
    // cluster whose score is NULL for every member elected a NULL best,
    // silently retaining the whole duplicate cluster. String ids (CC
    // itself requires long-castable ones) must elect without arithmetic
    // on the id, and all-NULL clusters must still dedup (min-id
    // survivor).
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      ("101", base, Some(1.0)), ("102", base, Some(5.0)), // 102 wins on score
      ("201", "completely different words about spark catalyst codegen", None),
      ("202", "completely different words about spark catalyst codegen",
        None: Option[Double])                             // all-NULL: 201 by min id
    ).toDF("doc_id", "text", "score")
    val survivors = Dedup.deduplicateCorpusKeepBest(docs, "doc_id", "text",
        k = 16, bands = 8, threshold = 0.8, scoreCol = col("score"))
      .collect().map(_.getString(0)).toSet
    assert(survivors == Set("102", "201"), survivors.toString)
  }

  test("iteration checkpoints are unpersisted (no BlockManager leak)") {
    // round-2 bench contamination: each CC round's localCheckpoint stayed
    // pinned for the session. After a run, only the (tiny) result
    // checkpoint may remain persisted.
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val out = Dedup.connectedComponents(
      (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b"), "id_a", "id_b")
    out.collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet.diff(before)
    // the chain forces several rounds; a leak would leave >= 2 RDDs per round
    assert(leaked.size <= 1, s"superseded checkpoints still persisted: $leaked")
  }

  test("empty pair set yields empty clusters") {
    val out = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b")
    assert(out.isEmpty)
    assert(out.columns.toSeq == Seq("node", "cluster_id"))
  }
}
