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
}
