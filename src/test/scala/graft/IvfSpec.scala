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

  test("searchIngest: streaming probe equals the batch face, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val embs = clustered
    val centroids = Ivf.train(embs, "vec_id", "embedding", k = 3, iters = 3)
    val queryRows = (0 until 9).map { i =>
      val axis = i % 3
      val v = Array.fill(4)(0.01 * i)
      v(axis) = 10.0 + i * 0.005
      (100L + i, v.map(_.toFloat))
    }
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))

    val batch = Ivf.searchIngest(
      graft.api.MStream(queryRows.toDF("q_id", "embedding")), embs,
      "vec_id", "embedding", "q_id", centroids, topK = 3, nProbe = 2)
    assert(!batch.df.isStreaming)
    val b = batch.df.collect().map(key).toSet
    assert(b.nonEmpty && b.map(_._1).size == 9, "every query finds neighbors")

    val in = MemoryStream[(Long, Array[Float])]
    val out = Ivf.searchIngest(
      graft.api.MStream(in.toDF().toDF("q_id", "embedding")), embs,
      "vec_id", "embedding", "q_id", centroids, topK = 3, nProbe = 2)
    assert(out.df.isStreaming)
    val name = s"ivf_ing_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      queryRows.grouped(4).foreach(g => in.addData(g: _*))
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "streaming probe is stateless")
      assert(spark.table(name).collect().map(key).toSet == b,
        "streaming top-k, ranks, and rounded cosines equal the batch face")
    } finally q.stop()
    graft.api.Pinned.release(spark)
  }
}
