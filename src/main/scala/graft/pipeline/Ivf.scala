package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) index for approximate nearest neighbor: k-means
 * cells trained with Lloyd's iterations, search probes only the nProbe
 * nearest cells. Everything is DataFrame ops — assignment is a broadcast
 * join + min_by, centroid update is posexplode/avg/collect — so training
 * scales with the corpus and never collects vectors to the driver.
 *
 * The scale story vs the exact operators: brute force scans corpus×queries;
 * hyperplane LSH bounds candidates but with data-independent buckets; IVF
 * adapts cells to the data distribution. Recall depends on nProbe.
 */
object Ivf {

  /** Train `k` centroids. Initialization is deterministic (the k lowest
    * ids) so results are reproducible across engines and runs. Centroids
    * are k×dim — small by definition — so they live as driver-side state
    * between iterations (no cache churn, one broadcast per assignment),
    * exactly how production IVF trainers treat the codebook; the corpus
    * itself never leaves the executors. */
  def train(embs: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val pts = embs.select(col(idCol).as("__pid"), col(vecCol).cast("array<double>").as("__pv"))
    var cent: Seq[(Int, Seq[Double])] = pts.orderBy("__pid").limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    def cdf = cent.toDF("cid", "cv").select(col("cid"), col("cv").cast("array<double>").as("cv"))
    var i = 0
    while (i < iters) {
      cent = assign(pts, cdf).join(pts, "__pid")
        .select(col("cid"), posexplode(col("__pv")).as(Seq("__pos", "__x")))
        .groupBy("cid", "__pos").agg(avg("__x").as("__m"))
        .groupBy("cid").agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__ms"))
        .select(col("cid"), expr("transform(__ms, s -> s.__m)").as("cv"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
      i += 1
    }
    cdf
  }

  /** Assign each point to its nearest centroid (broadcast + min_by). */
  def assign(pts: DataFrame, centroids: DataFrame): DataFrame =
    pts.crossJoin(broadcast(centroids))
      .withColumn("__d", Similarity.dot(col("__pv"), col("__pv"))
        - lit(2.0) * Similarity.dot(col("__pv"), col("cv"))
        + Similarity.dot(col("cv"), col("cv")))
      .groupBy("__pid").agg(min_by(col("cid"), struct(col("__d"), col("cid"))).as("cid"))

  /**
   * ANN search: probe the `nProbe` nearest cells per query, exact cosine
   * top-k within the probed cells only. The corpus join is on the cell id
   * — candidates per query shrink by roughly k/nProbe versus brute force.
   */
  def search(embs: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             qIdCol: String, centroids: DataFrame, topK: Int, nProbe: Int): DataFrame = {
    val pts = embs.select(col(idCol).as("__pid"), col(vecCol).cast("array<double>").as("__pv"))
    val cells = assign(pts, centroids)
    val corpus = pts.join(cells, "__pid")

    val q = queries.select(col(qIdCol).as("__qid"), col(vecCol).cast("array<double>").as("__qv"))
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("__d", Similarity.dot(col("__qv"), col("__qv"))
        - lit(2.0) * Similarity.dot(col("__qv"), col("cv"))
        + Similarity.dot(col("cv"), col("cv")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__qid")
          .orderBy(col("__d"), col("cid"))))
      .filter(col("__rn") <= nProbe)
      .select(col("__qid"), col("__qv"), col("cid"))

    val scored = qCells.join(corpus, "cid")
      .filter(col("__pid") =!= col("__qid"))
      .withColumn("cos", Similarity.cosine(col("__qv"), col("__pv")))
    scored.withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__qid")
          .orderBy(col("cos").desc, col("__pid"))))
      .filter(col("__rk") <= topK)
      .select(col("__qid").as(qIdCol), col("__pid").as(idCol),
        round(col("cos"), 6).as("cos"), col("__rk").as("rn"))
  }
}
