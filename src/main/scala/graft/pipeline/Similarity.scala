package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (`array<float>`), built from
 * Catalyst higher-order functions (`zip_with`/`aggregate`) — codegen'd dot
 * products, no UDFs.
 */
object Similarity {

  /** Dot product of two array<double> columns: a native codegen'd Catalyst
    * expression (`graft.functions.DotProduct`) — the higher-order-function
    * formulation interprets lambdas per element, ~200× slower in the
    * quadratic stages. Sequential left-to-right fold either way, so the fp
    * result is deterministic and engine-portable. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dotNative(a, b)

  def norm(a: Column): Column = graft.functions.VectorFunctions.normNative(a)

  /** Cosine via `try_divide`: a zero-norm vector (e.g. an all-zero
    * embedding from a failed encoder) has no defined cosine — the plain
    * division would THROW under Spark's default ANSI mode and kill the
    * job at scale. Null cosine then fails every `>= threshold` gate and
    * is excluded from every top-k ranking (both the bounded-heap and
    * window faces filter it), so zero-norm vectors match nothing. */
  def cosine(a: Column, b: Column): Column = try_divide(dot(a, b), norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: every query scans the corpus once. The query
   * set is broadcast (small side), so the corpus never shuffles for the
   * scan; ranking shuffles (query_id, cos) pairs only. Exact baseline for
   * the bucketed variant below.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, qIdCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__e"))
    val q = queries.select(col(qIdCol), col(vecCol).cast("array<double>").as("__qe"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos", cosine(col("__qe"), col("__e")))
      .filter(col("cos").isNotNull) // zero-norm: match the heap face, which skips null scores
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qIdCol), col(idCol), round(col("cos"), 6).as("cos"), col("rn"))
  }

  /** `bruteForceTopK` with partial (map-side) top-k aggregation — same
    * results, shuffle bounded to queries × k rows instead of
    * queries × corpus: the difference between a merge of k-element heaps
    * and an N-row sort per query at 100 TB. The bounding runs as a native
    * aggregate (`functions.BoundedTopK`), so the scan + cosine projection
    * stays in whole-stage codegen with no typed-object barrier. */
  def bruteForceTopKPartial(corpus: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String, qIdCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__e"))
    val q = queries.select(col(qIdCol), col(vecCol).cast("array<double>").as("__qe"))
    c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol).cast("long").as("__id"),
        cosine(col("__qe"), col("__e")).as("__cos"))
      .groupBy(col(qIdCol))
      .agg(graft.functions.VectorFunctions.topKByScore(col("__id"), col("__cos"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")))
      .select(col(qIdCol), col("col.id").as(idCol),
        round(col("col.cos"), 6).as("cos"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Johnson–Lindenstrauss random projection of the embedding column to
    * `outDim` dims (Achlioptas-style dense bounded family — the seeded
    * portable hyperplanes, so both the projection matrix and every output
    * element are engine-reproducible): the standard dimensionality
    * reduction before ANN indexing or k-means when the native dimension
    * makes distance arithmetic the bottleneck. A codegen'd zero-shuffle
    * projection (`functions.JlProject`), dual-mode by construction; all
    * original columns pass through, `as` carries the projected vector. */
  def randomProject(embs: DataFrame, vecCol: String, outDim: Int,
                    seed: Int = 0, as: String = "projected"): DataFrame =
    embs.withColumn(as, graft.functions.VectorFunctions.jlProject(
      col(vecCol).cast("array<double>"), outDim, seed))

  /**
   * Random-hyperplane LSH bucket key: `planes` sign bits from deterministic
   * pseudo-random hyperplanes (hash-seeded, so any engine reproduces them).
   * The scale path for ANN / near-dup: bucket, then compare within buckets
   * only. Recall depends on the angle distribution — the exact operators
   * above are the correctness baseline.
   */
  def hyperplaneBuckets(embs: DataFrame, idCol: String, vecCol: String,
                        planes: Int, seed: Long = 42L): DataFrame = {
    val e = col(vecCol).cast("array<double>")
    // plane p, dim i weight: portable pseudo-random in [-1, 1)
    def weight(p: Int, i: Column): Column =
      (pmod((i + lit(p * 7919L + seed)) * 2654435761L, lit(1000003L)).cast("double") / 500001.5d) - 1.0d
    val bits = (0 until planes).map { p =>
      val proj = aggregate(zip_with(e, sequence(lit(0L), size(e).cast("long") - 1),
        (x, i) => x * weight(p, i)), lit(0.0d), (s, x) => s + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    embs.select(col(idCol), col(vecCol), bits.reduce(_ + _).as("bucket"))
  }

  /** Per-group embedding statistics — the corpus-report operator an
    * embedding pipeline runs per shard/label/source: vector count,
    * centroid L2 norm, and mean vector norm. ONE scan, one shuffle of one
    * dim-length array + two scalars per group: the centroid accumulates
    * through the `VectorSum` aggregate (map-side partial sums — a
    * posexplode formulation would shuffle rows × dim), the mean norm
    * through a codegen'd `NormL2`. */
  def embeddingStats(embs: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    embs.select(col(groupCol), v.as("__v"))
      .groupBy(col(groupCol))
      // count(__v), not count(*): null vectors are skipped by BOTH the
      // VectorSum accumulation and avg(norm), so the centroid divisor and
      // the reported count must use the same (non-null) population
      .agg(count(col("__v")).as("n_vecs"),
        graft.functions.VectorFunctions.vectorSum(col("__v")).as("__s"),
        avg(norm(col("__v"))).as("__an"))
      .select(col(groupCol), col("n_vecs"),
        round(norm(transform(col("__s"), x => x / col("n_vecs"))), 4).as("centroid_norm"),
        round(col("__an"), 4).as("mean_norm"))
  }

  /** Bucketed ANN: exact cosine within hyperplane buckets — sub-quadratic
    * candidate generation, shuffle on the bucket key only. */
  def bucketedNearDup(embs: DataFrame, idCol: String, vecCol: String,
                      planes: Int, threshold: Double): DataFrame = {
    val b = hyperplaneBuckets(embs, idCol, vecCol, planes)
      .select(col(idCol), col(vecCol).cast("array<double>").as("__e"), col("bucket"))
    // the bucket self-join rides the shared triangle cover
    // ([[Dedup.saltedSelfJoin]]): a hot sign bucket (zero vectors, one
    // dominant direction) redistributes over bounded tasks under
    // `graft.dedup.bandCap`; cosine is symmetric, so least/greatest
    // canonicalization under the cover's arbitrary orientation is safe
    val cap = Dedup.capConf(embs.sparkSession, "graft.dedup.bandCap", 8192L)
    Dedup.saltedSelfJoin(b, "bucket", idCol, cap, hint = Some("shuffle_hash"))
      .withColumn("cos", cosine(col("a.__e"), col("b.__e")))
      .filter(col("cos") >= threshold)
      .select(least(col(s"a.$idCol"), col(s"b.$idCol")).as("id_a"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("id_b"),
        round(col("cos"), 6).as("cos"))
  }
}
