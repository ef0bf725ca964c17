package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Scalar (int8) quantization of an embedding column — the storage-
 * compression face of the ANN stack (IVF routes, PQ sub-codes, SQ8
 * whole-vector codes; FAISS's `SQ8` / Milvus's `IVF_SQ8` are the
 * production shape). 8× smaller vectors with one affine map per element;
 * recall loss is bounded by half a quantization step per dimension.
 *
 * Scale posture: training is ONE partial-aggregated scan through the
 * `VectorExtreme` native aggregates (each partition ships two dim-length
 * arrays — never a rows × dim explode), the stats artifact is
 * driver-sized and capped like the IVF codebook, and encode/decode are
 * zero-shuffle codegen'd projections whose generated-method size is
 * constant in the dimension (the ranges ride as one reference object).
 */
object Sq {
  /** The one driver-sized artifact: dims are bounded like IVF cells. */
  val MaxDims = 65536

  private def vecMin(c: Column): Column = ColumnBridge.column(
    graft.functions.VectorExtreme(ColumnBridge.expr(c), max = false)
      .toAggregateExpression())
  private def vecMax(c: Column): Column = ColumnBridge.column(
    graft.functions.VectorExtreme(ColumnBridge.expr(c), max = true)
      .toAggregateExpression())

  /** Train: per-dimension [lo, hi] over the corpus as a (dim, lo, hi)
    * frame — the shippable stats artifact (bind it as a document input
    * like an IVF codebook). One aggregation job, no explode. */
  def sq8Train(embs: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    embs.agg(vecMin(v).as("__lo"), vecMax(v).as("__hi"))
      .select(posexplode(arrays_zip(col("__lo"), col("__hi"))).as(Seq("dim", "z")))
      .select(col("dim").cast("long").as("dim"),
        col("z.__lo").as("lo"), col("z.__hi").as("hi"))
  }

  /** Collect a `sq8Train` frame into the pinned (lo, hi) arrays —
    * capped driver artifact ([[MaxDims]]), dims contiguous from 0. */
  def collectStats(stats: DataFrame): (Seq[Double], Seq[Double]) = {
    // cast up front so a user-bound artifact with INT dims or FLOAT
    // bounds gets the named contract errors, not a ClassCastException
    val probe = stats.select(col("dim").cast("long").as("dim"),
        col("lo").cast("double").as("lo"), col("hi").cast("double").as("hi"))
      .orderBy(col("dim")).limit(MaxDims + 1).collect()
    require(probe.length <= MaxDims,
      s"sq8 stats artifact exceeds MaxDims=$MaxDims dimensions " +
        "(scalar quantization's stats are a driver-sized artifact by contract)")
    require(probe.nonEmpty, "sq8 stats artifact is empty")
    probe.zipWithIndex.foreach { case (r, i) =>
      require(r.getLong(0) == i.toLong,
        s"sq8 stats artifact must have contiguous dims from 0, found ${r.getLong(0)} at $i")
    }
    (probe.map(_.getDouble(1)).toSeq, probe.map(_.getDouble(2)).toSeq)
  }

  /** Encode the vector column to int8 codes under pinned stats — a
    * zero-shuffle codegen'd projection; all original columns pass
    * through, `as` carries the code array. */
  def sq8Encode(embs: DataFrame, vecCol: String, lo: Seq[Double],
                hi: Seq[Double], as: String = "codes"): DataFrame =
    embs.withColumn(as, ColumnBridge.column(graft.functions.Sq8Encode(
      ColumnBridge.expr(col(vecCol).cast("array<double>")), lo, hi)))

  /** Midpoint reconstruction of a code column (approximate distance
    * arithmetic on compressed vectors). */
  def sq8Decode(codes: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    ColumnBridge.column(graft.functions.Sq8Decode(
      ColumnBridge.expr(codes), lo, hi))
}
