package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Record lineage (Milan `LineageRecord`, `types/LineageRecord.scala`;
 * emitted by runtime operators to link output→input record ids, wired by
 * `ApplicationConfiguration.addLineageSink`,
 * `application/ApplicationConfiguration.scala:111`). Spark version:
 * deterministic record ids derived from content, helpers to emit edges,
 * and an opt-in session [[Recorder]] the operators consult — when a
 * configuration binds a lineage sink ([[App.Config.addLineageSink]]),
 * enrichment joins, as-of joins, and the running-aggregate scans
 * automatically expose a `record_id` output column and register their
 * (output_id → input_id) edge frames, which [[App.run]] drives to the
 * bound sink alongside the program outputs.
 */
object Lineage {

  /** Deterministic record id: 64-bit hash of the full record. The
    * reference uses fresh UUIDs; a content hash keeps runs reproducible
    * and needs no state (identical records share an id — lineage then
    * links classes of identical records, documented deviation). */
  def withRecordId(df: DataFrame, as: String = "record_id"): DataFrame =
    df.withColumn(as, xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)))

  /** Lineage pairs (output_id, input_id) from an output that kept input
    * id columns; write with `foreachBatch`/`write` as a side output. */
  def edges(out: DataFrame, outId: String, inputIds: Seq[String]): DataFrame =
    out.select(explode(array(inputIds.map(i =>
        struct(col(outId).as("output_id"), col(i).as("input_id"))): _*)).as("e"))
      .select(col("e.output_id"), col("e.input_id"))

  /** Per-run edge collector. Operators register their edge frames here
    * when a recorder is active for their session; [[App.run]] unions and
    * writes them. Edge schema: (op string, output_id long, input_id long). */
  final class Recorder private[Lineage] () {
    private var frames = List.empty[DataFrame]
    private[graft] def add(edges: DataFrame): Unit =
      synchronized { frames ::= edges }
    /** All edges registered so far (empty frame when no operator ran). */
    def edgeFrames: Seq[DataFrame] = synchronized(frames.reverse)
    def allEdges(spark: SparkSession): DataFrame = {
      val fs = edgeFrames
      require(fs.forall(_.isStreaming) || fs.forall(!_.isStreaming),
        "a program mixing batch and streaming lineage-emitting operators " +
          "cannot union its edge frames; bind sinks per mode instead")
      if (fs.nonEmpty) fs.reduce(_ unionByName _)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("output_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("input_id", org.apache.spark.sql.types.LongType))))
    }
  }

  private val recorders =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Recorder]()

  /** Activate lineage recording for this session (idempotent). */
  def enable(spark: SparkSession): Recorder =
    recorders.computeIfAbsent(spark, _ => new Recorder)

  def current(spark: SparkSession): Option[Recorder] = Option(recorders.get(spark))

  def disable(spark: SparkSession): Unit = recorders.remove(spark)

  /** Operator-side helper: append `record_id` (content hash of the listed
    * output columns) and register one edge per non-null input id column.
    * `inputIds` are (expression, nullable-guard) pairs. */
  private[graft] def record(rec: Recorder, op: String, out: DataFrame,
                            idCols: Seq[org.apache.spark.sql.Column],
                            inputIds: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val withId = out.withColumn("record_id", xxhash64(struct(idCols: _*)))
    val e = withId.select(col("record_id").as("output_id"),
        explode(array(inputIds: _*)).as("input_id"))
      .filter(col("input_id").isNotNull)
      .select(lit(op).as("op"), col("output_id"), col("input_id"))
    rec.add(e)
    withId
  }
}
