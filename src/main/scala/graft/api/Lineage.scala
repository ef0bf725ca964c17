package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Record lineage (Milan `LineageRecord`, `types/LineageRecord.scala`;
 * emitted by runtime operators to link output→input record ids). Spark
 * version: deterministic record ids derived from content + a helper to
 * emit a lineage side-channel from any operator that carries its input
 * ids through (the enrichment joins do — both sides ride along as
 * structs until `select`).
 */
object Lineage {

  /** Deterministic record id: 64-bit hash of the full record. The
    * reference uses fresh UUIDs; a content hash keeps runs reproducible
    * and needs no state. */
  def withRecordId(df: DataFrame, as: String = "record_id"): DataFrame =
    df.withColumn(as, xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)))

  /** Lineage pairs (output_id, input_id) from an output that kept input
    * id columns; write with `foreachBatch`/`write` as a side output. */
  def edges(out: DataFrame, outId: String, inputIds: Seq[String]): DataFrame =
    out.select(explode(array(inputIds.map(i =>
        struct(col(outId).as("output_id"), col(i).as("input_id"))): _*)).as("e"))
      .select(col("e.output_id"), col("e.input_id"))
}
