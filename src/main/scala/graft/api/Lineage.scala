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
  final class Recorder private[Lineage] (
      private[Lineage] val session: SparkSession) {
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

  private val scope = new ThreadLocal[Option[Recorder]] {
    override def initialValue(): Option[Recorder] = None
  }

  /** Activate a FRESH recorder for the duration of `body` on this thread.
    * Program construction happens synchronously inside [[App.run]], so
    * thread scoping isolates concurrent runs sharing one session — a
    * session-keyed registry would union both runs' edge frames into
    * whichever sink finishes binding first, and the first run's teardown
    * would disable recording mid-build for the other. Scopes nest
    * (restore-previous), so a program that itself calls App.run records
    * each layer separately. */
  private[graft] def scoped[T](spark: SparkSession)(body: Recorder => T): T = {
    val rec = new Recorder(spark)
    val prev = scope.get()
    scope.set(Some(rec))
    try body(rec) finally scope.set(prev)
  }

  /** The recorder active for the current run, if any (operators consult
    * this at stream-construction time). Filtered by session: a stream
    * built against a DIFFERENT session inside a scoped run must not
    * register its edges into this run's recorder. */
  def current(spark: SparkSession): Option[Recorder] =
    scope.get().filter(_.session eq spark)

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

  /** Operator-side helper for AGGREGATING ops (group/window select), where
    * the output row has collapsed its inputs: the record id is the GROUP
    * identity hash (key/window columns — a documented deviation from the
    * full-record hash, since the aggregate values derive from the very
    * inputs the edges list), which lets the fan-in edges project from the
    * INPUT side alone — one stateless pass, no join back to the aggregate,
    * so the same emission works in streaming micro-batches (edges append
    * while the aggregate output runs in its own output mode). */
  private[graft] def recordFanIn(rec: Recorder, op: String, out: DataFrame,
                                 groupIdCols: Seq[org.apache.spark.sql.Column],
                                 input: DataFrame,
                                 inputGroupIdCols: Seq[org.apache.spark.sql.Column],
                                 inputIdCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val withId = out.withColumn("record_id", xxhash64(struct(groupIdCols: _*)))
    rec.add(input.select(
      lit(op).as("op"),
      xxhash64(struct(inputGroupIdCols: _*)).as("output_id"),
      xxhash64(struct(inputIdCols: _*)).as("input_id")))
    withId
  }
}
