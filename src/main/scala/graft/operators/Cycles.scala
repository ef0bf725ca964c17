package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType
import graft.api.{App, MStream}

/**
 * Milan `beginCycle`/`closeCycle` (`lang/CycleStream.scala:22`,
 * `program/StreamExpressions.scala:141`) models feedback edges; Flink
 * lowers them to `DataStream.iterate`. Structured Streaming has no
 * iterative streaming — the reference's own docs recommend routing
 * feedback through an external sink→source when cycles can't be used
 * (`bodaboda/BodaApp.scala:62-66`), which works unchanged here (write the
 * feedback stream to a sink, read it back as a source).
 *
 * For batch programs the equivalent is driver-side fixpoint iteration,
 * provided here: apply `step` until `maxIterations` or until the output
 * row count stabilizes (a cheap fixpoint witness that never collects rows
 * to the driver).
 */
object Cycles {

  /** Does the schema contain a MapType anywhere? `xxhash64` rejects maps
    * (unordered entries have no canonical hash), so such frames degrade to
    * the count-only witness (and emit no cycle lineage edges). */
  private[graft] def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: StructType => s.exists(f => hasMap(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
    case _ => false
  }

  /** Eager checkpoint with a (row count, xor-of-row-hashes) SET
    * fingerprint riding the checkpoint job as observed metrics (one job
    * per round, not two) — the same convergence witness
    * `Dedup.connectedComponents` uses (`checkpointTracked`). Count alone
    * is a sound witness only for monotone set growth (the Program cycle
    * lowering's H = distinct(input ∪ F(H)) shape, where equal count ⟺
    * equal set); [[iterate]] is a public API, and a caller's non-monotone
    * step that changes rows while preserving count must not falsely
    * converge — the xor fingerprint catches exactly that (collision odds
    * 2⁻⁶⁴ per comparison; xor, not sum: overflow-free under ANSI).
    * Returns the pinned frame, the RDD ids it persisted (for later
    * release — exact capture off the checkpoint's own plan node,
    * `Pinned.idsOf`, so concurrent builds on one session cannot claim
    * each other's blocks), and the fingerprint. Frames with map-typed
    * columns (unhashable) degrade to (count, 0) — i.e. the old
    * count-stable witness. */
  private def checkpointCounted(df: DataFrame): (DataFrame, Set[Int], (Long, Long)) = {
    import org.apache.spark.sql.functions.{bit_xor, coalesce, col, count, lit, xxhash64}
    val obs = org.apache.spark.sql.Observation()
    val rowHash =
      if (df.schema.exists(f => hasMap(f.dataType))) lit(0L)
      else xxhash64(df.columns.toIndexedSeq.map(col): _*)
    val observed = df.observe(obs, count(lit(1)).as("__n"),
      coalesce(bit_xor(rowHash), lit(0L)).as("__x"))
    val cp = observed.localCheckpoint()
    val m = obs.get
    (cp, graft.api.Pinned.idsOf(cp),
      (m("__n").asInstanceOf[Long], m("__x").asInstanceOf[Long]))
  }

  private def release(sc: org.apache.spark.SparkContext, ids: Set[Int]): Unit =
    graft.api.Pinned.unpersist(sc, ids)

  /** Round-granularity lineage for cycle fixpoints (active when the run
    * bound a lineage sink — milan emits lineage from every runtime op,
    * `types/LineageRecord.scala`; a generic `step` cannot be inverted
    * row-for-row, so rounds are the honest derivation unit, the same
    * group-identity deviation `Lineage.recordFanIn` documents for
    * aggregates). Two edge families per productive round r:
    *   `cycleRound:<name>` — round-group id ← each row of the frontier
    *     the step consumed (fan-in, bounded by frontier size);
    *   `cycle:<name>` — each row NEW in round r ← the round-group id.
    * Record ids are content hashes, so a frontier row's id equals the id
    * under which an earlier round (or the upstream operator that built
    * the seed) emitted it — the rounds chain into a DAG from every output
    * row back to the seed records with no extra bookkeeping. */
  private final class CycleLineage(rec: graft.api.Lineage.Recorder,
                                   name: String) {
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    private val tag = if (name.nonEmpty) name else "cycle"
    private def rowId(d: DataFrame) =
      xxhash64(d.columns.toIndexedSeq.map(col): _*)
    private def groupId(round: Int) = xxhash64(lit(s"cycle:$tag"), lit(round))
    /** `frontier` = the frame the step consumed; `fresh` = the rows first
      * derived this round. Both are read lazily when the lineage sink
      * writes — their checkpoints must stay alive until then (the caller
      * registers them with Pinned instead of releasing). */
    def round(r: Int, frontier: DataFrame, fresh: DataFrame): Unit = {
      rec.add(frontier.select(lit(s"cycleRound:$tag").as("op"),
        groupId(r).as("output_id"), rowId(frontier).as("input_id")))
      rec.add(fresh.select(lit(s"cycle:$tag").as("op"),
        rowId(fresh).as("output_id"), groupId(r).as("input_id")))
    }
  }

  private def lineageFor(initial: MStream): Option[CycleLineage] =
    graft.api.Lineage.current(initial.df.sparkSession)
      .filter(_ => !initial.df.schema.exists(f => hasMap(f.dataType)))
      .map(new CycleLineage(_, initial.name))

  /** Iterate a batch dataflow to a fixpoint: apply `step` until the
    * (count, xor-hash) fingerprint of consecutive rounds is equal, or
    * `maxIterations`. Each round's result is localCheckpoint()ed so
    * lineage doesn't grow unboundedly (the classic iterative-Spark
    * hazard); the fingerprint rides the checkpoint job as observed
    * metrics, and each round's blocks are unpersisted once its successor
    * is materialized — the same supersede-and-release discipline as
    * `Dedup.connectedComponents`. The FINAL round's checkpoint stays
    * persisted: the returned plan reads it.
    *
    * When the run records lineage, per-round edges emit (see
    * [[CycleLineage]]); the edge frames read the per-round checkpoints
    * lazily, so superseded rounds are then REGISTERED with `Pinned`
    * (released after the run's lineage sink writes) instead of freed
    * eagerly — recording a naive fixpoint holds all rounds' frames.
    *
    * `graft.cycle.checkpointCadence` (session conf, default 1): eagerly
    * checkpoint only every Nth round; the rounds between compute their
    * convergence fingerprint with a plain aggregate job over the
    * unmaterialized plan, whose (bounded, <= N-step) lineage the next
    * checkpointed round re-executes. Trades ~(N+1)/2-fold step re-work
    * for N-fold fewer block writes — CycleBench measured cadence 2 as a
    * LOSS in both its regimes (the persist is cheaper than re-running a
    * round's shuffle), so the default stays 1; the knob remains for
    * bodies whose step is cheaper than their output materialization. */
  def iterate(initial: MStream, maxIterations: Int,
              checkpoint: Boolean = true)(step: MStream => MStream): MStream = {
    import org.apache.spark.sql.functions.{bit_xor, coalesce, col, count, lit, xxhash64}
    val spark = initial.df.sparkSession
    val sc = spark.sparkContext
    val lin = lineageFor(initial)
    val cadenceConf = spark.conf.get("graft.cycle.checkpointCadence", "1").toInt
    require(cadenceConf >= 1,
      s"graft.cycle.checkpointCadence must be >= 1, got $cadenceConf")
    // with lineage recording, every round's edge frame must read a
    // MATERIALIZED round: at cadence > 1 the uncheckpointed rounds' edge
    // frames would be plans over the previous checkpoint, so the lineage
    // sink write would re-execute up to cadence-1 step()s per round — and
    // record step's RE-COMPUTED output (divergent edges if step is
    // nondeterministic). Force cadence 1 when recording.
    val cadence = if (lin.isDefined) 1 else cadenceConf
    var current = initial
    var prevIds = Set.empty[Int]
    var last: (Long, Long) = (-1L, 0L)
    var i = 0
    while (i < maxIterations) {
      val next = step(current)
      val (df, ids, fp): (DataFrame, Set[Int], (Long, Long)) =
        if (checkpoint && (i + 1) % cadence == 0) checkpointCounted(next.df)
        else {
          val d = next.df
          val rowHash =
            if (d.schema.exists(f => hasMap(f.dataType))) lit(0L)
            else xxhash64(d.columns.toIndexedSeq.map(col): _*)
          val r = d.agg(count(lit(1)).as("__n"),
            coalesce(bit_xor(rowHash), lit(0L)).as("__x")).head()
          (d, Set.empty[Int], (r.getLong(0), r.getLong(1)))
        }
      // a converged (fingerprint-equal) round derived nothing: no edges
      if (fp != last) lin.foreach(_.round(i + 1, current.df,
        df.exceptAll(current.df)))
      // supersede the previous checkpoint ONLY when this round
      // materialized one: at cadence > 1 the rounds in between are plans
      // over the last checkpoint, which must stay alive until the next
      // checkpoint (or the returned frame) stops referencing it
      if (ids.nonEmpty) {
        if (lin.isEmpty) release(sc, prevIds)
        else graft.api.Pinned.register(spark, prevIds)
        prevIds = ids
      }
      current = new MStream(df, next.eventOrder, next.contextKeys, next.name)
      if (fp == last) {
        // the returned plan reads the final checkpoint — register it so a
        // long-lived service can free it after the consuming action
        graft.api.Pinned.register(spark, prevIds)
        return current
      }
      last = fp
      i += 1
    }
    graft.api.Pinned.register(spark, prevIds)
    current
  }

  /**
   * Semi-naive (delta) set fixpoint: H = distinct(initial); repeat
   * Δ' = step(Δ) \ H, H ∪= Δ' until Δ' is empty. SOUND ONLY when `step`
   * distributes over union (step(A ∪ B) = step(A) ∪ step(B)) — i.e. the
   * loop body is LINEAR in the head: per-record ops and joins whose other
   * side is loop-invariant. Callers must check that property statically
   * (`Program` does) and fall back to [[iterate]] otherwise.
   *
   * Scale posture vs [[iterate]]: the step function runs over the FRONTIER
   * only, never re-deriving old facts — for join bodies (transitive
   * closure and friends) that is the difference between quadratic and
   * linear total work in the number of rounds. H accumulates as a union
   * of per-round checkpointed deltas (each materialized exactly once)
   * instead of a full re-distinct of the accumulation every round, and
   * termination is exact (empty delta), not a count heuristic.
   */
  def iterateDelta(initial: MStream, maxIterations: Int)(
      step: MStream => MStream): MStream = {
    import org.apache.spark.sql.functions.col
    val spark = initial.df.sparkSession
    val sc = spark.sparkContext
    val lin = lineageFor(initial)
    def lift(d: DataFrame): MStream =
      new MStream(d, initial.eventOrder, initial.contextKeys, initial.name)
    val cols = initial.df.columns.toIndexedSeq
    val (h0, ids0, _) = checkpointCounted(initial.df.distinct())
    var acc: DataFrame = h0
    var allIds = ids0
    var delta = lift(h0)
    var i = 0
    var sinceConsolidation = 0
    var growing = true
    while (growing && i < maxIterations) {
      val fd = step(delta)
      // Dataset.except compares POSITIONALLY — align the body's output
      // column order to the head's before differencing
      val aligned = fd.df.select(cols.map(col): _*)
      val (d2, ids2, (c2, _)) = checkpointCounted(aligned.except(acc))
      if (c2 == 0L) { release(sc, ids2); growing = false }
      else {
        // semi-naive lineage is the cheap case: the new delta IS the
        // round's fresh rows and the consumed frontier IS the previous
        // delta — two narrow projections over already-checkpointed frames
        lin.foreach(_.round(i + 1, delta.df, d2))
        acc = acc.unionByName(d2); allIds ++= ids2
        delta = lift(d2); i += 1; sinceConsolidation += 1
        // collapse the union-of-round-deltas into ONE frame periodically:
        // without this, round k's except scans k separate checkpointed
        // frames — O(rounds²) map tasks over the loop, unbounded block
        // count. It bounds frame growth; it does NOT close the local-mode
        // gap to naive on many-tiny-round fixpoints (CycleBench depth 40:
        // still ~2× — per-round stage overhead, not frame count, dominates
        // there; that regime is why `auto` can be overridden to naive).
        // The copy is a no-shuffle materialization, amortized |H|/C per
        // round.
        if (sinceConsolidation >= 8) {
          val (flat, flatIds, _) = checkpointCounted(acc)
          // the newest delta's checkpoint must survive: next round's step
          // reads it. It is also inside `flat` now, so only the superseded
          // accumulation frames are dropped — unless lineage edge frames
          // still read the per-round deltas, in which case they stay
          // pinned until the run's lineage sink writes.
          if (lin.isEmpty) release(sc, allIds -- ids2)
          else graft.api.Pinned.register(spark, allIds -- ids2)
          acc = flat; allIds = flatIds ++ ids2; sinceConsolidation = 0
        }
      }
    }
    // consolidate the survivors into ONE pinned frame, release the round
    // checkpoints (kept when lineage edge frames read them), and register
    // for App-level release (Pinned)
    val (fin, finIds, _) = checkpointCounted(acc)
    if (lin.isEmpty) release(sc, allIds)
    else graft.api.Pinned.register(spark, allIds)
    graft.api.Pinned.register(spark, finIds)
    lift(fin)
  }

  /**
   * Streaming feedback — the reference's documented sink→source fallback
   * (`bodaboda/BodaApp.scala:62-66`: route the cycle through an external
   * channel when `beginCycle`/`closeCycle` can't be used) as a managed
   * surface rather than prose: ONE directory is both the cycle's sink and
   * its source, so a record the loop body emits re-enters the program in a
   * later micro-batch.
   *
   * Returns the `(source, sink)` pair to bind in an [[App.Config]]: union
   * the source into the loop body's ingress, route the body's feedback
   * output to the sink. The sink is the `cycle-feedback` format — a
   * foreachBatch writer that SKIPS EMPTY MICRO-BATCHES and publishes part
   * files into the channel by atomic rename. Both halves of that matter
   * for a self-loop: Spark's stock file sink emits a (possibly empty) part
   * file and a commit-log entry every batch, which the loop's own source
   * then sees as new data — the cycle re-triggers forever on its own
   * zero-row emissions. Suppressing empty batches makes
   * `StreamingQuery.processAllAvailable()` a fixpoint driver: it returns
   * exactly when the feedback predicate stops emitting (an always-true
   * predicate loops forever, like an ill-founded Flink iteration), and
   * rename-publication means the listing-based source never observes a
   * half-written file.
   *
   * Scale posture: the channel is a parquet directory — at cluster scale
   * point it at shared storage; feedback volume is bounded by the
   * predicate, not by any single executor's memory. Each pass costs one
   * file round trip (latency, not throughput) — the same cost the
   * reference's sink→source fallback pays through Kinesis. Delivery is
   * at-least-once across crash recovery (foreachBatch replay), matching
   * the reference fallback's semantics.
   */
  def feedbackChannel(dir: String, schema: StructType,
      checkpoint: Option[String] = None): (App.Source, App.Sink) = {
    new java.io.File(dir).mkdirs()
    val source = App.Source(format = "parquet", path = Some(dir),
      schema = Some(schema), keepReading = true)
    val sink = App.Sink(format = "cycle-feedback", path = Some(dir),
      outputMode = "append",
      checkpoint = Some(checkpoint.getOrElse(
        java.nio.file.Files.createTempDirectory("graft_cycle_cp").toString)))
    (source, sink)
  }
}
