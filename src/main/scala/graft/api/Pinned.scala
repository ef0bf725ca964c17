package graft.api

import org.apache.spark.sql.SparkSession

/**
 * Session registry of deliberately pinned (locally checkpointed) frames
 * whose blocks must outlive their building operator because the RETURNED
 * plan references them — the residual left-inner join's consolidated
 * matches (`EnrichmentJoins`) and the driver-sized vocabulary
 * (`TextOps.buildVocab`). Operators unpersist every superseded
 * intermediate themselves; what lands here is only the frame the caller
 * is still using. A long-lived service calls [[release]] once the
 * consuming action (write/collect) completes; short-lived drivers can
 * ignore it (blocks die with the session).
 */
object Pinned {
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Set[Int]]()

  private[graft] def register(spark: SparkSession, ids: Set[Int]): Unit =
    if (ids.nonEmpty) reg.merge(spark, ids, (a, b) => a ++ b)

  /** RDD ids currently registered for `spark`. */
  def registered(spark: SparkSession): Set[Int] =
    Option(reg.get(spark)).getOrElse(Set.empty)

  /** Unpersist every registered frame. The plans built from them cannot
    * be re-executed afterwards (local checkpoints truncate lineage), so
    * call this only after their consuming actions complete. */
  def release(spark: SparkSession): Unit = {
    val ids = Option(reg.remove(spark)).getOrElse(Set.empty)
    val live = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
  }
}
