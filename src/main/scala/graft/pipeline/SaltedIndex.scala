package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hot-key salting for PINNED static indexes — the stream-static sibling
 * of [[Dedup.saltedSelfJoin]]/[[Dedup.saltedCrossJoin]] (reference:
 * amzn/milan keeps no indexed-reference operators; this is part of
 * graft's parity-plus ingest family).
 *
 * A per-micro-batch (or per-query-batch) equi-join against a static
 * key-indexed reference routes every arrival carrying a given key to ONE
 * task together with ALL n reference rows of that key — a boilerplate
 * band, a dominant-direction IVF cell, or any other hot index key
 * serializes its n verifications per batch. The batch covers' in-plan
 * census cannot run per micro-batch; but the static side is
 * materialized EAGERLY anyway (`graft.api.Pinned.checkpointTracked`),
 * so the census runs once at pin time, batch-side (this pin-time
 * heavy-hitter count is also the shape the batch covers adopted in
 * r14 — saltedSelfJoin's census is the in-plan sibling of this one):
 *
 *  - [[pin]] checkpoints the index WITH a salt column `__sg`
 *    (`hash(id) mod s`, s = ceil(pop/cap); 0 for cold keys) plus the
 *    small hot-key table (key, __s) as a second pinned frame — bounded
 *    by the number of hot keys, like every other driver-adjacent
 *    artifact in this library, but never collected.
 *  - [[replicate]] explodes each arriving row to all s salts of its key
 *    via a broadcast left join against the hot table (cold keys: the
 *    1-element sequence — one row, salt 0).
 *
 * Joining arrivals to the index on `(key, __sg)` then meets every
 * (arrival, reference) pair EXACTLY once while a hot key's work spreads
 * over s tasks. When no key is hot the hot table is empty and the plan
 * degenerates to the plain key join plus one broadcast left join against
 * an empty frame.
 */
private[graft] object SaltedIndex {

  private def hotKeys(plan: DataFrame, keyCol: String, cap: Long): DataFrame = {
    require(cap >= 0,
      s"SaltedIndex cap must be >= 0 (0 disables the cover), got $cap")
    // cap = 0: the same explicit escape as Dedup.capConf documents — an
    // EMPTY hot table without even the census scan (limit 0 keeps the
    // schema), so the join degenerates to the plain key join (every row
    // salt 0) and pin time pays nothing for the skipped armor
    if (cap == 0L)
      plan.select(col(keyCol), lit(1).cast("int").as("__s")).limit(0)
    else
      plan.groupBy(col(keyCol)).count().filter(col("count") > cap)
        .select(col(keyCol),
          ceil(col("count").cast("double") / cap).cast("int").as("__s"))
  }

  private def withSalt(plan: DataFrame, hot: DataFrame, keyCol: String,
                       idCol: Column): DataFrame =
    plan.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("__sg", when(col("__s").isNull, lit(0))
        .otherwise(pmod(xxhash64(idCol), col("__s")).cast("int")))
      .drop("__s")

  /** Checkpoint `plan` ONCE, then census + salt over the materialized
    * base: the (possibly expensive) index projection — band explosion,
    * cell assignment — is computed exactly one time; the census reads the
    * checkpoint and the salted frame is checkpoint + broadcast-left-join
    * + hash-mod, replayed cheaply when a stream-static join re-plans its
    * static side per micro-batch. Returns (salted index carrying `__sg`,
    * hot-key table, RDD ids to register with Pinned). */
  def pin(plan: DataFrame, keyCol: String, idCol: Column, cap: Long)
      : (DataFrame, DataFrame, Set[Int]) = {
    val (base, bIds) = graft.api.Pinned.checkpointTracked(plan)
    val (hot, hIds) = graft.api.Pinned.checkpointTracked(
      hotKeys(base, keyCol, cap))
    (withSalt(base, hot, keyCol, idCol), hot, bIds ++ hIds)
  }

  /** Replicate each arriving row to every salt of its key (cold keys:
    * one row, salt 0). The output carries `__sg`; join the pinned index
    * on `(keyCol, "__sg")`. */
  def replicate(arrivals: DataFrame, hot: DataFrame, keyCol: String): DataFrame =
    arrivals
      .join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("__sg", explode(sequence(lit(0), coalesce(col("__s"), lit(1)) - 1)))
      .drop("__s")
}
