package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot keys. AQE's skew-join handles joins at runtime;
 * for aggregations over pathological key distributions (one key = half the
 * corpus — common in web-scale training data: empty strings, boilerplate
 * fingerprints), pre-salting splits a hot key across `saltFactor` reducers
 * and a second, tiny aggregation merges the partials.
 *
 * Only ALGEBRAIC aggregates decompose this way (sum/count/min/max, and
 * avg via sum+count) — the same restriction Catalyst's own partial
 * aggregation has.
 */
object Skew {

  /** Two-stage salted aggregation: partial per (key, salt), final per key.
    * `partials` aggregate raw input; `finals` merge the partial columns
    * (referenced by their output names). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id().cast("long")
      + monotonically_increasing_id(), lit(saltFactor.toLong)))
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
