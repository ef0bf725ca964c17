package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry per implemented operator from SURVEY.md §2; each has
  * a DuckDB oracle twin in `oracleSql` (same column names on both sides). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.qJoin3(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_map_scalar" -> (QueriesCore.qMapScalar _),
    "q_where" -> (QueriesCore.qWhere _),
    "q_addfields" -> (QueriesCore.qAddFields _),
    "q_agg" -> (QueriesCore.qAgg _),
    "q_argminmax" -> (QueriesCore.qArgMinMax _),
    "q_union" -> (QueriesCore.qUnion _),
    "q_unique" -> (QueriesCore.qUnique _),
    "q_join3" -> (QueriesCore.qJoin3 _),
    "q_range_join" -> (QueriesCore.qRangeJoin _),
    "q_asof_join" -> (QueriesCore.qAsofJoin _),
    "q_asof_fwd" -> (QueriesCore.qAsofFwd _),
    "q_program_agg" -> (QueriesCore.qProgramAgg _),
    "q_capture_agg" -> (QueriesCore.qCaptureAgg _),
    "q_program_fn" -> (QueriesCore.qProgramFn _),
    "q_cycle" -> (QueriesCore.qCycle _),
    "q_cycle_delta" -> (QueriesCore.qCycleDelta _)
  ) ++ QueriesStateful.all ++ QueriesPipeline.all

  def oracleSql: Map[String, String] = Map(
    "q_map_scalar" -> QueriesCore.qMapScalarSql,
    "q_where" -> QueriesCore.qWhereSql,
    "q_addfields" -> QueriesCore.qAddFieldsSql,
    "q_agg" -> QueriesCore.qAggSql,
    "q_argminmax" -> QueriesCore.qArgMinMaxSql,
    "q_union" -> QueriesCore.qUnionSql,
    "q_unique" -> QueriesCore.qUniqueSql,
    "q_join3" -> QueriesCore.qJoin3Sql,
    "q_range_join" -> QueriesCore.qRangeJoinSql,
    "q_asof_join" -> QueriesCore.qAsofJoinSql,
    "q_asof_fwd" -> QueriesCore.qAsofFwdSql,
    "q_program_agg" -> QueriesCore.qProgramAggSql,
    "q_capture_agg" -> QueriesCore.qCaptureAggSql,
    "q_program_fn" -> QueriesCore.qProgramFnSql,
    "q_cycle" -> QueriesCore.qCycleSql,
    "q_cycle_delta" -> QueriesCore.qCycleDeltaSql
  ) ++ QueriesStateful.sql ++ QueriesPipeline.sql
}
