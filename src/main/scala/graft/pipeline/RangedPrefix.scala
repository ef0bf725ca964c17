package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed exact per-group prefix aggregation — the machinery behind
 * every "rank/running-sum within a group whose population is unbounded"
 * operator (CCNet per-language tiles, per-stratum token budgets). A
 * window partitioned by the group puts the WHOLE group in one task, and
 * dominant groups are the norm in crawl curation (English is ~half of
 * Common Crawl); this is the buildVocab range+offset pattern generalized:
 *
 *  1. range partition on the total order (group cols ++ order cols —
 *     must be UNIQUE per row, so the partitioner balances regardless of
 *     group skew),
 *  2. checkpoint ONCE — load-bearing: the offsets pass and the caller's
 *     final pass must read the SAME boundary sampling, but two lazy
 *     consumers of a range exchange are differently-pruned subtrees (no
 *     ReuseExchange) and each samples its OWN boundaries (observed as
 *     impossible tile ids at sf0.1 before the pin). Exactness never
 *     depends on WHERE the boundaries fall — offsets come from actual
 *     per-range aggregates — only on both passes seeing one assignment.
 *     Project the frame to what the caller needs BEFORE calling: the
 *     checkpoint materializes it once (narrow rank/score rows, never
 *     corpus text). Note RangePartitioner's boundary sampling is ITSELF
 *     a full pass over the input (the buildVocab lesson): an expensive
 *     input pipeline runs once for the sampler and once into this
 *     checkpoint — pin it first when the input costs more than one
 *     materialization of its narrow rows (perplexityBuckets does; a
 *     plain column projection does not bother).
 *  3. per-(range, group) partial aggregates of `valueExpr` — a
 *     width × groups frame, never corpus-sized — give each range's
 *     within-group offset (earlier ranges' total) and the group total
 *     via two tiny windows over that frame.
 *
 * The caller joins the offsets back on ("__p" ++ groupCols) — NULL-SAFE
 * on the group columns (a null group is its own group, exactly as a
 * window would treat it) — and adds its local within-(range, group)
 * window, bounded by the range width.
 */
private[graft] object RangedPrefix {

  /** Returns (checkpointed frame + "__p", offsets: __p, groupCols...,
    * "__off" = earlier-ranges total, "__grptot" = group total). Input
    * must not already carry a "__p" column. `pinInput = true` checkpoints
    * the INPUT first so the boundary sampler reads narrow materialized
    * rows instead of re-running the input pipeline — opt in when the
    * input costs more than one materialization of its rows
    * (perplexityBuckets' two-pass LM scoring does; a plain column
    * projection does not). */
  def apply(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
            valueExpr: Column, pinInput: Boolean = false): (DataFrame, DataFrame) = {
    // loud contract errors beat silent corruption: the machinery's
    // working columns must not already exist (a caller's __off would
    // become ambiguous after joinOffsets)
    Seq("__p", "__off", "__grptot").foreach(c => require(!df.columns.contains(c),
      s"RangedPrefix input must not already carry '$c' (machinery column)"))
    val input =
      if (!pinInput) df
      else {
        val (cp, ids) = graft.api.Pinned.checkpointTracked(df)
        graft.api.Pinned.register(df.sparkSession, ids)
        cp
      }
    val width = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    val (parted, cpIds) = graft.api.Pinned.checkpointTracked(input
      .repartitionByRange(width, (groupCols.map(col) ++ orderCols): _*)
      .withColumn("__p", spark_partition_id()))
    graft.api.Pinned.register(df.sparkSession, cpIds)
    // groupCols must be non-empty: a GLOBAL total order (maximalRepeats'
    // rank) should pass a constant-valued group COLUMN — an empty
    // partition spec here would be correct (the offsets frame is
    // width-rows tiny) but Spark logs a WindowExec warning per job, and a
    // literal in partitionBy gets folded away by the optimizer, bringing
    // the warning back
    require(groupCols.nonEmpty,
      "RangedPrefix needs at least one group column — for a global total " +
        "order add a constant-valued column and group by it")
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val offs = parted
      .groupBy(col("__p") +: groupCols.map(col): _*)
      .agg(sum(valueExpr).as("__v"))
      .withColumn("__off", coalesce(
        sum(col("__v")).over(byGroup.orderBy(col("__p"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__grptot", sum(col("__v")).over(byGroup))
      .select((col("__p") +: groupCols.map(col)) ++
        Seq(col("__off"), col("__grptot")): _*)
    (parted, offs)
  }

  /** THE shared running-sum lowering of the greedy packing/budget family
    * (packChunks' chunk assignment, capTokensPerKey's budget walk,
    * capPerKey's rank — one kernel so the next packing operator cannot
    * reintroduce an unbounded per-group frame): the exact per-group
    * running sum of `valueExpr` along `orderCols` (which must make
    * (groupCols ++ orderCols) unique per row), EXCLUDING the current row
    * unless `inclusive`. Appends it as column `as` to the offsets-joined
    * frame — machinery columns (__p, __off, __grptot) ride along for
    * callers that need the group total; select them away when done.
    * Every task is bounded by the range width regardless of group skew.
    * For a naturally BOUNDED group (one document's sentences), skip the
    * machinery and use [[windowedSum]]. */
  def runningSum(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
                 valueExpr: Column, inclusive: Boolean, as: String): DataFrame = {
    val (parted, offs) = apply(df, groupCols, orderCols, valueExpr)
    joinOffsets(parted, offs, groupCols)
      .withColumn(as, col("__off") + windowedSum(
        col("__p") +: groupCols.map(col), orderCols, valueExpr, inclusive))
  }

  /** The plain-window face of [[runningSum]] for groups bounded by a
    * NATURAL unit (a single document's sentences/positions — never a
    * corpus-scale key): per-group running sum of `valueExpr` along
    * `orderCols`, excluding the current row unless `inclusive`, null-free
    * (empty exclusive frames coalesce to 0). */
  def windowedSum(groupCols: Seq[Column], orderCols: Seq[Column],
                  valueExpr: Column, inclusive: Boolean): Column = {
    val w0 = Window.partitionBy(groupCols: _*).orderBy(orderCols: _*)
    val w = if (inclusive) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            else w0.rowsBetween(Window.unboundedPreceding, -1)
    coalesce(sum(valueExpr).over(w), lit(0L))
  }

  /** Null-safe equi-join of `parted` to its offsets frame on
    * ("__p" ++ groupCols): null groups must MATCH (they form their own
    * group, as a window would), which `Seq`-column joins don't do. The
    * offsets side's join columns come back deduplicated.
    *
    * Deliberately NO broadcast hint: the offsets frame is width × groups
    * — a few hundred languages broadcast on their own via the size-based
    * planner choice, but per-DOMAIN strata run to 10^8 groups, where a
    * forced broadcast OOMs the executors; EqualNullSafe is a hash-join
    * key, so the many-groups case plans a shuffled equi-join bounded per
    * task by the range width (the exactKPerKey rationale). */
  def joinOffsets(parted: DataFrame, offs: DataFrame,
                  groupCols: Seq[String]): DataFrame = {
    val r = offs.select(
      (col("__p").as("__pr") +: groupCols.map(c => col(c).as(s"__r_$c"))) ++
        Seq(col("__off"), col("__grptot")): _*)
    parted.join(r,
        groupCols.map(c => col(c) <=> col(s"__r_$c"))
          .foldLeft(col("__p") === col("__pr"))(_ && _))
      .drop("__pr").drop(groupCols.map(c => s"__r_$c"): _*)
  }
}
