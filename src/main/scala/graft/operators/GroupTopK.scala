package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/**
 * Top-k rows per group WITHOUT a per-group sort — the 100 TB lowering of
 * `QUALIFY row_number() OVER (PARTITION BY keys ORDER BY score DESC) <= k`.
 *
 * A window formulation sorts every group's full row set on the shuffled
 * side; this lowers onto the `BoundedTopK` native aggregate instead, so
 * each map task keeps a k-element heap per group and the exchange carries
 * at most groups × k (id, score) pairs — partial aggregation does the
 * heavy lifting where the data is, exactly like `sum`. Ties break by
 * ascending id (a total order, so results are partitioning-invariant and
 * oracle-checkable).
 *
 * Contract: `idCol` must be an integral column (the heap entry is the
 * (id, score) pair, not the row — join the result back on id to recover
 * payload columns), and rows whose id or score evaluates to NULL are
 * EXCLUDED — aggregate null-skipping semantics, like `sum`, NOT the
 * window formulation's nulls-rank-last. Coalesce the score upstream if
 * null rows should compete. Milan has no ranking operator at all
 * (SURVEY §2.7: "sort / limit / top-k — absent"); this is parity-plus
 * for the "top documents per domain / per query" steps of corpus
 * curation.
 */
object GroupTopK {
  /** The heap-entry id contract, shared by every bounded-heap face
    * (topKPerKey, the Sampling exact-k family): the heap carries
    * (id, score) pairs, so the id must be integral. */
  private[graft] def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit =
    df.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
      case other => throw new IllegalArgumentException(
        s"$op: idCol '$idCol' must be integral (the bounded heap " +
          s"carries (id, score) pairs), got $other")
    }

  def topKPerKey(df: DataFrame, keys: Seq[String], idCol: String,
                 score: Column, k: Int, scoreAs: String = "score"): DataFrame = {
    require(k > 0, s"topKPerKey needs k > 0, got $k")
    require(keys.nonEmpty, "topKPerKey needs at least one grouping key")
    requireIntegralId(df, idCol, "topKPerKey")
    // Output columns are keys ++ (idCol, scoreAs, rank) — reject overlaps
    // up front with a named contract error instead of emitting a frame
    // with duplicate column names.
    Seq(idCol, scoreAs, "rank").foreach { n =>
      require(!keys.contains(n),
        s"topKPerKey: grouping key '$n' collides with an output column " +
          s"(output is keys ++ ($idCol, $scoreAs, rank))")
    }
    require(scoreAs != idCol && scoreAs != "rank",
      s"topKPerKey: scoreAs '$scoreAs' collides with an output column")
    require(idCol != "rank",
      "topKPerKey: idCol 'rank' collides with the rank output column " +
        s"(output is keys ++ ($idCol, $scoreAs, rank))")
    // Collision-proof working names (the zorderBy idiom): a key named
    // 'pos'/'col' or '__id'/'__s'/'__top' must not capture the internal
    // heap/explode columns.
    val taken = collection.mutable.Set(df.columns ++ keys: _*)
    def fresh(base: String): String = {
      val n = Iterator.from(0).map(i => s"__$base$i").find(!taken(_)).get
      taken += n; n
    }
    val (idW, sW, topW, posW, entryW) =
      (fresh("id"), fresh("s"), fresh("top"), fresh("pos"), fresh("e"))
    val keyCols = keys.map(col)
    df.select(keyCols ++ Seq(col(idCol).cast("long").as(idW),
        score.cast("double").as(sW)): _*)
      .groupBy(keyCols: _*)
      .agg(graft.functions.VectorFunctions.topKByScore(
        col(idW), col(sW), k).as(topW))
      .select(keyCols :+ posexplode(col(topW)).as(Seq(posW, entryW)): _*)
      .select(keyCols ++ Seq(col(s"$entryW.id").as(idCol),
        col(s"$entryW.cos").as(scoreAs),
        (col(posW) + 1).cast("long").as("rank")): _*)
  }
}
