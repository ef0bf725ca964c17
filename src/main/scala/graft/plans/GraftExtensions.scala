package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/**
 * SQL surface for graft's native expressions: registered either at
 * session build time (`spark.sql.extensions=graft.plans.GraftExtensions`
 * — the deployment path for a shared cluster) or programmatically on a
 * live session (`GraftExtensions.register(spark)` — the notebook path).
 * After registration, `SELECT graft_dot(a, b) FROM ...` etc. plan as the
 * same codegen'd expressions the Scala API uses.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", info("graft_dot", "dot product of two array<double>"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_norm", info("graft_norm", "L2 norm of array<double>"),
      (es: Seq[Expression]) => NormL2(es(0))),
    ("graft_jaccard_sorted", info("graft_jaccard_sorted",
      "Jaccard of two sorted distinct array<bigint>"),
      (es: Seq[Expression]) => JaccardSorted(es(0), es(1))),
    ("graft_polyhash", info("graft_polyhash", "portable polynomial string hash mod 1e9+7"),
      (es: Seq[Expression]) => StringPolyHash(es(0))),
    ("graft_minhash16", info("graft_minhash16", "16-minhash signature of array<bigint>"),
      (es: Seq[Expression]) => MinHashSignature(es(0), 16)),
    ("graft_shingle_hashes3", info("graft_shingle_hashes3",
      "hashes of word 3-gram shingles of a string"),
      (es: Seq[Expression]) => WordShingleHashes(es(0), 3)))

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
