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
    ("graft_normalize", info("graft_normalize",
      "CCNet-style unicode fold: NFKD, strip marks, lowercase, digits->0, collapse whitespace"),
      (es: Seq[Expression]) => UnicodeFold(es(0))),
    ("graft_minhash16", info("graft_minhash16", "16-minhash signature of array<bigint>"),
      (es: Seq[Expression]) => MinHashSignature(es(0), 16)),
    ("graft_shingle_hashes3", info("graft_shingle_hashes3",
      "hashes of word 3-gram shingles of a string"),
      (es: Seq[Expression]) => WordShingleHashes(es(0), 3)),
    ("graft_char_shingle_hashes4", info("graft_char_shingle_hashes4",
      "hashes of char 4-gram shingles of a string"),
      (es: Seq[Expression]) => CharShingleHashes(es(0), 4)),
    ("graft_simhash32", info("graft_simhash32",
      "32-bit SimHash of an array<bigint> feature-hash column"),
      (es: Seq[Expression]) => SimHashBits(es(0), 32)),
    ("graft_byte_mean", info("graft_byte_mean", "mean unsigned byte of a binary column"),
      (es: Seq[Expression]) => ByteMean(es(0))),
    ("graft_vec_sum", info("graft_vec_sum",
      "aggregate: elementwise sum of array<double> vectors"),
      (es: Seq[Expression]) => VectorSum(es(0)).toAggregateExpression()),
    ("graft_vec_min", info("graft_vec_min",
      "aggregate: elementwise min of array<double> vectors"),
      (es: Seq[Expression]) => VectorExtreme(es(0), max = false).toAggregateExpression()),
    ("graft_vec_max", info("graft_vec_max",
      "aggregate: elementwise max of array<double> vectors"),
      (es: Seq[Expression]) => VectorExtreme(es(0), max = true).toAggregateExpression()),
    ("graft_count_min", info("graft_count_min",
      "aggregate: count-min sketch (d=4, w=2048) over bigint item hashes"),
      (es: Seq[Expression]) => CountMinAgg(es(0), 4, 2048).toAggregateExpression()),
    ("graft_hyperplane16", info("graft_hyperplane16",
      "16-bit hyperplane LSH code (table 0) of an array<double> vector"),
      (es: Seq[Expression]) => HyperplaneBits(es(0), 16, 0)),
    ("graft_winnow4", info("graft_winnow4",
      "winnowing fingerprints (window 4) of a position-ordered hash array"),
      (es: Seq[Expression]) => WinnowSelect(es(0), 4)),
    ("graft_bloom", info("graft_bloom",
      "aggregate: bloom filter (2^20 bits, 7 hashes) over bigint item hashes"),
      (es: Seq[Expression]) => BloomAgg(es(0), 1 << 20, 7).toAggregateExpression()),
    ("graft_bloom_contains", info("graft_bloom_contains",
      "membership probe (7 hashes) against a graft_bloom word array"),
      (es: Seq[Expression]) => BloomMightContain(es(0), es(1), 7)),
    ("graft_jaccard_at_least", info("graft_jaccard_at_least",
      "Jaccard of two sorted distinct array<bigint> with early abandonment below a literal threshold (-1 when provably below)"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        val t = es(2) match {
          case Literal(d: Double, _) => d
          case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
          case Literal(i: Int, _) => i.toDouble
          case Literal(l: Long, _) => l.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_jaccard_at_least threshold must be a literal number, got $other")
        }
        JaccardSortedAtLeast(es(0), es(1), t)
      }))

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
