package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/** The CCNet normalization fold (`TextOps.normalizeText` /
  * `functions.UnicodeFold`): unicode examples through the DataFrame
  * (codegen) path, null handling, WholeStageCodegen retention, and the
  * registered SQL face. The cross-implementation property lives in
  * ExpressionProps ("unicodeFold matches the independent unicode
  * reference"). */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("unicode fold: NFKD + marks + case + digits + whitespace") {
    val rows = Seq(
      // fullwidth H, precomposed e-acute + combining acute, umlaut,
      // ligature fi, fullwidth digits
      "Ｈélló  Wörld ﬁne ２３",
      "  tabs\tand\nnewlines here ",
      "Café == Café", // composed vs decomposed fold identically
      "① circled and Ⅷ roman",
      "").toDF("text")
    val got = rows.select(TextOps.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "hello world fine 00",
      "tabs and newlines here",
      "cafe == cafe",
      "0 circled and viii roman",
      ""))
  }

  test("null text folds to null; ascii lowercase text only collapses") {
    val got = Seq((1L, null: String), (2L, "already  normal text"))
      .toDF("id", "text")
      .select(col("id"), TextOps.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains("already normal text"))
  }

  test("the fold stays inside WholeStageCodegen") {
    // a non-local source, so the projection cannot constant-fold away
    val df = spark.range(3)
      .select(TextOps.normalizeText(
        concat(lit("a  B "), col("id").cast("string"))).as("n"))
    val codegen = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(codegen.nonEmpty,
      s"normalizeText must not break codegen:\n${df.queryExecution.executedPlan}")
    assert(df.collect().map(_.getString(0)).toSet == Set("a b 0"))
  }

  test("the registered SQL face evaluates graft_normalize") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_normalize('Café  Nº ５') AS n").collect().head
    // NFKD: º -> o (ordinal indicator), fullwidth ５ -> 5 -> 0
    assert(r.getString(0) == "cafe no 0")
  }
}
