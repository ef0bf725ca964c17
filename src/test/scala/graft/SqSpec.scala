package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sq

/** SQ8 scalar quantization (`pipeline.Sq`): train → collect → encode →
  * decode round-trip on a DataFrame, the stats-artifact contract errors,
  * the plan shapes (one aggregation to train, zero-shuffle codegen'd
  * encode), and the registered vec_min/vec_max SQL faces. */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private def embs = Seq(
    (1L, Seq(0.0, 10.0, -1.0)),
    (2L, Seq(5.0, 20.0, -1.0)),  // dim 2 is degenerate (constant)
    (3L, Seq(10.0, 15.0, -1.0))).toDF("id", "vec")

  test("train -> collect -> encode -> decode round-trip") {
    val (lo, hi) = Sq.collectStats(Sq.sq8Train(embs, "vec"))
    assert(lo == Seq(0.0, 10.0, -1.0) && hi == Seq(10.0, 20.0, -1.0))
    val coded = Sq.sq8Encode(embs, "vec", lo, hi)
    val codes = coded.collect().map(r =>
      r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(codes(1L) == Seq(0, 0, 0), s"extremes code to 0: ${codes(1L)}")
    assert(codes(3L) == Seq(255, 127, 0), s"max / midpoint / degenerate: ${codes(3L)}")
    // decode lands within half a quantization step everywhere
    val err = coded.select(col("vec"),
        Sq.sq8Decode(col("codes"), lo, hi).as("dec"))
      .collect().flatMap { r =>
        r.getSeq[Double](0).zip(r.getSeq[Double](1)).zipWithIndex.map {
          case ((x, d), j) => math.abs(d - x) -> (hi(j) - lo(j)) }
      }
    assert(err.forall { case (e, s) => e <= s / 255.0 * 0.5 + 1e-9 },
      s"decode error exceeds half a step: ${err.mkString(", ")}")
  }

  test("the stats artifact contract fails loudly") {
    val gap = Seq((0L, 0.0, 1.0), (2L, 0.0, 1.0)).toDF("dim", "lo", "hi")
    val e = intercept[IllegalArgumentException](Sq.collectStats(gap))
    assert(e.getMessage.contains("contiguous dims"), e.getMessage)
    val empty = Seq.empty[(Long, Double, Double)].toDF("dim", "lo", "hi")
    val e2 = intercept[IllegalArgumentException](Sq.collectStats(empty))
    assert(e2.getMessage.contains("empty"), e2.getMessage)
  }

  test("train is one partial-aggregated pass; encode is zero-shuffle codegen") {
    val train = Sq.sq8Train(embs, "vec").queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(train).size >= 2,
      s"train must partial-aggregate:\n$train")
    assert(!train.contains("Generate") || train.indexOf("Generate") <
      train.indexOf("ObjectHashAggregate"),
      s"the explode must sit above the aggregate (1 row), not below it:\n$train")

    val (lo, hi) = Sq.collectStats(Sq.sq8Train(embs, "vec"))
    val enc = spark.range(3).select(Sq.sq8Decode(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(graft.functions.Sq8Encode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(array(col("id").cast("double"),
          col("id").cast("double"), col("id").cast("double"))), lo, hi)),
      lo, hi).as("d"))
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be zero-shuffle:\n$plan")
    assert(plan.contains("*(1)"), s"encode must stay in codegen:\n$plan")
    enc.collect()
  }

  test("the registered vec_min/vec_max SQL faces evaluate") {
    graft.plans.GraftExtensions.register(spark)
    embs.createOrReplaceTempView("sq_embs")
    val r = spark.sql(
      """SELECT graft_vec_min(vec) AS lo, graft_vec_max(vec) AS hi
         FROM (SELECT cast(vec AS array<double>) AS vec FROM sq_embs)""")
      .collect().head
    assert(r.getSeq[Double](0) == Seq(0.0, 10.0, -1.0))
    assert(r.getSeq[Double](1) == Seq(10.0, 20.0, -1.0))
  }
}
