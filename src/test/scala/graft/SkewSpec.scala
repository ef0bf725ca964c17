package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted two-stage aggregation equals direct aggregation. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg matches direct groupBy for algebraic aggregates") {
    // one pathologically hot key
    val df = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      Seq(("a", 5L), ("a", 7L), ("b", 1L))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedAgg(df, Seq("k"), saltFactor = 8,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn"), max("v").as("pm")),
      finals = Seq(sum("ps").as("s"), sum("pn").as("n"), max("pm").as("m")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == direct)
  }
}
