package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Co-located joins: two tables bucketed+sorted on the join key join with
  * no shuffle exchange in the physical plan. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two bucketed tables plans without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "av")
      val b = (1L to 1000L).map(i => (i, i * 2)).toDF("id", "bv")
      Bucketing.writeBucketed(a, "graft_bucket_a", Seq("id"), 4)
      Bucketing.writeBucketed(b, "graft_bucket_b", Seq("id"), 4)
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "id")
      assert(joined.count() == 1000)
      assert(!Bucketing.hasShuffle(joined), "bucketed join must not shuffle:\n" +
        joined.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}
