package graft

import graft.plans.GraftExtensions

/** The native expressions are reachable from SQL after registration. */
class SqlFunctionSpec extends SparkSpec {

  test("registered graft_* functions evaluate from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_norm(array(3.0d, 4.0d)) AS n,
                graft_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
                graft_polyhash('ab') AS h,
                size(graft_shingle_hashes3('a b c d')) AS ns
      """).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
    assert(r.getLong(3) == ('a' * 31 + 'b').toLong)
    assert(r.getInt(4) == 2)
  }
}
