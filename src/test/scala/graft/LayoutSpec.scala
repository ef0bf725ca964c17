package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** `Layout.zorderBy`: interleave correctness against a definitional bit
  * loop, the locality property that justifies the operator (per-partition
  * bounding boxes shrink vs arrival order — what parquet min/max pruning
  * feeds on), sorted-within-partition output, and degenerate ranges. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave equals the definitional bit loop") {
    def ref(bs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits; i <- bs.indices)
        z |= ((bs(i) >> b) & 1L) << (b * bs.size + i)
      z
    }
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.interleave(Seq(col("a"), col("b")), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == ref(Seq(a, b), 4), s"($a,$b)")
    }
    // 3-column interleave too
    val g3 = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
      .select(Layout.interleave(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .collect().head.getLong(0)
    assert(g3 == ref(Seq(5L, 3L, 6L), 3))
  }

  test("z-ordering shrinks per-partition bounding boxes vs arrival order") {
    // a 64x64 grid in shuffled arrival order
    val pts = scala.util.Random.shuffle(
      (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)).toList)
    val df = pts.toDF("x", "y").repartition(1)
    def totalArea(d: org.apache.spark.sql.DataFrame): Long =
      d.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .agg(sum("area")).collect().head.getLong(0)
    val zByParts = Layout.zorderBy(df, Seq("x", "y"), numFiles = 16, bits = 6)
    val zArea = totalArea(zByParts)
    val naiveArea = totalArea(df.repartition(16))
    // 16 hash partitions of a shuffled grid each span ~the whole domain
    // (~16 * 4096); z-ordered range partitions tile it (~4096 total, and
    // boxes overlap a little at curve seams)
    assert(naiveArea >= 16L * 3000,
      s"baseline should span the domain per partition, got $naiveArea")
    assert(zArea <= naiveArea / 4,
      s"z-order must tile the domain: zArea=$zArea vs naive=$naiveArea")
    // output is sorted by the (recomputed) z-key within each partition
    val keyed = Layout.zkey(zByParts, Seq("x", "y"), bits = 6)
    val sortedWithin = zByParts.withColumn("z", keyed)
      .withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg(collect_list("z").as("zs"))
      .collect().forall { r =>
        val zs = r.getSeq[Long](1); zs == zs.sorted
      }
    assert(sortedWithin, "partitions must be internally sorted by the z-key")
  }

  test("a re-clustered frame carrying __zkey0 keeps its column") {
    val df = Seq((1L, 2L, 99L), (3L, 4L, 98L)).toDF("x", "y", "__zkey0")
    val out = Layout.zorderBy(df, Seq("x", "y"), numFiles = 1, bits = 4)
    assert(out.columns.toSeq == Seq("x", "y", "__zkey0"),
      "a user column colliding with the working name must survive")
    assert(out.select("__zkey0").collect().map(_.getLong(0)).toSet == Set(99L, 98L))
  }

  test("non-numeric z-columns fail with the type error, not a null-range error") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("x", "s")
    val e = intercept[IllegalArgumentException](Layout.zkey(df, Seq("x", "s"), 4))
    assert(e.getMessage.contains("must be numeric or date/time"), e.getMessage)
  }

  test("degenerate (constant) columns bucket to 0 and a null-only column fails by name") {
    val df = Seq((1L, 7L), (2L, 7L)).toDF("a", "c")
    val z = df.select(Layout.zkey(df, Seq("a", "c"), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSet
    // c is constant -> bucket 0 everywhere; key only varies by a
    assert(z.size == 2)
    val nulls = Seq((Some(1L), None: Option[Long]), (Some(2L), None))
      .toDF("a", "c")
    val e = intercept[IllegalArgumentException](
      nulls.select(Layout.zkey(nulls, Seq("a", "c"), 4)))
    assert(e.getMessage.contains("'c'"), e.getMessage)
  }

  test("date and timestamp_ntz z-columns bucket by explicit epoch conversion") {
    // date and timestamp_ntz are NOT castable to double in Spark SQL —
    // zkey must convert via unix_date/unix_micros instead of failing at
    // analysis (round-10 advice)
    val df = Seq((1L, "2024-01-01"), (2L, "2024-06-15"), (3L, "2024-12-31"))
      .toDF("id", "d")
      .withColumn("d", to_date(col("d")))
      .withColumn("ts", col("d").cast("timestamp"))
      .withColumn("tsntz", col("ts").cast("timestamp_ntz"))
    for (c <- Seq("d", "ts", "tsntz")) {
      val z = df.select(col("id"), Layout.zkey(df, Seq("id", c), bits = 4).as("z"))
        .orderBy("id").collect().map(_.getLong(1))
      // both columns increase together, so the z-key must strictly increase
      assert(z(0) < z(1) && z(1) < z(2), s"$c: ${z.toSeq}")
    }
    // and zorderBy round-trips a date column end to end
    val out = Layout.zorderBy(df, Seq("d"), numFiles = 2, bits = 4)
    assert(out.count() == 3)
  }
}
