package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.HyperplaneUtil
import graft.pipeline.Dedup

/** Hyperplane LSH (`HyperplaneBits` + `Dedup.hyperplaneNearDup`): the
  * Charikar code properties (scale invariance, cosine-tracking bit
  * agreement) and the operator contract — candidates bucket-generated,
  * output a subset of exact all-pairs, identical vectors always caught. */
class HyperplaneSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def vec(d: Int): Array[Double] = Array.fill(d)(rnd.nextGaussian())
  private def code(v: Array[Double], bits: Int, seed: Int): Long =
    HyperplaneUtil.code(new GenericArrayData(v), bits, seed)

  test("codes are scale-invariant and equal vectors share every table's code") {
    for (_ <- 0 until 20) {
      val v = vec(32)
      for (t <- 0 until 4) {
        assert(code(v, 16, t) == code(v.map(_ * 3.7), 16, t))
        assert(code(v, 16, t) == code(v.clone(), 16, t))
      }
    }
  }

  test("bit agreement tracks cosine: near-identical vectors agree on almost all bits") {
    var nearAgree = 0
    var farAgree = 0
    val trials = 50
    val bits = 32
    for (_ <- 0 until trials) {
      val v = vec(64)
      val near = v.zipWithIndex.map { case (x, i) => x + (if (i == 0) 0.01 else 0.0) }
      val far = vec(64)
      nearAgree += bits - java.lang.Long.bitCount(code(v, bits, 0) ^ code(near, bits, 0))
      farAgree += bits - java.lang.Long.bitCount(code(v, bits, 0) ^ code(far, bits, 0))
    }
    assert(nearAgree > trials * bits * 9 / 10,
      s"near-identical pairs agree on >90% of bits, got $nearAgree/${trials * bits}")
    assert(farAgree < trials * bits * 7 / 10,
      s"random pairs agree on ~half the bits, got $farAgree/${trials * bits}")
  }

  test("operator: identical vectors always pair; output is exact-verified") {
    val base = (1 to 30).map(i => (i.toLong, vec(16).map(_.toFloat)))
    val dup = Seq((100L, base.head._2.clone())) // identical to vec 1
    val df = (base ++ dup).toDF("vec_id", "embedding")
    val got = Dedup.hyperplaneNearDup(df, "vec_id", "embedding",
        bits = 12, tables = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.exists(p => p._1 == 1L && p._2 == 100L && p._3 == 1.0),
      s"an identical pair shares every code and must surface: $got")
    val exact = Dedup.embeddingNearDupExact(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.subsetOf(exact),
      "every LSH-verified pair must appear in the exact all-pairs output")
  }

  test("assignment is invariant under input partitioning") {
    val df = (1 to 40).map(i => (i.toLong, vec(16).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    def run(parts: Int) = Dedup.hyperplaneNearDup(df.repartition(parts),
        "vec_id", "embedding", bits = 10, tables = 2, threshold = 0.5)
      .collect().map(r => r.toSeq.toList).toSet
    assert(run(1) == run(19))
  }
}
