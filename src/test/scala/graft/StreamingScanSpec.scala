package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingScans

case class Ev(k: String, seq: Long, v: Double)
case class RunSum(k: String, seq: Long, total: Double)

/**
 * Streaming scan semantics (reference `TestEventAppScan`-style traces):
 * maxBy emits only on strict improvement; sumBy emits a running value per
 * record; counts run per key.
 */
class StreamingScanSpec extends SparkSpec {
  import spark.implicits._

  private def withQuery[O](ds: org.apache.spark.sql.Dataset[O])(f: (() => List[O]) => Unit): Unit = {
    val name = s"scan_${System.nanoTime()}"
    val q = ds.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      import org.apache.spark.sql.Encoder
      implicit val enc: Encoder[O] = ds.encoder
      f(() => { q.processAllAvailable(); spark.table(name).as[O].collect().toList })
    } finally q.stop()
  }

  test("maxBy emits only when the running max strictly improves") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingScans.argCompare[Ev, String, Double](in.toDS(), _.k, _.seq, _.v, isMax = true)
    withQuery(out) { emitted =>
      in.addData(Ev("a", 1, 5.0))
      assert(emitted() == List(Ev("a", 1, 5.0)), "first record emits")
      in.addData(Ev("a", 2, 3.0))
      assert(emitted().size == 1, "smaller value does not emit")
      in.addData(Ev("a", 3, 5.0))
      assert(emitted().size == 1, "equal value does not emit (strict)")
      in.addData(Ev("a", 4, 7.0))
      assert(emitted().size == 2, "new max emits")
      in.addData(Ev("b", 5, 1.0))
      assert(emitted().size == 3, "separate key has its own running max")
    }
  }

  test("sumBy emits the running per-key sum for every record") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingScans.sumBy[Ev, String, RunSum](
      in.toDS(), _.k, _.seq, _.v, (e, s) => RunSum(e.k, e.seq, s))
    withQuery(out) { emitted =>
      in.addData(Ev("a", 1, 5.0), Ev("a", 2, 3.0), Ev("b", 3, 1.0))
      assert(emitted().toSet == Set(RunSum("a", 1, 5.0), RunSum("a", 2, 8.0), RunSum("b", 3, 1.0)),
        "in-batch records fold in seq order per key")
      in.addData(Ev("a", 4, 2.0))
      assert(emitted().toSet.contains(RunSum("a", 4, 10.0)), "state persists across batches")
    }
  }

  test("countByKey runs per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingScans.countByKey[Ev, String, RunSum](
      in.toDS(), _.k, _.seq, (e, n) => RunSum(e.k, e.seq, n.toDouble))
    withQuery(out) { emitted =>
      in.addData(Ev("a", 1, 0), Ev("a", 2, 0))
      in.addData(Ev("a", 3, 0), Ev("b", 4, 0))
      val out1 = emitted().toSet
      assert(out1 == Set(RunSum("a", 1, 1), RunSum("a", 2, 2), RunSum("a", 3, 3), RunSum("b", 4, 1)))
    }
  }
}
