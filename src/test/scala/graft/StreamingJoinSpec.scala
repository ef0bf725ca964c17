package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingJoins

/** Records shared by the streaming specs. */
case class LRec(k: String, seq: Long, v: Int)
case class RRec(k: String, seq: Long, w: Int)
case class Pair(l: Option[LRec], r: Option[RRec])

/**
 * Streaming enrichment-join semantics, one record per micro-batch —
 * mirrors the reference's synchronous event tests
 * (`TestEventAppJoin.scala:29-62`): left-enrichment emits nothing on right
 * arrival; a left pairs with the latest right or None; full join emits on
 * both sides; left-inner buffers lefts until a right arrives.
 */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(kind: StreamingJoins.Kind,
                  residual: (LRec, RRec) => Boolean = (_, _) => true)(
                  feed: (MemoryStream[LRec], MemoryStream[RRec],
                         () => List[Pair]) => Unit): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[LRec]
    val rs = MemoryStream[RRec]
    val joined = StreamingJoins.enrichmentJoin[LRec, RRec, String, Pair](
      ls.toDS(), rs.toDS(), _.k, _.k, _.seq, _.seq, kind, residual)(Pair(_, _))
    val name = s"join_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def emitted(): List[Pair] = {
        q.processAllAvailable()
        spark.table(name).as[Pair].collect().toList
      }
      feed(ls, rs, emitted _)
    } finally q.stop()
  }

  test("left enrichment: right arrivals emit nothing; lefts pair with latest right or None") {
    run(StreamingJoins.LeftEnrichment) { (ls, rs, emitted) =>
      ls.addData(LRec("a", 1, 10))
      assert(emitted() == List(Pair(Some(LRec("a", 1, 10)), None)), "unmatched left pairs with None")
      rs.addData(RRec("a", 2, 100))
      assert(emitted().size == 1, "right arrival emits nothing")
      ls.addData(LRec("a", 3, 11))
      assert(emitted().toSet.contains(Pair(Some(LRec("a", 3, 11)), Some(RRec("a", 2, 100)))))
      rs.addData(RRec("a", 4, 200))
      ls.addData(LRec("a", 5, 12))
      assert(emitted().toSet.contains(Pair(Some(LRec("a", 5, 12)), Some(RRec("a", 4, 200)))),
        "left sees the LATEST right")
    }
  }

  test("full enrichment: either side emits, paired with latest other side") {
    run(StreamingJoins.FullEnrichment) { (ls, rs, emitted) =>
      rs.addData(RRec("a", 1, 100))
      assert(emitted() == List(Pair(None, Some(RRec("a", 1, 100)))), "right emits with no left")
      ls.addData(LRec("a", 2, 10))
      assert(emitted().toSet.contains(Pair(Some(LRec("a", 2, 10)), Some(RRec("a", 1, 100)))))
      rs.addData(RRec("a", 3, 200))
      assert(emitted().toSet.contains(Pair(Some(LRec("a", 2, 10)), Some(RRec("a", 3, 200)))),
        "right pairs with latest left")
    }
  }

  test("strict residual with a primitive-typed side is a named contract error") {
    // reference-strict gating hands the residual a null for the side with
    // no state yet; Long can't hold that null (it would unbox to a phantom
    // 0 and silently pass/fail the gate), so the engine must refuse loudly
    val left = Seq(LRec("a", 1, 10)).toDS()
    val right = Seq(5L).toDS()
    // rejected EAGERLY at construction — a lazy per-arrival check would
    // make the failure arrival-order-dependent
    val ex = intercept[IllegalArgumentException] {
      StreamingJoins.enrichmentJoin[LRec, Long, String, String](
        left, right, _.k, _ => "a", _.seq, _ => 2L, StreamingJoins.FullEnrichment,
        residual = (l: LRec, r: Long) => l.v > r)((l, r) => s"$l|$r")
    }
    assert(ex.getMessage.contains("primitive") && ex.getMessage.contains("lenientResidual"),
      s"expected the named primitive-side error, got: $ex")
    // no residual supplied -> the gate never evaluates, primitive sides fine
    val ok = StreamingJoins.enrichmentJoin[LRec, Long, String, String](
      left, right, _.k, _ => "a", _.seq, _ => 2L,
      StreamingJoins.FullEnrichment)((l, r) => s"$l|$r")
    assert(ok.collect().length == 2, "default residual emits both arrivals")
  }

  test("strict residual NPE on a null side is gate-failed, not a query killer") {
    // the strict gate is the one place user code receives a null side; a
    // null-INTOLERANT residual (r.w dereferences the right) used to NPE
    // and terminate the streaming query, while the Column-based faces
    // evaluate the same null pair to false and suppress the row. The
    // typed face now matches: NPE-with-a-null-side = gate-failed.
    run(StreamingJoins.FullEnrichment, residual = (l, r) => l.v > r.w) { (ls, rs, emitted) =>
      ls.addData(LRec("a", 1, 10))
      assert(emitted().isEmpty,
        "null right side -> residual NPE -> gate-failed, matching the Column faces")
      rs.addData(RRec("a", 2, 5))
      assert(emitted() == List(Pair(Some(LRec("a", 1, 10)), Some(RRec("a", 2, 5)))),
        "query stays alive; both-sides-present gate passes (10 > 5)")
      ls.addData(LRec("a", 3, 1))
      assert(emitted().size == 1, "failing residual with both sides present emits nothing")
      ls.addData(LRec("a", 4, 99))
      assert(emitted().toSet.contains(Pair(Some(LRec("a", 4, 99)), Some(RRec("a", 2, 5)))),
        "gate keeps evaluating correctly after the earlier NPE")
    }
  }

  test("left inner: lefts buffer until a matching right, then flush exactly once") {
    run(StreamingJoins.LeftInner) { (ls, rs, emitted) =>
      ls.addData(LRec("a", 1, 10))
      ls.addData(LRec("a", 2, 11))
      assert(emitted().isEmpty, "lefts buffer while no right exists")
      rs.addData(RRec("a", 3, 100))
      val afterRight = emitted()
      assert(afterRight.toSet == Set(
        Pair(Some(LRec("a", 1, 10)), Some(RRec("a", 3, 100))),
        Pair(Some(LRec("a", 2, 11)), Some(RRec("a", 3, 100)))), "buffered lefts flush")
      ls.addData(LRec("a", 4, 12))
      assert(emitted().size == 3, "subsequent lefts emit immediately")
    }
  }

  test("left enrichment with residual: non-matching right treated as absent") {
    run(StreamingJoins.LeftEnrichment, (l, r) => r.w > l.v * 10) { (ls, rs, emitted) =>
      rs.addData(RRec("a", 1, 100))
      ls.addData(LRec("a", 2, 5))   // 100 > 50 → matches
      ls.addData(LRec("a", 3, 50))  // 100 > 500 fails → None
      val out = emitted().toSet
      assert(out.contains(Pair(Some(LRec("a", 2, 5)), Some(RRec("a", 1, 100)))))
      assert(out.contains(Pair(Some(LRec("a", 3, 50)), None)))
    }
  }

  test("keys are independent") {
    run(StreamingJoins.LeftEnrichment) { (ls, rs, emitted) =>
      rs.addData(RRec("a", 1, 100))
      ls.addData(LRec("b", 2, 10))
      assert(emitted() == List(Pair(Some(LRec("b", 2, 10)), None)),
        "a right under key 'a' does not enrich key 'b'")
    }
  }
}
