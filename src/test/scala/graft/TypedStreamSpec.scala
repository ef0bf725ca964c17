package graft

import graft.api.TypedStream

/** The typed (lambda) facade runs Milan-shaped programs identically over
  * batch Datasets — same stateful engine as the streaming module. */
class TypedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def events = TypedStream(
    Seq(Ev("a", 1, 5.0), Ev("a", 2, 3.0), Ev("a", 3, 7.0), Ev("b", 4, 1.0)).toDS(),
    (e: Ev) => e.seq)

  test("where/map/groupBy/scan compose on batch datasets") {
    val counts = events
      .where(_.v > 2.0)
      .groupBy(_.k)
      .scan(0L)((k, s, e) => (s + 1, Some((k, e.seq, s + 1))))
      .collect().toSet
    assert(counts == Set(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L)))
  }

  test("typed maxBy emits on strict improvement in seq order") {
    val out = events.groupBy(_.k).maxBy(_.v).collect().toSet
    assert(out == Set(Ev("a", 1, 5.0), Ev("a", 3, 7.0), Ev("b", 4, 1.0)))
  }

  test("typed last reduces batch groups to the final record") {
    val out = events.groupBy(_.k).last().collect().toSet
    assert(out == Set(Ev("a", 3, 7.0), Ev("b", 4, 1.0)))
  }

  test("typed reduce emits the running pairwise fold per key in seq order") {
    val out = events.groupBy(_.k)
      .reduce((a, b) => Ev(b.k, b.seq, a.v + b.v))
      .collect().toSet
    assert(out == Set(
      Ev("a", 1, 5.0), Ev("a", 2, 8.0), Ev("a", 3, 15.0), Ev("b", 4, 1.0)))
  }

  test("typed reduce runs streaming with identical semantics") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = TypedStream(in.toDS(), (e: Ev) => e.seq)
      .groupBy(_.k).reduce((a, b) => Ev(b.k, b.seq, a.v + b.v))
    val name = s"reduce_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      in.addData(Ev("a", 1, 5.0), Ev("a", 2, 3.0))
      q.processAllAvailable()
      in.addData(Ev("a", 3, 7.0), Ev("b", 4, 1.0))
      q.processAllAvailable()
      assert(spark.table(name).as[Ev].collect().toSet == Set(
        Ev("a", 1, 5.0), Ev("a", 2, 8.0), Ev("a", 3, 15.0), Ev("b", 4, 1.0)),
        "state carries across micro-batches; fold order = seq order within batch")
    } finally q.stop()
  }

  test("typed left enrichment join over batch datasets") {
    val rights = TypedStream(Seq(RRec("a", 2, 100)).toDS(), (r: RRec) => r.seq)
    val lefts = TypedStream(
      Seq(LRec("a", 1, 10), LRec("a", 3, 11), LRec("b", 4, 12)).toDS(), (l: LRec) => l.seq)
    val out = lefts.leftJoin(rights)(_.k, _.k)((l, r) => Pair(l, r)).collect().toSet
    assert(out == Set(
      Pair(Some(LRec("a", 1, 10)), None),
      Pair(Some(LRec("a", 3, 11)), Some(RRec("a", 2, 100))),
      Pair(Some(LRec("b", 4, 12)), None)))
  }
}
