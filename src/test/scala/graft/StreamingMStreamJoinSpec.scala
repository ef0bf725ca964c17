package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.api.MStream

/** The SAME MStream join program lowers to stateful streaming when its
  * inputs are streaming DataFrames — reference emission rules hold. */
class StreamingMStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("MStream leftJoin over streaming inputs follows enrichment semantics") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[LRec]
    val rs = MemoryStream[RRec]
    val lefts = new MStream(ls.toDF(), Seq("seq"))
    val rights = new MStream(rs.toDF(), Seq("seq"))
    val joined = lefts.leftJoin(rights)
      .on((l, r) => l("k") === r("k") && r("w") > 50)
      .select((l, r) => Seq(
        l("seq").as("lseq"), r("w").as("rw")))
    assert(joined.df.isStreaming, "streaming inputs produce a streaming plan")
    val name = s"msj_${System.nanoTime()}"
    val q = joined.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def emitted(): Set[(Long, Option[Int])] = {
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Int]))).toSet
      }
      ls.addData(LRec("a", 1, 10))
      assert(emitted() == Set((1L, None)), "unmatched left emits null right")
      rs.addData(RRec("a", 2, 30)) // fails precondition w > 50
      assert(emitted().size == 1, "right arrival emits nothing")
      ls.addData(LRec("a", 3, 11))
      assert(emitted().contains((3L, None)), "precondition-filtered right never pairs")
      rs.addData(RRec("a", 4, 100))
      ls.addData(LRec("a", 5, 12))
      assert(emitted().contains((5L, Some(100))), "left pairs with latest passing right")
    } finally q.stop()
  }

  test("streaming fullJoin with residual is reference-strict: failing pair emits NOTHING") {
    // the reference's FullJoinKeyedCoProcessFunction.scala:57-79 collects
    // ONLY inside `if (postCondition(...))` — a failing pair produces no
    // output record at all; this trace mirrors that gate event by event
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[LRec]
    val rs = MemoryStream[RRec]
    val joined = new MStream(ls.toDF(), Seq("seq"))
      .fullJoin(new MStream(rs.toDF(), Seq("seq")))
      .on((l, r) => l("k") === r("k") && r("w") > l("v") * 10)
      .select((l, r) => Seq(l("seq").as("lseq"), r("w").as("rw")))
    assert(joined.df.isStreaming)
    val name = s"msjf_${System.nanoTime()}"
    val q = joined.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def emitted(): List[(Option[Long], Option[Int])] = {
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
                     Option(r.get(1)).map(_.asInstanceOf[Int]))).toList
      }
      rs.addData(RRec("a", 1, 100))
      assert(emitted().isEmpty,
        "right with no left: residual on a null left fails -> nothing (reference trace)")
      ls.addData(LRec("a", 2, 5))   // 100 > 50 → pairs
      assert(emitted() == List((Some(2L), Some(100))))
      ls.addData(LRec("a", 3, 50))  // 100 > 500 fails → NOTHING emitted
      assert(emitted().size == 1, "failing residual suppresses the arrival")
      rs.addData(RRec("a", 4, 600)) // 600 > 500 → pairs with latest left
      assert(emitted().contains((Some(3L), Some(600))))
      rs.addData(RRec("a", 5, 400)) // 400 > 500 fails → NOTHING
      assert(emitted().size == 2, "failing residual on right arrival suppresses too")
    } finally q.stop()
  }

  test("streaming fullJoin .lenient(): failing pair keeps arriving side, nulls other") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[LRec]
    val rs = MemoryStream[RRec]
    val joined = new MStream(ls.toDF(), Seq("seq"))
      .fullJoin(new MStream(rs.toDF(), Seq("seq"))).lenient()
      .on((l, r) => l("k") === r("k") && r("w") > l("v") * 10)
      .select((l, r) => Seq(l("seq").as("lseq"), r("w").as("rw")))
    assert(joined.df.isStreaming)
    val name = s"msjfl_${System.nanoTime()}"
    val q = joined.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def emitted(): Set[(Option[Long], Option[Int])] = {
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
                     Option(r.get(1)).map(_.asInstanceOf[Int]))).toSet
      }
      rs.addData(RRec("a", 1, 100))
      assert(emitted() == Set((None, Some(100))), "right with no left emits (None, r)")
      ls.addData(LRec("a", 2, 5))   // 100 > 50 → pairs
      assert(emitted().contains((Some(2L), Some(100))))
      ls.addData(LRec("a", 3, 50))  // 100 > 500 fails → right nulled, left kept
      assert(emitted().contains((Some(3L), None)), "failing residual keeps arriving left")
      rs.addData(RRec("a", 4, 600)) // 600 > 500 → pairs with latest left
      assert(emitted().contains((Some(3L), Some(600))))
      rs.addData(RRec("a", 5, 400)) // 400 > 500 fails → left nulled, right kept
      assert(emitted().contains((None, Some(400))), "failing residual keeps arriving right")
    } finally q.stop()
  }

  test("streaming leftInnerJoin with residual: lefts wait for a right that satisfies it") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[LRec]
    val rs = MemoryStream[RRec]
    val joined = new MStream(ls.toDF(), Seq("seq"))
      .leftInnerJoin(new MStream(rs.toDF(), Seq("seq")))
      .on((l, r) => l("k") === r("k") && r("w") > l("v") * 10)
      .select((l, r) => Seq(l("seq").as("lseq"), r("w").as("rw")))
    assert(joined.df.isStreaming)
    val name = s"msjl_${System.nanoTime()}"
    val q = joined.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      def emitted(): Set[(Long, Int)] = {
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSet
      }
      ls.addData(LRec("a", 1, 5))
      assert(emitted().isEmpty, "left buffers with no right")
      rs.addData(RRec("a", 2, 30)) // 30 > 50 fails: pending left stays buffered
      assert(emitted().isEmpty, "non-satisfying right releases nothing")
      ls.addData(LRec("a", 3, 2))  // latest right 30 > 20 → immediate
      assert(emitted() == Set((3L, 30)), "left pairs immediately when residual holds")
      rs.addData(RRec("a", 4, 100)) // 100 > 50 → releases the seq=1 left
      assert(emitted().contains((1L, 100)), "buffered left released by first satisfying right")
      ls.addData(LRec("a", 5, 50))  // 100 > 500 fails → buffers
      rs.addData(RRec("a", 6, 600)) // 600 > 500 → releases it
      assert(emitted().contains((5L, 600)))
      assert(emitted().size == 3, "each left emits exactly once")
    } finally q.stop()
  }

  test("cross-side residual nulls the paired right when unsatisfied") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[LRec]
    val rs = MemoryStream[RRec]
    val joined = new MStream(ls.toDF(), Seq("seq"))
      .leftJoin(new MStream(rs.toDF(), Seq("seq")))
      .on((l, r) => l("k") === r("k") && r("w") > l("v") * 10)
      .select((l, r) => Seq(l("seq").as("lseq"), r("w").as("rw")))
    val name = s"msjr_${System.nanoTime()}"
    val q = joined.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      rs.addData(RRec("a", 1, 100))
      ls.addData(LRec("a", 2, 5))   // 100 > 50 → pairs
      ls.addData(LRec("a", 3, 50))  // 100 > 500 fails → null right
      q.processAllAvailable()
      val out = spark.table(name).collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Int]))).toSet
      assert(out == Set((2L, Some(100)), (3L, None)))
    } finally q.stop()
  }
}
