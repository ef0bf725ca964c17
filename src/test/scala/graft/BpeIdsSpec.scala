package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.TextOps

/** BPE tokenization to vocabulary ids (`bpeEncodeIds`): the id space is
  * derivable from the merge table ALONE (in-merge alphabet in UTF-8
  * order, then merge outputs by first rank — the HuggingFace-BPE
  * layout), pinned against a plain-Scala reference of both the greedy
  * merge application and the id assignment; plus duplicate-output
  * dedup, streaming == batch, the node codec, and the contracts. */
class BpeIdsSpec extends SparkSpec {
  import spark.implicits._

  private val S = "\u0002"
  private val E = "\u0003"

  /** Plain-Scala reference: bracketed-symbol greedy merge application
    * (String.replace = left-to-right non-overlapping, exactly the
    * engine's codegen'd replace chain) + the documented id layout. */
  private def refIds(text: String, merges: Seq[(String, String)],
                     oovId: Long): Seq[Long] = {
    val outs = merges.zipWithIndex.groupBy { case ((a, b), _) => a + b }
      .map { case (p, xs) => p -> xs.map(_._2).min }
    val atoms = merges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .filterNot(outs.contains)
      .sorted // ASCII fixtures: natural order == UTF-8 byte order
    val idOf = (atoms.zipWithIndex.map { case (p, i) => p -> i.toLong } ++
      outs.toSeq.sortBy(_._2).zipWithIndex
        .map { case ((p, _), i) => p -> (atoms.length + i).toLong }).toMap
    text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      val wrapped = w.codePoints().toArray
        .map(cp => S + new String(Character.toChars(cp)) + E).mkString
      val merged = merges.foldLeft(wrapped) { case (s, (a, b)) =>
        s.replace(S + a + E + S + b + E, S + a + b + E)
      }
      merged.split(s"[$S$E]").filter(_.nonEmpty).toSeq
        .map(p => idOf.getOrElse(p, oovId))
    }
  }

  private def mergesDf(ms: Seq[(String, String)]) =
    ms.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("merge_rank", "lhs", "rhs")

  private val fixtures = Seq(
    (1L, "abcd ddd"), (2L, "xy abab"), (3L, ""), (4L, "abc d a"))

  test("ids == the definitional merge walk + HuggingFace id layout") {
    val ms = Seq(("a", "b"), ("ab", "c"), ("d", "d"))
    val got = TextOps.bpeEncodeIds(MStream(fixtures.toDF("doc_id", "text")),
        mergesDf(ms), "text")
      .df.select(col("doc_id"), col("ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    fixtures.foreach { case (id, text) =>
      assert(got(id) == refIds(text, ms, -1L), s"doc $id ('$text')")
    }
    // the layout by hand: atoms a=0 b=1 c=2 d=3, outputs ab=4 abc=5 dd=6
    assert(got(1L) == Seq(5L, 3L, 6L, 3L), "abcd -> [abc d], ddd -> [dd d]")
    assert(got(2L) == Seq(-1L, -1L, 4L, 4L), "unknown chars take oovId")
    assert(got(3L) == Seq())
  }

  test("two merges producing the same string share ONE id (first rank)") {
    val ms = Seq(("a", "bc"), ("ab", "c"))
    val got = TextOps.bpeEncodeIds(MStream(Seq((1L, "abc bc ab"))
        .toDF("doc_id", "text")), mergesDf(ms), "text")
      .df.select(col("ids")).head().getSeq[Long](0)
    // atoms sorted: a=0 ab=1 bc=2 c=3; output abc=4 (dedup to rank 0).
    // "abc" never merges (chars are separate symbols): [a b c] with b
    // OOV; "bc"/"ab" are single words whose chars stay apart too
    assert(got == refIds("abc bc ab", ms, -1L))
    assert(got == Seq(0L, -1L, 3L, -1L, 3L, 0L, -1L))
  }

  test("streaming == batch (zero-shuffle projection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val ms = mergesDf(Seq(("a", "b"), ("ab", "c")))
    val batch = TextOps.bpeEncodeIds(MStream(fixtures.toDF("doc_id", "text")),
        ms, "text")
      .df.select(col("doc_id"), col("ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val in = MemoryStream[(Long, String)]
    val out = TextOps.bpeEncodeIds(MStream(in.toDF().toDF("doc_id", "text")),
      ms, "text")
    assert(out.df.isStreaming)
    in.addData(fixtures: _*)
    val name = s"bpeids_${System.nanoTime()}"
    val q = out.df.select(col("doc_id"), col("ids")).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L))
      assert(spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap == batch)
    } finally q.stop()
  }

  test("BpeIds node: v11 stamp, codec identity, document run == direct API") {
    import graft.api.{App, Program}
    import graft.api.Program._
    val d = Doc(Seq(External("in"), External("m"),
      BpeIds("a", "in", "m", "text")), Seq("a"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":11") && Program.fromJson(json) == d)
    val docs = fixtures.toDF("doc_id", "text")
    val ms = mergesDf(Seq(("a", "b"), ("ab", "c"), ("d", "d")))
    try {
      val cap = Program.capture(
        Program.Rec.external("in", MStream(docs))
          .bpeEncodeIds(Program.Rec.external("m", MStream(ms)), "text").as("a"))
      assert(Program.fromJson(Program.toJson(cap)) == cap)
      val config = new App.Config()
        .setSource("in", App.Source("list", rows = Some(docs)))
        .setSource("m", App.Source("list", rows = Some(ms)))
        .addSink("a", App.Sink("memory"))
      Program.validate(cap, spark, config)
      val out = App.runProgram(spark, config, Program.toJson(cap))
        .collectFirst { case App.BatchOutput("a", o) => o }.get
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
      val direct = TextOps.bpeEncodeIds(MStream(docs), ms, "text")
        .df.select(col("doc_id"), col("ids")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(out == direct, "document execution equals the direct API")
    } finally graft.api.Pinned.release(spark)
  }

  test("contracts: empty merges, column collision, streaming merges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = fixtures.toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException](TextOps.bpeEncodeIds(
      MStream(docs), mergesDf(Nil), "text"))
      .getMessage.contains("1..65536"))
    assert(intercept[IllegalArgumentException](TextOps.bpeEncodeIds(
      MStream(docs.withColumn("ids", lit(1))),
      mergesDf(Seq(("a", "b"))), "text"))
      .getMessage.contains("ids"))
    val streamingMerges = MemoryStream[(Int, String, String)].toDF()
      .toDF("merge_rank", "lhs", "rhs")
    assert(intercept[IllegalArgumentException](TextOps.bpeEncodeIds(
      MStream(docs), streamingMerges, "text"))
      .getMessage.contains("batch artifact"))
  }
}
