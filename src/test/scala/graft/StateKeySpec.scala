package graft

import java.sql.Timestamp

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{BinaryType, IntegerType, StructType}
import graft.api.MStream

/**
 * The keyed-state operators must group on NATIVE key columns, never on a
 * kryo-serialized blob: the grouping attributes are what the state
 * exchange partitions on AND what the state-store persists as checkpoint
 * keys. A binary grouping attribute would mean (a) no codegen'd hashing /
 * exchange reuse and (b) a checkpoint key format tied to kryo's byte
 * layout of a Scala collection — orphaned state on any Spark/kryo/Scala
 * upgrade. These specs pin the grouping attributes of every
 * flatMapGroupsWithState lowering (scan, enrichment join, as-of) to named,
 * typed columns.
 */
class StateKeySpec extends SparkSpec {
  import spark.implicits._

  /** Grouping attributes of every FlatMapGroupsWithState node in `plan`
    * (matched by node name; the catalyst case class is not in our API). */
  private def groupingAttrs(plan: LogicalPlan): Seq[Seq[Attribute]] =
    plan.collect {
      case p if p.nodeName == "FlatMapGroupsWithState" =>
        p.getClass.getMethod("groupingAttributes").invoke(p)
          .asInstanceOf[Seq[Attribute]]
    }

  private def assertNativeKeys(plan: LogicalPlan, expectNames: Seq[String]): Unit = {
    val groups = groupingAttrs(plan)
    assert(groups.nonEmpty, "plan must contain a FlatMapGroupsWithState node")
    groups.foreach { attrs =>
      assert(attrs.nonEmpty, "grouping attributes must not be empty")
      attrs.foreach(a => assert(a.dataType != BinaryType,
        s"grouping attribute ${a.name} is BinaryType — kryo-opaque state key"))
      assert(attrs.map(_.name) == expectNames,
        s"grouping attributes ${attrs.map(_.name)} != expected $expectNames")
    }
  }

  test("streaming sumBy groups state on the named key column, not a kryo blob") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = new MStream(in.toDF(), Seq("seq")).groupBy("k").sumBy(col("v"), "run")
    assertNativeKeys(out.df.queryExecution.analyzed, Seq("k"))
    val attrs = groupingAttrs(out.df.queryExecution.analyzed).head
    assert(attrs.head.dataType == org.apache.spark.sql.types.StringType)
  }

  test("streaming enrichment join groups state on the native __k struct") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[LRec]
    val rs = MemoryStream[RRec]
    val joined = new MStream(ls.toDF(), Seq("seq"))
      .leftJoin(new MStream(rs.toDF(), Seq("seq")))
      .on((l, r) => l("k") === r("k"))
      .select((l, r) => Seq(l("seq").as("lseq"), r("w").as("rw")))
    assertNativeKeys(joined.df.queryExecution.analyzed, Seq("__k"))
    val attrs = groupingAttrs(joined.df.queryExecution.analyzed).head
    assert(attrs.head.dataType.isInstanceOf[StructType],
      "join state key is the typed key struct")
  }

  test("streaming as-of join groups state on the native __k struct") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[AsofL]
    val rs = MemoryStream[AsofR]
    val out = graft.streaming.StreamingAsof.asofBackward(
      ls.toDF(), "lts", rs.toDF(), "rts", Seq("lk" -> "rk"), Seq("rid"))
    assertNativeKeys(out.queryExecution.analyzed, Seq("__k"))
  }

  test("unkeyed streaming scan groups on a constant INT key and still folds globally") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = new MStream(in.toDF(), Seq("seq")).sumBy(col("v"), "run")
    assertNativeKeys(out.df.queryExecution.analyzed, Seq("__gk"))
    val attrs = groupingAttrs(out.df.queryExecution.analyzed).head
    assert(attrs.head.dataType == IntegerType)
    val name = s"sk_${System.nanoTime()}"
    val q = out.df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Ev("a", 1, 5.0), Ev("b", 2, 3.0))
      in.addData(Ev("c", 3, 2.0))
      q.processAllAvailable()
      val got = spark.table(name).select("seq", "run").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 5.0), (2L, 8.0), (3L, 10.0)),
        "global running sum folds across keys and micro-batches")
    } finally q.stop()
  }
}
