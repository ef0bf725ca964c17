package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.sources.Tables

/**
 * Milan §2.2/2.3/2.7/2.8 surface as driver-checkable queries, each with a
 * DuckDB oracle twin (SparkEntry.oracleSql). Column names are aligned
 * between both sides — the driver sorts columns by name before hashing.
 */
object QueriesCore {

  /** Milan `map` + the scalar expression surface (ConstantValue, Plus/Minus,
    * IfThenElse, IsNull, ConvertType — `program/Expression.scala`). */
  def qMapScalar(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).map(
      col("l_orderkey"),
      col("l_linenumber"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
      when(col("l_quantity") > 30.0, lit("bulk")).otherwise(lit("small")).as("size_class"),
      col("l_quantity").cast("long").as("qty_int"),
      (col("l_extendedprice") + col("l_tax") - col("l_discount")).as("adj")
    ).df

  val qMapScalarSql: String =
    """SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS disc_price,
       CASE WHEN l_quantity > 30.0 THEN 'bulk' ELSE 'small' END AS size_class,
       CAST(l_quantity AS BIGINT) AS qty_int,
       l_extendedprice + l_tax - l_discount AS adj
       FROM lineitem"""

  /** Milan `where` — predicate pushed to the parquet scan. */
  def qWhere(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R" &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .map(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .df

  val qWhereSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       WHERE l_returnflag = 'R' AND l_shipdate < TIMESTAMP '1998-01-01'"""

  /** Milan `addFields` — append computed fields, schema concat (TypeJoiner). */
  def qAddFields(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .addFields(
        "price_band" -> when(col("o_totalprice") > 200000.0, lit("high"))
          .when(col("o_totalprice") > 100000.0, lit("mid")).otherwise(lit("low")),
        "order_year" -> year(col("o_orderdate")).cast("int"))
      .df

  val qAddFieldsSql: String =
    """SELECT *,
       CASE WHEN o_totalprice > 200000.0 THEN 'high'
            WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'low' END AS price_band,
       CAST(year(o_orderdate) AS INT) AS order_year
       FROM orders"""

  /** Milan grouped `select` with the whole aggregate family:
    * sum/min/max/mean/count (`program/AggregateExpressions.scala`). */
  def qAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .select(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("cnt")).df

  val qAggSql: String =
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS cnt
       FROM lineitem GROUP BY l_returnflag, l_linestatus"""

  /** Milan `argmax`/`argmin` (`AggregateExpressions.scala:91,111`) +
    * `first`/`any` lowered to deterministic arg-orderings. */
  def qArgMinMax(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .select(
        max_by(col("event_id"), struct(col("value"), col("event_id"))).as("argmax_id"),
        min_by(col("event_id"), struct(col("value"), col("event_id"))).as("argmin_id"),
        min_by(col("value"), col("event_id")).as("first_value"),
        max_by(col("value"), col("event_id")).as("any_value")).df

  val qArgMinMaxSql: String =
    """WITH ranked AS (
         SELECT event_type, event_id, value,
           row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rmax,
           row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rmin
         FROM events)
       SELECT r.event_type,
         max(CASE WHEN r.rmax = 1 THEN r.event_id END) AS argmax_id,
         max(CASE WHEN r.rmin = 1 THEN r.event_id END) AS argmin_id,
         arg_min(r.value, r.event_id) AS first_value,
         arg_max(r.value, r.event_id) AS any_value
       FROM ranked r GROUP BY r.event_type"""

  /** Milan `union` (`lang/Stream.scala:135`) — bag union, no dedup. */
  def qUnion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
    val purchases = ev.where(col("event_type") === "purchase")
    clicks.union(purchases)
      .map(col("event_id"), col("user_id"), col("event_type"), col("value")).df
  }

  val qUnionSql: String =
    """SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'click'
       UNION ALL
       SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'purchase'"""

  /** Milan `unique`/UniqueBy: latest record per (group, extracted value),
    * then aggregate. */
  def qUnique(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .uniqueBy(Seq("user_id", "event_type"), Seq("ts_ns", "event_id"))
      .groupBy("event_type")
      .select(count(lit(1)).as("n_users"),
        round(sum(col("value")), 4).as("sum_latest_value")).df

  val qUniqueSql: String =
    """SELECT event_type, count(*) AS n_users,
       round(sum(value), 4) AS sum_latest_value
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1
       GROUP BY event_type"""

  /** Milan grouped-select after a 3-way enrichment chain — the BodaApp-style
    * relational composition; dims broadcast, fact shuffles once. */
  def qJoin3(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).df
    val o = Tables.orders(spark, dir).df
    val c = Tables.customer(spark, dir).df
    val n = Tables.nation(spark, dir).df
    MStream(li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey")))
      .groupBy("n_name")
      .select(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items")).df
  }

  val qJoin3Sql: String =
    """SELECT n_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       count(*) AS n_items
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name"""

  /** Pure range join (no equi key): returned lineitems shipped within 7
    * days of any urgent order's date — bucketized lowering, never the
    * BroadcastNestedLoopJoin a raw range predicate plans to. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val D = 86400000000L // micros per day
    // parquet dates are TIMESTAMP_NTZ; session tz is UTC, so the cast is
    // the identity wall-clock mapping DuckDB's epoch_us applies
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    // aggregation pushdown below the range join: ship dates are
    // day-granular, so collapsing the fact side to (day, count) first
    // shrinks the join from |lineitem|x(overlap) pairs (~19M at sf0.1) to
    // |distinct days| x(overlap) (~20k) — the count just becomes a sum
    val pts = Tables.lineitem(spark, dir).df.filter(col("l_returnflag") === "R")
      .select(us(col("l_shipdate")).as("__pt"))
      .groupBy("__pt").agg(count(lit(1)).as("__n"))
    val ivs = Tables.orders(spark, dir).df.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), us(col("o_orderdate")).as("__s"),
        (us(col("o_orderdate")) + lit(7L * D)).as("__e"))
    graft.operators.RangeJoins.pointInInterval(pts, "__pt", ivs, "__s", "__e",
        bucketWidth = 8L * D)
      .groupBy("o_orderkey").agg(sum(col("__n")).as("n_shipped"))
  }

  val qRangeJoinSql: String =
    """SELECT o_orderkey, count(*) AS n_shipped
       FROM orders o JOIN lineitem l
         ON l.l_returnflag = 'R' AND o.o_orderpriority = '1-URGENT'
        AND epoch_us(l.l_shipdate) >= epoch_us(o.o_orderdate)
        AND epoch_us(l.l_shipdate) <= epoch_us(o.o_orderdate) + 604800000000
       GROUP BY o_orderkey"""

  /** Backward as-of join: each purchase enriched with the user's most
    * recent click at-or-before the purchase, within a 1-hour tolerance —
    * the point-in-time lookup feature pipelines run (kdb `aj`, pandas
    * `merge_asof`, DuckDB `ASOF JOIN`). One shuffle on the user key; no
    * pair materialization (the oracle's quadratic join + argmax is
    * exactly what the operator avoids). */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).df
    // µs time axis on both sides: DuckDB reads the ns parquet at µs
    // precision, so the oracle's epoch_us IS `ts_ns div 1000` exactly
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        expr("ts_ns div 1000").as("p_ts"), col("value").as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        expr("ts_ns div 1000").as("c_ts"), col("value").as("c_value"))
    graft.operators.AsofJoins.asofBackward(purchases, "p_ts", clicks, "c_ts",
        keys = Seq("p_user" -> "c_user"), rightOrder = Seq("c_id"),
        tolerance = Some(3600L * 1000000L))
      .select(col("p_id"), col("p_user"), col("p_ts"), col("p_value"),
        col("c_id"), col("c_value"), (col("p_ts") - col("c_ts")).as("lag_us"))
  }

  val qAsofJoinSql: String =
    """WITH p AS (SELECT event_id AS p_id, user_id AS p_user, epoch_us(ts) AS p_ts,
                    value AS p_value
                  FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS c_id, user_id AS c_user, epoch_us(ts) AS c_ts,
                    value AS c_value
               FROM events WHERE event_type = 'click'),
         m AS (SELECT p.p_id AS m_pid, c.c_id, c.c_ts, c.c_value,
                 row_number() OVER (PARTITION BY p.p_id
                                    ORDER BY c.c_ts DESC, c.c_id DESC) AS rn
               FROM p JOIN c ON p.p_user = c.c_user
                AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - 3600000000)
       SELECT p.p_id, p.p_user, p.p_ts, p.p_value, m.c_id, m.c_value,
              p.p_ts - m.c_ts AS lag_us
       FROM p LEFT JOIN m ON p.p_id = m.m_pid AND m.rn = 1"""

  /** Forward as-of: each purchase matched to the EARLIEST click at-or-after
    * it within 1 h (first-wins ties on click id) — e.g. "next user action
    * after a conversion". Mirror of q_asof_join with the frame reversed. */
  def qAsofFwd(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).df
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        expr("ts_ns div 1000").as("p_ts"), col("value").as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        expr("ts_ns div 1000").as("c_ts"), col("value").as("c_value"))
    graft.operators.AsofJoins.asofForward(purchases, "p_ts", clicks, "c_ts",
        keys = Seq("p_user" -> "c_user"), rightOrder = Seq("c_id"),
        tolerance = Some(3600L * 1000000L))
      .select(col("p_id"), col("p_user"), col("p_ts"), col("p_value"),
        col("c_id"), col("c_value"), (col("c_ts") - col("p_ts")).as("lead_us"))
  }

  val qAsofFwdSql: String =
    """WITH p AS (SELECT event_id AS p_id, user_id AS p_user, epoch_us(ts) AS p_ts,
                    value AS p_value
                  FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS c_id, user_id AS c_user, epoch_us(ts) AS c_ts,
                    value AS c_value
               FROM events WHERE event_type = 'click'),
         m AS (SELECT p.p_id AS m_pid, c.c_id, c.c_ts, c.c_value,
                 row_number() OVER (PARTITION BY p.p_id
                                    ORDER BY c.c_ts ASC, c.c_id ASC) AS rn
               FROM p JOIN c ON p.p_user = c.c_user
                AND c.c_ts >= p.p_ts AND c.c_ts <= p.p_ts + 3600000000)
       SELECT p.p_id, p.p_user, p.p_ts, p.p_value, m.c_id, m.c_value,
              m.c_ts - p.p_ts AS lead_us
       FROM p LEFT JOIN m ON p.p_id = m.m_pid AND m.rn = 1"""

  /** Program-as-data import path (milan `ApplicationInstance.toJsonString`
    * + `TreeParser`; built from JSON by
    * `tools/CompileApplicationInstance.scala:28`): the same aggregation as
    * q_agg, but arriving as a JSON artifact — parsed, validated, lowered
    * through `Program.interpret`, and run under a config that binds the
    * lineitem parquet by name. Same oracle SQL as q_agg, so the import
    * path is hash-verified against DuckDB. */
  def qProgramAgg(spark: SparkSession, dir: String): DataFrame = {
    val programJson =
      """{"nodes": [
           {"op": "external", "name": "lineitem"},
           {"op": "groupSelect", "name": "out", "input": "lineitem",
            "keys": ["l_returnflag", "l_linestatus"],
            "aggs": [
              {"expr": "sum(l_quantity)", "as": "sum_qty"},
              {"expr": "round(sum(l_extendedprice), 2)", "as": "sum_base"},
              {"expr": "min(l_quantity)", "as": "min_qty"},
              {"expr": "max(l_quantity)", "as": "max_qty"},
              {"expr": "round(avg(l_discount), 6)", "as": "avg_disc"},
              {"expr": "count(1)", "as": "cnt"}]}],
         "outputs": ["out"]}"""
    val config = new graft.api.App.Config()
      .setSource("lineitem", graft.api.App.Source(
        format = "parquet", path = Some(s"$dir/lineitem.parquet")))
      .addSink("out", graft.api.App.Sink(format = "memory"))
    graft.api.App.runProgram(spark, config, programJson)
      .collectFirst { case graft.api.App.BatchOutput("out", out) => out }.get
  }

  val qProgramAggSql: String = qAggSql

  /** Program CAPTURE path (milan `graph/StreamCollection.scala:9-31` build →
    * `application/ApplicationInstance.scala:27` toJsonString): the q_agg
    * pipeline is composed on the RECORDING surface (`Program.Rec`), captured
    * to a document, serialized, re-parsed, and executed via `runProgram` —
    * the full author-in-Scala / ship-JSON flow, hash-verified against the
    * same DuckDB oracle as q_agg. */
  def qCaptureAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Program
    val rec = Program.Rec.external("lineitem", Tables.lineitem(spark, dir))
      .groupSelect(Seq("l_returnflag", "l_linestatus"),
        "sum(l_quantity)" -> "sum_qty",
        "round(sum(l_extendedprice), 2)" -> "sum_base",
        "min(l_quantity)" -> "min_qty",
        "max(l_quantity)" -> "max_qty",
        "round(avg(l_discount), 6)" -> "avg_disc",
        "count(1)" -> "cnt").as("out")
    val programJson = Program.toJson(Program.capture(rec))
    val config = new graft.api.App.Config()
      .setSource("lineitem", graft.api.App.Source(
        format = "parquet", path = Some(s"$dir/lineitem.parquet")))
      .addSink("out", graft.api.App.Sink(format = "memory"))
    graft.api.App.runProgram(spark, config, programJson)
      .collectFirst { case graft.api.App.BatchOutput("out", out) => out }.get
  }

  val qCaptureAggSql: String = qAggSql

  /** Milan's serializable UDF escape hatch
    * (`ApplyFunction(FunctionReference(type, name), args)`,
    * `program/Expression.scala:407`, `program/FunctionReference.scala`) as
    * a program document: three functions registered by NAME in
    * `Program.Functions` (column builders — codegen'd Catalyst
    * expressions, not Scala UDFs), referenced from `applyFn` nodes in all
    * three positions (addField, where, map) of a JSON document that ships
    * through the codec and runs via `App.runProgram`. The oracle mirrors
    * each function's definition in DuckDB SQL, so the whole
    * register → serialize → load → resolve-by-name → execute path is
    * hash-verified. */
  def qProgramFn(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.Program
    Program.Functions.register("norm_text", 1)(a =>
      lower(regexp_replace(a.head, "[^A-Za-z0-9 ]", " ")))
    Program.Functions.register("is_substantial", 2)(a => length(a.head) >= a(1))
    Program.Functions.register("fmt_doc_stats", 3)(a => concat_ws(":", a: _*))
    val programJson =
      """{"nodes": [
           {"op": "external", "name": "documents"},
           {"op": "applyFn", "name": "n", "input": "documents",
            "function": "norm_text", "args": ["text"], "kind": "addField", "as": "norm"},
           {"op": "applyFn", "name": "f", "input": "n",
            "function": "is_substantial", "args": ["norm", "200"], "kind": "where"},
           {"op": "groupSelect", "name": "g", "input": "f", "keys": ["lang"],
            "aggs": [{"expr": "count(1)", "as": "cnt"},
                     {"expr": "sum(length(norm))", "as": "total_len"}]},
           {"op": "applyFn", "name": "out", "input": "g",
            "function": "fmt_doc_stats", "args": ["lang", "cnt", "total_len"],
            "kind": "map", "as": "summary"}],
         "outputs": ["out"]}"""
    val config = new graft.api.App.Config()
      .setSource("documents", graft.api.App.Source(
        format = "parquet", path = Some(s"$dir/documents.parquet")))
      .addSink("out", graft.api.App.Sink(format = "memory"))
    graft.api.App.runProgram(spark, config, programJson)
      .collectFirst { case graft.api.App.BatchOutput("out", out) => out }.get
  }

  val qProgramFnSql: String =
    """WITH n AS (
         SELECT *, lower(regexp_replace(text, '[^A-Za-z0-9 ]', ' ', 'g')) AS norm
         FROM documents),
       f AS (SELECT * FROM n WHERE length(norm) >= 200),
       g AS (SELECT lang, count(*) AS cnt,
                    CAST(sum(length(norm)) AS BIGINT) AS total_len
             FROM f GROUP BY lang)
       SELECT concat_ws(':', lang, cnt, total_len) AS summary FROM g"""

  /** Iterative dataflow through the program-document cycle surface (milan
    * `beginCycle`/`closeCycle`, `lang/CycleStream.scala:22`,
    * `program/StreamExpressions.scala:141`): per-order base-10 shift chains
    * (x, x div 10, ... while > 0) as the batch SET least-fixpoint
    * H = distinct(init ∪ F(H)), driver-iterated with per-round checkpoints
    * (`Cycles.iterate`). The document ships through the JSON codec and
    * executes via `App.runProgram`, so the oracle row set certifies the
    * whole serialize → load → cycle-lowering path. DuckDB mirror: recursive
    * CTE with UNION (set semantics — the same fixpoint). */
  def qCycle(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.{App, Program}
    import graft.api.Program._
    val doc = Doc(
      nodes = Seq(
        External("orders"),
        MapCols("init", "orders", Seq(
          Field("o_orderkey", "id"),
          Field("CAST(floor(o_totalprice) AS BIGINT)", "x"))),
        BeginCycle("chain", "init", 50),
        MapCols("shift", "chain", Seq(Field("id", "id"), Field("x div 10", "x"))),
        Where("fb", "shift", "x > 0"),
        CloseCycle("out", "chain", "fb")),
      outputs = Seq("out"))
    val config = new App.Config()
      .setSource("orders", App.Source(
        format = "parquet", path = Some(s"$dir/orders.parquet")))
      .addSink("out", App.Sink(format = "memory"))
    App.runProgram(spark, config, Program.toJson(doc))
      .collectFirst { case App.BatchOutput("out", out) => out }.get
  }

  val qCycleSql: String =
    """WITH RECURSIVE h(id, x) AS (
      |  SELECT o_orderkey AS id, CAST(floor(o_totalprice) AS BIGINT) AS x FROM orders
      |  UNION
      |  SELECT id, x // 10 FROM h WHERE (x // 10) > 0
      |) SELECT id, x FROM h""".stripMargin

  /** The JOIN-BODY cycle twin of q_cycle: reachability over a +120 ring on
    * custkey residues (out-degree 1 — milan's enrichment join pairs each
    * left with ONE right). The body is linear in the head AND contains a
    * head-dependent join, so the auto strategy lowers through SEMI-NAIVE
    * delta evaluation (`Cycles.iterateDelta` — frontier-only rounds,
    * exact empty-delta termination after the 3-step rings close): this
    * query puts the delta machinery itself under the DuckDB oracle, where
    * q_cycle's row-local body exercises the naive path (deeper-round
    * behavior incl. the round-8 consolidation is spec-pinned —
    * StreamingCycleSpec's seeded random-graph equivalence). */
  def qCycleDelta(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.{App, Program}
    import graft.api.Program._
    val doc = Doc(
      nodes = Seq(
        External("orders"),
        MapCols("edges0", "orders", Seq(
          Field("o_custkey % 360", "src"),
          Field("(o_custkey % 360 + 120) % 360", "dst"))),
        OrderBy("edges", "edges0", Seq("src", "dst")),
        MapCols("ids", "orders", Seq(Field("o_custkey % 360", "id"))),
        Where("seeds0", "ids", "id % 60 = 0"),
        OrderBy("seeds", "seeds0", Seq("id")),
        BeginCycle("reach", "seeds", 30),
        Join("step", "leftInner", "reach", "edges", "l.id = r.src",
          Seq(Field("r.dst", "id"))),
        CloseCycle("out", "reach", "step")),
      outputs = Seq("out"))
    val config = new App.Config()
      .setSource("orders", App.Source(
        format = "parquet", path = Some(s"$dir/orders.parquet")))
      .addSink("out", App.Sink(format = "memory"))
    App.runProgram(spark, config, Program.toJson(doc))
      .collectFirst { case App.BatchOutput("out", out) => out }.get
  }

  val qCycleDeltaSql: String =
    """WITH RECURSIVE
      |e AS (SELECT DISTINCT o_custkey % 360 AS src, (o_custkey % 360 + 120) % 360 AS dst FROM orders),
      |s AS (SELECT DISTINCT o_custkey % 360 AS id FROM orders WHERE (o_custkey % 360) % 60 = 0),
      |h(id) AS (SELECT id FROM s UNION SELECT e.dst FROM h JOIN e ON h.id = e.src)
      |SELECT id FROM h""".stripMargin
}
