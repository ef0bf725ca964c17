package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.MStream

/**
 * Batch table loaders over the driver-provided parquet star schema
 * (/root/repo/TESTDATA.md). The Milan analog is `FileDataSource` +
 * format (`application/sources/FileDataSource.scala:22`); Spark's
 * DataSource API already separates format from location, so these are
 * thin, schema-aware wrappers.
 */
object Tables {
  /** Schema memo per (path, conf-variant): a bare `read.parquet(path)`
    * runs a footer-reading schema-INFERENCE job on every call — one
    * driver-visible job per table per query, ~0.1-0.8 s each on this
    * harness (measured as the "parquet at Tables.scala" stage in every
    * event-log profile). A catalog table (Hive/Iceberg/Delta) never pays
    * it because the schema is known metadata; this memo gives the
    * path-based star schema the same posture. METADATA only — every
    * query still computes from the parquet files; the first read of a
    * path infers, later reads plan straight from the cached StructType.
    *
    * CONTRACT: a memoized path is STATIC-SCHEMA for the life of the JVM —
    * exactly the driver-provided star schema's posture (the test fixtures
    * are never rewritten inside one process). The memo never invalidates
    * on its own: a process that rewrites a Tables-read path with a
    * DIFFERENT schema must call [[invalidate]] (or [[clearSchemaCache]])
    * first, or later reads plan against the stale StructType (renamed /
    * added columns surface as nulls instead of errors). Artifact
    * round-trip paths (tmp exports, model files) are NOT routed through
    * Tables and never hit this memo. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Drop every memoized schema whose key starts with `path` (both the
    * plain and conf-variant entries) — call before re-reading a path that
    * was rewritten with a different schema. */
  def invalidate(path: String): Unit =
    schemaCache.keySet.removeIf(_.startsWith(path))

  /** Drop the whole schema memo (test isolation / fixture regeneration). */
  def clearSchemaCache(): Unit = schemaCache.clear()

  private def readCached(spark: SparkSession, path: String,
                         variant: String = ""): DataFrame = {
    val key = path + variant
    val cached = schemaCache.get(key)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val d = spark.read.parquet(path)
      schemaCache.putIfAbsent(key, d.schema)
      d
    }
  }

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    readCached(spark, s"$dir/$name.parquet")

  def stream(spark: SparkSession, dir: String, name: String): MStream =
    MStream(df(spark, dir, name))

  /**
   * The `events` table's `ts` column has shipped in two physical forms:
   * TIMESTAMP(NANOS) (which Spark's µs TimestampType cannot represent —
   * read as raw nanos via `nanosAsLong`) and TIMESTAMP(MICROS) without
   * timezone (read as TIMESTAMP_NTZ). Either way we expose BOTH: `ts_ns`
   * (exact epoch nanos, used for ordering and exact window arithmetic)
   * and `ts` (TimestampType, for Spark windowing / streaming watermarks).
   * The naive µs form is interpreted as UTC — the session timezone is
   * pinned to UTC by every entry point, matching DuckDB's `epoch_ns` over
   * the same file. Arrival order := (ts_ns, event_id) — unique.
   */
  def events(spark: SparkSession, dir: String): MStream = {
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw =
      try readCached(spark, s"$dir/events.parquet", variant = "#nanosAsLong")
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    val norm = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          // integral `div`, NOT floor(x/1000): double division loses
          // precision at ns-scale epochs (ulp of 1.7e18 is 256) and
          // truncates off-by-one
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        // µs-precision timestamp (TIMESTAMP or TIMESTAMP_NTZ): the
        // NTZ→timestamp cast applies the session timezone, pinned UTC
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        // a third driver-side schema drift (STRING, DATE, ...) must fail
        // fast, not cast to null ts rows and silently wrong query output
        throw new IllegalStateException(
          s"events.ts has unexpected physical type $other " +
            "(expected INT64 nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
    new MStream(norm, Seq("ts_ns", "event_id"))
  }

  def lineitem(spark: SparkSession, dir: String): MStream = stream(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): MStream = stream(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): MStream = stream(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): MStream = stream(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): MStream = stream(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): MStream = stream(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): MStream = stream(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): MStream = stream(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): MStream = stream(spark, dir, "embeddings")
}
