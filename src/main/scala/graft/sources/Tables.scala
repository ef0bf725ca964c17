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
  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def stream(spark: SparkSession, dir: String, name: String): MStream =
    MStream(df(spark, dir, name))

  /**
   * The `events` table carries TIMESTAMP(NANOS) which Spark's TimestampType
   * (µs) cannot represent. We read it as raw nanos (`nanosAsLong`) and
   * expose BOTH: `ts_ns` (exact, used for ordering and exact window
   * arithmetic) and `ts` (µs-truncated TimestampType, for Spark windowing /
   * streaming watermarks). Arrival order := (ts_ns, event_id) — unique.
   */
  def events(spark: SparkSession, dir: String): MStream = {
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw =
      try spark.read.parquet(s"$dir/events.parquet")
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    val norm = raw
      .withColumnRenamed("ts", "ts_ns")
      // integral `div`, NOT floor(x/1000): double division loses precision
      // at ns-scale epochs (ulp of 1.7e18 is 256) and truncates off-by-one
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
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
