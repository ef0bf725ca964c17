package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/**
 * Milan's application model, Spark-first (reference:
 * `application/Application.scala:13`, `ApplicationConfiguration.scala:29`,
 * `ApplicationInstance.scala:14`): the *program* is pure dataflow over
 * named external streams; *sources and sinks are bound by name outside the
 * program* in a configuration object. Program + configuration = runnable
 * instance, in batch (finite sources) or streaming (Structured Streaming)
 * mode from the same program.
 */
object App {

  /** Where/how to read a named external stream
    * (Milan `FileDataSource`/`ListDataSource` etc. + `DataFormat`). */
  final case class Source(
      format: String,
      path: Option[String] = None,
      options: Map[String, String] = Map.empty,
      schema: Option[StructType] = None,
      /** Milan `ReadMode.KeepReading` = streaming, `Once` = batch. */
      keepReading: Boolean = false,
      /** For in-memory list sources (Milan `ListDataSource`). */
      rows: Option[DataFrame] = None,
      /** Arrival-order columns for stateful batch operators. */
      order: Seq[String] = Nil)

  /** Where/how to write a named output stream
    * (Milan `FileDataSink`/`ConsoleDataSink`/`SingletonMemorySink`). */
  final case class Sink(
      format: String,
      path: Option[String] = None,
      options: Map[String, String] = Map.empty,
      mode: String = "overwrite",
      /** streaming only: update/append/complete */
      outputMode: String = "update",
      /** memory sink table name (the test oracle, like SingletonMemorySink). */
      queryName: Option[String] = None)

  /** Milan `ApplicationConfiguration`: name → source / sinks bindings. */
  final class Config {
    private var sources = Map.empty[String, Source]
    private var sinks = Map.empty[String, Seq[Sink]]
    def setSource(stream: String, s: Source): Config = { sources += stream -> s; this }
    def addSink(stream: String, s: Sink): Config = {
      sinks += stream -> (sinks.getOrElse(stream, Nil) :+ s); this
    }
    def source(stream: String): Source = sources.getOrElse(stream,
      throw new IllegalArgumentException(s"no source bound for stream '$stream'"))
    def sinkList(stream: String): Seq[Sink] = sinks.getOrElse(stream, Nil)
    def sinkStreams: Seq[String] = sinks.keys.toSeq
  }

  /** One running output: batch results are materialized DataFrames,
    * streaming outputs are live queries. */
  sealed trait Running
  final case class BatchOutput(stream: String, df: DataFrame) extends Running
  final case class StreamingOutput(stream: String, query: StreamingQuery) extends Running

  private def readSource(spark: SparkSession, s: Source): MStream = {
    val df = s.rows.getOrElse {
      val reader =
        if (s.keepReading) {
          val r = spark.readStream.format(s.format).options(s.options)
          s.schema.foreach(r.schema)
          s.path.map(r.load).getOrElse(r.load())
        } else {
          val r = spark.read.format(s.format).options(s.options)
          s.schema.foreach(r.schema)
          s.path.map(r.load).getOrElse(r.load())
        }
      reader
    }
    new MStream(df, s.order)
  }

  /** Milan `ApplicationInstance.toJsonString` parity
    * (`application/ApplicationInstance.scala:27`): a JSON description of
    * the resolved program — output stream names, schemas, and optimized
    * plans — without executing anything. */
  def describeJson(spark: SparkSession, config: Config)(
      program: (String => MStream) => Map[String, MStream]): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val outputs = program(name => readSource(spark, config.source(name)))
    outputs.map { case (name, s) =>
      s"""${q(name)}: {"schema": ${q(s.df.schema.json)}, "plan": ${q(
        s.df.queryExecution.optimizedPlan.toString)}}"""
    }.mkString("{", ",", "}")
  }

  /**
   * Run a program under a configuration: resolve each named input, apply
   * the dataflow, drive every bound sink. The program never names paths or
   * formats — exactly Milan's separation.
   */
  def run(spark: SparkSession, config: Config)(
      program: (String => MStream) => Map[String, MStream]): Seq[Running] = {
    val outputs = program(name => readSource(spark, config.source(name)))
    config.sinkStreams.flatMap { stream =>
      val out = outputs.getOrElse(stream,
        throw new IllegalArgumentException(s"program produced no stream '$stream'"))
      config.sinkList(stream).map { sink =>
        if (out.df.isStreaming) {
          val w = out.df.writeStream.format(sink.format)
            .options(sink.options).outputMode(sink.outputMode)
          sink.queryName.foreach(w.queryName)
          StreamingOutput(stream, sink.path.map(w.start).getOrElse(w.start()))
        } else sink.format match {
          case "memory" => BatchOutput(stream, out.df) // caller collects
          case "console" => out.df.show(false); BatchOutput(stream, out.df)
          case f =>
            val w = out.df.write.format(f).options(sink.options).mode(sink.mode)
            sink.path.map(w.save).getOrElse(w.save())
            BatchOutput(stream, out.df)
        }
      }
    }
  }
}
