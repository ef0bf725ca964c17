package graft.api

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Milan metrics (`application/MetricDefinition.scala`, per-operator
 * counters in the runtime co-process functions), Spark-first: named
 * `observe()` metrics evaluated inside the plan (no extra pass over the
 * data), collected via QueryExecutionListener (batch) or
 * StreamingQueryProgress (streaming).
 */
object Metrics {

  /** Attach named observed metrics to a stream (Milan `MetricDefinition`). */
  def observe(s: MStream, name: String, metrics: (String, Column)*): MStream = {
    val cols = metrics.map { case (n, c) => c.as(n) }
    new MStream(
      s.df.observe(name, cols.head, cols.tail: _*),
      s.eventOrder, s.contextKeys, s.name)
  }

  /** Batch metrics collector: registers a listener, returns a handle that
    * exposes every observation seen so far keyed by observation name. */
  final class Collector(spark: SparkSession) extends AutoCloseable {
    private val seen = new ConcurrentHashMap[String, Map[String, Any]]()
    private val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          seen.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    def get(name: String): Option[Map[String, Any]] = Option(seen.get(name))
    override def close(): Unit = spark.listenerManager.unregister(listener)
  }
}
