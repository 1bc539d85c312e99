package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Observable metrics (`Dataset.observe`): named aggregates computed
  * INSIDE the existing job — row counts, null rates, value sums ride
  * along with the action instead of costing a second scan. At 100 TB a
  * separate monitoring pass doubles the I/O bill; observed metrics are
  * free. Batch collection goes through a [[QueryExecutionListener]];
  * in Structured Streaming the same observe calls surface in each
  * progress event.
  */
object Observe {

  /** Listener that retains the latest observed-metrics row per metric
    * name. Listener-bus delivery is asynchronous — poll [[get]] (or use
    * [[await]]) after the action. */
  final class MetricSink extends QueryExecutionListener {
    private val collected = new ConcurrentHashMap[String, Row]()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (k, v) => collected.put(k, v) }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    def get(name: String): Option[Row] = Option(collected.get(name))
    /** Poll until the named metrics arrive (listener bus is async). */
    def await(name: String, timeoutMs: Long = 10000): Row = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var r = get(name)
      while (r.isEmpty && System.nanoTime() < deadline) { Thread.sleep(20); r = get(name) }
      r.getOrElse(throw new IllegalStateException(s"metrics '$name' not observed within ${timeoutMs}ms"))
    }
    def clear(): Unit = collected.clear()
  }

  /** Register a sink on the session; caller owns unregistering via
    * `spark.listenerManager.unregister`. */
  def attach(spark: SparkSession): MetricSink = {
    val s = new MetricSink
    spark.listenerManager.register(s)
    s
  }

  /** Standard health counters for a table: total rows, nulls in the
    * watched column, and its total UTF-8 length (ingest volume proxy). */
  def health(df: DataFrame, name: String, watched: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      coalesce(sum(when(col(watched).isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"),
      coalesce(sum(length(col(watched)).cast("long")), lit(0L)).as("total_len"))

  /** Arbitrary observed aggregates (must be observe-legal: no distinct,
    * no reference to other observations). */
  def metrics(df: DataFrame, name: String, aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "Observe.metrics requires at least one aggregate")
    df.observe(name, aggs.head, aggs.tail: _*)
  }
}
