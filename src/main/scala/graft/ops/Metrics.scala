package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline metrics surface (reference main.py:27-36 metrics dict, O-A5):
  * instead of hand-threaded counters, a QueryExecutionListener records
  * every action's wall time and output rows from the executed plan's own
  * SQL metrics — zero cost added to the plans themselves.
  */
object Metrics {

  final case class ActionMetric(name: String, durationMs: Long, outputRows: Option[Long])

  /** Attach a recorder to the session; returns a handle to read/clear.
    * Listener callbacks are async — call [[Recorder.awaitQuiesce]] (or
    * `spark.sparkContext.listenerBus`-driven sinks) before reading in
    * tight tests.
    */
  def attach(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r.listener)
    r
  }

  final class Recorder {
    private val buf = new ConcurrentLinkedQueue[ActionMetric]()

    private[Metrics] val listener: QueryExecutionListener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
        buf.add(ActionMetric(funcName, durationNs / 1000000, rows))
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
        buf.add(ActionMetric(s"$funcName!failed", -1, None))
    }

    def metrics: Seq[ActionMetric] = buf.iterator().asScala.toSeq
    def clear(): Unit = buf.clear()

    /** Best-effort wait for async listener delivery (the bus is
      * private[spark]; poll instead of peeking). */
    def awaitQuiesce(spark: SparkSession): Unit = {
      val deadline = System.nanoTime() + 10000000000L
      var last = -1
      while (System.nanoTime() < deadline && (buf.size() != last || buf.isEmpty)) {
        last = buf.size()
        Thread.sleep(100)
      }
    }

    def detach(spark: SparkSession): Unit =
      spark.listenerManager.unregister(listener)
  }
}
