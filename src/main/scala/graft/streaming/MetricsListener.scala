package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** The reference's metrics surface (`LogMetric` —
  * /root/reference/src/DispatcherFunction/DispatcherFunction.cs:25,37,49
  * logs converted/total counts + elapsed ms per pipeline stage) as a
  * Structured Streaming observability hook: one record per micro-batch
  * with the same shape — how many rows entered, how many the sink got,
  * how long the batch took, and where the watermark stands.
  *
  * Spark already aggregates these per batch (`QueryProgressEvent`);
  * the listener just projects the reference's fields. Batch-side
  * metric counting stays declarative (q_parse_errors is the R8 count
  * aggregate); this is the runtime half. */
class MetricsListener extends StreamingQueryListener {

  /** (queryName, batchId, inputRows, sinkRows, batchMs, watermark) */
  case class BatchMetric(query: String, batchId: Long, inputRows: Long,
                         sinkRows: Long, batchMs: Long, watermark: String)

  private val buf = mutable.ArrayBuffer.empty[BatchMetric]

  def metrics: Seq[BatchMetric] = buf.synchronized(buf.toVector)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val sinkRows = Option(p.sink).map(_.numOutputRows).getOrElse(-1L)
    val wm = Option(p.eventTime).map(_.getOrDefault("watermark", "")).getOrElse("")
    val m = BatchMetric(Option(p.name).getOrElse(p.id.toString), p.batchId,
      p.numInputRows, sinkRows, p.batchDuration, wm)
    buf.synchronized(buf += m)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
}
