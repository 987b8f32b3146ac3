package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{MetricsListener, StreamingWindows}

/** The runtime metrics surface: one record per micro-batch with the
  * reference LogMetric's shape (rows in, rows out, elapsed ms). */
class MetricsListenerSpec extends SparkSpec {

  test("listener captures per-batch input rows, sink rows, and duration") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val listener = new MetricsListener
    spark.streams.addListener(listener)
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val query = StreamingWindows.demuxWindowAvg(
      stream.toDF().toDF("user_id", "ts", "value"), "2 seconds")
      .writeStream.format("memory").queryName("metrics_probe")
      .outputMode(OutputMode.Append).start()
    try {
      def ev(uid: Long, tsUs: Long, v: Double) =
        (uid, new Timestamp(1700000000000L + tsUs / 1000), v)
      stream.addData(Seq(ev(1, 0L, 10.0), ev(1, 500000L, 20.0)))
      query.processAllAvailable()
      stream.addData(Seq(ev(1, 8000000L, 1.0))) // closes the first window
      query.processAllAvailable()

      val ms = listener.metrics.filter(_.query == "metrics_probe")
      assert(ms.nonEmpty)
      assert(ms.map(_.inputRows).sum == 3) // every event accounted for
      assert(ms.exists(_.sinkRows > 0))    // the closed window reached the sink
      assert(ms.forall(_.batchMs >= 0))
      // batch ids are the micro-batch sequence — strictly increasing
      assert(ms.map(_.batchId) == ms.map(_.batchId).sorted)
    } finally {
      query.stop()
      spark.streams.removeListener(listener)
    }
  }
}
