package graft

import java.sql.Timestamp
import scala.collection.mutable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** q_late_events is the batch PREDICTION of what a watermark drops;
  * this spec closes the loop against the REAL runtime. The same
  * hash-jittered arrival replay (amplified jitter so the sf0.001 slice
  * carries several drops) fed ONE event per micro-batch through
  * `withWatermark` + `dropDuplicates` must (a) report exactly the
  * predicted `numRowsDroppedByWatermark` total and (b) deliver exactly
  * the predicted surviving event set to the sink.
  *
  * The prediction mirrors Spark's semantics precisely: the watermark
  * for batch N is the max event-time in MILLISECONDS seen through
  * batch N-1 minus the delay, and a row is dropped iff its µs event
  * time < watermark·1000 (strict — EventTimeWatermarkExec tracks stats
  * in ms; the state-store predicate compares in µs). With one event
  * per batch, "through batch N-1" IS "strictly earlier arrivals" —
  * q_late_events' continuous-watermark model, up to the ms floor this
  * fold applies. */
class StreamingLateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val delayMs = 10000L

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }

  test("withWatermark drops exactly the events the lateness audit predicts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // arrival replay: same construction as q_late_events with a 300 s
    // jitter bound; first 250 arrivals keep the replay fast while
    // carrying multiple predicted drops
    val rows: Seq[(Long, Long)] = Tables.events(spark, sf)
      .select(col("event_id"), col("ts_us"),
        (col("ts_us") + expr(
          """cast(conv(substring(sha2(concat('late:',
            | cast(event_id as string)), 256), 1, 15), 16, 10) as bigint)
            | % 300000000""".stripMargin.replaceAll("\n", "")))
          .as("arr_us"))
      .orderBy("arr_us", "event_id").limit(250)
      .collect().toSeq.map(r => (r.getLong(1), r.getLong(0)))

    // the audit fold at Spark's ms watermark granularity
    var maxMs = Long.MinValue
    val predictedDrops = mutable.Set.empty[Long]
    for ((tsUs, id) <- rows) {
      if (maxMs != Long.MinValue && tsUs < (maxMs - delayMs) * 1000L)
        predictedDrops += id
      maxMs = math.max(maxMs, Math.floorDiv(tsUs, 1000L))
    }
    assert(predictedDrops.size >= 3, "replay slice lost its drop signal")

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2000")
    val stream = MemoryStream[(Timestamp, Long)]
    val query = stream.toDS().toDF("ts", "event_id")
      .withWatermark("ts", "10 seconds")
      .dropDuplicates(Seq("ts", "event_id"))
      .writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    try {
      rows.foreach { case (tsUs, id) =>
        stream.addData((tsOf(tsUs), id))
        query.processAllAvailable()
      }
      val droppedMetric = query.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .map(_.numRowsDroppedByWatermark).sum
      assert(droppedMetric == predictedDrops.size,
        s"runtime dropped $droppedMetric, audit predicted ${predictedDrops.size}")
      val sunk = spark.table("late_sink")
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(sunk == rows.map(_._2).toSet -- predictedDrops,
        "sink set != predicted survivors")
    } finally query.stop()
  }
}
