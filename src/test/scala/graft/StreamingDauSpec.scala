package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDau

/** The streaming DAU must count each user once per day regardless of
  * how many events they emit or how the micro-batches are chunked,
  * emit a day exactly once when the watermark closes it, and agree
  * with a batch distinct count over the same rows. */
class StreamingDauSpec extends SparkSpec {

  private val dayUs = 86400000000L

  private def ev(tsUs: Long, user: Long): (Timestamp, Long) =
    (new Timestamp(tsUs / 1000), user)

  private def run(chunks: Seq[Seq[(Timestamp, Long)]],
                  name: String): Seq[(Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val events = stream.toDF().toDF("ts", "user_id")
    val query = StreamingDau.dau(events, "25 hours")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => stream.addData(c); query.processAllAvailable() }
      // advance the watermark far past every day to flush all state
      stream.addData(Seq(ev(100L * dayUs, 999L)))
      query.processAllAvailable()
      spark.table(name).select(col("day"), col("dau"))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    } finally query.stop()
  }

  test("duplicate users within a day count once; days close exactly once") {
    // day 0: users 1 (3 events), 2 (1 event) -> dau 2
    // day 1: users 1, 2, 3 -> dau 3
    val rows = run(Seq(
      Seq(ev(0L, 1L), ev(1000L, 1L), ev(2000L, 2L)),
      Seq(ev(5000L, 1L), ev(dayUs, 1L), ev(dayUs + 5L, 2L)),
      Seq(ev(dayUs + 9L, 3L), ev(dayUs + 10L, 1L))), "dau_a")
    assert(rows == Seq((0L, 2L), (1L, 3L)))
  }

  test("chunking-invariant and equal to the batch distinct count") {
    val all = Seq(ev(0L, 1L), ev(1000L, 1L), ev(2000L, 2L),
      ev(5000L, 1L), ev(dayUs, 1L), ev(dayUs + 5L, 2L),
      ev(dayUs + 9L, 3L), ev(dayUs + 10L, 1L))
    val oneShot = run(Seq(all), "dau_b")
    val perEvent = run(all.map(Seq(_)), "dau_c")
    assert(oneShot == perEvent, "chunking must not change DAU")
    import spark.implicits._
    val batch = all.toDF("ts", "user_id")
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        col("user_id")).distinct()
      .groupBy("day").agg(count(lit(1)).as("dau"))
      .where(col("day") < 100L)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(oneShot == batch, "stream must equal the batch distinct count")
  }
}
