package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.CsvEvents

/** CSV ingest contract: typed rows parse, rows with type failures
  * dead-letter with the raw line intact (log-don't-drop), and the
  * write→read round trip is lossless including µs timestamps.
  */
class CsvEventsSpec extends SparkSpec {

  test("clean rows parse typed; corrupt rows keep their raw line") {
    val dir = Files.createTempDirectory("csvev").toFile.getAbsolutePath
    val f = new java.io.File(dir, "drop.csv")
    val w = new java.io.PrintWriter(f)
    w.println("event_id,ts,user_id,event_type,value,props")
    w.println("1,2026-01-01T00:00:00.000001,7,click,1.5,{}")
    w.println("2,2026-01-01T00:00:00.000002,7,view,2.5,{}")
    w.println("3,not-a-timestamp,7,click,oops,{}") // two type failures
    w.close()
    val (clean, dead) = CsvEvents.read(spark, dir)
    assert(clean.count() == 2)
    assert(clean.schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val vals = clean.orderBy("event_id")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(vals == Seq((1L, 1.5), (2L, 2.5)))
    val rawLines = dead.collect().map(_.getString(0)).toSeq
    assert(rawLines == Seq("3,not-a-timestamp,7,click,oops,{}"))
  }

  test("write then read round-trips the events table losslessly") {
    val dir = Files.createTempDirectory("csvrt").toFile.getAbsolutePath
    val src = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    CsvEvents.write(src, dir)
    val (back, dead) = CsvEvents.read(spark, dir)
    assert(dead.count() == 0)
    assert(back.count() == src.count())
    // content equality both directions (µs timestamps must survive)
    assert(back.exceptAll(src).count() == 0)
    assert(src.exceptAll(back).count() == 0)
  }

  test("the file-stream path delivers the same typed rows") {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = Files.createTempDirectory("csvstream").toFile.getAbsolutePath
    val f = new java.io.File(dir, "batch0.csv")
    val w = new java.io.PrintWriter(f)
    w.println("event_id,ts,user_id,event_type,value,props")
    w.println("10,2026-01-01T00:00:01.000000,3,purchase,9.0,{}")
    w.close()
    val q = CsvEvents.stream(spark, dir)
      .where(col("_corrupt_record").isNull).drop("_corrupt_record")
      .writeStream.format("memory").queryName("csv_stream_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("csv_stream_out")
        .select("event_id", "user_id", "value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq((10L, 3L, 9.0)))
    } finally q.stop()
  }
}
