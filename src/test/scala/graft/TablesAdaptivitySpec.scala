package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The r7 regression class, pinned: the driver has shipped
  * events.parquet with `ts` as parquet TIMESTAMP(NANOS) (reads as a
  * raw nanos long under `nanosAsLong`) AND as TIMESTAMP(MICROS)
  * isAdjustedToUTC=false (reads as TIMESTAMP_NTZ). `Tables.events`
  * must normalize BOTH to the same `ts_us: long` — r6 lost all 58
  * events-reading queries to this exact drift. */
class TablesAdaptivitySpec extends SparkSpec {

  test("events ts_us is identical across nanos-long and NTZ physical types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tsadapt").toFile.getAbsolutePath
    val usVals = Seq(1700000000000001L, 1700000003500000L, 1700086400123456L)
    val rows = usVals.zipWithIndex.map { case (us, i) => (i.toLong, us) }

    // variant A: ts as a raw BIGINT column named ts (the nanosAsLong
    // read shape: epoch NANOS as long)
    rows.map { case (id, us) => (id, us * 1000L) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")

    // variant B: ts as TIMESTAMP_NTZ (the r6+ regeneration shape)
    rows.toDF("event_id", "us")
      .select(col("event_id"),
        expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")

    def tsUs(sub: String): Seq[(Long, Long)] =
      Tables.events(spark, s"$dir/$sub")
        .select(col("event_id"), col("ts_us"))
        .as[(Long, Long)].collect().toSeq.sortBy(_._1)

    val a = tsUs("nanos")
    val b = tsUs("ntz")
    assert(a == b, s"physical-type drift: $a vs $b")
    assert(a.map(_._2) == usVals, "ts_us must be the exact epoch micros")
  }
}
