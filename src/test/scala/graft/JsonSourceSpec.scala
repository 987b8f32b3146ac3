package graft

import graft.sources.JsonEvents
import graft.streaming.DataDrivenWindow
import graft.streaming.DataDrivenWindow.emptyState

/** End-to-end of the reference's ingest surface: JSON blobs → parse +
  * dead-letter split (R2/R4) → key synthesis (R3) → data-driven window
  * replay → output-row JSON (R23). */
class JsonSourceSpec extends SparkSpec {

  private def ev(ts: String, dev: String, sess: String, player: String, v: String): String =
    s"""{"Timestamp":"$ts","DeviceId":"$dev","SessionId":"$sess","SensorType":"sensor",""" +
      s""""Names":["speed","player"],"Values":["$v","$player"]}"""

  test("parse splits clean vs dead-letter and synthesizes the reference key") {
    import spark.implicits._
    val lines = Seq(
      ev("2024-01-01T00:00:00.000Z", "d1", "sessA", "p1", "10"),
      ev("2024-01-01T00:00:00.500Z", "d1", "sessA", "p1", "20"),
      """{this is not json at all""",
      """{"DeviceId":"d9","SessionId":"s9"}""") // parses but no Timestamp
    val (clean, dead) = JsonEvents.parse(lines.toDF("value"))
    assert(clean.count() == 2 && dead.count() == 2)
    // key = "{SessionId}:{Values[1]}" (cs:180)
    assert(clean.select("key").as[String].collect().toSet == Set("sessA:p1"))
    // dead letter keeps the raw blob for the log side (cs:186-188)
    assert(dead.as[String].collect().exists(_.startsWith("{this")))
  }

  test("observed parse yields single-pass ingest metrics with the action") {
    import spark.implicits._
    val lines = Seq(
      ev("2024-01-01T00:00:00.000Z", "d1", "sessA", "p1", "10"),
      ev("2024-01-01T00:00:01.000Z", "d1", "sessA", "p1", "20"),
      ev("2024-01-01T00:00:02.000Z", "d2", "sessB", "p2", "30"),
      """not json""")
    val (clean, dead, obs) = JsonEvents.parseObserved(lines.toDF("value"))
    assert(clean.count() == 3) // the action that materializes the metrics
    val m = obs.get
    assert(m("n_total") == 4L && m("n_clean") == 3L && m("n_dead") == 1L)
    assert(dead.count() == 1)
  }

  test("JSON in → windows → reference-shaped JSON out") {
    import spark.implicits._
    val lines = Seq(
      ev("2024-01-01T00:00:00.000Z", "d1", "sessA", "p1", "10"),
      ev("2024-01-01T00:00:00.400Z", "d1", "sessA", "p1", "20"),
      ev("2024-01-01T00:00:01.000Z", "d1", "sessA", "p1", "60")) // boundary: closes window
    val (clean, _) = JsonEvents.parse(lines.toDF("value"))
    val pts = JsonEvents.toCompatPoints(spark, clean)
      .collect().sortBy(p => (p.tsUs, p.seq))
    val rows = DataDrivenWindow.replay(emptyState, Iterator(pts.toSeq))._2
    assert(rows.length == 1)
    val json = JsonEvents.toOutputJson(spark, rows.toDS()).collect().head
    // cs:152-161 shape: lowercase names, empty sessionstart, averaged
    // values re-stringified into the allvalues map (avg speed = 30)
    assert(json.contains(""""deviceid":"d1""""))
    assert(json.contains(""""sessionid":"sessA""""))
    assert(json.contains(""""sessionstart":""""))
    assert(json.contains(""""speed":"30""""))
    assert(json.contains(""""player":""""))
  }
}
