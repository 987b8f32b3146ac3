package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingCuration

/** The streaming intake path must admit exactly the documents the
  * batch curation admits: quality-filter in the stateless prefix,
  * drop normalization duplicates within the watermark, and emit
  * per-(lang, window) stats when the watermark closes the window.
  * Event times sit far from the epoch — near-epoch rows trip the
  * watermark constraint solvers (verify-skill gotcha). */
class StreamingCurationSpec extends SparkSpec {

  private val base = 1700000000000L // ms

  private def doc(id: Long, offsetMs: Long, lang: String,
                  text: String): (Long, Timestamp, String, String) =
    (id, new Timestamp(base + offsetMs), lang, text)

  // 30 distinct non-stopword tokens: quality ≈ 0.4*0.3 + 0.3 + 0.3 = 0.72
  private val good = (0 until 30).map(i => s"tok$i").mkString(" ")

  test("stream admits what batch admits, drops dups and low quality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Timestamp, String, String)]
    val docs = stream.toDF().toDF("doc_id", "ts", "lang", "text")
    val query = StreamingCuration.curate(docs, "2 seconds")
      .writeStream.format("memory").queryName("cur_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(Seq(
        doc(1, 0L, "en", good),
        // normalization variant of doc 1 — must dedup against it
        doc(2, 200L, "en", good.toUpperCase + "!!"),
        // stopword soup — quality-filtered in the stateless prefix
        doc(3, 400L, "en", "a a the the of of and and in in"),
        // distinct good doc, other language, same window
        doc(4, 600L, "fr", good + " extra")))
      query.processAllAvailable()
      // advance the watermark past the first 1s window
      stream.addData(Seq(doc(9, 5000L, "en", good + " later")))
      query.processAllAvailable()
      stream.addData(Seq(doc(10, 9000L, "en", good + " flush")))
      query.processAllAvailable()

      val rows = spark.table("cur_out")
        .select(col("lang"), col("win_start").cast("long").as("s"),
          col("n_docs"), col("sum_tokens"), col("sum_quality_u"))
        .as[(String, Long, Long, Long, Long)].collect()
        .filter(_._2 == base / 1000)
        .sortBy(_._1)
      // first window: en = doc 1 only (dup 2 dropped, soup 3 filtered),
      // fr = doc 4
      assert(rows.map(r => (r._1, r._3, r._4)).toSeq ==
        Seq(("en", 1L, 30L), ("fr", 1L, 31L)))
      assert(rows.forall(_._5 >= 600000L))
    } finally query.stop()
  }

  test("stateless prefix scores exactly like the batch operator") {
    import spark.implicits._
    val df = Seq((1L, new Timestamp(base), "en", good))
      .toDF("doc_id", "ts", "lang", "text")
    val s = StreamingCuration.scored(df).collect().head
    // same formula as LlmOps.curationPipeline: 0.4*0.3 + 0.3 + 0.3
    assert(s.getAs[Long]("quality_u") == 719999L ||
      s.getAs[Long]("quality_u") == 720000L)
    assert(s.getAs[Long]("n_tokens") == 30L)
  }
}
