package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.EventOps
import graft.streaming.StreamingDecay

/** The streaming decay scores must agree with the oracled batch
  * query: for every key whose anchor hour has caught up to the
  * corpus max hour, the final Update row equals q_decay_counts'
  * (decayed_n_milli, decayed_sum_u) exactly — stream ≡ batch ≡
  * DuckDB. Keys anchored earlier (no event in the corpus-max hour)
  * are checked against the same algebra re-anchored per key. Also
  * pins chunking-invariance of the fold (bucket adds commute). */
class StreamingDecaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def replay(chunks: Int): Map[Long, (Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("value"))
      .orderBy("ts_us", "user_id")
      .as[(Long, Long, Double)].collect().toSeq
    val stream = MemoryStream[(Long, Long, Double)]
    val name = s"decay_sink_$chunks"
    val query = StreamingDecay.scores(spark,
        stream.toDS().toDF("user_id", "ts_us", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      val size = math.max(1, (rows.size + chunks - 1) / chunks)
      rows.grouped(size).foreach { chunk =>
        stream.addData(chunk); query.processAllAvailable()
      }
      val w = Window.partitionBy(col("user_id")).orderBy(col("n_seen").desc)
      spark.table(name)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("user_id", "n_seen", "anchor_h", "decayed_n_milli",
          "decayed_sum_u")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    } finally query.stop()
  }

  test("streamed decay equals the oracled batch scores at any chunking") {
    val batch = EventOps.decayCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val globalH = Tables.events(spark, sf)
      .agg(max(expr("ts_us div 3600000000"))).collect()(0).getLong(0)
    for (chunks <- Seq(1, 6)) {
      val streamed = replay(chunks)
      assert(streamed.keySet == batch.keySet)
      var caughtUp = 0
      streamed.foreach { case (u, (nSeen, anchorH, nMilli, sumU)) =>
        val (bn, bMilli, bSum) = batch(u)
        assert(nSeen == bn, s"user $u: saw $nSeen of $bn events")
        if (anchorH == globalH) {
          caughtUp += 1
          assert(nMilli == bMilli && sumU == bSum,
            s"user $u: stream ($nMilli, $sumU) != batch ($bMilli, $bSum)")
        }
      }
      assert(caughtUp > 0, "no key anchored at the corpus max hour")
    }
  }

  test("the fold is chunking-invariant and decays exactly") {
    // bucket adds commute: any split of the same events gives the
    // same state; and two weight-1 events at the horizon edge must
    // expire to zero together (the carry-bit case a shifted
    // accumulator gets wrong).
    val evs = Seq((100L, 5L), (100L, 7L), (120L, 1L), (141L, 2L))
    val whole = StreamingDecay.foldSlice(StreamingDecay.zero, evs)
    val split = StreamingDecay.foldSlice(
      StreamingDecay.foldSlice(StreamingDecay.zero, evs.take(2)),
      evs.drop(2))
    assert(whole == split)
    // events at h=100 are 41 hours older than anchor 141: expired
    assert(whole.buckets.forall(_._1 >= 101L))
    val (nMilli, _) = StreamingDecay.score(whole)
    // remaining: h=120 (k=21, weight 2^-21) + h=141 (k=0, weight 1)
    assert(nMilli == ((BigInt(1000) << 19) + (BigInt(1000) << 40) >> 40).toLong)
  }
}
