package graft

import org.apache.spark.sql.functions._
import graft.ops.EventOps

/** Invariants of the round-6 tail operators (changepoint / decay /
  * heatmap wave) beyond the DuckDB hash gate — scale-independent
  * properties, plus the one equivalence the whole CUSUM design rests
  * on: the windowed closed form must equal the textbook sequential
  * recurrence.
  */
class R6TailOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("CUSUM closed form equals the sequential recurrence") {
    // Fold the recurrence S_i = max(0, S_{i-1} + dev_i) driver-side
    // per user (with the same n-scaled integer deviations) and
    // compare the max excursion against the query's closed form
    // P_i - min(0, min prefix P). Equality here is the proof the
    // distributed reformulation is the same operator.
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("cast(floor(value * cast(1000000 as double)) as bigint)")
          .as("yu"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val n = BigInt(sorted.length)
      val vsum = sorted.map(e => BigInt(e._4)).sum
      var s = BigInt(0); var mx = BigInt(0)
      sorted.foreach { e =>
        s = (s + n * e._4 - vsum).max(BigInt(0))
        mx = mx.max(s)
      }
      u -> (mx / n).toLong
    }
    val got = EventOps.cusumChangepoint(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) =>
      assert(got(u) == e, s"user $u: closed form ${got(u)} != recurrence $e")
    }
  }

  test("decay scores are bounded by the undecayed mass") {
    // Each event's weight is 2^(-k) <= 1, so the decayed count can
    // never exceed n_events (in milli-units: 1000 * n), and a corpus
    // with any event inside the newest hour keeps a strictly
    // positive score.
    val r = EventOps.decayCounts(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getLong(1); val dm = row.getLong(2)
      assert(dm <= 1000L * n, s"user ${row.getLong(0)}: $dm > ${1000 * n}")
      assert(dm >= 0L)
    }
    assert(r.exists(_.getLong(2) > 0L), "all scores decayed to zero")
  }

  test("heatmap marginals are consistent and lift averages to ~1") {
    // Cell counts must re-sum to the corpus total, and the
    // count-weighted mean lift equals 1 exactly when rows and
    // columns are independent — on real data it stays near 1e6 ppm
    // (it is a weighted average of observed/expected ratios).
    val cells = EventOps.eventHeatmap(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).count()
    assert(cells.map(_.getLong(2)).sum == total)
    val wmean = cells.map(r => r.getLong(2).toDouble * r.getLong(3)).sum /
      total.toDouble
    assert(wmean > 900000.0 && wmean < 1200000.0,
      s"count-weighted mean lift $wmean far from 1e6 ppm")
    cells.foreach(r => assert(r.getLong(3) > 0L))
  }
}
