package graft

import graft.ops.{EventOps, TextOps}

/** Invariants of the round-6 drift/concentration wave (KS test, ACF
  * head, token Gini) beyond the DuckDB hash gate — each operator's
  * headline number is recomputed brute-force on the driver from the
  * raw table and must match EXACTLY (the operators are integer-exact
  * by construction, so equality is the right assertion).
  */
class R6DriftStatsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("KS statistic matches a brute-force ECDF sup per type") {
    val got = EventOps.ksDrift(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "ts_us",
        "cast(floor(value * cast(1000000 as double)) as bigint) as vu")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    got.foreach { case (t, (nEarly, nLate, ksPpm)) =>
      val a = ev.filter(e => e._1 == t && e._2 <= mid).map(_._3).sorted
      val b = ev.filter(e => e._1 == t && e._2 > mid).map(_._3).sorted
      assert(a.length.toLong === nEarly && b.length.toLong === nLate)
      val cuts = (a ++ b).distinct.sorted
      val sup = cuts.map { x =>
        math.abs(a.count(_ <= x).toLong * b.length - b.count(_ <= x).toLong * a.length)
      }.max
      assert(sup * 1000000L / (a.length.toLong * b.length) === ksPpm,
        s"type $t KS mismatch")
    }
  }

  test("lag-autocorr slopes match brute-force OLS on lagged pairs") {
    val got = EventOps.lagAutocorr(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "ts_us", "event_id",
        "cast(floor(value * cast(1000000 as double)) as bigint) as vu")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { r =>
      val t = r.getString(0)
      val xs = ev.filter(_._1 == t).sortBy(e => (e._2, e._3)).map(_._4)
      assert(r.getLong(1) === xs.length.toLong)
      for (k <- 1 to 3) {
        val pairs = xs.drop(k).zip(xs.dropRight(k)) // (y=x_t, x=x_{t-k})
        val n = BigInt(pairs.length)
        val sx = pairs.map(p => BigInt(p._2)).sum
        val sy = pairs.map(p => BigInt(p._1)).sum
        val sxx = pairs.map(p => BigInt(p._2) * p._2).sum
        val sxy = pairs.map(p => BigInt(p._2) * p._1).sum
        val den = n * sxx - sx * sx
        if (den > 0) {
          // BigInt `/` truncates toward zero — same as SQL `div`
          val want = (n * sxy - sx * sy) * 1000000 / den
          assert(BigInt(r.getLong(1 + k)) === want, s"type $t ar$k")
        } else assert(r.isNullAt(1 + k))
      }
    }
  }

  test("token Gini matches the mean-absolute-difference definition") {
    val got = TextOps.giniToken(spark, sfDir).collect()
    assert(got.length === 5)
    val counts = Tables(spark, sfDir, "documents")
      .selectExpr("lang", "explode(split(text, ' ')) as token")
      .groupBy("lang", "token").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    got.foreach { r =>
      val (lang, nTok, nOcc) = (r.getString(0), r.getLong(1), r.getLong(2))
      val cs = counts.filter(_._1 == lang).map(_._2)
      assert(cs.length.toLong === nTok && cs.sum === nOcc)
      // Gini via pairwise |ci - cj| / (2 n sum) — the definition the
      // rank formula is an O(n log n) rewrite of
      val mad = (for (a <- cs; b <- cs) yield BigInt((a - b).abs)).sum
      val want = mad * 1000000 / (BigInt(2) * cs.length * cs.sum)
      assert(BigInt(r.getLong(3)) === want, s"lang $lang gini")
      assert(r.getLong(4) === cs.max * 1000000L / cs.sum)
    }
  }
}
