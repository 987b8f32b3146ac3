package graft

import org.apache.spark.sql.functions._

import graft.ops.TwoPhaseRank

/** Bucket-spread guard for the two-phase window discipline (ADVICE r9):
  * the whole point of `TwoPhaseRank` is that every corpus exchange
  * rides the uniform (key, bucket) grain — which silently degrades
  * back to the serialized per-key sort if the chosen bucket function
  * is DEGENERATE on the sort domain (one bucket ⇒ one sort task per
  * key, plus a wasted full-corpus repartition on top).
  *
  * The default `monotoneBucket` (sign × bitlength·32 + top-5-bits) is
  * exactly that trap for epoch-microsecond timestamps: every ts in a
  * sub-year corpus shares bitlength ~51 AND its top 5 bits (granularity
  * ≈ 2.2 years), so the 30-day test corpus collapses to ONE bucket.
  * This spec pins the trap (so the degeneracy is detected, not
  * re-discovered) and the fix (q_lag_autocorr's explicit hourly
  * coarsening spreads the same corpus over hundreds of buckets). */
class TwoPhaseBucketSpreadSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tsBuckets(bucket: org.apache.spark.sql.Column): Long =
    Tables.events(spark, sf).select(bucket.as("b")).distinct().count()

  test("default monotoneBucket is degenerate on epoch-microsecond ts") {
    // If this ever starts failing because the bucket SPREADS, the
    // documented trap is gone and q_lag_autocorr may drop its
    // override; until then any new time-ordered TwoPhaseRank call
    // site MUST pass an explicit coarsening.
    assert(tsBuckets(TwoPhaseRank.monotoneBucket("ts_us")) === 1L,
      "monotoneBucket(ts_us) was expected to collapse a 30-day corpus " +
        "to a single bucket — revisit q_lag_autocorr's bucketOverride")
  }

  test("q_lag_autocorr's hourly override spreads the corpus") {
    // 30 days × 24 h = up to 720 buckets; require real spread (not
    // one, not a handful) so the in-bucket sorts parallelize and the
    // (type × hour) offsets grid stays tiny.
    val spread = tsBuckets(expr("ts_us div 3600000000"))
    assert(spread >= 100L,
      s"hourly ts bucket spread collapsed to $spread distinct values")
  }

  test("structural guard: a degenerate caller fails loudly at runtime") {
    // VERDICT r10 #1: the spec above pins ONE query's trap; the guard
    // in TwoPhaseRank itself must cover the CLASS — any future call
    // site on a narrow-band domain fails with the remedy message
    // instead of silently re-serializing. Plant exactly that caller:
    // epoch-µs-like values under the default monotoneBucket, with the
    // degenerate-rows floor lowered to test scale.
    import spark.implicits._
    val base = 1704067200000000L // 2024-01-01 in epoch µs
    val planted = spark.range(0, 5000)
      .select(lit("a").as("k"), (lit(base) + col("id")).as("ts_us"),
        col("id").as("v"))
    spark.conf.set("spark.graft.tpr.degenerateRows", "1000")
    try {
      val ranked = TwoPhaseRank.withRankAndCount(
        planted, Seq("k"), "ts_us", Seq(col("v")), "r", "n")
      val e = intercept[Exception] { ranked.collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("degenerate bucket domain")),
        s"expected the degenerate-domain guard, got: ${msgs(e).mkString(" | ")}")

      // the SAME caller with an explicit hourly coarsening... cannot
      // spread a 5000-µs span; use a fine coarsening to prove the
      // guard is about SPREAD, not about overrides per se
      val fixed = TwoPhaseRank.withRankAndCount(
        planted, Seq("k"), "ts_us", Seq(col("v")), "r", "n",
        bucketOverride = Some(expr("ts_us div 64")))
      assert(fixed.count() === 5000L)

      // small frames are exempt: the degenerate shape on 500 rows
      // sorts fine in one task and must not trip the guard
      val small = TwoPhaseRank.withRankAndCount(
        planted.limit(500), Seq("k"), "ts_us", Seq(col("v")), "r", "n")
      assert(small.count() === 500L)

      // orderStatistics and the cum-sum paths carry the same guard
      val os = TwoPhaseRank.orderStatistics(
        planted, Seq("k"), "ts_us", Seq(col("v")),
        Seq(("p50", "1 + (n - 1) * 50 div 100")))
      val e2 = intercept[Exception] { os.collect() }
      assert(msgs(e2).exists(_.contains("degenerate bucket domain")))
      val rs = TwoPhaseRank.withRunningSums(
        planted, Seq("k"), Seq(col("ts_us"), col("v")),
        TwoPhaseRank.monotoneBucket("ts_us"), Seq(("v", "cum_v")))
      val e3 = intercept[Exception] { rs.collect() }
      assert(msgs(e3).exists(_.contains("degenerate bucket domain")))
    } finally spark.conf.unset("spark.graft.tpr.degenerateRows")
  }

  test("withLags under the hourly override equals the naive corpus lag") {
    // Equality witness at test scale: the two-phase lag with the
    // explicit bucket must match lag() over the per-type corpus
    // window row for row (the shape it replaces at 100 TB).
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("ts_us"),
        expr("cast(floor(value * cast(1000000 as double)) as bigint)")
          .as("vu"))
    val two = TwoPhaseRank.withLags(ev, Seq("event_type"), "ts_us",
        Seq(col("event_id")), "vu", 3, "x",
        bucketOverride = Some(expr("ts_us div 3600000000")))
      .select("event_type", "event_id", "x1", "x2", "x3")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    val naive = ev.select(col("event_type"), col("event_id"),
      lag(col("vu"), 1).over(w).as("x1"),
      lag(col("vu"), 2).over(w).as("x2"),
      lag(col("vu"), 3).over(w).as("x3"))
    assert(two.exceptAll(naive).isEmpty && naive.exceptAll(two).isEmpty,
      "two-phase lag diverged from the naive corpus-window lag")
  }
}
