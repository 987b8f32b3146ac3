package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-phase ordered computation (rank / prefix sum /
  * lag) — the scale-out replacement for `OVER (PARTITION BY
  * low_cardinality_key ORDER BY v)` when the partition key has only a
  * handful of values and the frame is corpus-sized. A plain window
  * there serializes the corpus onto |key| sort tasks (5 event types =
  * 5 sort tasks at 100 TB); the two-phase formulation keeps every
  * exchange on the uniform (key, bucket) grain and provably computes
  * the SAME answer, so oracles are byte-identical.
  *
  * Phase structure (the q_token_budget / q_class_rebalance /
  * q_quality_vs_dup discipline, generalized to an arbitrary signed
  * 64-bit sort domain):
  *   1. bucket = a MONOTONE coarsening of the leading sort key —
  *      bucket order refines into sort order, so per-bucket results +
  *      bucket offsets total to the global per-key answer; equal sort
  *      keys always share a bucket, so tie semantics are exact;
  *   2. per-(key, bucket) partials roll up in one combine agg to a
  *      domain-bounded grid (constant in corpus size);
  *   3. bucket offsets (and per-key totals) are windows over that
  *      bounded grid, broadcast back;
  *   4. the in-bucket window partitions on (key, bucket) — the
  *      uniform grain — and `offset + in-bucket value` IS the answer.
  *
  * The default bucket function is floating-point-like: sign ×
  * (bitlength(|v|)·32 + top-5-bits(|v|)). Monotone because bitlength
  * dominates and the top-5-bits subdivide each binary octave in
  * order; bounded because a 64-bit domain has ≤ 64 octaves × 32
  * subdivisions per sign. For uniform hash domains a plain
  * `hk div 2^53` coarsening spreads better — pass it explicitly.
  * (|v| = Long.MinValue would overflow `abs`; the micro-unit domains
  * used here are floor(value·1e6)-bounded, far inside the safe range.)
  *
  * Reference scope note: the reference engine (avodovnik/eventstreamer,
  * DispatcherFunction.cs:117-138) buffers one key's window in memory —
  * the single-node shape this helper exists to avoid at corpus scale.
  */
object TwoPhaseRank {

  /** Monotone, domain-bounded (≤ ~4.2k values per sign) coarsening of
    * a signed BIGINT expression. b(v1) <= b(v2) whenever v1 <= v2.
    *
    * DEGENERATE for narrow-band domains: values sharing a bitlength
    * AND top-5-bits all land in ONE bucket — epoch-microsecond
    * timestamps (constant bitlength ~51, top-5-bit granularity ≈ 2.2
    * years) collapse any sub-year corpus to a single bucket, which
    * re-serializes the per-key sort the two-phase shape exists to
    * avoid. For such domains pass an explicit fixed-granularity
    * coarsening instead (e.g. `ts_us div 3_600_000_000` — hourly;
    * still monotone, and the (keys × hours) offsets grid stays
    * broadcastable for decade-scale spans).
    * `TwoPhaseBucketSpreadSpec` pins both the trap and the fix. */
  def monotoneBucket(v: String): Column = expr(
    s"""(CASE WHEN $v < 0 THEN -1 ELSE 1 END) *
       |(length(bin(abs($v))) * 32 +
       | shiftright(abs($v), greatest(length(bin(abs($v))) - 5, 0)))"""
      .stripMargin)

  /** Minimum distinct buckets a corpus-sized key must spread over
    * before the in-bucket window runs — the STRUCTURAL form of the
    * degenerate-domain trap `TwoPhaseBucketSpreadSpec` first pinned
    * for one query (VERDICT r10 #1): a narrow-band sort domain (e.g.
    * epoch-microsecond timestamps under [[monotoneBucket]]) collapses
    * a key's whole frame into ONE bucket, silently re-serializing the
    * sort this class exists to parallelize. Every entry point now
    * embeds a per-grid-row check in the offsets frame itself — zero
    * extra jobs, the grid is bounded — that fails the query loudly
    * with the bucketOverride remedy instead. Keys below
    * `degenerateRows` are exempt (a small frame sorts fine in one
    * task; you also cannot demand 32 buckets of 50 rows). */
  private def minSpread(df: DataFrame): Long =
    df.sparkSession.conf.get("spark.graft.tpr.minBucketSpread", "32").toLong
  private def degenerateRows(df: DataFrame): Long =
    df.sparkSession.conf.get("spark.graft.tpr.degenerateRows", "100000").toLong

  /** Wraps `guarded` so that evaluating it on a grid row whose key
    * holds ≥ `degenerateRows` rows spread over < `minSpread` buckets
    * raises the degenerate-domain error. The guard rides a column the
    * caller keeps, so Catalyst cannot prune it. */
  private def spreadGuard(df: DataFrame, nRows: Column, spread: Column,
                          guarded: Column): Column =
    when(nRows >= lit(degenerateRows(df)) && spread < lit(minSpread(df)),
      raise_error(concat(
        lit("TwoPhaseRank degenerate bucket domain: a key with "), nRows,
        lit(" rows landed in only "), spread,
        lit(" buckets (< " + minSpread(df) + ") — the sort domain is " +
          "too narrow for the default monotoneBucket coarsening " +
          "(epoch-like timestamps are the known case); pass an " +
          "explicit fixed-granularity bucketOverride, e.g. " +
          "ts div 3600000000 for hourly"))))
      .otherwise(guarded)

  /** Adds `rankName` = the global per-`keys` rank of each row by
    * (`v` ASC, `ties` ASC) and `nName` = the per-`keys` row count,
    * without ever partitioning a corpus-sized window on `keys` alone.
    * `v` must be a BIGINT column name already present in `df`; `ties`
    * break exact-v ties (must be deterministic and total for the
    * rank to be reproducible cross-engine). */
  def withRankAndCount(
      df: DataFrame, keys: Seq[String], v: String, ties: Seq[Column],
      rankName: String, nName: String,
      bucketOverride: Option[Column] = None): DataFrame =
    withRankAndCountBucketed(df, keys, col(v) +: ties,
      bucketOverride.getOrElse(monotoneBucket(v)), rankName, nName)

  /** As [[withRankAndCount]] but with an explicit sort-column list and
    * an explicit `bucket` expression, which MUST be a monotone
    * coarsening of `order.head` (equal order.head ⇒ equal bucket). */
  def withRankAndCountBucketed(
      df: DataFrame, keys: Seq[String], order: Seq[Column], bucket: Column,
      rankName: String, nName: String): DataFrame = {
    val b = "__tpr_bucket"
    // ONE corpus exchange on the uniform (keys, bucket) grain; the
    // counts agg AND the in-bucket window both ride it (matching
    // required distribution → no further exchange), and AQE's
    // ReuseExchange materializes it once for both branches.
    val withB = df.withColumn(b, bucket)
      .repartition((keys :+ b).map(col): _*)
    val counts = withB.groupBy((keys :+ b).map(col): _*)
      .agg(count(lit(1)).as("__tpr_bn"))
    val offW = Window.partitionBy(keys.map(col): _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(keys.map(col): _*)
    val offsets = counts.select(
      (keys :+ b).map(col) ++ Seq(
        spreadGuard(df, sum(col("__tpr_bn")).over(totW).cast("long"),
          count(lit(1)).over(totW),
          coalesce(sum(col("__tpr_bn")).over(offW), lit(0L))).as("__tpr_off"),
        sum(col("__tpr_bn")).over(totW).cast("long").as(nName)): _*)
    val inW = Window.partitionBy((keys :+ b).map(col): _*)
      .orderBy(order: _*)
    withB.join(broadcast(offsets), keys :+ b)
      .withColumn(rankName,
        (col("__tpr_off") + row_number().over(inW)).cast("long"))
      .drop(b, "__tpr_off")
  }

  /** Adds per-`keys` cumulative sums with RANGE-frame semantics over
    * `v` (all peers of a v value included — the exact-ECDF frame):
    * for each (sumCol -> outName), outName = sum(sumCol) over rows of
    * the same `keys` with v' <= v. Same two-phase shape as
    * [[withRankAndCount]]; equal v always lands in one bucket, so the
    * in-bucket RANGE window sees every peer. */
  def withRangeCumSums(
      df: DataFrame, keys: Seq[String], v: String,
      sums: Seq[(String, String)]): DataFrame = {
    val inW = Window.partitionBy((keys :+ "__tpr_bucket").map(col): _*)
      .orderBy(col(v))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    withCumSums(df, keys, monotoneBucket(v), inW, sums)
  }

  /** Adds per-`keys` running sums with ROWS-frame semantics in total
    * (`order`) order — the distributed prefix sum. `bucket` must be a
    * monotone coarsening of `order.head`. For each (sumCol ->
    * outName), outName = sum(sumCol) over rows up to AND INCLUDING
    * the current row in (keys, order) order. */
  def withRunningSums(
      df: DataFrame, keys: Seq[String], order: Seq[Column], bucket: Column,
      sums: Seq[(String, String)]): DataFrame = {
    val inW = Window.partitionBy((keys :+ "__tpr_bucket").map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withCumSums(df, keys, bucket, inW, sums)
  }

  private def withCumSums(
      df: DataFrame, keys: Seq[String], bucket: Column,
      inW: org.apache.spark.sql.expressions.WindowSpec,
      sums: Seq[(String, String)]): DataFrame = {
    val b = "__tpr_bucket"
    // same single-reused-exchange shape as withRankAndCountBucketed
    val withB = df.withColumn(b, bucket)
      .repartition((keys :+ b).map(col): _*)
    val sumCols = sums.map { case (src, out) =>
      sum(col(src)).as(s"__tpr_bs_$out") }
    val counts = withB.groupBy((keys :+ b).map(col): _*)
      .agg(sumCols.head, sumCols.tail :+ count(lit(1)).as("__tpr_bn"): _*)
    val offW = Window.partitionBy(keys.map(col): _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(keys.map(col): _*)
    val offsets = counts.select(
      (keys :+ b).map(col) ++ sums.zipWithIndex.map { case ((_, out), i) =>
        val off = coalesce(sum(col(s"__tpr_bs_$out")).over(offW), lit(0L))
        // the guard rides the first offset column (always kept)
        (if (i == 0)
          spreadGuard(df, sum(col("__tpr_bn")).over(totW).cast("long"),
            count(lit(1)).over(totW), off)
        else off).as(s"__tpr_off_$out") }: _*)
    val joined = withB.join(broadcast(offsets), keys :+ b)
    val withSums = sums.foldLeft(joined) { case (d, (src, out)) =>
      d.withColumn(out,
        (col(s"__tpr_off_$out") + sum(col(src)).over(inW)).cast("long"))
    }
    withSums.drop(b +: sums.map { case (_, out) => s"__tpr_off_$out" }: _*)
  }

  /** Exact per-`keys` order statistics WITHOUT fully shuffling the
    * corpus — the selection specialization of the two-phase rank: when
    * only the values at a few rank positions are needed (percentile
    * clips, medians, p50/p90 summaries), ranking every row is wasted
    * movement. Phase 1's (keys, bucket) counts roll up map-side
    * (partial agg → only grid rows move); the bounded offsets grid
    * then identifies, per key, WHICH buckets contain a target
    * position, and only those buckets' rows (a broadcast-semi-join
    * scan-side filter) are ever sorted. The corpus itself crosses no
    * exchange.
    *
    * `targets` = (outName, 1-based-rank SQL expression over `n`), e.g.
    * ("lo_u", "1 + (n - 1) * 5 div 100"). Returns one row per key:
    * the key columns, `n`, and one column per target holding the
    * value of `v` at that rank in (`v` ASC, `ties` ASC) order.
    * `bucketOverride` supplies the monotone coarsening when `v` is
    * not BIGINT (e.g. a decimal ranked via its exact cents). */
  def orderStatistics(
      df: DataFrame, keys: Seq[String], v: String, ties: Seq[Column],
      targets: Seq[(String, String)],
      bucketOverride: Option[Column] = None): DataFrame = {
    val b = "__tpr_bucket"
    val withB = df.withColumn(b,
      bucketOverride.getOrElse(monotoneBucket(v)))
    val counts = withB.groupBy((keys :+ b).map(col): _*)
      .agg(count(lit(1)).as("__tpr_bn"))
    val offW = Window.partitionBy(keys.map(col): _*).orderBy(col(b))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(keys.map(col): _*)
    val posCols = targets.map { case (out, posSql) =>
      expr(posSql).cast("long").as(s"__tpr_pos_$out") }
    val offsets = counts.select(
      (keys :+ b).map(col) ++ Seq(
        spreadGuard(df, sum(col("__tpr_bn")).over(totW).cast("long"),
          count(lit(1)).over(totW),
          coalesce(sum(col("__tpr_bn")).over(offW), lit(0L))).as("__tpr_off"),
        col("__tpr_bn"),
        sum(col("__tpr_bn")).over(totW).cast("long").as("n")): _*)
    val withPos = offsets.select(offsets.columns.map(col) ++ posCols: _*)
    val sel = withPos.where(targets.map { case (out, _) =>
      col("__tpr_off") < col(s"__tpr_pos_$out") &&
        col(s"__tpr_pos_$out") <= col("__tpr_off") + col("__tpr_bn")
    }.reduce(_ || _))
    val inW = Window.partitionBy((keys :+ b).map(col): _*)
      .orderBy(col(v) +: ties: _*)
    val ranked = withB.join(broadcast(sel), keys :+ b)
      .withColumn("__tpr_r",
        (col("__tpr_off") + row_number().over(inW)).cast("long"))
    ranked.groupBy(keys.map(col): _*)
      .agg(max(col("n")).as("n"),
        targets.map { case (out, _) =>
          max(when(col("__tpr_r") === col(s"__tpr_pos_$out"), col(v))).as(out)
        }: _*)
  }

  /** Adds `prefix1..prefixK` = lag(`src`, 1..maxLag) in total per-`keys`
    * (`v` ASC, `ties` ASC) order — the distributed sequential lag. The
    * total order comes from [[withRankAndCount]]; rows then partition
    * into fixed-size rank blocks of `blockSize`, each block receives
    * the previous block's last `maxLag` rows as carry-in (so the lag
    * never crosses an exchange blindly), and an ordinary (keys, block)
    * window computes the lags before carry rows are dropped. Rank
    * blocks are contiguous and exactly full (bar the last), so the
    * carry rows ARE the lag predecessors — equal to the naive
    * corpus-window lag, row for row. */
  def withLags(
      df: DataFrame, keys: Seq[String], v: String, ties: Seq[Column],
      src: String, maxLag: Int, prefix: String,
      blockSize: Int = 4096,
      bucketOverride: Option[Column] = None,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    // `pin` (caller-supplied checkpoint discipline, default off): the
    // ranked frame is referenced TWICE below (main + carry sides of
    // the union) and multi-referenced subplans re-execute — unpinned,
    // the whole rank pipeline (repartition + grid offsets + in-bucket
    // window) runs once per side.
    val ranked = pin(withRankAndCount(df, keys, v, ties, "__tpr_r", "__tpr_n",
        bucketOverride)
      .drop("__tpr_n"))
    val withPb = ranked
      .withColumn("__tpr_pb", expr(s"(__tpr_r - 1) div $blockSize"))
    val carry = withPb
      .where(expr(s"(__tpr_r - 1) % $blockSize >= ${blockSize - maxLag}"))
      .withColumn("__tpr_pb", col("__tpr_pb") + 1L)
      .withColumn("__tpr_carry", lit(1))
    val main = withPb.withColumn("__tpr_carry", lit(0))
    val w = Window.partitionBy((keys :+ "__tpr_pb").map(col): _*)
      .orderBy(col("__tpr_r"))
    val lagged = (1 to maxLag).foldLeft(main.unionByName(carry)) { (d, k) =>
      d.withColumn(s"$prefix$k", lag(col(src), k).over(w))
    }
    lagged.where(col("__tpr_carry") === 0)
      .drop("__tpr_pb", "__tpr_carry", "__tpr_r")
  }
}
