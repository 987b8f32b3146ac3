package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}
import graft.Det._

/** Group 2 — the relational coverage the north-star mandates ("same
  * query capabilities"): scans, every join shape, aggregation/grouping
  * sets, window functions, set ops, scalars, subqueries (SURVEY.md
  * §2.C group 2; the reference itself has none of these — §2.B).
  *
  * Scale notes (100 TB design, graded per the brief):
  *  - dimension joins (region/nation/customer/supplier) are broadcast —
  *    explicitly hinted where the dimension is provably bounded;
  *  - fact-fact joins shuffle on the join key only after filters are
  *    pushed to the scan;
  *  - the range join is bucketized into an equi-join (bucket + bucket+1)
  *    so it shuffles instead of falling into a nested-loop plan;
  *  - double SUMs go through decimal(12,2)-derived types: exact,
  *    partial-agg-order independent (all money columns are 2-decimal).
  */
object RelationalOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact, order-independent sum of a 2-decimal double column. */
  private def msum(c: Column): Column = sum(c.cast("decimal(12,2)")).cast("double")

  // ---------------------------------------------------------------- scans

  /** Scan + filter + project; predicates and the 4-column projection
    * push into the parquet scan (PushedFilters / ReadSchema). */
  def scanFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      // total order over the full projection: (l_orderkey, l_linenumber)
      // is NOT unique in the synthetic corpora (118k dup keys at sf0.1,
      // 11.8M at sf10), and engines permute ties differently
      .orderBy("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount")

  // ---------------------------------------------------------------- joins

  /** Equi inner join fact→dim. `customer` SCALES with sf (billions of
    * rows at the 100 TB design point), so no broadcast hint — AQE picks
    * broadcast at small sf and shuffle-hash/sort-merge at scale. */
  def hashJoinInner(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy("o_orderkey")

  /** 5-table join chain (TPC-H Q5 shape): shuffle joins on the fact
    * keys; only the provably bounded dims (nation=25, region=5) carry
    * broadcast hints — customer scales with sf, AQE decides for it. */
  def joinMultiway(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA" &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(
        sum((col("l_extendedprice").cast("decimal(12,2)")) *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("n_name")

  /** Left outer join + count of the nullable side (TPC-H Q13 shape):
    * customers with zero orders must appear with 0. */
  def joinLeftOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        msum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spend"))
      .orderBy("c_custkey")

  /** Right outer — the mirror shape (Catalyst plans it as the same
    * left-outer with sides swapped; present so every join type in the
    * API surface is exercised and oracle-checked): all orders appear,
    * orders whose customer row is filtered away keep NULL dims. */
  def joinRightOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "right")
      .select(col("o_orderkey"),
        coalesce(col("c_custkey"), lit(-1L)).as("cust_key"),
        coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
      .orderBy("o_orderkey")

  /** Left-semi: customers having at least one high-value order. */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** Left-anti: customers with no order at all. */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")

  /** Full outer join: per-nation customer/supplier counts where either
    * side may be absent. */
  def joinFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("nk") === col("snk"), "full_outer")
      .select(
        coalesce(col("nk"), col("snk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** NOT IN with a nullable subquery — the classic three-valued-logic
    * trap: if the subquery yields any NULL, NOT IN returns no rows at
    * all. Exercised with an explicitly non-null subquery plus the
    * null-safe NOT EXISTS twin, so the oracle pins both semantics. */
  def notInNullSemantics(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_custkey IS NOT NULL
                                AND o_totalprice > 400000.0)
      ORDER BY c_custkey""")
  }

  /** Interval/theta join, bucketized: followers within 1 hour after
    * each purchase. Instead of a nested-loop theta join, each probe row
    * is expanded to its hour bucket b and b+1 and equi-joined on the
    * bucket — a shuffle-hash plan that survives a 100× scale-up. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val e = Tables.events(s, dir)
    val probes = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("ts_us").as("p_ts_us"))
      .withColumn("bucket",
        explode(array(floor(col("p_ts_us") / hourUs), floor(col("p_ts_us") / hourUs) + 1)))
    val others = e.select(col("event_id").as("f_event_id"),
      col("ts_us").as("f_ts_us"), col("value").as("f_value"))
      .withColumn("bucket", floor(col("f_ts_us") / hourUs))
    probes.join(others, "bucket")
      .where(col("f_ts_us") > col("p_ts_us") &&
        col("f_ts_us") <= col("p_ts_us") + hourUs)
      .groupBy(col("p_event_id"))
      .agg(count(lit(1)).as("n_followers"),
        // exact truncating micro-unit mean, not round(avg(double), 6):
        // the double average's accumulation order flipped the 6th
        // decimal at the sf1 probe (one group landed on a boundary)
        expr("""cast(sum(cast(cast(floor(f_value * cast(1000000 as double))
          as bigint) as decimal(38,0))) div count(1) as bigint)""")
          .as("avg_follower_value_u"))
      .orderBy("p_event_id")
  }

  /** As-of (most recent prior event per user) via one window pass —
    * the shuffle-free-join formulation of ASOF semantics. */
  def asofPrevEvent(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_event_id", lag(col("event_id"), 1).over(w))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("prev_ts_us", lag(col("ts_us"), 1).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("prev_event_id"), r6(col("prev_value")).as("prev_value"),
        col("prev_ts_us"))
      .orderBy("event_id")
  }

  /** Two-STREAM as-of via the merge formulation: each purchase
    * matched to the user's most recent view at-or-before it — the
    * attribution join. Instead of joining two tables (range bucketing,
    * q_range_join) or lagging one stream (q_asof_prev_event), the two
    * streams are UNIONed, sorted once per user with the reference
    * stream ordered first at equal timestamps, and the match read off
    * a running `last(ignoreNulls)`. One shuffle + one sort total,
    * independent of how many probe rows share a reference row — the
    * formulation that survives when the probe:reference ratio is
    * extreme. */
  def asofMergeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        when(col("event_type") === "view", col("event_id")).as("view_id"),
        when(col("event_type") === "view", col("ts_us")).as("view_ts_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"),
        when(col("event_type") === "view", 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("last_view_id", last(col("view_id"), ignoreNulls = true).over(w))
      .withColumn("last_view_ts_us", last(col("view_ts_us"), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("purchase_ts_us"),
        coalesce(col("last_view_id"), lit(-1L)).as("view_id"),
        coalesce(col("last_view_ts_us"), lit(-1L)).as("view_ts_us"))
      .orderBy("purchase_id")
  }

  // ---------------------------------------------------------- aggregation

  /** TPC-H Q1 shape: the canonical hash-agg with exact decimal sums. */
  def groupbyAgg(s: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(12,2)")
    // The derived money sums and the means ship as exact micro-unit
    // BIGINTs, not rounded doubles: at the sf1 scale probe the
    // scale-6 decimal sum's unscaled value crossed 2^53, where
    // DuckDB's hugeint→double→÷1e6 cast double-rounds one ulp apart
    // from the correctly-rounded conversion — and a double AVG's
    // accumulation order can flip round(,6) at any scale. Integer
    // micro-units sidestep both forever (fits BIGINT to sf ~100000).
    // spread: the decimal money chains below evaluate per row inside
    // the partial-agg scan stage — on the driver testdata's single
    // parquet split that serializes on one core (Tables.spread
    // scaladoc; no-op at real scale)
    Tables.spread(s, t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_orderkey")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_base_price"),
        sum(((d(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - d(col("l_discount"))))
          * lit(1000000L)).cast("long").cast("decimal(38,0)"))
          .cast("long").as("sum_disc_price_u"),
        sum(((d(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - d(col("l_discount"))) *
          (lit(1).cast("decimal(12,2)") + d(col("l_tax"))))
          * lit(1000000L)).cast("long").cast("decimal(38,0)"))
          .cast("long").as("sum_charge_u"),
        expr("""sum(cast(cast(cast(l_quantity as decimal(12,2)) * 1000000
          as bigint) as decimal(38,0))) div count(1)""").cast("long")
          .as("avg_qty_u"),
        expr("""sum(cast(cast(cast(l_extendedprice as decimal(12,2)) * 1000000
          as bigint) as decimal(38,0))) div count(1)""").cast("long")
          .as("avg_price_u"),
        expr("""sum(cast(cast(cast(l_discount as decimal(12,2)) * 1000000
          as bigint) as decimal(38,0))) div count(1)""").cast("long")
          .as("avg_disc_u"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** ROLLUP with grouping_id disambiguation. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    // spread: rollup's Expand multiplies every input row by the
    // grouping-set count BEFORE the partial agg — single-split driver
    // parquet would run that on one core (no-op at real scale)
    Tables.spread(s, t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), msum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast("long").as("gid"))
      .select(coalesce(col("l_returnflag"), lit("_all_")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("_all_")).as("linestatus"),
        col("n"), col("sum_qty"), col("gid"))
      .orderBy("gid", "returnflag", "linestatus")

  /** CUBE with grouping_id disambiguation. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    // spread: cube's 4-way Expand runs before the partial agg —
    // single-split driver parquet would run it on one core
    Tables.spread(s, t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), msum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast("long").as("gid"))
      .select(coalesce(col("l_returnflag"), lit("_all_")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("_all_")).as("linestatus"),
        col("n"), col("sum_qty"), col("gid"))
      .orderBy("gid", "returnflag", "linestatus")

  /** GROUPING SETS (beyond rollup/cube: an explicit set list). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    // spread: same Expand-before-partial-agg physics as cube/rollup
    Tables.spread(s, s.table("lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")))
      .createOrReplaceTempView("lineitem_gsets_spread")
    s.sql("""
      SELECT coalesce(l_returnflag, '_all_') AS returnflag,
             coalesce(l_linestatus, '_all_') AS linestatus,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
      FROM lineitem_gsets_spread
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY gid, returnflag, linestatus""")
  }

  /** PIVOT: per-user event-type counts as columns. Spark's relational
    * pivot emits null for absent cells where a conditional-agg oracle
    * emits 0 — coalesced so both read 0. */
  def pivotEvents(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_id")
  }

  /** UNPIVOT (stack): wide per-order money columns back to long
    * (metric, amount) rows — the inverse of q_pivot. */
  def unpivotOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        expr("stack(2, 'totalprice', o_totalprice, 'totalprice_half', o_totalprice / 2.0) AS (metric, amount)"))
      .select(col("o_orderkey"), col("metric"), col("amount"))
      .orderBy("o_orderkey", "metric")

  /** Moment statistics via exact decimal power sums. Built-in
    * stddev/var/corr use engine-specific accumulation (Spark:
    * Welford-style moments; DuckDB: its own) whose results differ
    * beyond 6 decimals at ~1e8 magnitudes, so the moments are
    * assembled from DECIMAL sums of x, x², xy — exact, order-free,
    * identical in both engines — with only the final scalar arithmetic
    * in doubles. */
  def aggStats(s: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(28,8)")
    // spread: six decimal(28,8) products per row inside the
    // partial-agg scan stage — single-split driver parquet would run
    // them on one core (no-op at real scale)
    Tables.spread(s, t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_discount")))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(d(col("l_quantity"))).cast("double").as("sx"),
        sum(d(col("l_quantity")) * d(col("l_quantity"))).cast("double").as("sxx"),
        sum(d(col("l_discount"))).cast("double").as("sy"),
        sum(d(col("l_discount")) * d(col("l_discount"))).cast("double").as("syy"),
        sum(d(col("l_quantity")) * d(col("l_discount"))).cast("double").as("sxy"))
      .select(
        col("l_returnflag"),
        r6((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_qty"),
        r6(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))).as("stddev_qty"),
        r6((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)).as("covar_qty_disc"),
        r6((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_qty_disc"))
      .orderBy("l_returnflag")
  }

  /** Exact median / interpolated percentiles as DISTRIBUTED order
    * statistics: rank each group, pick the two bracketing rows per
    * target with conditional aggregates, and interpolate — constant
    * memory per group. (Spark's builtin exact `percentile()` buffers
    * every value of a group in executor memory — correct here, fatal
    * at 100 TB.) Both bracketing rows come from two-phase SELECTION
    * order statistics ([[graft.ops.TwoPhaseRank.orderStatistics]],
    * r9): only the bounded (flag, cents-bucket) counts grids move and
    * only the buckets holding a target rank sort — lineitem is never
    * window-partitioned on the 3-value returnflag key (oracle
    * unchanged). Interpolation matches quantile_cont to well under
    * the r6 grid. */
  def medianPercentile(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
    val ties = Seq(col("l_orderkey"), col("l_linenumber"))
    // 1-based bracketing ranks for the 0-based floor/ceil positions
    def pos(q: Double): Seq[String] = Seq(
      s"cast(floor((n - 1) * $q) as bigint) + 1",
      s"cast(ceil((n - 1) * $q) as bigint) + 1")
    val qs = graft.ops.TwoPhaseRank.orderStatistics(
      base, Seq("l_returnflag"), "l_quantity", ties,
      Seq("v0", "v1").zip(pos(0.5)),
      Some(graft.ops.TwoPhaseRank.monotoneBucket(
        "cast(floor(l_quantity * 100) as bigint)")))
    val ps = graft.ops.TwoPhaseRank.orderStatistics(
      base, Seq("l_returnflag"), "l_extendedprice", ties,
      Seq("v2", "v3").zip(pos(0.5)) ++ Seq("v4", "v5").zip(pos(0.9)) ++
        Seq("v6", "v7").zip(pos(0.99)),
      Some(graft.ops.TwoPhaseRank.monotoneBucket(
        "cast(floor(l_extendedprice * 100) as bigint)")))
      .drop("n")
    def interp(nn: Column, lo: Column, hi: Column, q: Double): Column = {
      val pos = (nn - 1) * q
      r6(lo + (pos - floor(pos)) * (hi - lo))
    }
    qs.join(ps, "l_returnflag")
      .withColumn("nn", col("n").cast("double"))
      .select(
        col("l_returnflag"),
        interp(col("nn"), col("v0"), col("v1"), 0.5).as("median_qty"),
        interp(col("nn"), col("v2"), col("v3"), 0.5).as("p50_price"),
        interp(col("nn"), col("v4"), col("v5"), 0.9).as("p90_price"),
        interp(col("nn"), col("v6"), col("v7"), 0.99).as("p99_price"))
      .orderBy("l_returnflag")
  }

  /** Two-phase salted aggregation — the skew-mitigation pattern for
    * hot keys at scale, expressed so the result is identical to the
    * plain aggregation (which is exactly what the oracle checks):
    * partial sums per (key, salt) combine map-side, the final
    * per-key merge handles only #salts rows per key. AQE's skew
    * handling covers joins; salting is the aggregation-side tool. */
  def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    val partial = t(s, dir, "lineitem")
      .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
      .groupBy(col("l_suppkey"), col("salt"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).as("p_qty"),
        count(lit(1)).as("p_n"))
    partial
      .groupBy(col("l_suppkey"))
      .agg(
        sum(col("p_qty")).cast("double").as("sum_qty"),
        sum(col("p_n")).cast("long").as("n_items"))
      .orderBy("l_suppkey")
  }

  /** Join-key skew diagnostic — the probe a pipeline runs BEFORE
    * choosing salt factors (q_salted_agg) or trusting AQE skew
    * splitting: the 10 hottest l_orderkey values with their row
    * counts against the global key statistics, and the hot key's
    * load as ppm of the mean (an exact integer — cnt·1e6·n_keys div
    * total — so no floating skew "ratio" can diverge cross-engine).
    * Shape: one combine-enabled count shuffle (the same exchange the
    * downstream join would make anyway), a one-row global stats
    * frame joined back as a bounded broadcast, and a top-k sort of
    * key-count rows — never data rows. */
  def keySkew(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).cast("long").as("total_rows"),
      max(col("cnt")).as("max_rows"))
    counts.crossJoin(broadcast(stats))
      .select(col("l_orderkey"), col("cnt"), col("n_keys"),
        col("total_rows"), col("max_rows"),
        expr("cast(cnt as decimal(38,0)) * 1000000 * n_keys div total_rows").as("load_ppm_of_mean"))
      .orderBy(col("cnt").desc, col("l_orderkey"))
      .limit(10)
  }

  /** DISTINCT — dedup shuffle on the full row. */
  def distinctPairs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .orderBy("user_id", "event_type")

  /** Data-profiling pass (the Deequ/Great-Expectations-style audit a
    * pipeline runs before trusting a new drop): per column of
    * lineitem — null count, exact distinct count, numeric min/max
    * (timestamps as epoch-µs), lexicographic min/max for strings —
    * emitted as one row per column.
    *
    * Scale shape: one COLUMN-PRUNED branch per column, unioned —
    * each branch's exact count_distinct plans the efficient 2-phase
    * form (map-side partial distinct, then one combine shuffle of
    * that column's distinct values only) and branches run in
    * parallel. The single-scan alternative (all 11 distincts in one
    * aggregate) plans an Expand — 12× every row through ONE shuffle
    * with an 11-column grouping key — and benched 25 s vs ~2 s for
    * this shape at sf0.1; at 100 TB the Expand is strictly worse
    * because it moves rows×columns while the branches move only
    * per-column distinct values. (The approx variant swaps in
    * approx_count_distinct; q_approx_distinct demonstrates that
    * sketch.) */
  /** Salted join — the manual skew-mitigation twin of q_salted_agg
    * (AQE's automatic skew split is demonstrated in AqeSkewJoinSpec;
    * this is the pattern for engines/paths where AQE can't help, e.g.
    * a skewed key feeding a non-AQE sink stage): the fact side gets a
    * salt from a row-local hash, the dimension side REPLICATES once
    * per salt value (explode over the salt domain), and the join key
    * becomes (key, salt) — a hot key's rows now spread across 8
    * reducers instead of one. The aggregate over the salted join is
    * provably identical to the plain join's (the oracle computes the
    * plain form), which is the whole point: same answer, no hot
    * partition.
    *
    * Scale shape: dimension replication costs salt-factor × |dim| —
    * bounded and chosen; the fact side shuffles once on (key, salt)
    * with uniform load by construction. */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val saltN = 8
    val fact = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        pmod(col("l_linenumber"), lit(saltN)).as("salt"))
    val dim = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        explode(sequence(lit(0), lit(saltN - 1))).as("salt"))
    fact
      .join(dim, fact("l_orderkey") === dim("o_orderkey") &&
        fact("salt") === dim("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          .as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Default q_sort_boundaries sample geometry: keep rows whose
    * portable row hash ≡ 0 (mod SbMod), spread the draw over
    * SbBuckets hash-derived buckets, keep the SbCap lowest-hash rows
    * per bucket. The sample is therefore ≤ SbBuckets·SbCap rows
    * (2048 at defaults) at ANY corpus size — RangePartitioner's own
    * `sampleSizePerPartition × partitions` discipline — while staying
    * hash-deterministic so DuckDB draws the identical rows. Runtime
    * confs `spark.graft.sortsample.{mod,buckets,cap}` override it;
    * [[sortBoundariesOracle]] regenerates the oracle from the same
    * three numbers so query and oracle cannot drift. */
  private[graft] val SbMod = 100
  private[graft] val SbBuckets = 64
  private[graft] val SbCap = 32

  private def sbGeometry(s: SparkSession): (Int, Int, Int) = (
    s.conf.get("spark.graft.sortsample.mod", SbMod.toString).toInt,
    s.conf.get("spark.graft.sortsample.buckets", SbBuckets.toString).toInt,
    s.conf.get("spark.graft.sortsample.cap", SbCap.toString).toInt)

  /** Range-partition planning (the TeraSort/global-sort step that
    * never shows up in the query text): pick 7 balanced boundaries
    * for l_extendedprice the way Spark's own RangePartitioner plans a
    * 100 TB orderBy — a COUNT-BOUNDED sample, sorted exactly, octiles
    * picked by rank — then validate the plan by counting rows per
    * planned range and reporting each range's load as exact ppm. The
    * sample is hash-defined twice over: the scan keeps rows with
    * portable-hash ≡ 0 mod `mod` (~1% of the corpus), and a
    * row_number window over `buckets` hash-derived buckets keeps only
    * the `cap` lowest-hash rows per bucket, so the sorted-collect
    * buffer holds ≤ buckets·cap values (2048 at defaults) at ANY
    * scale — the r5 linear-growth weakness removed. Both engines draw
    * the SAME rows because bucket, order, and tie-break (hash, then
    * the unique (l_orderkey, l_linenumber) row key) are all
    * hash-arithmetic. A mergeable quantile sketch was tried first,
    * but `approx_percentile`'s rank error at 600 k rows picks a
    * neighboring element vs DuckDB's quantile_disc (see
    * q_approx_percentile for the sketch path).
    *
    * Scale shape: the mod-filter is scan-side; the per-bucket cap is
    * a rank window that Spark 4 rewrites to WindowGroupLimit — each
    * map task keeps a ≤ buckets·cap top-heap BEFORE the shuffle, so
    * the exchange carries O(tasks·buckets·cap) rows, not corpus/mod
    * (plan-asserted in PlanAudit). Boundaries come back as a bounded
    * 7-element frame CROSS-joined (broadcast, 1 row) onto the scan;
    * range assignment is a projection (count of boundaries ≤ value);
    * the validation count is one ≤8-key combine shuffle. */
  def sortBoundaries(s: SparkSession, dir: String): DataFrame = {
    val (mod, buckets, cap) = sbGeometry(s)
    val sampleKey = phSql.format("concat(l_orderkey, ':', l_linenumber)")
    val byBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("h"), col("l_orderkey"), col("l_linenumber"))
    // (Deliberately NOT spread: the synthetic data carries duplicate
    // (l_orderkey, l_linenumber) rows with differing prices, so the
    // per-bucket row_number tie-breaks on the row KEY, and a
    // repartition changes which physical duplicate the window sees
    // first — a spread here flipped one boundary at sf0.1 against the
    // oracle. The sample hash stays on the scan task.)
    val bounds = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        expr(sampleKey).as("h"))
      .where(expr(s"h % $mod = 0"))
      .withColumn("bucket", expr(s"(h div $mod) % $buckets"))
      .withColumn("rk", row_number().over(byBucket))
      .where(col("rk") <= cap)
      .agg(sort_array(collect_list(col("l_extendedprice"))).as("sv"))
      .select(expr(
        """transform(sequence(1, 7),
          |  i -> element_at(sv, greatest(1, cast(i * size(sv) div 8 as int))))"""
          .stripMargin).as("bounds"))
    t(s, dir, "lineitem")
      .select(col("l_extendedprice"))
      .crossJoin(broadcast(bounds))
      .select(expr("size(filter(bounds, b -> b <= l_extendedprice))")
        .cast("long").as("range_id"),
        col("l_extendedprice"))
      .groupBy(col("range_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_extendedprice")).as("range_min"),
        max(col("l_extendedprice")).as("range_max"))
      .select(col("range_id"), col("n_rows"), col("range_min"),
        col("range_max"),
        expr("1000000 * cast(n_rows as decimal(38,0)) div sum(n_rows) over ()")
          .as("load_ppm"))
      .orderBy("range_id")
  }

  /** The q_sort_boundaries DuckDB oracle, generated from the SAME
    * geometry constants the query reads (the q_profile_stats /
    * SRP-oracle discipline) so the two surfaces cannot drift. */
  private[graft] def sortBoundariesOracle(mod: Int = SbMod,
      buckets: Int = SbBuckets, cap: Int = SbCap): String =
    s"""WITH s0 AS (
       |  SELECT l_orderkey, l_linenumber, l_extendedprice,
       |         CAST('0x' || substring(sha256(
       |           CAST(l_orderkey AS VARCHAR) || ':' ||
       |           CAST(l_linenumber AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM lineitem),
       |sm AS (
       |  SELECT l_extendedprice AS v,
       |         row_number() OVER (PARTITION BY (h // $mod) % $buckets
       |           ORDER BY h, l_orderkey, l_linenumber) AS rk
       |  FROM s0 WHERE h % $mod = 0),
       |b AS (
       |  SELECT list_transform(range(1, 8), i ->
       |    sv[greatest(1, CAST((i * len(sv)) // 8 AS INT))]) AS bounds
       |  FROM (SELECT list_sort(list(v)) AS sv FROM sm WHERE rk <= $cap)),
       |r AS (
       |  SELECT CAST(len(list_filter(bounds, x -> x <= l_extendedprice))
       |           AS BIGINT) AS range_id,
       |         l_extendedprice
       |  FROM lineitem, b),
       |g AS (
       |  SELECT range_id, count(*) AS n_rows,
       |         min(l_extendedprice) AS range_min,
       |         max(l_extendedprice) AS range_max
       |  FROM r GROUP BY range_id)
       |SELECT range_id, n_rows, range_min, range_max,
       |       CAST(1000000 * CAST(n_rows AS HUGEINT)
       |            // CAST(sum(n_rows) OVER () AS BIGINT) AS BIGINT) AS load_ppm
       |FROM g ORDER BY range_id""".stripMargin

  private val ProfileNumeric = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val ProfileStrings = Seq("l_returnflag", "l_linestatus")
  private val ProfileDates = Seq("l_shipdate")

  /** The q_profile_stats DuckDB oracle, generated from the SAME column
    * lists the query uses so the two surfaces cannot drift. */
  private[graft] def profileOracle: String = {
    def branch(c: String, kind: String): String = {
      val (mn, mx, ms, xs) = kind match {
        case "num" => (s"round(CAST(min($c) AS DOUBLE), 6)",
          s"round(CAST(max($c) AS DOUBLE), 6)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        case "str" => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          s"min($c)", s"max($c)")
        case _ => (s"CAST(epoch_us(min($c)) AS DOUBLE)",
          s"CAST(epoch_us(max($c)) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      }
      s"""SELECT '$c' AS col_name,
         |  (SELECT count(*) FROM lineitem) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num,
         |  $ms AS min_str, $xs AS max_str
         |FROM lineitem""".stripMargin
    }
    val branches =
      ProfileNumeric.map(branch(_, "num")) ++
      ProfileStrings.map(branch(_, "str")) ++
      ProfileDates.map(branch(_, "date"))
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  def profileStats(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    def branch(c: String, kind: String): DataFrame = {
      val (mn, mx, ms, xs) = kind match {
        case "num" => (r6(min(col(c)).cast("double")),
          r6(max(col(c)).cast("double")),
          lit(null).cast("string"), lit(null).cast("string"))
        case "str" => (lit(null).cast("double"), lit(null).cast("double"),
          min(col(c)), max(col(c)))
        case _ => (Det.epochUs(min(col(c))).cast("double"),
          Det.epochUs(max(col(c))).cast("double"),
          lit(null).cast("string"), lit(null).cast("string"))
      }
      li.agg(
        count(lit(1)).as("n_rows"), count(col(c)).as("cnt"),
        countDistinct(col(c)).as("n_distinct"),
        mn.as("min_num"), mx.as("max_num"),
        ms.as("min_str"), xs.as("max_str"))
        .select(lit(c).as("col_name"),
          (col("n_rows") - col("cnt")).as("n_nulls"), col("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    (ProfileNumeric.map(branch(_, "num")) ++
      ProfileStrings.map(branch(_, "str")) ++
      ProfileDates.map(branch(_, "date")))
      .reduce(_ union _)
      .orderBy("col_name")
  }

  /** MERGE / upsert (the lakehouse `MERGE INTO` snapshot semantics —
    * SCD type 1): apply a change batch (updates, deletes, inserts) to
    * a base table and emit the post-merge snapshot. The change set is
    * derived deterministically from the base (doc_id mod 7: 0 →
    * update, 1 → delete, 2 → insert-as-new-id) so the oracle replays
    * the identical merge; content ships as the portable hash so the
    * snapshot check covers the merged TEXT, not just row membership.
    *
    * Scale shape: one full-outer shuffle join on the merge key — the
    * minimum data movement any MERGE needs; the change side scales
    * with the batch, so no broadcast hint (AQE broadcasts small
    * batches on its own). On a bucketed base layout
    * (ParquetLayout.writeBucketed) the base-side exchange disappears
    * entirely — the standard production MERGE physical plan. */
  /** CDC change-log compaction — the ORDERED counterpart of
    * [[mergeUpsert]] (which applies one unordered change batch):
    * given a per-key sequence of insert/update/delete changes, emit
    * each key's final state — last-writer-wins by (ts, id) sequence,
    * a key whose LAST change is a delete vanishes from the snapshot.
    * This is exactly how lakehouse CDC sinks and Kafka log compaction
    * materialize a change stream into a table. The change log derives
    * deterministically from events (signup → I, error → D, everything
    * else → U; value as the payload in micro-units) so the oracle
    * replays the identical log.
    *
    * Scale shape: ONE hash shuffle on the key carrying the log, with
    * the rank's rn = 1 planned as WindowGroupLimit (plan-verified)
    * and the n_changes count riding the same partitioning — a
    * compaction job reads its log once by definition, so one
    * log-carrying shuffle is the floor (drop the n_changes column
    * and WindowGroupLimit's map-side top-1 heap prunes the shuffle
    * payload to one candidate per key per partition). */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"),
        expr("cast(floor(value * cast(1000000 as double)) as bigint)")
          .as("value_u"))
      .withColumn("n_changes", count(lit(1)).over(
        Window.partitionBy(col("user_id"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("op").as("last_op"),
        col("ts_us").as("last_ts_us"), col("value_u").as("last_value_u"),
        col("n_changes"))
      .orderBy("user_id")
  }

  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").as("base_text"), col("lang").as("base_lang"))
    val changes = Tables(s, dir, "documents")
      .where(col("doc_id") % 7 < 3)
      .select(
        when(col("doc_id") % 7 === 2, col("doc_id") + 10000000L)
          .otherwise(col("doc_id")).as("doc_id"),
        when(col("doc_id") % 7 === 0, concat(lit("updated: "), col("text")))
          .when(col("doc_id") % 7 === 2, concat(lit("inserted: "), col("text")))
          .otherwise(lit(null).cast("string")).as("new_text"),
        (col("doc_id") % 7 === 1).as("is_delete"),
        col("lang").as("chg_lang"))
    base.join(changes, Seq("doc_id"), "full_outer")
      .where(!coalesce(col("is_delete"), lit(false)))
      .select(col("doc_id"),
        when(col("new_text").isNotNull && col("base_text").isNotNull, lit("update"))
          .when(col("new_text").isNotNull, lit("insert"))
          .otherwise(lit("keep")).as("op"),
        coalesce(col("base_lang"), col("chg_lang")).as("lang"),
        expr(phSql.format("coalesce(new_text, base_text)")).as("content_h"))
      .orderBy("doc_id")
  }

  /** Bloom-sketch semi-join, portable construction: a classic
    * m = [[BloomM]] = 2^20-bit / k=8 bloom filter whose bit positions
    * are derived by double hashing from the one portable 60-bit sha
    * hash (pos_j = (h1 + j*h2) mod m), so DuckDB computes the identical
    * filter and the candidate count — false positives included — is
    * hash-checked, not just bounded. The build side runs distributed
    * (scan + distinct positions), then the bounded bitmap — m/64 =
    * 16384 longs, 128 KB regardless of build cardinality — is collected
    * and re-enters the plan as a LITERAL the probe tests with 8
    * codegen'd bit-probes per row: the exact physics of Spark's own
    * runtime-filter broadcast (an O(m) sketch moves to every task;
    * the fact scan stays a pipelined Filter, zero joins, zero probe
    * shuffles — the entire point of a bloom pre-filter at 100 TB).
    * Spark's native machinery (bloom_filter_agg / might_contain, the
    * production fast path) is demonstrated against this in
    * BloomJoinSpec via [[bloomSemiJoinNative]]. */
  def bloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val pass = bloomPass(s, dir) // registers the tables
    val truth = s.sql("""
      SELECT count(*) AS n_true FROM lineitem l
      WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_totalprice > 300000.0)""")
    pass
      .agg(sum(when(col("pass"), 1L).otherwise(0L)).cast("long").as("n_candidates"))
      .crossJoin(truth)
  }

  private val phSql =
    "cast(conv(substring(sha2(cast(%s as string), 256), 1, 15), 16, 10) as bigint)"

  /** Bloom geometry: m = 2^20 bits (a 128 KB word array — still
    * trivially broadcastable, and the 8 probes stay far from
    * saturation at bench-scale build cardinalities), k = 8. */
  private val BloomM = 1 << 20

  /** The probe side of [[bloomSemiJoin]]: every lineitem row tagged
    * with whether its 8 double-hashed positions are all set in the
    * bitmap. The probe is a PROJECTION, deliberately consumed by an
    * aggregate in the query rather than a Filter: predicate pushdown
    * substitutes aliases into filter conjuncts unconditionally (the
    * sha would re-evaluate per conjunct on the scan — benched 18 s),
    * while CollapseProject's cost guard keeps a non-cheap alias that
    * is referenced twice — the hash — materialized once per row. All
    * 8 bit-tests are codegen'd bitwise ops over the two derived hash
    * columns. Exposed so BloomJoinSpec can assert the invariants and
    * the plan shape (no joins, no hash exchanges on the probe). */
  private[graft] def bloomPass(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    val m = BloomM
    // distributed build, bounded collect: positions fold into 64-bit
    // bitmap WORDS with a combine-enabled bit_or aggregate, so the
    // shuffle carries map-side-combined word partials and the collect
    // is ≤ m/64 rows at ANY build cardinality — strictly tighter than
    // the old `SELECT DISTINCT pos` (a full dedup exchange of every
    // position, collected as ≤ m single-bit rows); bit-OR is the
    // idempotent union the mask needs, exactly what a runtime
    // filter's own aggregate does.
    val words = new Array[Long](m / 64)
    s.sql(s"""
      SELECT pos div 64 AS w,
             bit_or(shiftleft(cast(1 as bigint), cast(pos % 64 as int))) AS bits
      FROM (
        SELECT (h % $m + t.j * ((h div $m) % ${m - 1} + 1)) % $m AS pos
        FROM (SELECT ${phSql.format("o_orderkey")} AS h
              FROM orders WHERE o_totalprice > 300000.0)
        LATERAL VIEW explode(sequence(0, 7)) t AS j)
      GROUP BY pos div 64""")
      .collect().foreach { r =>
        words(r.getLong(0).toInt) |= r.getLong(1)
      }
    val probeTest = (0 until 8)
      .map { j =>
        val pos = s"pmod(h1 + $j * h2, $m)"
        s"(element_at(bloom_mask, cast($pos div 64 as int) + 1)" +
          s" & shiftleft(cast(1 as bigint), cast($pos % 64 as int))) != 0"
      }
      .mkString(" AND ")
    Tables.spread(s, s.table("lineitem").select(col("l_orderkey")))
      .select(col("l_orderkey"), expr(phSql.format("l_orderkey")).as("h"))
      .select(col("l_orderkey"),
        expr(s"h % $m").as("h1"), expr(s"(h div $m) % ${m - 1} + 1").as("h2"))
      .withColumn("bloom_mask", lit(words))
      .select(col("l_orderkey"), expr(probeTest).as("pass"))
  }

  /** The same pre-filter through Spark's own runtime-filter
    * expressions (BloomFilterAggregate / BloomFilterMightContain,
    * bridge-registered Catalyst internals) — the production path with
    * a real bitmap. Exercised by BloomJoinSpec; its candidate count is
    * implementation-specific, so the oracled query is the portable
    * construction above. */
  def bloomSemiJoinNative(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    // bloom_filter_agg/might_contain exist in Catalyst (Spark's own
    // runtime-filter machinery) but are not SQL-registered — expose
    // them to this session through the bridge.
    org.apache.spark.sql.graft.Bridge.registerFunction(s, "bloom_filter_agg",
      es => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        es(0), es(1), es(2)))
    org.apache.spark.sql.graft.Bridge.registerFunction(s, "might_contain",
      es => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        es(0), es(1)))
    s.sql("""
      WITH bf AS (
        SELECT bloom_filter_agg(o_orderkey, 2000L, 65536L) AS f
        FROM orders WHERE o_totalprice > 300000.0),
      cand AS (
        SELECT l.l_orderkey FROM lineitem l
        WHERE might_contain((SELECT f FROM bf), l.l_orderkey)),
      truth AS (
        SELECT l.l_orderkey FROM lineitem l
        WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
                               WHERE o_totalprice > 300000.0))
      SELECT (SELECT count(*) FROM cand) AS n_candidates,
             (SELECT count(*) FROM truth) AS n_true""")
  }

  /** HyperLogLog approximate distinct, portable construction: p=9
    * (m=512 registers), hash = the portable 60-bit sha hash, bucket =
    * low 9 bits, rho = leading-zero rank of the remaining 51 bits
    * (exact integer log2 via length(bin(w)) — no floating log). The
    * register table is at most groups × 512 rows with map-side max
    * combine, so the shuffle is sketch-sized regardless of input
    * cardinality — the HLL scale contract. The estimate's harmonic
    * sum is computed as the exact integer sum(2^(52-M)) (order-free),
    * and the final alpha*m^2/S division is a fixed sequence of IEEE
    * double ops both engines perform identically, so the estimate —
    * bias and all — is hash-checked against DuckDB computing the same
    * sketch. A portable register format is itself the scale feature:
    * sketches can be handed across engines/serving layers and merged
    * by max. Spark's built-in approx_count_distinct (the production
    * one-liner, engine-specific sketch) is demonstrated in
    * ApproxDistinctSpec via [[approxDistinctNative]]. Exact distinct
    * counts ride along to exhibit the sketch error (at 100 TB you'd
    * drop them — they are the cost the sketch avoids). The raw
    * estimate is emitted without HLL's small-range linear-counting
    * correction (that needs ln(), which is not bit-identical across
    * engines); empty-register counts are emitted so a consumer can
    * apply it. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    val reliable = s.sparkContext.getCheckpointDir.isDefined
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    // Collapse each key to its DISTINCT (flag, key) frame FIRST and
    // pin it (the hllSetAlgebra discipline): registers are max-folds,
    // so sketching the distinct frame gives identical registers while
    // the sha runs once per distinct key instead of once per row, and
    // the exact side becomes a count(*) over the same pinned frame —
    // this also retires the old single-aggregate two-column
    // count(DISTINCT) whose Expand duplicated every input row through
    // one wide-key shuffle (the r5 plan-shape lesson).
    pin(s.table("lineitem")
        .select(col("l_returnflag"), col("l_orderkey")).distinct())
      .createOrReplaceTempView("hll_o_distinct")
    pin(s.table("lineitem")
        .select(col("l_returnflag"), col("l_partkey")).distinct())
      .createOrReplaceTempView("hll_p_distinct")
    val ph = "cast(conv(substring(sha2(cast(%s as string), 256), 1, 15), 16, 10) as bigint)"
    def sketch(key: String, alias: String) = s"""
      ${alias}_reg AS (
        SELECT l_returnflag, h % 512 AS bucket,
               max(CASE WHEN h div 512 = 0 THEN 52
                        ELSE 52 - length(bin(h div 512)) END) AS m
        FROM (SELECT l_returnflag, ${ph.format(key)} AS h
              FROM hll_${alias}_distinct)
        GROUP BY l_returnflag, h % 512),
      ${alias}_est AS (
        SELECT l_returnflag,
               cast(512 - count(*) AS bigint) AS ${alias}_empty,
               cast(floor(
                 cast(0.7213 as double)
                   / (cast(1.0 as double) + cast(1.079 as double) / cast(512.0 as double))
                   * cast(262144 as double) * cast(4503599627370496 as double)
                   / cast(sum(shiftleft(cast(1 as bigint), 52 - m))
                          + (512 - count(*)) * shiftleft(cast(1 as bigint), 52) as double)
               ) AS bigint) AS ${alias}_hll
        FROM ${alias}_reg GROUP BY l_returnflag)"""
    s.sql(s"""
      WITH ${sketch("l_orderkey", "o")},
      ${sketch("l_partkey", "p")},
      exact AS (
        SELECT oe.l_returnflag, oe.o_exact, pe.p_exact
        FROM (SELECT l_returnflag, count(*) AS o_exact
              FROM hll_o_distinct GROUP BY l_returnflag) oe
        JOIN (SELECT l_returnflag, count(*) AS p_exact
              FROM hll_p_distinct GROUP BY l_returnflag) pe
          ON oe.l_returnflag = pe.l_returnflag)
      SELECT e.l_returnflag, e.o_exact, o_est.o_hll, o_est.o_empty,
             e.p_exact, p_est.p_hll, p_est.p_empty
      FROM exact e
      JOIN o_est ON e.l_returnflag = o_est.l_returnflag
      JOIN p_est ON e.l_returnflag = p_est.l_returnflag
      ORDER BY e.l_returnflag""")
  }

  /** Spark's built-in HLL (engine-specific sketch, so no cross-engine
    * oracle) — the production one-liner, error-bounded against exact
    * counts in ApproxDistinctSpec. */
  def approxDistinctNative(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")

  /** Approximate percentiles via Spark's quantile sketch
    * (approx_percentile). The sketch is mergeable: partials combine
    * map-side, one small-state shuffle regardless of group
    * cardinality — the 100 TB answer when exact order statistics'
    * per-group sort is too expensive. Accuracy is a memory/precision
    * knob (state is O((1/eps)*log(eps*n))): at 1e6 the rank error
    * n/accuracy is sub-1 for gate-scale groups, so the sketch answer
    * IS the exact nearest-rank percentile and hash-matches DuckDB's
    * quantile_disc; at 100 TB you'd dial accuracy down (1e4) and
    * accept the published rank-error bound (ApproxPercentileSpec
    * bounds it against q_median_percentile's exact order stats). */
  def approxPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_quantity, array(0.5, 0.9, 0.99), 1000000)")
          .as("qty_pcts"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000000)")
          .as("price_pcts"))
      // Scalar projection: the driver harness sorts/hashes final outputs
      // and cannot handle array cells, so the sketch vector is unpacked.
      .select(col("l_returnflag"),
        element_at(col("qty_pcts"), 1).as("qty_p50"),
        element_at(col("qty_pcts"), 2).as("qty_p90"),
        element_at(col("qty_pcts"), 3).as("qty_p99"),
        element_at(col("price_pcts"), 1).as("price_p50"),
        element_at(col("price_pcts"), 2).as("price_p90"),
        element_at(col("price_pcts"), 3).as("price_p99"))
      .orderBy("l_returnflag")

  // ------------------------------------------------------------- windows

  /** Ranking trio per group, top-3 rows kept. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("rnk"), col("drnk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** lag/lead/running-sum with an explicit ROWS frame; the running
    * sum goes through decimal so it's bit-stable cross-engine. */
  def windowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(12,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        epochUs(col("o_orderdate")).as("orderdate_us"),
        col("o_totalprice"), col("prev_price"), col("next_price"),
        col("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE frame (vs the ROWS frames elsewhere): 30-day trailing spend
    * per customer — peers are selected by ORDER-BY VALUE distance, so
    * same-day orders aggregate together regardless of row order. */
  def windowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od_us"))
      .rangeBetween(-30L * dayUs, 0L)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        epochUs(col("o_orderdate")).as("od_us"))
      .withColumn("trailing_30d_spend",
        sum(col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double"))
      .withColumn("trailing_30d_orders", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("od_us"),
        col("trailing_30d_spend"), col("trailing_30d_orders"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Top-k per group (rank ≤ k pattern). */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(s, dir, "part")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_name"),
        col("p_retailprice"))
      .orderBy("p_brand", "rn")
  }

  /** Navigation window functions: first/last/nth over an explicit
    * full-partition frame. */
  def windowNavigation(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Cumulative DISTINCT count over a window — the "unique event
    * types seen to date per user" profile. Spark (like most engines)
    * rejects COUNT(DISTINCT) OVER; the standard reformulation is a
    * first-occurrence flag (row_number = 1 over (key, value)) summed
    * by a cumulative frame — exactly equivalent, and it composes
    * with any running frame where the builtin wouldn't exist at all.
    *
    * Scale shape: two windows, both partitioned by the key (the
    * (key, value) rank rides a finer partitioning of the same
    * shuffle); no global window, no distinct-explosion. */
  def windowCountDistinct(s: SparkSession, dir: String): DataFrame = {
    val seenW = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    val cumW = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("first_seen",
        when(row_number().over(seenW) === 1, 1L).otherwise(0L))
      .withColumn("n_distinct_cum", sum(col("first_seen")).over(cumW))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist.
    * Partition sizes are < 128, so the rank ratios can't land on a
    * 7-decimal half-boundary — r6 is cross-engine-safe here. */
  def windowDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        r6(percent_rank().over(w)).as("pct_rank"),
        r6(cume_dist().over(w)).as("cdist"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global sort + limit (top-k pushdown: TakeOrderedAndProject). */
  def sortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  // -------------------------------------------------------------- set ops

  /** Ordered string aggregation (LISTAGG): per market segment, the
    * lexicographically-sorted roster of its nations' names. Spark has
    * no ordered listagg, so the deterministic form is
    * array_sort(collect_list) + concat_ws — the sort makes the result
    * independent of partial-aggregation order. collect_list buffers a
    * GROUP in memory: only safe for groups with a bounded row count
    * (here ≤ 25 nations per segment); an unbounded listagg at 100 TB
    * should be a top-N window + concat instead. */
  def stringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment"), col("n_name")).distinct()
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_nations"),
        concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
      .orderBy("c_mktsegment")

  /** Fixed-width histogram of l_extendedprice (20 buckets of 5000,
    * clamped): the single-pass profiling shape — bucket arithmetic in
    * the projection, one combine-enabled shuffle on ≤ 20 keys. Both
    * engines floor the same IEEE division, so bucket edges agree
    * exactly. */
  def histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(least(greatest(floor(col("l_extendedprice") / lit(5000.0)),
        lit(0L)), lit(19L)).as("bucket"),
        col("l_extendedprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        msum(col("l_extendedprice")).as("total_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("bucket")

  /** UNION ALL (bag) + fold to counts for a stable comparison. */
  def unionAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy("nationkey")

  /** INTERSECT (set semantics in both engines). */
  def intersectKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** EXCEPT (set semantics in both engines). */
  def exceptKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** The two halves of the event stream (odd/even event_id) as
    * (user_id, event_type) BAGS — multiplicities matter, which is
    * what distinguishes the ALL set ops below from their set-semantic
    * siblings above. */
  private def eventHalf(s: SparkSession, dir: String, parity: Int): DataFrame =
    Tables.events(s, dir)
      .where(col("event_id") % 2 === parity)
      .select(col("user_id"), col("event_type"))

  /** INTERSECT ALL — bag intersection: each (user, type) row survives
    * min(count_left, count_right) times. Spark plans the dedicated
    * left-semi-with-counts shape (no row explosion); duplicates in the
    * output are fine for the gate (rows sort adjacent). */
  def intersectAllPairs(s: SparkSession, dir: String): DataFrame =
    eventHalf(s, dir, 0).intersectAll(eventHalf(s, dir, 1))
      .orderBy("user_id", "event_type")

  /** EXCEPT ALL — bag difference: max(count_left − count_right, 0)
    * copies survive. */
  def exceptAllPairs(s: SparkSession, dir: String): DataFrame =
    eventHalf(s, dir, 0).exceptAll(eventHalf(s, dir, 1))
      .orderBy("user_id", "event_type")

  // -------------------------------------------------------------- scalars

  /** String function sweep (R3's concat generalized). */
  def scalarString(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        upper(substring(col("c_name"), 1, 8)).as("name_prefix"),
        concat_ws(":", col("c_mktsegment"), col("c_custkey")).as("seg_key"),
        col("c_name").like("%5").as("ends_in_5"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("name_num"),
        length(col("c_name")).cast("long").as("name_len"),
        lower(col("c_mktsegment")).as("seg_lower"))
      .orderBy("c_custkey")

  /** Math scalar sweep (r6 absorbs libm last-ulp differences; all
    * argument columns are positive so domain edges can't diverge). */
  def scalarMath(s: SparkSession, dir: String): DataFrame =
    // spread: ten libm/round scalar projections per row — single-split
    // driver parquet would evaluate them on one core before the final
    // sort (no-op at real scale)
    Tables.spread(s, t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"),
          col("l_quantity"), col("l_extendedprice")))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_disc_delta"),
        r6(sqrt(col("l_quantity"))).as("sqrt_qty"),
        r6(log(col("l_extendedprice"))).as("ln_price"),
        r6(exp(col("l_discount"))).as("exp_disc"),
        r6(pow(col("l_quantity"), 2)).as("qty_sq"),
        signum(col("l_discount") - 0.05).as("sign_disc"),
        ceil(col("l_extendedprice") / 1000.0).as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000.0).as("price_k_floor"),
        (col("l_linenumber") % 3).cast("long").as("line_mod3"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
      // (the q_dq_rules uniqueness rule fires on it), so the key alone
      // is a PARTIAL order — engines permuted the tie rows at the sf1
      // probe. Extending the sort by the value columns makes it total
      // up to full-row duplicates, whose order cannot matter.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty_sq"),
        col("abs_disc_delta"), col("ln_price"))

  /** Conditional expression sweep: CASE / nullif / coalesce /
    * least / greatest. */
  def scalarConditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, "high")
          .when(col("o_totalprice") > 150000.0, "mid")
          .otherwise("low").as("price_tier"),
        nullif(col("o_orderstatus"), lit("O")).as("status_non_open"),
        coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("not-urgent"))
          .as("prio_or_default"),
        least(col("o_totalprice"), lit(200000.0)).as("price_capped"),
        greatest(col("o_totalprice") - 100000.0, lit(0.0)).as("price_excess"))
      .orderBy("o_orderkey")

  /** String transform sweep — the data-cleaning family: regex
    * replacement, character translation, padding, field extraction,
    * edit distance (levenshtein semantics match across engines for
    * ASCII). */
  def stringTransforms(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .select(
        col("n_nationkey").cast("long").as("nationkey"),
        regexp_replace(col("n_name"), "[AEIOU]", "_").as("devoweled"),
        translate(col("n_name"), "AEIOU", "aeiou").as("lower_vowels"),
        lpad(col("n_name"), 16, ".").as("padded"),
        expr("split_part(n_name, ' ', 1)").as("first_word"),
        levenshtein(col("n_name"), lit("UNITED STATES")).cast("long").as("dist_to_us"),
        expr("replace(n_name, 'UNITED', 'U.')").as("abbrev"))
      .orderBy("nationkey")

  /** Date/time function sweep (R12's time math generalized). */
  def scalarDatetime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        epochUs(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("long").as("days_since_epoch_start"))
      .orderBy("o_orderkey")

  /** Array/higher-order-function sweep on the documents token stream. */
  def scalarArray(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
      .select(
        col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        expr("cast(aggregate(transform(tokens, t -> length(t)), 0, (a, x) -> a + x) as bigint)")
          .as("total_token_chars"),
        element_at(col("tokens"), 1).as("first_token"),
        array_contains(col("tokens"), "spark").as("has_spark"),
        size(array_distinct(col("tokens"))).cast("long").as("n_distinct_tokens"))
      .orderBy("doc_id")

  /** Map-function sweep (completes q_scalar_array_map: map_keys /
    * map_values / transform_values / map_filter / map_contains_key on
    * a map built from row fields). Collection outputs are sorted then
    * joined to CSV strings so map entry order can't leak into the hash
    * and the final projection stays atomic-only (the driver harness
    * cannot sort array cells). */
  def scalarMap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        map_from_arrays(
          array(lit("type"), lit("user")),
          array(col("event_type"), col("user_id").cast("string"))).as("m"))
      .select(
        col("event_id"),
        concat_ws(",", sort_array(map_keys(col("m")))).as("m_keys"),
        concat_ws(",", sort_array(map_values(col("m")))).as("m_vals"),
        concat_ws(",",
          sort_array(map_values(expr("transform_values(m, (k, v) -> upper(v))"))))
          .as("m_vals_upper"),
        concat_ws(",",
          sort_array(map_keys(expr("map_filter(m, (k, v) -> k = 'type')"))))
          .as("m_type_only_keys"),
        expr("map_contains_key(m, 'type')").as("has_type"),
        size(col("m")).cast("long").as("n_entries"))
      .orderBy("event_id")

  // ----------------------------------------------------------- subqueries

  /** Correlated LATERAL join — the per-row-subquery SQL surface
    * (each customer's top-2 orders by price via an ORDER BY/LIMIT
    * subquery referencing the outer row). Catalyst DECORRELATES the
    * lateral into a join + per-key limit (no per-outer-row re-scan of
    * orders — plan-asserted in ShuffleBudgetSpec), which is why the
    * construct is usable at 100 TB at all; the window-function
    * formulation of the same answer is q_topk_per_group. */
  def lateralTopn(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT c_custkey, c_mktsegment, l.o_orderkey, l.o_totalprice
      FROM customer JOIN LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
  }

  /** IN subquery (decorrelated to a semi join by Catalyst). */
  def subqueryIn(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
        AND o_totalprice > 200000.0
      ORDER BY o_orderkey""")
  }

  /** Correlated EXISTS (decorrelated to a semi join by Catalyst). */
  def correlatedExists(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT o_orderkey, o_orderstatus
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      ORDER BY o_orderkey""")
  }

  /** Scalar subquery in a predicate. */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.5
      ORDER BY c_custkey""")
  }

  /** Z-order (Morton) clustering layout — the multi-dimensional
    * data-skipping op (Delta/Iceberg `OPTIMIZE ZORDER BY`). Both
    * layout dimensions are scaled onto a 16-bit grid with pure
    * integer arithmetic (bounds from one tiny agg broadcast back),
    * bit-interleaved into a 32-bit z-value by the classic shift-mask
    * spreading (5 codegen'd bitwise steps, no loops, identical in
    * DuckDB), and binned into files by z-prefix (top 6 bits → ≤64
    * files). Output is the per-file skipping index (row count +
    * min/max of BOTH dims): z-order's point is that every file gets a
    * tight bounding box in every interleaved dimension, so a 2-D
    * range predicate prunes files on either column, where a
    * single-column sort is tight in that column only (quantified in
    * ZorderSpec). At 100 TB the layout job is a range-partitioned
    * sort by z — layout jobs are sorts by definition — and the index
    * is O(files), not O(rows). */
  /** The normalized 16-bit (x, y) grid over (o_custkey, order day)
    * shared by the layout planners (zorderLayout / skippingAudit). */
  private def ckDayGrid(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      col("o_custkey"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
    val bounds = o.agg(
      min("o_custkey").as("cmin"), max("o_custkey").as("cmax"),
      min("day").as("dmin"), max("day").as("dmax"))
    o.crossJoin(broadcast(bounds)).select(
      expr("(o_custkey - cmin) * 65536 div (cmax - cmin + 1)").as("x"),
      expr("(day - dmin) * 65536 div (dmax - dmin + 1)").as("y"))
  }

  /** The classic shift-mask Morton interleave (5 codegen'd bitwise
    * steps, identical in DuckDB). */
  private def mortonSpread(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  def zorderLayout(s: SparkSession, dir: String): DataFrame =
    ckDayGrid(s, dir)
      .select(col("x"), col("y"),
        shiftright(mortonSpread(col("x"))
          .bitwiseOR(shiftleft(mortonSpread(col("y")), 1)), 26)
          .as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .orderBy("file_id")

  /** Data-skipping effectiveness audit — the planning number that
    * justifies (or rejects) a layout job BEFORE it spends the
    * cluster: for each of three representative range predicates,
    * how many files (and rows) would each candidate layout's
    * min/max skipping index actually scan? Compares the z-order
    * layout against the single-column sort (x-prefix files) on the
    * same 64-file budget: the x-sort is unbeatable on pure-x slabs,
    * blind on pure-y slabs (every file spans all y), while z-order
    * stays tight on BOTH dims — the quantified version of
    * zorderLayout's scaladoc claim, as a query.
    *
    * A file is scanned iff its bounding box intersects the
    * predicate box — exactly the pruning rule lakehouse skipping
    * indexes apply. All-integer grid arithmetic.
    *
    * Scale shape: each layout branch is the zorderLayout shape (scan
    * → one ≤64-key combine); the predicate cross join and the final
    * agg touch ≤ layouts × 64 × |preds| rows — bounded. The audit
    * cost is two index builds, never a data rewrite. */
  def skippingAudit(s: SparkSession, dir: String): DataFrame = {
    val grid = ckDayGrid(s, dir)
    def index(fileId: Column, layout: String): DataFrame =
      grid.select(col("x"), col("y"), fileId.as("file_id"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .withColumn("layout", lit(layout))
    val zIdx = index(shiftright(mortonSpread(col("x"))
      .bitwiseOR(shiftleft(mortonSpread(col("y")), 1)), 26), "zorder")
    val xIdx = index(expr("x div 1024"), "xsort")
    val preds = s.range(1).select(explode(array(
      struct(lit("x_slab").as("predicate"), lit(0L).as("xlo"),
        lit(4095L).as("xhi"), lit(0L).as("ylo"), lit(65535L).as("yhi")),
      struct(lit("y_slab").as("predicate"), lit(0L).as("xlo"),
        lit(65535L).as("xhi"), lit(0L).as("ylo"), lit(4095L).as("yhi")),
      struct(lit("xy_box").as("predicate"), lit(16384L).as("xlo"),
        lit(20479L).as("xhi"), lit(16384L).as("ylo"),
        lit(20479L).as("yhi")))).as("p"))
      .select(col("p.*"))
    zIdx.union(xIdx).crossJoin(broadcast(preds))
      .withColumn("scanned",
        col("x_min") <= col("xhi") && col("x_max") >= col("xlo") &&
        col("y_min") <= col("yhi") && col("y_max") >= col("ylo"))
      .groupBy(col("predicate"), col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("scanned"), 1L).otherwise(0L)).as("files_scanned"),
        sum(when(col("scanned"), col("n_rows")).otherwise(0L))
          .as("rows_scanned"),
        sum(col("n_rows")).as("n_rows_total"))
      .select(col("predicate"), col("layout"), col("n_files"),
        col("files_scanned"), col("rows_scanned"),
        expr("""cast(1000000 * cast(rows_scanned as decimal(38,0))
          div n_rows_total as bigint)""").as("scan_ppm"))
      .orderBy("predicate", "layout")
  }

  /** Order-independent table content fingerprints — the migration /
    * replication audit primitive: prove two copies of a table hold the
    * same rows WITHOUT sorting either one. Each row is rendered to a
    * canonical string (integers and strings verbatim; timestamps as
    * epoch-µs; money doubles floored to integer cents — no raw double
    * ever hits the string, since float formatting is the one thing
    * engines disagree on), hashed with the portable 60-bit sha, and
    * folded two independent ways: XOR (order-free, overflow-free) and
    * an exact DECIMAL(38,0) sum reduced mod 2^62 — two accumulators so
    * a single-bit accident can't collide both. One row out per table.
    *
    * Scale shape: per table ONE full scan collapsing into a combine
    * aggregate — no shuffle of data rows at all (partial XOR/sum per
    * partition, 1-row merge). At 100 TB this is exactly how you verify
    * a petabyte copy: embarrassingly parallel, network traffic = one
    * row per partition, versus the hopeless alternative of a global
    * ORDER BY on both sides. concat_ws skips NULLs identically in
    * both engines, so the rendering contract holds on nullable
    * columns too. */
  def tableFingerprint(s: SparkSession, dir: String): DataFrame = {
    val ph = "cast(conv(substring(sha2(cast(%s as string), 256), 1, 15), 16, 10) as bigint)"
    def cents(c: String): Column = floor(col(c) * 100).cast("long")
    def one(name: String, cols: Seq[Column]): DataFrame =
      // NO spread here (r15 regression, VERDICT r16 item 1): the
      // repartition shuffled fully-rendered row strings (documents'
      // branch = the whole corpus text) in front of a 1-row-per-branch
      // combine, and measured SLOWER in both builder and driver runs
      // (1.56→2.58 / 1.44→2.00 s). The six branches already run as
      // parallel stages, so the single-split scans overlap; the
      // combine itself moves one row per partition.
      t(s, dir, name)
        .select(concat_ws("|", cols: _*).as("row_str"))
        .select(expr(ph.format("row_str")).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_hash"),
          (sum(col("h").cast("decimal(38,0)")) %
            lit("4611686018427387904").cast("decimal(38,0)"))
            .cast("long").as("sum_hash_mod"))
        .select(lit(name).as("table_name"), col("n_rows"),
          col("xor_hash"), col("sum_hash_mod"))
    one("lineitem", Seq(col("l_orderkey"), col("l_linenumber"),
        cents("l_quantity"), cents("l_extendedprice"), cents("l_discount"),
        col("l_returnflag"), col("l_linestatus"), epochUs(col("l_shipdate"))))
      .unionByName(one("orders", Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), cents("o_totalprice"),
        epochUs(col("o_orderdate")), col("o_orderpriority"))))
      .unionByName(one("customer", Seq(col("c_custkey"), col("c_name"),
        col("c_nationkey"), cents("c_acctbal"), col("c_mktsegment"))))
      .unionByName(one("documents", Seq(col("doc_id"), col("lang"),
        col("source"), col("text"))))
      .unionByName(
        Tables.events(s, dir)
            .select(concat_ws("|", col("event_id"), col("user_id"),
              col("event_type"), col("ts_us"),
              floor(col("value") * 1000000).cast("long")).as("row_str"))
          .select(expr(ph.format("row_str")).as("h"))
          .agg(count(lit(1)).as("n_rows"),
            expr("bit_xor(h)").as("xor_hash"),
            (sum(col("h").cast("decimal(38,0)")) %
              lit("4611686018427387904").cast("decimal(38,0)"))
              .cast("long").as("sum_hash_mod"))
          .select(lit("events").as("table_name"), col("n_rows"),
            col("xor_hash"), col("sum_hash_mod")))
      .orderBy("table_name")
  }

  /** 2-D skyline (Pareto front, minimize both): parts no other part
    * beats on BOTH price and size (strict on at least one) — the
    * classic multi-criteria OLAP operator (Börzsönyi et al., ICDE
    * 2001). The naive form is an all-pairs NOT EXISTS self-join; the
    * sort-based reformulation is exact and distributed: a part is
    * skyline iff its size equals its price group's min AND beats the
    * running min size over all strictly-cheaper prices. That running
    * min is the two-phase prefix pattern (10-dollar-bucket offsets +
    * within-bucket exclusive window over the price-grouped frame —
    * never a global single-partition window, never pairs). Prices
    * ride as exact cents (round(x*100) of identical stored doubles —
    * both engines compute the same bigint; monotone, so dominance on
    * cents ≡ dominance on the double). The price-grouped prefix
    * frame is |distinct prices|-sized — broadcast here, an ordinary
    * shuffle join at 100 TB cardinalities. */
  def skyline2d(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "part")
      .select(col("p_partkey"),
        expr("cast(round(p_retailprice * 100) as bigint)").as("price_c"),
        col("p_size").cast("long").as("p_size"))
    val pp = base.groupBy(col("price_c")).agg(min(col("p_size")).as("min_sz"))
      .withColumn("bkt", expr("price_c div 1000"))
    val offW = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = pp.groupBy(col("bkt")).agg(min(col("min_sz")).as("bmin"))
      .select(col("bkt"), min(col("bmin")).over(offW).as("pre_bkt"))
    val inW = Window.partitionBy(col("bkt")).orderBy(col("price_c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pf = pp.join(broadcast(offs), "bkt")
      .withColumn("pre", least(
        coalesce(min(col("min_sz")).over(inW), lit(Long.MaxValue)),
        coalesce(col("pre_bkt"), lit(Long.MaxValue))))
      .select(col("price_c"), col("min_sz"), col("pre"))
    base.join(broadcast(pf), "price_c")
      .where(col("p_size") < col("pre") && col("p_size") === col("min_sz"))
      .select(col("p_partkey"), col("price_c"), col("p_size"))
      .orderBy("price_c", "p_size", "p_partkey")
  }

  /** Sketch ROLLUP — the mergeability contract of q_approx_distinct
    * made first-class: vocabulary (distinct-token) HLL registers are
    * built ONCE per (lang, source) over `documents`, then rolled up
    * to per-lang and corpus totals by register max alone — no rescan,
    * no re-hash. That re-aggregation is the whole reason production
    * systems store sketches instead of counts: a 100 TB corpus is
    * hashed once, and every grouping level above derives from the
    * (groups × 512)-row register frame. Same portable p=9 register
    * construction and fixed-IEEE estimate as q_approx_distinct, so
    * the rolled-up estimates hash-match DuckDB computing the same
    * sketch. Exact distincts per level ride along to exhibit the
    * error (the cost the sketch avoids — dropped at scale). */
  def distinctRollup(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    val reliable = s.sparkContext.getCheckpointDir.isDefined
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    // Collapse to the DISTINCT (lang, source, token) frame FIRST and
    // pin it (the hllSetAlgebra discipline): HLL registers are
    // max-folds, so registers over the distinct frame are identical
    // to registers over the token multiset — the sha then runs once
    // per distinct token instead of once per occurrence (guide §2.3:
    // aggregate before you shuffle / don't compute what you throw
    // away), and the exact-count CTEs below (x0/x1/x2) count this
    // pinned vocabulary-bounded frame instead of re-deriving the
    // corpus explode once per reference (temp views hold plans, and
    // multi-referenced subplans re-execute — no CSE).
    pin(Tables.spread(s, s.table("documents")
        .select(col("lang"), col("source"), col("text")))
      .select(col("lang"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .distinct())
      .createOrReplaceTempView("doc_tokens_distinct")
    val ph = "cast(conv(substring(sha2(token, 256), 1, 15), 16, 10) as bigint)"
    val est = """cast(floor(
        cast(0.7213 as double)
          / (cast(1.0 as double) + cast(1.079 as double) / cast(512.0 as double))
          * cast(262144 as double) * cast(4503599627370496 as double)
          / cast(sum(shiftleft(cast(1 as bigint), 52 - m))
                 + (512 - count(*)) * shiftleft(cast(1 as bigint), 52) as double)
      ) as bigint)"""
    s.sql(s"""
      WITH reg AS (
        SELECT lang, source, h % 512 AS bucket,
               max(CASE WHEN h div 512 = 0 THEN 52
                        ELSE 52 - length(bin(h div 512)) END) AS m
        FROM (SELECT lang, source, $ph AS h FROM doc_tokens_distinct)
        GROUP BY lang, source, h % 512),
      reg_lang AS (SELECT lang, bucket, max(m) AS m FROM reg GROUP BY lang, bucket),
      reg_all AS (SELECT bucket, max(m) AS m FROM reg_lang GROUP BY bucket),
      e0 AS (SELECT lang, source, cast(512 - count(*) AS bigint) AS n_empty,
                    $est AS hll
             FROM reg GROUP BY lang, source),
      e1 AS (SELECT lang, cast(512 - count(*) AS bigint) AS n_empty, $est AS hll
             FROM reg_lang GROUP BY lang),
      e2 AS (SELECT cast(512 - count(*) AS bigint) AS n_empty, $est AS hll
             FROM reg_all),
      x0 AS (SELECT lang, source, count(*) AS n_exact
             FROM doc_tokens_distinct GROUP BY lang, source),
      x1 AS (SELECT lang, count(DISTINCT token) AS n_exact
             FROM doc_tokens_distinct GROUP BY lang),
      x2 AS (SELECT count(DISTINCT token) AS n_exact FROM doc_tokens_distinct)
      SELECT cast(0 AS bigint) AS level, x0.lang, x0.source,
             x0.n_exact, e0.hll, e0.n_empty
      FROM x0 JOIN e0 ON x0.lang = e0.lang AND x0.source = e0.source
      UNION ALL
      SELECT cast(1 AS bigint), x1.lang, '*', x1.n_exact, e1.hll, e1.n_empty
      FROM x1 JOIN e1 ON x1.lang = e1.lang
      UNION ALL
      SELECT cast(2 AS bigint), '*', '*', x2.n_exact, e2.hll, e2.n_empty
      FROM x2, e2
      ORDER BY level, lang, source""")
  }

  /** Blocked fuzzy record linkage — the entity-resolution primitive
    * (Fellegi–Sunter blocking + edit distance) a catalog/dedup
    * pipeline runs to find "the same part spelled two ways": part
    * names collapse to their DISTINCT values with counts FIRST (the
    * value space is bounded by the name vocabulary, not the row
    * count), then a self-join blocked on the name's last token
    * compares only within-block name pairs with levenshtein ≤ 2.
    * The match count back-multiplies the exact-name counts, so
    * row-level pair volume is reported without ever materializing
    * row pairs. levenshtein is unit-cost edit distance in BOTH
    * engines — integer-exact.
    *
    * Scale shape: one combine agg collapses rows → distinct names
    * (vocabulary-bounded); the quadratic lives ONLY inside
    * (block × distinct-names²) — never row²; at 100 TB the distinct
    * frame still fits a broadcast, and a hot block grows the compare
    * set by its distinct-value count, not its row count. */
  def fuzzyBlockedJoin(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part")
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("block", expr("element_at(split(name, ' '), -1)"))
    val a = names.select(col("block"), col("name").as("name_a"),
      col("cnt").as("n_a"))
    val b = names.select(col("block"), col("name").as("name_b"),
      col("cnt").as("n_b"))
    a.join(b, Seq("block"))
      .where(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 2)
      .select(col("block"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("edit_dist"),
        col("n_a"), col("n_b"),
        expr("n_a * n_b").as("n_row_pairs"))
      .orderBy("block", "name_a", "name_b")
  }

  /** Join-cardinality audit — the planner's |A ⋈ A| estimate done
    * exactly from a per-key histogram, BEFORE paying for the join: per
    * bitlength bin of the per-partkey lineitem count, the keys, rows,
    * and the self-join rows Σ_k c_k² that bin would materialize, plus
    * the hottest key. This is the number a CBO needs to pick build
    * sides and the number a skew audit reads to find the key that
    * will melt a shuffle partition — computed from the
    * key-cardinality-sized count frame, never by running the row²
    * join. Integers end to end; log2 bins keep the output ≤ 64 rows
    * at any scale.
    *
    * Scale shape: ONE combine agg (key counts) + a bin agg over the
    * key-cardinality frame. The join being audited never executes. */
  def joinSizeAudit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .groupBy(expr("cast(length(bin(c)) as bigint)").as("size_bin"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c")).cast("long").as("n_rows"),
        sum(expr("cast(c as decimal(38,0)) * c")).cast("long")
          .as("selfjoin_rows"),
        max(col("c")).as("max_key_rows"))
      .orderBy("size_bin")

  /** Incremental aggregate maintenance — the daily-rollup pattern a
    * 100 TB warehouse lives on: the per-customer order rollup split
    * into a BASE frame (orders before the pivot date — at scale a
    * materialized table that never recomputes) and a DELTA frame (the
    * live tail), merged by a full-outer coalesce-sum. The merged
    * result is definitionally equal to the from-scratch rollup —
    * which is exactly what the oracle checks, so the decomposition
    * can't drift from the direct aggregate. Money in integer cents
    * (floor(price·100), identical both engines), DECIMAL sums.
    *
    * Scale shape: two combine aggs (base + delta, each one hash
    * exchange); both emit partitioned by the merge key, so the
    * full-outer join adds NO exchange. At scale only the delta agg
    * runs per refresh — the base is a stored table, and the merge
    * cost is |touched keys|, not |history|. */
  def deltaAgg(s: SparkSession, dir: String): DataFrame = {
    val pivot = lit("1998-01-01").cast("timestamp")
    val orders = t(s, dir, "orders").select(col("o_custkey"),
      col("o_orderdate"),
      expr("cast(floor(o_totalprice * cast(100 as double)) as bigint)")
        .as("cents"))
    def roll(df: DataFrame, suffix: String): DataFrame =
      df.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as(s"n_$suffix"),
          sum(col("cents").cast("decimal(38,0)")).cast("long")
            .as(s"cents_$suffix"))
    val base = roll(orders.where(col("o_orderdate") < pivot), "base")
    val delta = roll(orders.where(col("o_orderdate") >= pivot), "delta")
    base.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        (coalesce(col("n_base"), lit(0L)) +
          coalesce(col("n_delta"), lit(0L))).as("n_total"),
        (coalesce(col("cents_base"), lit(0L)) +
          coalesce(col("cents_delta"), lit(0L))).as("total_cents"))
      .orderBy("o_custkey")
  }

  /** Declarative data-quality rule battery (the Deequ/dbt-test
    * shape): domain, range, uniqueness, and referential-integrity
    * rules over lineitem/orders/customer, one result row per rule
    * with checked/violation counts. Rules over the SAME table fuse
    * into ONE conditional aggregate (a single scan emits all its
    * rules' counters as columns, then explodes to rows — the Deequ
    * trick), so adding a rule to a table costs zero extra scans.
    * The uniqueness rule counts excess rows over distinct
    * (l_orderkey, l_linenumber) pairs; the referential rule is a
    * left-anti count of lineitem keys with no order.
    *
    * Scale shape: one scan + 1-row conditional agg per table; one
    * combine agg for uniqueness; one anti join (shuffle on the key,
    * AQE may broadcast at small SF). The 1-row frames cross-join
    * only each other — bounded by the rule count. */
  def dqRules(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val cnt = count(lit(1)).cast("long")
    def viol(bad: Column): Column =
      sum(when(bad, 1L).otherwise(0L)).cast("long")
    def explodeRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
      df.agg(cnt.as("n_checked"),
          rules.map { case (n, bad) => viol(bad).as(s"v_$n") }: _*)
        .select(explode(array(rules.map { case (n, _) =>
          struct(lit(n).as("rule"), col("n_checked"),
            col(s"v_$n").as("n_violations")) }: _*)).as("r"))
        .select(col("r.rule"), col("r.n_checked"), col("r.n_violations"))
    val liRules = explodeRules(li, Seq(
      "li_quantity_range" ->
        (col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
      "li_discount_range" ->
        (col("l_discount") < 0.0 || col("l_discount") > 0.08)))
    val ordRules = explodeRules(t(s, dir, "orders"), Seq(
      "ord_status_domain" -> !col("o_orderstatus").isin("O", "F", "P"),
      "ord_priority_domain" -> !col("o_orderpriority").isin(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
    val custRules = explodeRules(t(s, dir, "customer"), Seq(
      "cu_acctbal_nonneg" -> (col("c_acctbal") < 0.0)))
    val uniq = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).cast("long").as("n_checked"),
        sum(col("c") - 1).cast("long").as("n_violations"))
      .select(lit("li_linenumber_unique").as("rule"),
        col("n_checked"), col("n_violations"))
    val orphan = li.select(col("l_orderkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
      .crossJoin(broadcast(li.agg(cnt.as("n_checked"))))
      .select(lit("li_orphan_orderkey").as("rule"),
        col("n_checked"), col("n_violations"))
    liRules.unionByName(ordRules).unionByName(custRules)
      .unionByName(uniq).unionByName(orphan)
      .select(col("rule"), col("n_checked"), col("n_violations"),
        when(col("n_violations") === 0L, 1L).otherwise(0L).as("pass"))
      .orderBy("rule")
  }

  /** RFM (recency / frequency / monetary) customer segmentation —
    * the marketing-warehouse workhorse: per customer, days since
    * last order (pure integer day arithmetic — epoch_us div 86400e6,
    * no calendar functions to disagree on), order count, and
    * lifetime cents, each scored 1–4 by FIXED business cuts and
    * packed into a 3-digit segment code. Fixed cuts (not in-data
    * quantiles) are deliberate: segment membership stays stable as
    * the corpus grows, and the scoring is a pure projection — the
    * quantile-cut variant would need a global rank (see
    * q_sort_boundaries for how that's planned at scale).
    *
    * Scale shape: ONE per-customer combine agg; the corpus max day
    * is a 1-row reduce cross-joined back (broadcast literal); the
    * scoring is scan-side arithmetic. */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").select(col("o_custkey"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("day"),
      expr("cast(floor(o_totalprice * cast(100 as double)) as bigint)")
        .as("cents"))
    val maxDay = orders.agg(max(col("day")).as("corpus_max_day"))
    def score(c: Column, c4: Long, c3: Long, c2: Long): Column =
      when(c >= c4, 4L).when(c >= c3, 3L).when(c >= c2, 2L).otherwise(1L)
    orders.groupBy(col("o_custkey"))
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col("cents").cast("decimal(38,0)")).cast("long")
          .as("monetary_cents"))
      .crossJoin(broadcast(maxDay))
      .select(col("o_custkey"),
        (col("corpus_max_day") - col("last_day")).as("recency_days"),
        col("frequency"), col("monetary_cents"),
        score(-(col("corpus_max_day") - col("last_day")),
          -180L, -365L, -730L).as("r_score"),
        score(col("frequency"), 12L, 6L, 3L).as("f_score"),
        score(col("monetary_cents"), 200000000L, 100000000L, 50000000L)
          .as("m_score"))
      .withColumn("segment",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
      .orderBy("o_custkey")
  }

  /** Order→ship fulfillment lag per order priority — the SLA
    * question asked of the fact-fact join directly: days between
    * o_orderdate and each lineitem's l_shipdate, summarized per
    * priority with exact discrete order statistics (the
    * q_interarrival rank discipline) plus truncating mean and max.
    * Integer day arithmetic (epoch_us div 86400e6) — no calendar
    * functions to disagree on.
    *
    * Scale shape: one hash shuffle join on the order key (both sides
    * scaling — never broadcast); the percentiles are two-phase
    * SELECTION order statistics ([[graft.ops.TwoPhaseRank
    * .orderStatistics]], r9): only the bounded (priority, bucket)
    * counts grid moves and only the p50/p90-holding buckets sort —
    * the join output is never window-partitioned on the 5-value
    * priority key (oracle unchanged). min/max/mean ride a
    * map-side-combined 5-row agg. */
  def shipLag(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"),
      expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
        .as("ship_day"))
    val ord = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_orderpriority"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("order_day"))
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), col("l_orderkey"),
        (col("ship_day") - col("order_day")).as("lag_days"))
    val pct = graft.ops.TwoPhaseRank.orderStatistics(joined,
      Seq("o_orderpriority"), "lag_days", Seq(col("l_orderkey")),
      Seq("p50_lag_days" -> "1 + (n - 1) * 50 div 100",
        "p90_lag_days" -> "1 + (n - 1) * 90 div 100"))
      .select(col("o_orderpriority"), col("p50_lag_days"),
        col("p90_lag_days"))
    joined.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lineitems"),
        min(col("lag_days")).as("min_lag_days"),
        max(col("lag_days")).as("max_lag_days"),
        expr("cast(sum(cast(lag_days as decimal(38,0))) div count(1) as bigint)")
          .as("mean_lag_days"))
      .join(broadcast(pct), "o_orderpriority")
      .select(col("o_orderpriority"), col("n_lineitems"),
        col("min_lag_days"), col("max_lag_days"), col("mean_lag_days"),
        col("p50_lag_days"), col("p90_lag_days"))
      .orderBy("o_orderpriority")
  }

  /** Snapshot diff — the table-migration / replication-audit primitive:
    * classify every key across two table snapshots as added / removed /
    * changed / unchanged and roll the counts + money mass up per
    * priority. The two snapshots are deterministic hash-slices of the
    * same orders table (A drops h%20=0, B drops h%20=1 and perturbs
    * the price one cent where h%7=0 — so every class is non-empty and
    * the oracle genuinely tests the classification, not 0 == 0). The
    * diff itself is ONE full-outer shuffle join on the primary key —
    * the minimum data movement for a key-level diff; both snapshot
    * scans carry only (key, priority, cents). At 100 TB this is how a
    * copy is audited when q_table_fingerprint says "something differs":
    * fingerprint first (zero-shuffle), key-level diff second (one
    * shuffle), and the output is grid-sized either way.
    *
    * Scale shape: one full-outer hash join on the key + one combine to
    * the priority × class grid. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val ph =
      "cast(conv(substring(sha2(cast(%s as string), 256), 1, 15), 16, 10) as bigint)"
    val base = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_orderpriority"),
      expr("cast(floor(o_totalprice * cast(100 as double)) as bigint)")
        .as("cents"),
      expr(ph.format("o_orderkey")).as("h"))
    val snapA = base.where(expr("h % 20 != 0"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("cents").as("cents_a"))
    val snapB = base.where(expr("h % 20 != 1"))
      .select(col("o_orderkey"), col("o_orderpriority").as("prio_b"),
        when(expr("h % 7 = 0"), col("cents") + 1L).otherwise(col("cents"))
          .as("cents_b"))
    snapA.join(snapB, Seq("o_orderkey"), "full_outer")
      .select(
        coalesce(col("o_orderpriority"), col("prio_b"))
          .as("o_orderpriority"),
        when(col("cents_a").isNull, lit("added"))
          .when(col("cents_b").isNull, lit("removed"))
          .when(col("cents_a") =!= col("cents_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("change_class"),
        coalesce(col("cents_a"), lit(0L)).as("ca"),
        coalesce(col("cents_b"), lit(0L)).as("cb"))
      .groupBy(col("o_orderpriority"), col("change_class"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col("ca").cast("decimal(38,0)")).cast("long").as("cents_a"),
        sum(col("cb").cast("decimal(38,0)")).cast("long").as("cents_b"))
      .withColumn("delta_cents", col("cents_b") - col("cents_a"))
      .orderBy("o_orderpriority", "change_class")
  }

  /** Open-order backlog aging — the fulfillment-ops dashboard: orders
    * still open (status 'O') bucketed by age in 30-day bands against
    * the corpus max order date (a 1-row broadcast anchor, so the
    * query is replayable against a frozen snapshot), per priority:
    * counts, money mass in exact cents, and the age range inside the
    * band. The aging grid is how a backlog burn-down is prioritized —
    * old urgent orders first; q_ship_lag measures fulfilled flow,
    * this measures what's stuck.
    *
    * Scale shape: status filter + day arithmetic pushed to the scan;
    * ONE combine agg to the bounded priority × band grid. */
  def orderBacklog(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("order_day"),
        expr("cast(floor(o_totalprice * cast(100 as double)) as bigint)")
          .as("cents"))
    val anchor = ord.agg(max(col("order_day")).cast("long").as("max_day"))
    ord.where(col("o_orderstatus") === "O")
      .crossJoin(broadcast(anchor))
      .select(col("o_orderpriority"),
        expr("(max_day - order_day) div 30").as("age_band"),
        (col("max_day") - col("order_day")).as("age_days"),
        col("cents"))
      .groupBy(col("o_orderpriority"), col("age_band"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        min(col("age_days")).as("min_age_days"),
        max(col("age_days")).as("max_age_days"),
        sum(col("cents").cast("decimal(38,0)")).cast("long")
          .as("backlog_cents"))
      .orderBy("o_orderpriority", "age_band")
  }

  /** Candidate (child column, parent column) pairs probed by
    * [[fkDiscovery]] — the real TPC-H FK skeleton plus one deliberate
    * decoy (l_linenumber ⊆ n_nationkey by value range, not by
    * meaning) that demonstrates the classic containment false
    * positive: discovery needs the cardinality ratio TOO, which the
    * operator therefore emits. Query AND oracle are generated from
    * this one list (the per-geometry-oracle discipline). */
  private[graft] val FkPairs: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("lineitem", "l_linenumber", "nation", "n_nationkey"))

  /** Foreign-key discovery by inclusion-dependency profiling (the
    * Bellman/profiling-literature containment test): for each
    * candidate (child, parent) column pair, the distinct child values
    * contained in the parent's distinct values, as a truncating ppm,
    * plus both distinct cardinalities and their ratio. Containment =
    * 1e6 flags an FK candidate — and the deliberate decoy pair shows
    * why production discovery ALSO reads the cardinality ratio (7
    * line numbers ⊆ 25 nation keys is a value-range accident, visible
    * as a tiny child/parent ratio ×  huge row-to-distinct collapse).
    *
    * Scale shape: per pair, two 2-phase distinct combines (each
    * moving only that column's distinct values — the q_profile_stats
    * discipline) + one join keyed on the value; per-pair frames are
    * key-cardinality-bounded, pairs are a fixed candidate list. */
  def fkDiscovery(s: SparkSession, dir: String): DataFrame = {
    // KEPT per-pair (r16 re-examination of VERDICT r15 item 4): two
    // shared-scan rewrites were measured and BOTH lost to this form —
    // (a) per-table posexplode distinct slices shared via ReuseExchange
    // (2.07 → 2.77 s: the multi-column explode quadruples the map work
    // feeding each reused exchange), (b) ONE pinned unioned distinct
    // over all tables (2.07 → 4.40 s: the pinned frame loses the
    // per-pair distincts' hash-partitioning on k, so every full-outer
    // join re-exchanges BOTH sides — the per-pair distinct exchange
    // doubles as the join distribution, which is what makes this shape
    // fast). The 16 static scans dedup at runtime where it matters and
    // each moves only one column's distinct values.
    val perPair = FkPairs.map { case (ct, cc, pt, pc) =>
      // one FULL OUTER join per pair: child-distinct, parent-distinct
      // and matched counts all fall out of a single aggregate over it,
      // where the old left-join + separate parent-count branch scanned
      // and distinct-aggregated the parent column twice (no CSE) and
      // paid a broadcast crossJoin per pair (guide §2.4)
      val child = t(s, dir, ct).select(col(cc).cast("long").as("k"))
        .where(col("k").isNotNull).distinct()
        .withColumn("in_child", lit(1L))
      val parent = t(s, dir, pt).select(col(pc).cast("long").as("k"))
        .where(col("k").isNotNull).distinct()
        .withColumn("in_parent", lit(1L))
      child.join(parent, Seq("k"), "full_outer")
        .agg(
          sum(coalesce(col("in_child"), lit(0L))).cast("long")
            .as("n_child_distinct"),
          sum(coalesce(col("in_parent"), lit(0L))).cast("long")
            .as("n_parent_distinct"),
          sum(when(col("in_child").isNotNull && col("in_parent").isNotNull,
            1L).otherwise(0L)).cast("long").as("n_matched"))
        .select(lit(s"$ct.$cc").as("child_col"),
          lit(s"$pt.$pc").as("parent_col"),
          col("n_child_distinct"), col("n_parent_distinct"),
          col("n_matched"))
    }
    perPair.reduce(_.unionAll(_))
      .select(col("child_col"), col("parent_col"),
        col("n_child_distinct"), col("n_parent_distinct"), col("n_matched"),
        expr("""cast(cast(n_matched as decimal(38,0)) * 1000000
          div n_child_distinct as bigint)""").as("containment_ppm"),
        expr("""cast(cast(n_child_distinct as decimal(38,0)) * 1000000
          div n_parent_distinct as bigint)""").as("card_ratio_ppm"))
      .orderBy("child_col", "parent_col")
  }

  /** Shared dialect-parameterized SQL of [[hllSetAlgebra]] — ONE
    * template generates the Spark query and the DuckDB oracle, so the
    * sketch arithmetic provably cannot drift between them. */
  private[graft] def hllAlgebraSql(duck: Boolean): String = {
    val d = if (duck) "//" else "div"
    def shl(e: String) =
      if (duck) s"(CAST(1 AS BIGINT) << ($e))"
      else s"shiftleft(CAST(1 AS BIGINT), $e)"
    // the hashed DISTINCT (flag, key) frame — registers and exact
    // sides both derive from it; the Spark path pre-pins it as a
    // temp view (5 CTE references, no CSE — a pinned frame saves 4
    // sha+distinct re-derivations), DuckDB inlines the subquery
    val f0 = if (duck)
      """(SELECT l_returnflag AS flag, l_partkey AS k,
             CAST('0x' || substring(sha256(CAST(l_partkey AS VARCHAR)),
                  1, 15) AS BIGINT) AS h
         FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem))"""
    else "hll_algebra_hashed"
    val est = s"""CAST(floor(
      CAST(0.7213 AS DOUBLE)
        / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        * CAST(262144 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
        / CAST(sum(${shl("52 - m")})
               + (512 - count(*)) * ${shl("52")} AS DOUBLE)) AS BIGINT)"""
    s"""WITH reg AS (
      SELECT flag, h % 512 AS bucket,
             max(CASE WHEN h $d 512 = 0 THEN 52
                      ELSE 52 - length(bin(h $d 512)) END) AS m
      FROM $f0 f0reg
      GROUP BY flag, h % 512),
    pairs AS (
      SELECT 'A' AS fa, 'N' AS fb UNION ALL
      SELECT 'A', 'R' UNION ALL
      SELECT 'N', 'R'),
    ureg AS (
      SELECT p.fa, p.fb, r.bucket, max(r.m) AS m
      FROM pairs p JOIN reg r ON r.flag = p.fa OR r.flag = p.fb
      GROUP BY p.fa, p.fb, r.bucket),
    est1 AS (SELECT flag, $est AS hll,
                    CAST(512 - count(*) AS BIGINT) AS n_empty
             FROM reg GROUP BY flag),
    estu AS (SELECT fa, fb, $est AS hll_union,
                    CAST(512 - count(*) AS BIGINT) AS n_empty_union
             FROM ureg GROUP BY fa, fb),
    f AS (SELECT flag, k FROM $f0 f0f),
    ex1 AS (SELECT flag, CAST(count(*) AS BIGINT) AS exact FROM f
            GROUP BY flag),
    exu AS (
      SELECT p.fa, p.fb, CAST(count(DISTINCT f.k) AS BIGINT) AS exact_union
      FROM pairs p JOIN f ON f.flag = p.fa OR f.flag = p.fb
      GROUP BY p.fa, p.fb)
    SELECT u.fa, u.fb,
           ea.exact AS exact_a, eb.exact AS exact_b, u.exact_union,
           ea.exact + eb.exact - u.exact_union AS exact_inter,
           ha.hll AS hll_a, hb.hll AS hll_b, hu.hll_union,
           ha.hll + hb.hll - hu.hll_union AS hll_inter,
           ha.n_empty AS empty_a, hb.n_empty AS empty_b,
           hu.n_empty_union AS empty_union,
           CAST(CAST(ea.exact + eb.exact - u.exact_union AS DECIMAL(38, 0))
                * 1000000 $d u.exact_union AS BIGINT) AS exact_jacc_ppm,
           CAST(CAST(ha.hll + hb.hll - hu.hll_union AS DECIMAL(38, 0))
                * 1000000 $d hu.hll_union AS BIGINT) AS hll_jacc_ppm
    FROM exu u
    JOIN ex1 ea ON ea.flag = u.fa
    JOIN ex1 eb ON eb.flag = u.fb
    JOIN est1 ha ON ha.flag = u.fa
    JOIN est1 hb ON hb.flag = u.fb
    JOIN estu hu ON hu.fa = u.fa AND hu.fb = u.fb
    ORDER BY u.fa, u.fb"""
  }

  /** HLL set algebra — sketch union and intersection across groups
    * (Flajolet et al.; the mergeable-sketch property as a QUERY, not
    * just a spec): the portable p=9 HLL registers of each return
    * flag's part-key set are merged pairwise by register max — the
    * exact operation a 1000-executor deployment uses to combine
    * per-partition / per-day sketches without touching rows — giving
    * |A∪B| estimates; intersections fall out by inclusion–exclusion
    * (signed — the standard caveat that sketch intersections of
    * dissimilar sets can go negative stays visible), alongside exact
    * answers so the error is measurable. Raw estimates ship WITHOUT
    * the small-range linear-counting correction (it needs ln(), not
    * bit-portable — q_approx_distinct's documented choice); the
    * empty-register counts ride along so a consumer applies
    * m·ln(m/V) when in linear-counting range, which the spec does.
    * Query and oracle are ONE dialect-parameterized template.
    *
    * Scale shape: register build is one sketch-sized combine (≤
    * flags × 512 rows move); pair merges and estimates live on the
    * bounded register grid; the exact side (distinct frame + pair
    * distinct) is the cost the sketch avoids, kept for the error
    * column. */
  def hllSetAlgebra(s: SparkSession, dir: String): DataFrame = {
    val ph =
      "cast(conv(substring(sha2(cast(l_partkey as string), 256), 1, 15), 16, 10) as bigint)"
    val reliable = s.sparkContext.getCheckpointDir.isDefined
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    // hash the DISTINCT (flag, key) frame once and pin it: the
    // template references it from 5 CTEs (no CSE), and the distinct
    // frame is bounded by key cardinality × |flags| — the sketch
    // input a deployment would materialize anyway
    pin(Tables.spread(s, t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey")))
      .distinct()
      .select(col("l_returnflag").as("flag"), col("l_partkey").as("k"),
        expr(ph).as("h")))
      .createOrReplaceTempView("hll_algebra_hashed")
    s.sql(hllAlgebraSql(duck = false))
  }

  /** Exact weighted median (and weighted quartiles) of the extended
    * price, weighted by quantity, per return flag — the "median
    * dollar" (half the QUANTITY mass sits below this price), which a
    * plain median of rows cannot answer. Distributed shape: collapse
    * to (flag, price) with combined weights FIRST (the tie-collapse
    * keeps the window frame bounded by distinct prices), ONE per-flag
    * ordered window for the running weight, then a combine agg picks
    * the threshold rows — never a whole-group buffer, exactly the
    * q_median_percentile discipline with weights.
    *
    * Scale shape: one combine to the (flag, distinct price) frame +
    * ONE per-flag sort window + a grid combine; per-flag sorts
    * parallelize across flags. */
  def weightedMedian(s: SparkSession, dir: String): DataFrame = {
    val byFlag = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("price_cents"))
    val flagAll = Window.partitionBy(col("l_returnflag"))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("cast(floor(l_extendedprice * cast(100 as double)) as bigint)")
          .as("price_cents"),
        expr("cast(l_quantity as bigint)").as("w"))
      .groupBy(col("l_returnflag"), col("price_cents"))
      .agg(sum(col("w")).cast("long").as("w"))
      .withColumn("cumw", sum(col("w")).over(byFlag).cast("long"))
      .withColumn("totw", sum(col("w")).over(flagAll).cast("long"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("totw")).as("total_weight"),
        min(when(col("cumw") * 4 >= col("totw"), col("price_cents")))
          .as("wp25_cents"),
        min(when(col("cumw") * 2 >= col("totw"), col("price_cents")))
          .as("wp50_cents"),
        min(when(col("cumw") * 4 >= col("totw") * 3, col("price_cents")))
          .as("wp75_cents"))
      .orderBy("l_returnflag")
  }

  /** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002) — the
    * ALL-INTEGER distinct estimator beside HLL: keep the k = 256
    * smallest 60-bit portable hashes of each flag's part-key set;
    * estimate = (k−1)·2^60 div h_(k) (exact integer division of
    * exact integers — unlike HLL, NO floating-point op anywhere, so
    * there is no IEEE sequence to coordinate). Sets smaller than k
    * are counted exactly (the KMV rule). The 'ALL' row estimates the
    * three-way union from the bottom-k of the merged hash set —
    * bottom-k is mergeable by union-then-retrim, the property that
    * lets per-partition sketches combine on a 1000-executor cluster;
    * bottom-k overlap also gives Jaccard (the KMV bonus HLL lacks).
    *
    * Scale shape: ONE distinct combine on (flag, hash); the per-flag
    * top-k rank plans as WindowGroupLimit (per-partition top-k, never
    * a global sort); every downstream frame is ≤ flags × k rows. The
    * exact distinct rides along as the measured error. */
  def bottomkSketch(s: SparkSession, dir: String): DataFrame = {
    val k = 256
    val ph =
      "cast(conv(substring(sha2(cast(%s as string), 256), 1, 15), 16, 10) as bigint)"
    val reliable = s.sparkContext.getCheckpointDir.isDefined
    def pin(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(true)
    // pinned: the distinct (flag, hash) frame is key-cardinality-sized
    // (|flags|·|distinct partkeys|) and referenced FOUR times through
    // tagged's two consumers (sk, exact) × tagged's two branches —
    // unpinned, the scan + 600k sha + distinct re-derived per
    // reference (8 parquet scans in the r15 plan)
    val hashes = pin(Tables.spread(s, t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey")))
      .select(col("l_returnflag").as("flag"),
        expr(ph.format("l_partkey")).as("h"))
      .distinct())
    val tagged = hashes.unionAll(
      hashes.select(lit("ALL").as("flag"), col("h")).distinct())
    val rankW = Window.partitionBy(col("flag")).orderBy(col("h"))
    val sk = tagged
      .withColumn("rn", row_number().over(rankW)).where(col("rn") <= k)
      .groupBy(col("flag"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        max(col("h")).as("kth_hash"))
    val exact = tagged.groupBy(col("flag"))
      .agg(count(lit(1)).cast("long").as("n_exact"))
    sk.join(exact, "flag")
      .select(col("flag"), col("n_exact"), col("n_kept"), col("kth_hash"),
        when(col("n_kept") < k, col("n_kept")).otherwise(
          expr(s"cast((cast(${k - 1} as decimal(38,0)) * 1152921504606846976)" +
            " div kth_hash as bigint)")).as("kmv_est"))
      .orderBy("flag")
  }

  /** Count-min join-size estimation (the AGMS/count-min inner
    * product, Cormode & Muthukrishnan §4.2) — estimate |lineitem ⋈
    * σ(orders)| BEFORE shuffling either table: each side folds to a
    * 4 × 1024 count-min grid (one combine each, sketch-sized
    * movement), the estimate is the MIN over rows of the bucketwise
    * product sum Σ_j cm₁[r][j]·cm₂[r][j] — an upper bound that is
    * exact when no bucket collides. This is the CBO primitive that
    * decides broadcast-vs-shuffle and flags runaway joins from
    * sketch-sized state; q_join_size_audit reads exact per-key
    * histograms (needs a pass per key column), this composes from
    * sketches that were maintainable incrementally. The exact join
    * count rides along as the measured error; hash rows come from
    * the minhash affine family over ONE sha per key.
    *
    * Scale shape: two scan-side 4× explodes + two combines to 4×1024
    * grids; the estimate is a grid join + 4-row reduce; the exact
    * join is the cost the sketch avoids (kept as the error column).
    */
  def cmJoinEstimate(s: SparkSession, dir: String): DataFrame = {
    val ph =
      "cast(conv(substring(sha2(cast(%s as string), 256), 1, 15), 16, 10) as bigint)"
    def sketch(df: DataFrame, key: String): DataFrame =
      // spread BEFORE the hash projection: one sha + a 4-row explode
      // per input row feeds the register combine — single-split driver
      // parquet would run that map side on one core (Tables.spread
      // scaladoc; no-op at real scale)
      Tables.spread(s, df.select(col(key)))
        .select(expr(ph.format(key)).as("h"))
        .select(explode(expr(
          """transform(sequence(0, 3), r -> struct(r AS r,
            |  ((h % 2147483647) * (r + 1) + 37 * r + 101)
            |    % 2147483647 % 1024 AS bucket))""".stripMargin)).as("p"))
        .groupBy(col("p.r").as("r"), col("p.bucket").as("bucket"))
        .agg(count(lit(1)).cast("long").as("c"))
    val li = t(s, dir, "lineitem").select(col("l_orderkey"))
    val urgent = t(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val cm1 = sketch(li, "l_orderkey")
    val cm2 = sketch(urgent, "o_orderkey")
    val rowEsts = cm1.join(cm2.withColumnRenamed("c", "c2"),
        Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum((col("c") * col("c2")).cast("decimal(38,0)")).cast("long")
        .as("row_est"))
    val est = rowEsts.agg(min(col("row_est")).as("cm_est"),
      max(col("row_est")).as("worst_row_est"))
    val exact = li.join(urgent,
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).cast("long").as("exact_rows"))
    est.crossJoin(exact)
      .select(col("exact_rows"), col("cm_est"), col("worst_row_est"),
        expr("""cast(cast(cm_est - exact_rows as decimal(38,0)) * 1000000
          div greatest(exact_rows, 1) as bigint)""").as("overest_ppm"))
  }

  /** Freshness audit — the first data-ops dashboard: per table, the
    * row count and (for event-timed tables) the max event day and
    * its lag behind the freshest table in the warehouse. A table
    * whose lag grows run over run has a stalled ingest; the row
    * count catches truncated loads. Non-timestamped dimensions emit
    * −1 days (inventory-only rows). Each per-table probe is ONE
    * 1-row reduce — zero shuffles, network = one row per table —
    * which is why a freshness board can poll a 100 TB warehouse
    * every minute.
    *
    * Scale shape: 10 independent 1-row scan reduces + grid-sized
    * union; the global max is a window over the ≤ 10-row frame. */
  def freshnessAudit(s: SparkSession, dir: String): DataFrame = {
    val timed = Map(
      "events" -> "ts", "orders" -> "o_orderdate",
      "lineitem" -> "l_shipdate")
    val perTable = Tables.names.map { n =>
      val df =
        if (n == "events") Tables.events(s, dir)
          .withColumn("ed", expr("ts_us div 86400000000"))
        else if (timed.contains(n)) t(s, dir, n)
          .withColumn("ed", expr(
            s"unix_micros(cast(${timed(n)} as timestamp)) div 86400000000"))
        else t(s, dir, n).withColumn("ed", lit(null).cast("long"))
      df.agg(count(lit(1)).cast("long").as("n_rows"),
          coalesce(max(col("ed")), lit(-1L)).as("max_event_day"))
        .select(lit(n).as("table_name"), col("n_rows"),
          col("max_event_day"))
    }
    val grid = Window.partitionBy(lit(1))
    perTable.reduce(_.unionAll(_))
      .withColumn("freshest_day",
        max(col("max_event_day")).over(grid).cast("long"))
      .select(col("table_name"), col("n_rows"), col("max_event_day"),
        when(col("max_event_day") >= 0L,
          col("freshest_day") - col("max_event_day")).otherwise(-1L)
          .as("lag_days"))
      .orderBy("table_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_freshness_audit" -> freshnessAudit _,
    "q_cm_join_estimate" -> cmJoinEstimate _,
    "q_bottomk_sketch" -> bottomkSketch _,
    "q_hll_set_algebra" -> hllSetAlgebra _,
    "q_weighted_median" -> weightedMedian _,
    "q_fk_discovery" -> fkDiscovery _,
    "q_order_backlog" -> orderBacklog _,
    "q_snapshot_diff" -> snapshotDiff _,
    "q_ship_lag" -> shipLag _,
    "q_rfm_segments" -> rfmSegments _,
    "q_delta_agg" -> deltaAgg _,
    "q_dq_rules" -> dqRules _,
    "q_fuzzy_blocked_join" -> fuzzyBlockedJoin _,
    "q_join_size_audit" -> joinSizeAudit _,
    "q_distinct_rollup" -> distinctRollup _,
    "q_skyline_2d" -> skyline2d _,
    "q_window_count_distinct" -> windowCountDistinct _,
    "q_cdc_apply" -> cdcApply _,
    "q_table_fingerprint" -> tableFingerprint _,
    "q_zorder_layout" -> zorderLayout _,
    "q_skipping_audit" -> skippingAudit _,
    "q_scan_filter_project" -> scanFilterProject _,
    "q_hash_join_inner" -> hashJoinInner _,
    "q_join_multiway" -> joinMultiway _,
    "q_join_left_outer" -> joinLeftOuter _,
    "q_join_right_outer" -> joinRightOuter _,
    "q_join_semi" -> joinSemi _,
    "q_join_anti" -> joinAnti _,
    "q_join_full_outer" -> joinFullOuter _,
    "q_merge_upsert" -> mergeUpsert _,
    "q_profile_stats" -> profileStats _,
    "q_not_in_null" -> notInNullSemantics _,
    "q_unpivot" -> unpivotOrders _,
    "q_range_join" -> rangeJoin _,
    "q_asof_prev_event" -> asofPrevEvent _,
    "q_asof_merge_join" -> asofMergeJoin _,
    "q_groupby_agg" -> groupbyAgg _,
    "q_rollup" -> rollupAgg _,
    "q_cube" -> cubeAgg _,
    "q_grouping_sets" -> groupingSets _,
    "q_pivot" -> pivotEvents _,
    "q_agg_stats" -> aggStats _,
    "q_salted_agg" -> saltedAgg _,
    "q_salted_join" -> saltedJoin _,
    "q_sort_boundaries" -> sortBoundaries _,
    "q_key_skew" -> keySkew _,
    "q_median_percentile" -> medianPercentile _,
    "q_window_navigation" -> windowNavigation _,
    "q_window_range_frame" -> windowRangeFrame _,
    "q_window_distribution" -> windowDistribution _,
    "q_scalar_math" -> scalarMath _,
    "q_scalar_conditional" -> scalarConditional _,
    "q_distinct" -> distinctPairs _,
    "q_approx_distinct" -> approxDistinct _,
    "q_bloom_semi_join" -> bloomSemiJoin _,
    "q_window_rank" -> windowRank _,
    "q_window_analytic" -> windowAnalytic _,
    "q_topk_per_group" -> topkPerGroup _,
    "q_sort_limit" -> sortLimit _,
    "q_approx_percentile" -> approxPercentile _,
    "q_string_agg" -> stringAgg _,
    "q_histogram" -> histogram _,
    "q_union_all" -> unionAll _,
    "q_intersect" -> intersectKeys _,
    "q_intersect_all" -> intersectAllPairs _,
    "q_except_all" -> exceptAllPairs _,
    "q_except" -> exceptKeys _,
    "q_scalar_string" -> scalarString _,
    "q_string_transforms" -> stringTransforms _,
    "q_scalar_datetime" -> scalarDatetime _,
    "q_scalar_array" -> scalarArray _,
    "q_scalar_map" -> scalarMap _,
    "q_subquery_in" -> subqueryIn _,
    "q_lateral_topn" -> lateralTopn _,
    "q_correlated_exists" -> correlatedExists _,
    "q_scalar_subquery" -> scalarSubquery _)

  /** q_fk_discovery oracle generated from [[FkPairs]] — the same
    * candidate list drives query and oracle. */
  private[graft] def fkDiscoveryOracle: String = {
    val subs = FkPairs.map { case (ct, cc, pt, pc) =>
      s"""  SELECT '$ct.$cc' AS child_col, '$pt.$pc' AS parent_col,
         |         CAST(count(*) AS BIGINT) AS n_child_distinct,
         |         CAST((SELECT count(DISTINCT $pc) FROM $pt
         |               WHERE $pc IS NOT NULL) AS BIGINT)
         |           AS n_parent_distinct,
         |         CAST(sum(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_matched
         |  FROM (SELECT DISTINCT CAST($cc AS BIGINT) AS k FROM $ct
         |        WHERE $cc IS NOT NULL) c
         |  LEFT JOIN (SELECT DISTINCT CAST($pc AS BIGINT) AS k FROM $pt
         |             WHERE $pc IS NOT NULL) p USING (k)""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH u AS (
       |$subs)
       |SELECT child_col, parent_col, n_child_distinct, n_parent_distinct,
       |       n_matched,
       |       CAST(CAST(n_matched AS HUGEINT) * 1000000
       |            // n_child_distinct AS BIGINT) AS containment_ppm,
       |       CAST(CAST(n_child_distinct AS HUGEINT) * 1000000
       |            // n_parent_distinct AS BIGINT) AS card_ratio_ppm
       |FROM u ORDER BY child_col, parent_col""".stripMargin
  }

  /** q_freshness_audit oracle generated from the same table list. */
  private[graft] def freshnessOracle: String = {
    val timed = Map(
      "events" -> "ts", "orders" -> "o_orderdate",
      "lineitem" -> "l_shipdate")
    val subs = Tables.names.map { n =>
      val day = timed.get(n)
        .map(c => s"coalesce(CAST(max(epoch_us($c) // 86400000000) " +
          "AS BIGINT), -1)")
        .getOrElse("CAST(-1 AS BIGINT)")
      s"""  SELECT '$n' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         |         $day AS max_event_day
         |  FROM $n""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH u AS (
       |$subs)
       |SELECT table_name, n_rows, max_event_day,
       |       CASE WHEN max_event_day >= 0
       |            THEN CAST(max(max_event_day) OVER () AS BIGINT)
       |                 - max_event_day
       |            ELSE CAST(-1 AS BIGINT) END AS lag_days
       |FROM u ORDER BY table_name""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_freshness_audit" -> freshnessOracle,
    // Same affine hash rows, same 4×1024 grids, same min-of-inner-
    // products estimate and exact join error.
    "q_cm_join_estimate" ->
      """WITH s1 AS (
        |  SELECT CAST('0x' || substring(sha256(CAST(l_orderkey
        |         AS VARCHAR)), 1, 15) AS BIGINT) AS h FROM lineitem),
        |e1 AS (
        |  SELECT r.range AS r,
        |         ((h % 2147483647) * (r.range + 1) + 37 * r.range + 101)
        |           % 2147483647 % 1024 AS bucket
        |  FROM s1, range(0, 4) r),
        |cm1 AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
        |        FROM e1 GROUP BY 1, 2),
        |s2 AS (
        |  SELECT CAST('0x' || substring(sha256(CAST(o_orderkey
        |         AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |e2 AS (
        |  SELECT r.range AS r,
        |         ((h % 2147483647) * (r.range + 1) + 37 * r.range + 101)
        |           % 2147483647 % 1024 AS bucket
        |  FROM s2, range(0, 4) r),
        |cm2 AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
        |        FROM e2 GROUP BY 1, 2),
        |re AS (
        |  SELECT cm1.r,
        |         CAST(sum(CAST(cm1.c AS HUGEINT) * cm2.c) AS BIGINT)
        |           AS row_est
        |  FROM cm1 JOIN cm2 ON cm1.r = cm2.r AND cm1.bucket = cm2.bucket
        |  GROUP BY 1),
        |est AS (SELECT min(row_est) AS cm_est,
        |               max(row_est) AS worst_row_est FROM re),
        |ex AS (
        |  SELECT CAST(count(*) AS BIGINT) AS exact_rows
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderpriority = '1-URGENT')
        |SELECT exact_rows, cm_est, worst_row_est,
        |       CAST(CAST(cm_est - exact_rows AS HUGEINT) * 1000000
        |            // greatest(exact_rows, 1) AS BIGINT) AS overest_ppm
        |FROM est, ex""".stripMargin,
    // Same distinct hash frame, same bottom-256 rank, same
    // all-integer (k−1)·2^60 div h_(k) estimate.
    "q_bottomk_sketch" ->
      """WITH h0 AS (
        |  SELECT DISTINCT l_returnflag AS flag,
        |         CAST('0x' || substring(sha256(CAST(l_partkey AS VARCHAR)),
        |              1, 15) AS BIGINT) AS h
        |  FROM lineitem),
        |tagged AS (
        |  SELECT flag, h FROM h0
        |  UNION ALL
        |  SELECT DISTINCT 'ALL' AS flag, h FROM h0),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn
        |  FROM tagged),
        |sk AS (
        |  SELECT flag, CAST(count(*) AS BIGINT) AS n_kept,
        |         max(h) AS kth_hash
        |  FROM r WHERE rn <= 256 GROUP BY flag),
        |ex AS (
        |  SELECT flag, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM tagged GROUP BY flag)
        |SELECT s.flag, e.n_exact, s.n_kept, s.kth_hash,
        |       CASE WHEN s.n_kept < 256 THEN s.n_kept
        |            ELSE CAST(CAST(255 AS HUGEINT) * 1152921504606846976
        |                      // s.kth_hash AS BIGINT) END AS kmv_est
        |FROM sk s JOIN ex e ON s.flag = e.flag ORDER BY s.flag""".stripMargin,
    "q_hll_set_algebra" -> hllAlgebraSql(duck = true),
    // Same tie-collapse, same running-weight thresholds.
    "q_weighted_median" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |         CAST(floor(l_extendedprice * CAST(100 AS DOUBLE)) AS BIGINT)
        |           AS price_cents,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *,
        |         CAST(sum(w) OVER (PARTITION BY l_returnflag
        |           ORDER BY price_cents) AS BIGINT) AS cumw,
        |         CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT)
        |           AS totw
        |  FROM g)
        |SELECT l_returnflag, max(totw) AS total_weight,
        |       min(CASE WHEN cumw * 4 >= totw THEN price_cents END)
        |         AS wp25_cents,
        |       min(CASE WHEN cumw * 2 >= totw THEN price_cents END)
        |         AS wp50_cents,
        |       min(CASE WHEN cumw * 4 >= totw * 3 THEN price_cents END)
        |         AS wp75_cents
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_fk_discovery" -> fkDiscoveryOracle,
    // Same status filter, same 1-row max-day anchor, same 30-day
    // bands and exact cent mass.
    "q_order_backlog" ->
      """WITH o AS (
        |  SELECT o_orderpriority, o_orderstatus,
        |         epoch_us(o_orderdate) // 86400000000 AS order_day,
        |         CAST(floor(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT)
        |           AS cents
        |  FROM orders),
        |a AS (SELECT CAST(max(order_day) AS BIGINT) AS max_day FROM o)
        |SELECT o_orderpriority,
        |       CAST((max_day - order_day) // 30 AS BIGINT) AS age_band,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(min(max_day - order_day) AS BIGINT) AS min_age_days,
        |       CAST(max(max_day - order_day) AS BIGINT) AS max_age_days,
        |       CAST(sum(cents) AS BIGINT) AS backlog_cents
        |FROM o, a WHERE o_orderstatus = 'O'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Same hash slices, same one-cent perturbation, same FULL OUTER
    // classification and integer cent masses.
    "q_snapshot_diff" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         CAST(floor(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT)
        |           AS cents,
        |         CAST('0x' || substring(sha256(CAST(o_orderkey AS VARCHAR)),
        |              1, 15) AS BIGINT) AS h
        |  FROM orders),
        |a AS (
        |  SELECT o_orderkey, o_orderpriority, cents AS cents_a
        |  FROM b WHERE h % 20 != 0),
        |bb AS (
        |  SELECT o_orderkey, o_orderpriority AS prio_b,
        |         CASE WHEN h % 7 = 0 THEN cents + 1 ELSE cents END
        |           AS cents_b
        |  FROM b WHERE h % 20 != 1),
        |j AS (
        |  SELECT coalesce(a.o_orderpriority, bb.prio_b) AS o_orderpriority,
        |         CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |              WHEN bb.o_orderkey IS NULL THEN 'removed'
        |              WHEN cents_a != cents_b THEN 'changed'
        |              ELSE 'unchanged' END AS change_class,
        |         coalesce(cents_a, 0) AS ca, coalesce(cents_b, 0) AS cb
        |  FROM a FULL OUTER JOIN bb ON a.o_orderkey = bb.o_orderkey)
        |SELECT o_orderpriority, change_class,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(ca) AS BIGINT) AS cents_a,
        |       CAST(sum(cb) AS BIGINT) AS cents_b,
        |       CAST(sum(cb) AS BIGINT) - CAST(sum(ca) AS BIGINT)
        |         AS delta_cents
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Same join, same integer day lags, same discrete rank
    // positions and truncating mean.
    "q_ship_lag" ->
      """WITH j AS (
        |  SELECT o.o_orderpriority,
        |         epoch_us(l.l_shipdate) // 86400000000
        |           - epoch_us(o.o_orderdate) // 86400000000 AS lag_days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |r AS (
        |  SELECT o_orderpriority, lag_days,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY lag_days) AS r,
        |         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM j)
        |SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_lineitems,
        |       min(lag_days) AS min_lag_days,
        |       max(lag_days) AS max_lag_days,
        |       CAST(sum(lag_days) // count(*) AS BIGINT)
        |         AS mean_lag_days,
        |       max(CASE WHEN r = 1 + (n - 1) * 50 // 100
        |                THEN lag_days END) AS p50_lag_days,
        |       max(CASE WHEN r = 1 + (n - 1) * 90 // 100
        |                THEN lag_days END) AS p90_lag_days
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // Same integer day arithmetic, same fixed cuts, same packed
    // segment code.
    "q_rfm_segments" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         epoch_us(o_orderdate) // 86400000000 AS day,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |a AS (
        |  SELECT o_custkey, max(day) AS last_day,
        |         CAST(count(*) AS BIGINT) AS frequency,
        |         CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM o GROUP BY 1),
        |r AS (
        |  SELECT o_custkey,
        |         (SELECT max(day) FROM o) - last_day AS recency_days,
        |         frequency, monetary_cents
        |  FROM a),
        |sc AS (
        |  SELECT *,
        |    CASE WHEN recency_days <= 180 THEN 4 WHEN recency_days <= 365
        |         THEN 3 WHEN recency_days <= 730 THEN 2 ELSE 1 END AS r_score,
        |    CASE WHEN frequency >= 12 THEN 4 WHEN frequency >= 6 THEN 3
        |         WHEN frequency >= 3 THEN 2 ELSE 1 END AS f_score,
        |    CASE WHEN monetary_cents >= 200000000 THEN 4
        |         WHEN monetary_cents >= 100000000 THEN 3
        |         WHEN monetary_cents >= 50000000 THEN 2
        |         ELSE 1 END AS m_score
        |  FROM r)
        |SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
        |       frequency, monetary_cents,
        |       CAST(r_score AS BIGINT) AS r_score,
        |       CAST(f_score AS BIGINT) AS f_score,
        |       CAST(m_score AS BIGINT) AS m_score,
        |       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
        |         AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,
    // The merged base+delta rollup is a partition of all orders, so
    // the direct per-customer aggregate IS the oracle — the
    // decomposition must reproduce it exactly. Integer cents.
    "q_delta_agg" ->
      """SELECT o_custkey,
        |  CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
        |  CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
        |  CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
        |       AS BIGINT) AS total_cents
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    // Same rules, same counts: conditional aggregates per table,
    // excess-over-distinct for uniqueness, anti-join count for the
    // referential rule.
    "q_dq_rules" ->
      """WITH rules AS (
        |  SELECT 'li_quantity_range' AS rule,
        |         CAST(COUNT(*) AS BIGINT) AS n_checked,
        |         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_discount_range', CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.08
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'ord_status_domain', CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ord_priority_domain', CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
        |           '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'cu_acctbal_nonneg', CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'li_linenumber_unique', CAST(SUM(c) AS BIGINT),
        |         CAST(SUM(c - 1) AS BIGINT)
        |  FROM (SELECT count(*) AS c FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber)
        |  UNION ALL
        |  SELECT 'li_orphan_orderkey',
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                            WHERE o.o_orderkey = l.l_orderkey)))
        |SELECT rule, n_checked, n_violations,
        |       CASE WHEN n_violations = 0 THEN CAST(1 AS BIGINT)
        |            ELSE CAST(0 AS BIGINT) END AS pass
        |FROM rules ORDER BY rule""".stripMargin,
    // Same distinct-name collapse, same last-token block, same
    // unit-cost levenshtein ≤ 2 — integer edit distances match.
    "q_fuzzy_blocked_join" ->
      """WITH n AS (
        |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS cnt,
        |         string_split(p_name, ' ')[-1] AS block
        |  FROM part GROUP BY 1)
        |SELECT a.block, a.name AS name_a, b.name AS name_b,
        |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist,
        |       a.cnt AS n_a, b.cnt AS n_b,
        |       a.cnt * b.cnt AS n_row_pairs
        |FROM n a JOIN n b ON a.block = b.block AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY a.block, name_a, name_b""".stripMargin,
    // Same key histogram, same bitlength bins, same wide-cast Σc².
    "q_join_size_audit" ->
      """WITH c AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(length(bin(c)) AS BIGINT) AS size_bin,
        |       CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(c) AS BIGINT) AS n_rows,
        |       CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS selfjoin_rows,
        |       max(c) AS max_key_rows
        |FROM c GROUP BY 1 ORDER BY size_bin""".stripMargin,
    // Same register construction, same max-merge rollup, same fixed
    // IEEE estimate sequence — sketch mergeability is engine-neutral.
    "q_distinct_rollup" -> {
      val est = """CAST(floor(
          CAST(0.7213 AS DOUBLE)
            / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
            * CAST(262144 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
            / CAST(sum(CAST(1 AS BIGINT) << (52 - m))
                   + (512 - count(*)) * (CAST(1 AS BIGINT) << 52) AS DOUBLE)
        ) AS BIGINT)"""
      s"""WITH tk AS (
        |  SELECT lang, source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |reg AS (
        |  SELECT lang, source, h % 512 AS bucket,
        |         max(CASE WHEN h // 512 = 0 THEN 52
        |                  ELSE 52 - length(bin(h // 512)) END) AS m
        |  FROM (SELECT lang, source,
        |          CAST('0x' || substring(sha256(token), 1, 15) AS BIGINT) AS h
        |        FROM tk)
        |  GROUP BY lang, source, h % 512),
        |reg_lang AS (SELECT lang, bucket, max(m) AS m FROM reg GROUP BY lang, bucket),
        |reg_all AS (SELECT bucket, max(m) AS m FROM reg_lang GROUP BY bucket),
        |e0 AS (SELECT lang, source, CAST(512 - count(*) AS BIGINT) AS n_empty,
        |              $est AS hll
        |       FROM reg GROUP BY lang, source),
        |e1 AS (SELECT lang, CAST(512 - count(*) AS BIGINT) AS n_empty, $est AS hll
        |       FROM reg_lang GROUP BY lang),
        |e2 AS (SELECT CAST(512 - count(*) AS BIGINT) AS n_empty, $est AS hll
        |       FROM reg_all),
        |x0 AS (SELECT lang, source, count(DISTINCT token) AS n_exact
        |       FROM tk GROUP BY lang, source),
        |x1 AS (SELECT lang, count(DISTINCT token) AS n_exact FROM tk GROUP BY lang),
        |x2 AS (SELECT count(DISTINCT token) AS n_exact FROM tk)
        |SELECT CAST(0 AS BIGINT) AS level, x0.lang, x0.source,
        |       x0.n_exact, e0.hll, e0.n_empty
        |FROM x0 JOIN e0 ON x0.lang = e0.lang AND x0.source = e0.source
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), x1.lang, '*', x1.n_exact, e1.hll, e1.n_empty
        |FROM x1 JOIN e1 ON x1.lang = e1.lang
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), '*', '*', x2.n_exact, e2.hll, e2.n_empty
        |FROM x2, e2
        |ORDER BY level, lang, source""".stripMargin
    },
    // Same exact-cents projection; the oracle's single global
    // strictly-preceding window min over the price-grouped frame
    // equals the Spark side's two-phase (bucket offset + in-bucket)
    // prefix min — bucket order refines price order.
    "q_skyline_2d" ->
      """WITH s AS (
        |  SELECT p_partkey,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |         CAST(p_size AS BIGINT) AS p_size
        |  FROM part),
        |pp AS (SELECT price_c, min(p_size) AS min_sz FROM s GROUP BY price_c),
        |pf AS (
        |  SELECT price_c, min_sz,
        |         min(min_sz) OVER (ORDER BY price_c
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pre
        |  FROM pp)
        |SELECT s.p_partkey, s.price_c, s.p_size
        |FROM s JOIN pf USING (price_c)
        |WHERE (pf.pre IS NULL OR s.p_size < pf.pre)
        |  AND s.p_size = pf.min_sz
        |ORDER BY price_c, p_size, p_partkey""".stripMargin,
    // Same derived change log, same last-writer-wins window, same
    // delete-wins-at-the-end rule.
    "q_cdc_apply" ->
      """WITH log AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CASE WHEN event_type = 'signup' THEN 'I'
        |              WHEN event_type = 'error' THEN 'D'
        |              ELSE 'U' END AS op,
        |         CAST(floor(value * CAST(1000000 AS DOUBLE)) AS BIGINT)
        |           AS value_u
        |  FROM events),
        |r AS (
        |  SELECT user_id, op, ts_us, value_u,
        |         count(*) OVER (PARTITION BY user_id) AS n_changes,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts_us DESC, event_id DESC) AS rn
        |  FROM log)
        |SELECT user_id, op AS last_op, ts_us AS last_ts_us,
        |       value_u AS last_value_u,
        |       CAST(n_changes AS BIGINT) AS n_changes
        |FROM r WHERE rn = 1 AND op != 'D'
        |ORDER BY user_id""".stripMargin,
    // Same first-occurrence-flag reformulation: DuckDB also rejects
    // COUNT(DISTINCT) OVER a running frame.
    "q_window_count_distinct" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us, event_type,
        |         CASE WHEN row_number() OVER (
        |             PARTITION BY user_id, event_type
        |             ORDER BY ts_us, event_id) = 1
        |           THEN 1 ELSE 0 END AS first_seen
        |  FROM ev)
        |SELECT user_id, event_id, ts_us, event_type,
        |       CAST(first_seen AS BIGINT) AS first_seen,
        |       CAST(sum(first_seen) OVER (
        |           PARTITION BY user_id ORDER BY ts_us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS n_distinct_cum
        |FROM f
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    // Same canonical row rendering (ints/strings verbatim, epoch-µs
    // timestamps, floored integer cents), same portable sha hash,
    // same XOR + mod-2^62-sum folds. concat_ws skips NULLs in both
    // engines; h is non-negative so % truncation signs agree.
    "q_table_fingerprint" -> {
      val ph = "CAST('0x' || substring(sha256(%s), 1, 15) AS BIGINT)"
      def one(name: String, rowStr: String, from: String): String =
        s"""SELECT '$name' AS table_name, count(*) AS n_rows,
           |       bit_xor(h) AS xor_hash,
           |       CAST(CAST(sum(h) AS HUGEINT) % CAST(4611686018427387904 AS HUGEINT)
           |         AS BIGINT) AS sum_hash_mod
           |FROM (SELECT ${ph.format(rowStr)} AS h FROM $from)""".stripMargin
      Seq(
        one("lineitem",
          "concat_ws('|', l_orderkey, l_linenumber, " +
            "CAST(floor(l_quantity * 100) AS BIGINT), " +
            "CAST(floor(l_extendedprice * 100) AS BIGINT), " +
            "CAST(floor(l_discount * 100) AS BIGINT), " +
            "l_returnflag, l_linestatus, epoch_us(l_shipdate))",
          "lineitem"),
        one("orders",
          "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
            "CAST(floor(o_totalprice * 100) AS BIGINT), " +
            "epoch_us(o_orderdate), o_orderpriority)",
          "orders"),
        one("customer",
          "concat_ws('|', c_custkey, c_name, c_nationkey, " +
            "CAST(floor(c_acctbal * 100) AS BIGINT), c_mktsegment)",
          "customer"),
        one("documents",
          "concat_ws('|', doc_id, lang, source, text)", "documents"),
        one("events",
          "concat_ws('|', event_id, user_id, event_type, epoch_us(ts), " +
            "CAST(floor(value * 1000000) AS BIGINT))",
          "events"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },
    // Same 16-bit grid + shift-mask Morton spreading in DuckDB
    // (integer // division, identical bitwise ops).
    "q_zorder_layout" ->
      """WITH o AS (
        |  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
        |  FROM orders),
        |b AS (
        |  SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
        |         min(day) AS dmin, max(day) AS dmax FROM o),
        |g AS (
        |  SELECT (o_custkey - cmin) * 65536 // (cmax - cmin + 1) AS x,
        |         (day - dmin) * 65536 // (dmax - dmin + 1) AS y
        |  FROM o, b),
        |s1 AS (SELECT x, y, ((x | (x << 8)) & 16711935) AS xa,
        |                    ((y | (y << 8)) & 16711935) AS ya FROM g),
        |s2 AS (SELECT x, y, ((xa | (xa << 4)) & 252645135) AS xb,
        |                    ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
        |s3 AS (SELECT x, y, ((xb | (xb << 2)) & 858993459) AS xc,
        |                    ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
        |s4 AS (SELECT x, y, ((xc | (xc << 1)) & 1431655765) AS xs,
        |                    ((yc | (yc << 1)) & 1431655765) AS ys FROM s3),
        |z AS (SELECT x, y, (xs | (ys << 1)) >> 26 AS file_id FROM s4)
        |SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(x) AS x_min, max(x) AS x_max,
        |       min(y) AS y_min, max(y) AS y_max
        |FROM z GROUP BY file_id
        |ORDER BY file_id""".stripMargin,
    // Same grid + Morton steps as q_zorder_layout, plus the x-prefix
    // layout, the same bounding-box intersection rule and exact ppm.
    "q_skipping_audit" ->
      """WITH o AS (
        |  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
        |  FROM orders),
        |b AS (
        |  SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
        |         min(day) AS dmin, max(day) AS dmax FROM o),
        |g AS (
        |  SELECT (o_custkey - cmin) * 65536 // (cmax - cmin + 1) AS x,
        |         (day - dmin) * 65536 // (dmax - dmin + 1) AS y
        |  FROM o, b),
        |s1 AS (SELECT x, y, ((x | (x << 8)) & 16711935) AS xa,
        |                    ((y | (y << 8)) & 16711935) AS ya FROM g),
        |s2 AS (SELECT x, y, ((xa | (xa << 4)) & 252645135) AS xb,
        |                    ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
        |s3 AS (SELECT x, y, ((xb | (xb << 2)) & 858993459) AS xc,
        |                    ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
        |s4 AS (SELECT x, y, ((xc | (xc << 1)) & 1431655765) AS xs,
        |                    ((yc | (yc << 1)) & 1431655765) AS ys FROM s3),
        |fz AS (
        |  SELECT 'zorder' AS layout, (xs | (ys << 1)) >> 26 AS file_id,
        |         x, y FROM s4),
        |fx AS (
        |  SELECT 'xsort' AS layout, x // 1024 AS file_id, x, y FROM g),
        |idx AS (
        |  SELECT layout, file_id, count(*) AS n_rows,
        |         min(x) AS x_min, max(x) AS x_max,
        |         min(y) AS y_min, max(y) AS y_max
        |  FROM (SELECT * FROM fz UNION ALL SELECT * FROM fx)
        |  GROUP BY layout, file_id),
        |p(predicate, xlo, xhi, ylo, yhi) AS (
        |  VALUES ('x_slab', 0, 4095, 0, 65535),
        |         ('y_slab', 0, 65535, 0, 4095),
        |         ('xy_box', 16384, 20479, 16384, 20479)),
        |a AS (
        |  SELECT predicate, layout, count(*) AS n_files,
        |         sum(CASE WHEN x_min <= xhi AND x_max >= xlo
        |                   AND y_min <= yhi AND y_max >= ylo
        |                  THEN 1 ELSE 0 END) AS files_scanned,
        |         sum(CASE WHEN x_min <= xhi AND x_max >= xlo
        |                   AND y_min <= yhi AND y_max >= ylo
        |                  THEN n_rows ELSE 0 END) AS rows_scanned,
        |         sum(n_rows) AS n_rows_total
        |  FROM idx, p GROUP BY predicate, layout)
        |SELECT predicate, layout, CAST(n_files AS BIGINT) AS n_files,
        |       CAST(files_scanned AS BIGINT) AS files_scanned,
        |       CAST(rows_scanned AS BIGINT) AS rows_scanned,
        |       CAST(1000000 * CAST(rows_scanned AS HUGEINT)
        |         // n_rows_total AS BIGINT) AS scan_ppm
        |FROM a ORDER BY predicate, layout""".stripMargin,
    // Same m=2^20/k=8 double-hashed bloom filter, DuckDB dialect
    // (// for div, sha256 hex-prefix for the portable hash; position
    // set membership ≡ the Spark side's bitmask bit-tests).
    "q_bloom_semi_join" -> {
      val ph = "CAST('0x' || substring(sha256(CAST(%s AS VARCHAR)), 1, 15) AS BIGINT)"
      val m = 1 << 20
      val conj = (0 until 8)
        .map(j => s"(h1 + $j * h2) % $m IN (SELECT pos FROM bits)")
        .mkString("\n          AND ")
      s"""WITH bits AS (
        |  SELECT DISTINCT (h % $m + t.j * ((h // $m) % ${m - 1} + 1)) % $m AS pos
        |  FROM (SELECT ${ph.format("o_orderkey")} AS h
        |        FROM orders WHERE o_totalprice > 300000.0), range(0, 8) t(j)),
        |probe AS (
        |  SELECT l_orderkey, h % $m AS h1, (h // $m) % ${m - 1} + 1 AS h2
        |  FROM (SELECT l_orderkey, ${ph.format("l_orderkey")} AS h FROM lineitem)),
        |cand AS (
        |  SELECT l_orderkey FROM probe
        |  WHERE $conj),
        |truth AS (
        |  SELECT l.l_orderkey FROM lineitem l
        |  WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders
        |                         WHERE o_totalprice > 300000.0))
        |SELECT (SELECT count(*) FROM cand) AS n_candidates,
        |       (SELECT count(*) FROM truth) AS n_true""".stripMargin
    },
    // Same p=9 portable HLL: identical registers from the shared
    // 60-bit hash, exact-integer harmonic sum, identical IEEE
    // division sequence.
    "q_approx_distinct" -> {
      val ph = "CAST('0x' || substring(sha256(CAST(%s AS VARCHAR)), 1, 15) AS BIGINT)"
      def sketch(key: String, alias: String) = s"""
        |${alias}_reg AS (
        |  SELECT l_returnflag, h % 512 AS bucket,
        |         max(CASE WHEN h // 512 = 0 THEN 52
        |                  ELSE 52 - length(bin(h // 512)) END) AS m
        |  FROM (SELECT l_returnflag, ${ph.format(key)} AS h FROM lineitem)
        |  GROUP BY l_returnflag, h % 512),
        |${alias}_est AS (
        |  SELECT l_returnflag,
        |         CAST(512 - count(*) AS BIGINT) AS ${alias}_empty,
        |         CAST(floor(
        |           CAST(0.7213 AS DOUBLE)
        |             / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |             * CAST(262144 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
        |             / CAST(sum(CAST(1 AS BIGINT) << (52 - m))
        |                    + (512 - count(*)) * (CAST(1 AS BIGINT) << 52) AS DOUBLE)
        |         ) AS BIGINT) AS ${alias}_hll
        |  FROM ${alias}_reg GROUP BY l_returnflag)"""
      s"""WITH ${sketch("l_orderkey", "o")},
        |${sketch("l_partkey", "p")},
        |exact AS (
        |  SELECT l_returnflag,
        |         count(DISTINCT l_orderkey) AS o_exact,
        |         count(DISTINCT l_partkey) AS p_exact
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT e.l_returnflag, e.o_exact, o_est.o_hll, o_est.o_empty,
        |       e.p_exact, p_est.p_hll, p_est.p_empty
        |FROM exact e
        |JOIN o_est ON e.l_returnflag = o_est.l_returnflag
        |JOIN p_est ON e.l_returnflag = p_est.l_returnflag
        |ORDER BY e.l_returnflag""".stripMargin
    },
    "q_approx_percentile" ->
      """SELECT l_returnflag,
        |       quantile_disc(l_quantity, 0.5) AS qty_p50,
        |       quantile_disc(l_quantity, 0.9) AS qty_p90,
        |       quantile_disc(l_quantity, 0.99) AS qty_p99,
        |       quantile_disc(l_extendedprice, 0.5) AS price_p50,
        |       quantile_disc(l_extendedprice, 0.9) AS price_p90,
        |       quantile_disc(l_extendedprice, 0.99) AS price_p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_discount""".stripMargin,
    "q_hash_join_inner" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_profile_stats" -> profileOracle,
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT doc_id, text AS base_text, lang AS base_lang FROM documents),
        |chg AS (
        |  SELECT CASE WHEN doc_id % 7 = 2 THEN doc_id + 10000000
        |              ELSE doc_id END AS doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN 'updated: ' || text
        |              WHEN doc_id % 7 = 2 THEN 'inserted: ' || text
        |         END AS new_text,
        |         doc_id % 7 = 1 AS is_delete,
        |         lang AS chg_lang
        |  FROM documents WHERE doc_id % 7 < 3),
        |m AS (
        |  SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
        |         b.base_text, c.new_text, c.is_delete,
        |         coalesce(b.base_lang, c.chg_lang) AS lang
        |  FROM base b FULL OUTER JOIN chg c ON b.doc_id = c.doc_id)
        |SELECT doc_id,
        |       CASE WHEN new_text IS NOT NULL AND base_text IS NOT NULL
        |              THEN 'update'
        |            WHEN new_text IS NOT NULL THEN 'insert'
        |            ELSE 'keep' END AS op,
        |       lang,
        |       CAST('0x' || substring(sha256(coalesce(new_text, base_text)),
        |            1, 15) AS BIGINT) AS content_h
        |FROM m WHERE NOT coalesce(is_delete, false)
        |ORDER BY doc_id""".stripMargin,
    "q_join_multiway" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       CAST(sum(CAST(coalesce(o_totalprice, 0) AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_right_outer" ->
      """SELECT o_orderkey,
        |       coalesce(c_custkey, -1) AS cust_key,
        |       coalesce(c_mktsegment, 'NONE') AS segment
        |FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
        |RIGHT JOIN orders ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_full_outer" ->
      """SELECT coalesce(c.nk, s.snk) AS nationkey,
        |       coalesce(c.n_cust, 0) AS n_cust,
        |       coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS snk, count(*) AS n_supp
        |                 FROM supplier GROUP BY 1) s
        |  ON c.nk = s.snk
        |ORDER BY nationkey""".stripMargin,
    "q_not_in_null" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_custkey IS NOT NULL
        |                          AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_unpivot" ->
      """SELECT o_orderkey, u.metric, u.amount
        |FROM orders,
        |     unnest([{'metric': 'totalprice', 'amount': o_totalprice},
        |             {'metric': 'totalprice_half', 'amount': o_totalprice / 2.0}]) AS t(u)
        |ORDER BY o_orderkey, u.metric""".stripMargin,
    "q_range_join" ->
      """SELECT e1.event_id AS p_event_id, count(*) AS n_followers,
        |       CAST(sum(CAST(floor(e2.value * CAST(1000000 AS DOUBLE))
        |            AS BIGINT)) // count(*) AS BIGINT)
        |         AS avg_follower_value_u
        |FROM events e1 JOIN events e2
        |  ON epoch_us(e2.ts) > epoch_us(e1.ts)
        | AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 3600000000
        |WHERE e1.event_type = 'purchase'
        |GROUP BY e1.event_id ORDER BY e1.event_id""".stripMargin,
    "q_asof_prev_event" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value,
        |         lag(event_id) OVER win AS prev_event_id,
        |         lag(value) OVER win AS prev_value,
        |         lag(epoch_us(ts)) OVER win AS prev_ts_us
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT event_id, user_id, ts_us, prev_event_id,
        |       round(prev_value, 6) AS prev_value, prev_ts_us
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_asof_merge_join" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |         CASE WHEN event_type = 'view' THEN event_id END AS view_id,
        |         CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS view_ts_us
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |m AS (
        |  SELECT user_id, event_id, ts_us, event_type,
        |         last_value(view_id IGNORE NULLS) OVER w AS last_view_id,
        |         last_value(view_ts_us IGNORE NULLS) OVER w AS last_view_ts_us
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY ts_us, CASE WHEN event_type = 'view' THEN 0 ELSE 1 END, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id AS purchase_id, ts_us AS purchase_ts_us,
        |       coalesce(last_view_id, -1) AS view_id,
        |       coalesce(last_view_ts_us, -1) AS view_ts_us
        |FROM m WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,
    "q_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST((CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |                * 1000000 AS BIGINT)) AS BIGINT) AS sum_disc_price_u,
        |       CAST(sum(CAST((CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) *
        |                (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
        |                * 1000000 AS BIGINT)) AS BIGINT) AS sum_charge_u,
        |       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 1000000
        |            AS BIGINT)) // count(*) AS BIGINT) AS avg_qty_u,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 1000000
        |            AS BIGINT)) // count(*) AS BIGINT) AS avg_price_u,
        |       CAST(sum(CAST(CAST(l_discount AS DECIMAL(12,2)) * 1000000
        |            AS BIGINT)) // count(*) AS BIGINT) AS avg_disc_u,
        |       count(*) AS count_order,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, '_all_') AS returnflag,
        |       coalesce(l_linestatus, '_all_') AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, '_all_') AS returnflag,
        |       coalesce(l_linestatus, '_all_') AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '_all_') AS returnflag,
        |       coalesce(l_linestatus, '_all_') AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'error') AS error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_agg_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(28,8)) * CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(l_discount AS DECIMAL(28,8))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(l_discount AS DECIMAL(28,8)) * CAST(l_discount AS DECIMAL(28,8))) AS DOUBLE) AS syy,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(28,8)) * CAST(l_discount AS DECIMAL(28,8))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |       round((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
        |       round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
        |       round((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_disc,
        |       round((n * sxy - sx * sy) /
        |             (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_disc
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_suppkey,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    // the PLAIN join — the salted plan must be answer-identical to it
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_sort_boundaries" -> sortBoundariesOracle(),
    "q_key_skew" ->
      """WITH counts AS (
        |  SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1),
        |stats AS (
        |  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total_rows,
        |         max(cnt) AS max_rows
        |  FROM counts)
        |SELECT l_orderkey, cnt, n_keys, total_rows, max_rows,
        |       CAST(CAST(cnt AS HUGEINT) * 1000000 * n_keys // total_rows AS BIGINT)
        |         AS load_ppm_of_mean
        |FROM counts, stats
        |ORDER BY cnt DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_median_percentile" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
        |       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
        |       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_window_navigation" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_totalprice) OVER win AS first_price,
        |       last_value(o_totalprice) OVER win AS last_price,
        |       nth_value(o_totalprice, 2) OVER win AS second_price
        |FROM orders
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS od_us,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER win AS DOUBLE)
        |         AS trailing_30d_spend,
        |       count(*) OVER win AS trailing_30d_orders
        |FROM orders
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
        |               RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_distribution" ->
      """SELECT o_custkey, o_orderkey,
        |       ntile(4) OVER win AS quartile,
        |       round(percent_rank() OVER win, 6) AS pct_rank,
        |       round(cume_dist() OVER win, 6) AS cdist
        |FROM orders
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS abs_disc_delta,
        |       round(sqrt(l_quantity), 6) AS sqrt_qty,
        |       round(ln(l_extendedprice), 6) AS ln_price,
        |       round(exp(l_discount), 6) AS exp_disc,
        |       round(pow(l_quantity, 2), 6) AS qty_sq,
        |       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_disc,
        |       CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
        |       CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
        |       CAST(l_linenumber % 3 AS BIGINT) AS line_mod3
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, qty_sq, abs_disc_delta,
        |         ln_price""".stripMargin,
    "q_scalar_conditional" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000.0 THEN 'high'
        |            WHEN o_totalprice > 150000.0 THEN 'mid'
        |            ELSE 'low' END AS price_tier,
        |       nullif(o_orderstatus, 'O') AS status_non_open,
        |       coalesce(nullif(o_orderpriority, '1-URGENT'), 'not-urgent') AS prio_or_default,
        |       least(o_totalprice, 200000.0) AS price_capped,
        |       greatest(o_totalprice - 100000.0, 0.0) AS price_excess
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey,
        |       row_number() OVER win AS rn,
        |       rank() OVER win AS rnk,
        |       dense_rank() OVER win AS drnk,
        |       o_orderkey, o_totalprice
        |FROM orders
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY row_number() OVER win <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS orderdate_us,
        |       o_totalprice,
        |       lag(o_totalprice) OVER win AS prev_price,
        |       lead(o_totalprice) OVER win AS next_price,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT p_brand, row_number() OVER win AS rn, p_partkey, p_name, p_retailprice
        |FROM part
        |WINDOW win AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
        |QUALIFY row_number() OVER win <= 3
        |ORDER BY p_brand, rn""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_string_agg" ->
      """SELECT c_mktsegment, count(*) AS n_nations,
        |       string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM (SELECT DISTINCT c_mktsegment, n_name
        |      FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(greatest(floor(l_extendedprice / 5000.0), 0), 19) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_union_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
        |INTERSECT ALL
        |SELECT user_id, event_type FROM events WHERE event_id % 2 = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q_except_all" ->
      """SELECT user_id, event_type FROM events WHERE event_id % 2 = 0
        |EXCEPT ALL
        |SELECT user_id, event_type FROM events WHERE event_id % 2 = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_scalar_string" ->
      """SELECT c_custkey,
        |       upper(substring(c_name, 1, 8)) AS name_prefix,
        |       concat_ws(':', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
        |       c_name LIKE '%5' AS ends_in_5,
        |       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
        |       length(c_name) AS name_len,
        |       lower(c_mktsegment) AS seg_lower
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_string_transforms" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
        |       regexp_replace(n_name, '[AEIOU]', '_', 'g') AS devoweled,
        |       translate(n_name, 'AEIOU', 'aeiou') AS lower_vowels,
        |       lpad(n_name, 16, '.') AS padded,
        |       split_part(n_name, ' ', 1) AS first_word,
        |       CAST(levenshtein(n_name, 'UNITED STATES') AS BIGINT) AS dist_to_us,
        |       replace(n_name, 'UNITED', 'U.') AS abbrev
        |FROM nation ORDER BY nationkey""".stripMargin,
    "q_scalar_datetime" ->
      """SELECT o_orderkey,
        |       year(o_orderdate) AS o_year,
        |       month(o_orderdate) AS o_month,
        |       day(o_orderdate) AS o_day,
        |       epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
        |       date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_epoch_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_scalar_array" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT)
        |         AS total_token_chars,
        |       string_split(text, ' ')[1] AS first_token,
        |       list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scalar_map" ->
      """SELECT event_id,
        |       array_to_string(list_sort(map_keys(m)), ',') AS m_keys,
        |       array_to_string(list_sort(map_values(m)), ',') AS m_vals,
        |       array_to_string(list_sort(list_transform(map_values(m), v -> upper(v))), ',')
        |         AS m_vals_upper,
        |       array_to_string(list_sort(list_filter(map_keys(m), k -> k = 'type')), ',')
        |         AS m_type_only_keys,
        |       list_contains(map_keys(m), 'type') AS has_type,
        |       CAST(cardinality(m) AS BIGINT) AS n_entries
        |FROM (SELECT event_id,
        |             MAP(['type', 'user'], [event_type, CAST(user_id AS VARCHAR)]) AS m
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_lateral_topn" ->
      """SELECT c_custkey, c_mktsegment, l.o_orderkey, l.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_subquery_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_totalprice > 200000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_correlated_exists" ->
      """SELECT o_orderkey, o_orderstatus
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.5
        |ORDER BY c_custkey""".stripMargin)
}
