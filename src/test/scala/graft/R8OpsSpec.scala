package graft

import org.apache.spark.sql.functions._
import graft.ops.{EventOps, LlmOps, RelationalOps, TextOps, VectorOps}

/** Invariants of the round-8 operators beyond the DuckDB hash gate:
  * properties that must hold at ANY scale, not just equality at the
  * gate SF.
  */
class R8OpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("interarrival: order statistics bracket correctly per type") {
    val rows = EventOps.interarrival(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mn, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (mean, p50, p90) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(n > 0 && mn >= 0)
      assert(mn <= p50 && p50 <= p90 && p90 <= mx)
      assert(mn <= mean && mean <= mx)
    }
  }

  test("delta agg: the merge reproduces the direct rollup exactly") {
    val merged = RelationalOps.deltaAgg(spark, sfDir)
    val direct = Tables(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_total"),
        sum(expr("cast(floor(o_totalprice * cast(100 as double)) as bigint)")
          .cast("decimal(38,0)")).cast("long").as("total_cents"))
    val diff = merged.select("o_custkey", "n_total", "total_cents")
      .exceptAll(direct.select("o_custkey", "n_total", "total_cents"))
    assert(diff.isEmpty, "base+delta merge drifted from the direct rollup")
    // base + delta partitions the count
    assert(merged.where(col("n_base") + col("n_delta") =!= col("n_total"))
      .isEmpty)
  }

  test("dq rules: battery is complete, counts are consistent") {
    val rows = RelationalOps.dqRules(spark, sfDir).collect()
    val byRule = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byRule.keySet == Set(
      "li_quantity_range", "li_discount_range", "li_linenumber_unique",
      "li_orphan_orderkey", "ord_status_domain", "ord_priority_domain",
      "cu_acctbal_nonneg"))
    rows.foreach { r =>
      val (checked, viol, pass) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(viol >= 0 && viol <= checked)
      assert(pass == (if (viol == 0) 1L else 0L))
    }
    // referential integrity holds in the synthetic data; the
    // uniqueness rule genuinely fires (duplicated line numbers exist)
    assert(byRule("li_orphan_orderkey")._2 == 0L)
    assert(byRule("li_linenumber_unique")._2 > 0L)
    // all three lineitem-count-checked rules saw the same row count
    assert(byRule("li_quantity_range")._1 == byRule("li_orphan_orderkey")._1)
  }

  test("dup inflation: canonical tokens bound totals; global sums agree") {
    val rows = LlmOps.dupInflation(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // canonical docs <= docs
      assert(r.getLong(4) <= r.getLong(3)) // canonical toks <= toks
      val ppm = r.getLong(5)
      assert(ppm >= 0 && ppm <= 1000000L)
    }
    // across sources, canonical docs = number of distinct content
    // hashes in the corpus
    val distinctHashes = Tables(spark, sfDir, "documents")
      .select(sha2(col("text"), 256)).distinct.count()
    assert(rows.map(_.getLong(2)).sum == distinctHashes)
  }

  test("hapax ratio: count classes partition consistently") {
    val rows = TextOps.hapaxRatio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, occ) = (r.getLong(1), r.getLong(2))
      val (hapax, dis) = (r.getLong(3), r.getLong(4))
      assert(hapax + dis <= types)
      assert(occ >= types) // every type occurs at least once
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L)
    }
  }

  test("vocab coverage: knee points are ordered and within the vocab") {
    val rows = TextOps.vocabCoverage(spark, sfDir).collect()
    rows.foreach { r =>
      val (types, k50, k90, k95) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(1 <= k50 && k50 <= k90 && k90 <= k95 && k95 <= types)
    }
  }

  test("pca power: shares sum to ~1e6 over the dims grid") {
    val rows = VectorOps.pcaPower(spark, sfDir).collect()
    assert(rows.length > 0)
    val shareSum = rows.map(_.getLong(3)).sum
    // truncating ppm divisions lose < 1 ppm per dim
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.length)
    assert(rows.forall(_.getLong(1) == rows.head.getLong(1)),
      "every dim sees every vector")
  }

  test("rfm segments: scores respect the cuts and pack into the code") {
    val rows = RelationalOps.rfmSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rec, freq, cents) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (rs, fs, ms, seg) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(rec >= 0)
      assert(seg == rs * 100 + fs * 10 + ms)
      assert(rs == (if (rec <= 180) 4 else if (rec <= 365) 3
        else if (rec <= 730) 2 else 1))
      assert(fs == (if (freq >= 12) 4 else if (freq >= 6) 3
        else if (freq >= 3) 2 else 1))
      assert(ms == (if (cents >= 200000000L) 4
        else if (cents >= 100000000L) 3
        else if (cents >= 50000000L) 2 else 1))
    }
  }

  test("whale share: top-1 <= top-20 <= total; ppms consistent") {
    val rows = EventOps.whaleShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nUsers, total) = (r.getLong(1), r.getLong(2))
      val (top20, top1) = (r.getLong(3), r.getLong(4))
      assert(top1 <= top20 && top20 <= total)
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= r.getLong(5))
      // with <= 20 users, the top-20 mass IS the total
      if (nUsers <= 20) assert(top20 == total && r.getLong(5) == 1000000L)
    }
  }

  test("prefix cluster: every cluster has >= 2 docs, sources bounded") {
    val rows = TextOps.prefixCluster(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
    }
    // ordered by size desc
    val sizes = rows.map(_.getLong(1)).toSeq
    assert(sizes == sizes.sorted.reverse)
  }

  test("norm bands: bands bracket their min/max; counts cover the corpus") {
    val rows = VectorOps.normBands(spark, sfDir).collect()
    rows.foreach { r =>
      val (band, mn, mx) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(mn <= mx)
      if (band > 0) {
        assert(64L - java.lang.Long.numberOfLeadingZeros(mn) == band)
        assert(64L - java.lang.Long.numberOfLeadingZeros(mx) == band)
      } else assert(mn == 0L && mx == 0L)
    }
    val total = Tables(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(2)).sum == total)
  }

  test("conversion lag: bands bracket lags; lags are non-negative") {
    val rows = EventOps.conversionLag(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (band, mn, mx, mean) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mn >= 0 && mn <= mean && mean <= mx)
      if (band > 0) {
        assert(64L - java.lang.Long.numberOfLeadingZeros(mn) == band)
        assert(64L - java.lang.Long.numberOfLeadingZeros(mx) == band)
      }
    }
  }

  test("slo burn: error counts bound totals; breach matches the ppm") {
    val rows = EventOps.sloBurn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, errs, ppm, breach) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(errs <= n)
      assert(ppm <= 1000000L)
      assert(breach == (if (ppm > 10000L) 1L else 0L))
    }
  }

  test("dataset card: inventory is consistent with the documents table") {
    val rows = LlmOps.datasetCard(spark, sfDir).collect()
    val docs = Tables(spark, sfDir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val langs = docs.select("lang").distinct.count()
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= langs)
      assert(r.getLong(6) >= 0 && r.getLong(6) < 1000000L)
      assert(r.getLong(5) > 0) // mean tokens
    }
  }

  test("ship lag: order statistics bracket; all five priorities present") {
    val rows = RelationalOps.shipLag(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (mn, mx) = (r.getLong(2), r.getLong(3))
      val (mean, p50, p90) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(mn <= p50 && p50 <= p90 && p90 <= mx)
      assert(mn <= mean && mean <= mx)
      // NOTE: the synthetic shipdates are not constrained to follow
      // their order dates, so negative lags are legitimate here — the
      // op reports them rather than clamping (a real deployment wants
      // to SEE impossible lags; that's a data-quality signal).
    }
  }

  test("lsh recall: monotone in the agreement threshold; counts nest") {
    val rows = LlmOps.lshRecall(spark, sfDir).collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val nTruth = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == nTruth, "n_truth is a constant column")
      assert(r.getLong(3) <= r.getLong(2), "hits bounded by candidates")
      assert(r.getLong(3) <= nTruth, "hits bounded by truth")
    }
    // candidates and hits can only shrink as the threshold rises
    rows.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(1).getLong(2) <= w(0).getLong(2))
        assert(w(1).getLong(3) <= w(0).getLong(3))
      }
    }
    // single-perm bands: truth pairs (jaccard >= 0.5) collide on at
    // least one of 8 bands with overwhelming probability
    assert(nTruth == 0 || rows.head.getLong(4) >= 900000L,
      s"recall@1 collapsed: ${rows.head.getLong(4)}")
  }

  test("split leakage: pairs oriented, leak ppms bounded") {
    val rows = LlmOps.splitLeakage(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "split pair is oriented")
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(4) <= r.getLong(2))
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L)
    }
  }

  test("psi drift: halves partition the corpus; psi is non-negative") {
    val rows = EventOps.psiDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2) = (r.getLong(1), r.getLong(2))
      val (bands, dropped, psi) =
        (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n1 > 0 && n2 > 0)
      assert(dropped <= bands)
      // each contribution (p-q)(ln p - ln q) >= 0; floors can shave
      // at most 1 nano-unit per band
      assert(psi >= -bands)
    }
  }

  test("ann plan: sizing arithmetic is self-consistent") {
    val r = VectorOps.annPlan(spark, sfDir).collect()(0)
    val (n, dims, nlist) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nlist > 0 && (nlist & (nlist - 1)) == 0, "nlist is a power of 2")
    assert(nlist.toDouble <= math.sqrt(n.toDouble) * 2)
    assert(r.getLong(3) == n / nlist)
    assert(r.getLong(5) == dims * 4)
    assert(r.getLong(7) == (dims * 4) / (dims / 4))
  }

  test("negative sampling: no self or same-source negatives, ranks dense") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = LlmOps.negativeSampling(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (anchor, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, "ranks are dense from 1")
      rs.foreach { r =>
        assert(r.getLong(2) != anchor, "self-negative")
        assert(r.getString(3) != docs(anchor), "same-source negative")
        assert(r.getString(3) == docs(r.getLong(2)), "source mismatch")
      }
    }
  }

  test("clustering coeff: ppm in [0, 1e6]; triangles bounded by wedges") {
    val rows = LlmOps.clusteringCoeff(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, tri, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(deg >= 2)
      assert(2 * tri <= deg * (deg - 1), "triangles exceed wedges")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
    // the node-level triangle corners must sum to 3x the global count
    val global = SparkEntry.queries("q_triangle_count")(spark, sfDir)
      .collect()(0).getLong(3)
    // nodes with deg < 2 cannot host a triangle corner, so the
    // deg >= 2 filter loses none
    assert(rows.map(_.getLong(2)).sum == 3 * global)
  }

  test("benford audit: shares sum to ~1e6 per type; expectation is fixed") {
    val rows = EventOps.benfordAudit(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val share = rs.map(_.getLong(3)).sum
      assert(share <= 1000000L && share >= 1000000L - 9)
      rs.foreach { r =>
        assert(r.getLong(1) >= 1 && r.getLong(1) <= 9)
        assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
      }
      // Benford expectation for digit 1 is ~301030 ppm
      assert(rs.find(_.getLong(1) == 1L)
        .forall(_.getLong(4) == 301029L))
    }
  }

  test("centroid drift: label centroids straddle the global centroid") {
    val rows = VectorOps.centroidDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 0L)) // squared distance
    // the global centroid is the n-weighted mean of label centroids
    // (up to integer truncation): not all labels can drift the same
    // signed direction, so min dist2 should be small relative to max
    // — weak sanity only; the strong check is the oracle hash.
    val n = rows.map(_.getLong(1)).sum
    val total = Tables(spark, sfDir, "embeddings").count()
    assert(n == total, "label partition must cover all vectors")
  }

  test("dau stickiness: WAU dominates DAU, stickiness is a ratio") {
    val rows = EventOps.dauStickiness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dau >= 1 && wau >= dau,
        "a user active on day d is active in d's 7-day window")
      assert(ppm <= 1000000L && ppm == dau * 1000000L / wau)
    }
  }

  test("markov stationary: integer mass is conserved up to truncation") {
    val rows = EventOps.markovStationary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val init = rows.map(_.getLong(1)).sum
    val after = rows.map(_.getLong(2)).sum
    // each of 4 iterations drops < |types|² units to truncation
    assert(after <= init)
    assert(init - after <= 4L * rows.length * rows.length)
    // every type retains positive mass (chain is irreducible enough
    // in the synthetic data; zero mass would mean a lost type)
    assert(rows.forall(_.getLong(2) > 0L))
  }

  test("snapshot diff: every class appears and changed rows cost 1 cent") {
    val rows = RelationalOps.snapshotDiff(spark, sfDir).collect()
    val classes = rows.map(_.getString(1)).toSet
    assert(classes == Set("added", "removed", "changed", "unchanged"))
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(4) - r.getLong(3),
        "delta must equal cents_b - cents_a")
      if (r.getString(1) == "changed")
        assert(r.getLong(5) == r.getLong(2),
          "each changed row was perturbed by exactly one cent")
      if (r.getString(1) == "added") assert(r.getLong(3) == 0L)
      if (r.getString(1) == "removed") assert(r.getLong(4) == 0L)
    }
  }

  test("ivf balance: cells cover the corpus, shares and balance agree") {
    val rows = VectorOps.ivfBalance(spark, sfDir).collect()
    val total = Tables(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.length <= 16)
    val shares = rows.map(_.getLong(2)).sum
    assert(shares <= 1000000L && shares >= 1000000L - rows.length)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * rows.length ||
        // truncation can differ by ≤ n_cells between the two routes
        math.abs(r.getLong(3) - r.getLong(2) * rows.length) <= rows.length)
    }
  }

  test("pq residual: one row per subspace, seeds quantize exactly") {
    val rows = VectorOps.pqResidual(spark, sfDir).collect()
    assert(rows.length == VectorOps.PqM)
    val shares = rows.map(_.getLong(4)).sum
    assert(shares <= 1000000L)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) <= r.getLong(3), "mean must not exceed max")
      assert(r.getLong(2) >= 0L)
    }
  }

  test("bbit minhash: 1-bit agreement dominates full-width agreement") {
    val rows = TextOps.bbitMinhash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (full, bit) = (r.getLong(2), r.getLong(3))
      // equal 32-bit sigs ⇒ equal low bits, so bit-agreement ≥ full
      assert(bit >= full && bit <= 128L && full >= 0L)
      assert(r.getLong(4) == full * 1000000L / 128L)
      assert(r.getLong(6) == r.getLong(5) - r.getLong(4))
    }
  }

  test("ccnet buckets: terciles partition each language in NLL order") {
    val rows = TextOps.ccnetBuckets(spark, sfDir).collect()
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (_, rs) =>
      val m = rs.map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(m.keySet == Set("head", "middle", "tail"))
      // tercile sizes differ by at most 1
      val sizes = m.values.map(_._1)
      assert(sizes.max - sizes.min <= 1)
      // NLL ranges are ordered: head (fluent) below middle below tail
      assert(m("head")._3 <= m("middle")._2 ||
        m("head")._3 <= m("middle")._3)
      assert(m("middle")._3 <= m("tail")._3)
    }
  }

  test("tokenizer fertility: one row per lang, ratios positive") {
    val rows = TextOps.tokenizerFertility(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) > 0)
      assert(r.getLong(4) > 0 && r.getLong(5) > 0)
      // the regex tokenizer never merges across whitespace
      assert(r.getLong(3) >= r.getLong(2))
    }
  }

  test("order backlog: only open orders, bands are consistent") {
    val rows = RelationalOps.orderBacklog(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (band, n) = (r.getLong(1), r.getLong(2))
      val (mn, mx) = (r.getLong(3), r.getLong(4))
      assert(band >= 0 && n > 0)
      assert(mn <= mx && mn / 30 == band && mx / 30 == band)
      assert(r.getLong(5) > 0L)
    }
    val open = Tables(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "O").count()
    assert(rows.map(_.getLong(2)).sum == open)
  }

  test("fk discovery: real FKs contained, decoy flagged by ratio") {
    val rows = RelationalOps.fkDiscovery(spark, sfDir).collect()
    assert(rows.length == RelationalOps.FkPairs.length)
    val m = rows.map(r => r.getString(0) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // the real FK skeleton is fully contained
    Seq("lineitem.l_orderkey", "orders.o_custkey", "customer.c_nationkey",
      "nation.n_regionkey").foreach { k =>
      assert(m(k)._4 == 1000000L, s"$k should be fully contained")
    }
    // the decoy is contained too (the classic false positive)...
    assert(m("lineitem.l_linenumber")._4 == 1000000L)
    // ...but its cardinality ratio exposes it: 7 line numbers vs 25
    // nation keys, far below a genuine key-to-key ratio
    assert(m("lineitem.l_linenumber")._5 < 500000L)
  }

  test("seasonal baseline: split counts partition each cell") {
    val rows = EventOps.seasonalBaseline(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(2) + r.getLong(3)).sum
    val all = Tables.events(spark, sfDir).count()
    assert(total == all, "train+test must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23)
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
      assert(r.getLong(6) >= 0L)
    }
  }

  test("dedup survivorship: planted mirror loses every group") {
    val rows = LlmOps.dedupSurvivorship(spark, sfDir).collect()
    assert(rows.nonEmpty, "the planted mirror guarantees dup groups")
    // mirror ids are original+1e7, so the original always wins
    assert(rows.forall(_.getString(0) != "mirror"),
      "mirror can never win (its doc_ids are offset above all originals)")
    assert(rows.forall(_.getString(1) == "mirror") ||
      rows.exists(_.getString(1) == "mirror"))
    rows.foreach { r => assert(r.getLong(2) > 0 && r.getLong(3) > 0) }
  }

  test("assign margin: bands tile the margin range, shares sum to ~1e6") {
    val rows = VectorOps.assignMargin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = Tables(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total)
    val shares = rows.map(_.getLong(4)).sum
    assert(shares <= 1000000L && shares >= 1000000L - rows.length)
    rows.foreach { r =>
      val (band, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn >= 0 && mn <= mx)
      assert(mn / 100000 == band && mx / 100000 == band)
    }
  }

  test("hll set algebra: estimates bracket exacts, union dominates") {
    val rows = RelationalOps.hllSetAlgebra(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (exA, exB, exU, exI) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (hA, hB, hU, hI) =
        (r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
      // set identities on the exact side
      assert(exU <= exA + exB && exU >= math.max(exA, exB))
      assert(exI == exA + exB - exU && exI >= 0)
      // sketch identities: merged-register union dominates each side
      // (max-merge can only raise registers)
      assert(hU >= math.max(hA, hB))
      assert(hI == hA + hB - hU)
      // raw estimates are biased high in linear-counting range (the
      // documented omission); the emitted empty counts recover the
      // corrected estimate: m·ln(m/V)
      val emptyU = r.getLong(10 + 2)
      val corrected =
        if (emptyU > 0) math.round(512.0 * math.log(512.0 / emptyU))
        else hU
      assert(math.abs(corrected - exU) <= math.max(exU / 4, 30),
        s"corrected union estimate $corrected too far from exact $exU")
    }
  }

  test("weighted median: quartiles ordered and half the mass below p50") {
    val rows = RelationalOps.weightedMedian(spark, sfDir).collect()
    assert(rows.length == 3)
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        expr("cast(floor(l_extendedprice * cast(100 as double)) as bigint)")
          .as("pc"),
        expr("cast(l_quantity as bigint)").as("w"))
    rows.foreach { r =>
      val (flag, tot) = (r.getString(0), r.getLong(1))
      val (p25, p50, p75) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p25 <= p50 && p50 <= p75)
      // weight mass at or below the weighted median is >= half
      val below = li.where(col("l_returnflag") === flag &&
          col("pc") <= p50)
        .agg(sum(col("w")).cast("long")).collect()(0).getLong(0)
      assert(below * 2 >= tot)
    }
  }

  test("windowed funnel: windowed counts never exceed the open funnel") {
    val win = EventOps.funnelWindowed(spark, sfDir).collect()(0)
    val open = EventOps.funnel(spark, sfDir).collect()(0)
    assert(win.getLong(0) == open.getLong(0), "view anchor is identical")
    assert(win.getLong(1) <= open.getLong(1))
    assert(win.getLong(2) <= open.getLong(2))
    // conversion lags are inside the 24 h windows
    assert(win.getLong(5) >= 0 && win.getLong(5) < 86400000000L)
    assert(win.getLong(6) >= 0 && win.getLong(6) < 86400000000L)
  }

  test("bottomk sketch: KMV estimate tracks exact, ALL row dominates") {
    val rows = RelationalOps.bottomkSketch(spark, sfDir).collect()
    val m = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m.keySet == Set("A", "N", "R", "ALL"))
    m.foreach { case (flag, (exact, kept, kth, est)) =>
      assert(kept <= 256 && kth > 0)
      if (kept < 256) assert(est == exact, s"$flag small-set rule")
      // KMV relative SE is ~1/sqrt(k-2) ≈ 6.3%; allow 25%
      else assert(math.abs(est - exact) <= exact / 4,
        s"$flag KMV estimate $est too far from $exact")
    }
    assert(m("ALL")._1 >= Seq("A", "N", "R").map(m(_)._1).max)
  }

  test("activation time: bands partition signups; -1 row is unactivated") {
    val rows = EventOps.activationTime(spark, sfDir).collect()
    val signups = Tables.events(spark, sfDir)
      .where(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == signups)
    rows.foreach { r =>
      val band = r.getLong(0)
      if (band == -1L) assert(r.getLong(2) == -1L && r.getLong(4) == -1L)
      else {
        assert(r.getLong(2) <= r.getLong(3))
        assert(r.getLong(2) <= r.getLong(4) && r.getLong(4) <= r.getLong(3))
      }
    }
  }

  test("churn cohorts: rates are ratios, lifetimes non-negative") {
    val rows = EventOps.churnCohorts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
      assert(r.getLong(4) >= 0L)
    }
  }

  test("props schema: all four planted keys discovered and typed") {
    val rows = EventOps.propsSchema(spark, sfDir).collect()
    val m = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getString(5), r.getLong(6))).toMap
    assert(m.keySet == Set("k", "tag", "flag", "v"))
    // k appears in all shapes except the v-variant (~3/4 coverage)
    assert(m("k")._2 == "int")
    assert(m("k")._3 > 650000L && m("k")._3 < 850000L)
    assert(m("flag")._2 == "bool" && m("tag")._2 == "string")
    assert(m("v")._2 == "string")
    // the three variant shapes each cover ~a quarter of events
    Seq("tag", "flag", "v").foreach { k =>
      assert(m(k)._3 > 150000L && m(k)._3 < 350000L)
    }
  }

  test("dim covariance: diagonal is variance (non-negative), symmetric scope") {
    val rows = VectorOps.dimCovariance(spark, sfDir).collect()
    assert(rows.length == 36, "8 dims -> 36 upper-triangle cells")
    val n = Tables(spark, sfDir, "embeddings").count()
    rows.foreach { r =>
      assert(r.getLong(0) <= r.getLong(1))
      assert(r.getLong(2) == n)
      if (r.getLong(0) == r.getLong(1))
        assert(r.getLong(3) >= 0L, "variance cannot be negative")
    }
    // Cauchy-Schwarz: |cov(i,j)| <= sqrt(var_i * var_j) (integer
    // truncation can push at most 1 unit over)
    val vars = rows.filter(r => r.getLong(0) == r.getLong(1))
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.filter(r => r.getLong(0) != r.getLong(1)).foreach { r =>
      val bound = math.sqrt(vars(r.getLong(0)).toDouble *
        vars(r.getLong(1)).toDouble)
      assert(math.abs(r.getLong(3)) <= bound + 1.0)
    }
  }

  test("cm join estimate: upper bound that tightens with min-of-rows") {
    val r = RelationalOps.cmJoinEstimate(spark, sfDir).collect()(0)
    val (exact, est, worst) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(exact > 0, "the urgent-orders join is non-trivial")
    // count-min inner product NEVER underestimates
    assert(est >= exact, "count-min is an upper bound")
    assert(worst >= est, "min over rows is the tightest row")
    assert(r.getLong(3) == (est - exact) * 1000000L / exact)
    // 4096 buckets vs ~thousands of keys: the bound should be tight
    assert(est <= exact * 3, s"estimate $est unreasonably loose vs $exact")
  }

  test("survival curve: monotone non-increasing from full coverage") {
    val rows = EventOps.survivalCurve(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(0) == 0L)
    val n0 = rows.head.getLong(1)
    assert(rows.head.getLong(2) == 1000000L,
      "every signup survives to offset 0")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(0) == a.getLong(0) + 1, "offsets are contiguous")
        assert(b.getLong(1) <= a.getLong(1), "survival is monotone")
      case _ =>
    }
    assert(rows.forall(_.getLong(1) <= n0))
  }

  test("simhash hamming: histogram covers the dedup op's candidates") {
    val hist = TextOps.simhashHamming(spark, sfDir).collect()
    assert(hist.nonEmpty)
    val shares = hist.map(_.getLong(2)).sum
    assert(shares <= 1000000L && shares >= 1000000L - hist.length)
    // the <= 1 mass in the histogram equals the dedup op's row count
    val nearMass = hist.filter(_.getLong(0) <= 1L).map(_.getLong(1)).sum
    val dedupRows = TextOps.simhashDedup(spark, sfDir).count()
    assert(nearMass == dedupRows)
    assert(hist.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 32))
  }

  test("freshness audit: every table reported, lags anchored at zero") {
    val rows = RelationalOps.freshnessAudit(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet == Tables.names.toSet)
    val timed = rows.filter(_.getLong(2) >= 0L)
    assert(timed.map(_.getString(0)).toSet ==
      Set("events", "orders", "lineitem"))
    assert(timed.exists(_.getLong(3) == 0L),
      "the freshest table has zero lag")
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      if (r.getLong(2) < 0L) assert(r.getLong(3) == -1L)
      else assert(r.getLong(3) >= 0L)
    }
  }

  test("effective dims: PR between 1 and n_dims") {
    val r = VectorOps.effectiveDims(spark, sfDir).collect()(0)
    val (nDims, pr) = (r.getLong(0), r.getLong(2))
    assert(nDims == 64L)
    assert(pr >= 1000000L, "PR >= 1 by Cauchy-Schwarz")
    assert(pr <= nDims * 1000000L, "PR <= d")
    assert(r.getLong(1) > 0L)
  }

  test("mrr eval: ranks consistent with recall@5") {
    val rows = VectorOps.mrrEval(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (rank, rr) = (r.getLong(2), r.getLong(3))
      if (rank == -1L) assert(rr == 0L)
      else {
        assert(rank >= 1 && rank <= 5)
        assert(rr == 1000000L / rank)
      }
    }
    // a query whose truth-top1 is found at rank 1 contributes full rr
    assert(rows.exists(_.getLong(2) == 1L),
      "ADC should find at least one truth top-1 at rank 1")
  }

  test("media dedup: planted mirror accounts for every dup byte") {
    val rows = VectorOps.mediaDedup(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("image/x-stub", "audio/x-stub", "video/x-stub"))
    val total = Tables(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total + (total + 3) / 4)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
      assert(r.getLong(5) <= r.getLong(4))
      assert(r.getLong(6) >= 0L && r.getLong(6) < 1000000L)
    }
  }

  test("knn reciprocity: mutual pairs come in twos") {
    val rows = VectorOps.knnReciprocity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nRecip = rows.map(_.getLong(2)).sum
    assert(nRecip % 2 == 0, "reciprocity is symmetric — count must be even")
    assert(rows.map(_.getLong(1)).sum == 100L, "eval window is fixed at 100")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) <= 1000000L)
    }
  }
}
