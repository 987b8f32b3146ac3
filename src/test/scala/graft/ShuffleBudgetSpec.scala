package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Shuffle budgets, plan-asserted: the scale claims SURVEY §8 makes
  * per operator family ("scan-only", "one combine shuffle") must be
  * visible in the physical plan, and stay true as queries evolve. A
  * regression that sneaks an extra hash exchange into a scan-only
  * projection (or drops a broadcast and shuffles a corpus) fails here,
  * not in a 100 TB postmortem. Budgets count `Exchange
  * hashpartitioning` only — range partitioning for the final
  * presentation ORDER BY and single-partition reads of already-tiny
  * frames are not data-scaled movement. */
class ShuffleBudgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def hashExchanges(df: DataFrame): Int = {
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.treeString
      case p => p.treeString
    }
    "Exchange hashpartitioning".r.findAllIn(plan).length
  }

  /** Every budget assertion fetches its plan through here, so this
    * set records which queries actually received an assertion this
    * run — the completeness test (declared LAST; FunSuite runs tests
    * in declaration order) diffs it against the full surface. The r9
    * version regex-scanned the spec source for quoted q_* tokens,
    * which any mention in a message or exclusion list satisfied. */
  private val budgetedQueries = collection.mutable.Set[String]()

  /** Which of this suite's tests actually EXECUTED (filtered runs —
    * `testOnly … -z` — execute a subset). The completeness test keys
    * its cancel on this explicit signal, not on the accumulator size
    * (ADVICE r12: a size heuristic would also cancel on a genuine
    * regression that stripped budget assertions from most of the
    * surface, masking the gap in full-suite runs). */
  private val ranTests = collection.mutable.Set[String]()

  override def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    ranTests += test.name
    super.withFixture(test)
  }

  private def q(name: String): DataFrame = {
    budgetedQueries += name
    SparkEntry.queries(name)(spark, sf)
  }

  test("scan-only operators plan zero hash exchanges") {
    val scanOnly = Seq(
      "q_scan_filter_project", "q_quality_score", "q_token_count_bpe",
      "q_doc_fingerprint", "q_pii_redact", "q_repetition_filter",
      "q_embedding_quantize", "q_multimodal_binary",
      "q_scalar_math", "q_scalar_conditional", "q_event_sort")
    val offenders = scanOnly.flatMap { name =>
      val n = hashExchanges(q(name))
      if (n > 0) Some(s"$name: $n") else None
    }
    assert(offenders.isEmpty,
      s"scan-only queries with hash exchanges: ${offenders.mkString(", ")}")
  }

  test("combine-aggregate operators stay within one hash shuffle") {
    val oneShuffle = Seq(
      "q_text_stats", "q_exact_dedup", "q_histogram",
      "q_train_test_split", "q_corpus_mix")
    val offenders = oneShuffle.flatMap { name =>
      val n = hashExchanges(q(name))
      if (n > 1) Some(s"$name: $n") else None
    }
    assert(offenders.isEmpty,
      s"single-shuffle queries over budget: ${offenders.mkString(", ")}")
    // exact count_distinct legitimately costs a second (expand)
    // shuffle — the budget documents it rather than hiding it
    assert(hashExchanges(q("q_groupby_agg")) <= 2)
  }

  test("r4 pipeline ops hold their declared shuffle budgets") {
    // normalization dedup: union + canonicalize are scan-side; the
    // only data-scaled movement is one combine shuffle on the hash
    assert(hashExchanges(q("q_dedup_normalized")) <= 1)
    // BPE pair pass: corpus collapses to vocabulary (shuffle 1), pair
    // counts ride a vocabulary-sized shuffle (shuffle 2) — the corpus
    // is never shuffled as pairs
    assert(hashExchanges(q("q_bpe_pair_counts")) <= 2)
    // token rarity: vocabulary shuffle + token join + per-doc agg
    assert(hashExchanges(q("q_token_rarity")) <= 3)
  }

  test("r4 third-wave ops hold their declared shuffle budgets") {
    // chunking is scan + explode — zero data-scaled movement
    assert(hashExchanges(q("q_doc_chunk")) == 0)
    // chunk dedup: the combine shuffle on the hash, plus the second
    // expand shuffle its exact count_distinct(doc_id) costs — same
    // documented trade as q_groupby_agg above
    assert(hashExchanges(q("q_chunk_dedup")) <= 2)
    // key skew: count shuffle + the tiny stats agg's single-partition
    // exchange; never a shuffle of data rows
    assert(hashExchanges(q("q_key_skew")) <= 2)
    // curation pipeline: dedup window + stratum window + final agg —
    // the quality filter must stay on the scan, adding nothing
    assert(hashExchanges(q("q_curation_pipeline")) <= 3)
    // k-means step: assignment is broadcast-side; the only hash
    // exchanges are the assign join-back and the (cluster, dim)
    // combine agg
    assert(hashExchanges(q("q_kmeans_step")) <= 3)
  }

  test("r4 fourth-wave ops hold their declared shapes") {
    // bigram LM: two vocabulary count shuffles + two join-backs on
    // those vocabularies + the per-doc agg
    assert(hashExchanges(q("q_bigram_lm")) <= 5)
    // pagerank: per iteration one edge join + one combine sum; three
    // iterations over the minhash candidate graph
    assert(hashExchanges(q("q_dedup_pagerank")) <= 12)
    // chunk BM25's global top-10 must be TakeOrderedAndProject — a
    // per-partition top-k + merge — never a single-partition sort
    val df = q("q_chunk_bm25")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"chunk BM25 lost its distributed top-k:\n$plan")
  }

  test("r5 fifth-wave ops hold their declared shuffle budgets") {
    for ((name, budget) <- Seq(
      // per-user window + vocabulary pair count + totals + ppm join prep
      "q_event_transitions" -> 4,
      // per-user session window + bucket combine count; the minute
      // spine explode adds NO exchange (the whole point vs sweep-line)
      "q_concurrent_sessions" -> 2,
      // one per-key ordered window, nothing else moves
      "q_ewma_smooth" -> 1,
      // combine count on the uniform span hash + per-doc agg; the
      // join-back rides the count's partitioning
      "q_substring_spans" -> 2,
      // vocab count + distinct presence + n_x + doc-keyed pair
      // self-join + pair combine — all vocabulary- or doc-keyed
      "q_pmi_cooccur" -> 6,
      // the full-outer merge join: one exchange per side, nothing else
      "q_merge_upsert" -> 2,
      // argmin window on (vec, sub) + per-vector code pivot; codebook
      // is broadcast so assignment adds nothing
      "q_product_quantize" -> 2,
      // two triangle joins + degree/wedge combine aggs over the
      // CANDIDATE edge list; the corpus itself never re-shuffles
      "q_triangle_count" -> 6,
      // three LSH-bounded candidate generators (their own band joins)
      // + two full-outer joins over candidate-PAIR frames
      "q_dedup_consensus" -> 12,
      // 3 unrolled frontier-join+distinct rounds over the candidate
      // edge list (the recursive CTE), on top of the band join
      "q_recursive_reach" -> 14,
      // ADC: codes window + (qid, vec) combine sum + per-query rank;
      // the distance table is broadcast, never shuffled
      "q_ann_pq_search" -> 4,
      // exact-truth rank window + the ADC pipeline + the tiny
      // (queries x 5) recall join/agg
      "q_pq_recall" -> 8,
      // assignment is broadcast-side; doc join on the shared id +
      // (cluster, token) combine + per-cluster rank window
      "q_cluster_topterms" -> 4,
      // fact shuffles once on (key, salt) — uniform by construction;
      // the replicated dim side and the final ≤5-key agg are the rest
      "q_salted_join" -> 4,
      // the bucket rank-limit window (WindowGroupLimit caps it at
      // buckets·cap rows map-side) + the bounded sorted-collect + the
      // ≤8-key validation count; the boundary frame is broadcast,
      // range assignment is a projection
      "q_sort_boundaries" -> 3,
      // two per-user windows + (user, island) agg + per-user agg, all
      // user-keyed — AQE reuses the partitioning where it can
      "q_interval_union" -> 3,
      // one per-user window for the time origin + the combine agg on
      // the same key
      "q_regr_per_key" -> 2,
      // two rank windows over the same (user, bucket) partitioning
      "q_downsample_minmax" -> 2,
      // signals are scan-side, the battery is one global 1-row agg
      // (single-partition exchange, not data-scaled hash movement)
      "q_filter_battery" -> 0,
      // one column-pruned branch per column: each branch's 2-phase
      // exact distinct moves only THAT column's distinct values (the
      // single-scan Expand alternative moved rows x columns through
      // one shuffle and benched 25 s vs 1.8 s at sf0.1)
      "q_profile_stats" -> 22,
      // variant access is a scan-side projection + filter
      "q_variant_extract" -> 0,
      // the decorrelated lateral: one per-key WindowGroupLimit
      // exchange + the join — never a per-outer-row re-scan
      "q_lateral_topn" -> 2,
      // inherits langId's vocab-build + per-doc argmax exchanges
      // (vocabulary- and doc-keyed); the confusion cells and totals
      // past the argmax add only langs^2-bounded movement
      "q_langid_confusion" -> 7)) {
      val n = hashExchanges(q(name))
      assert(n <= budget, s"$name over budget: $n > $budget")
    }
  }

  test("r6 incremental dedup is delta-bounded, never corpus x corpus") {
    // band join (delta probe + index build sides) + the candidate-pair
    // agg + the per-delta-doc partner counts + the verdict join-back
    // onto the delta base — every exchange past the band join carries
    // LSH-collision-bounded pair rows, and the probe side's delta
    // predicate is pushed below the join (asserted on the plan)
    val df = q("q_dedup_incremental")
    val n = hashExchanges(df)
    assert(n <= 6, s"q_dedup_incremental over budget: $n > 6")
    val plan = df.queryExecution.optimizedPlan.toString
    assert("Join Inner, .*band".r.findFirstIn(plan).isDefined,
      s"band equi-join missing:\n$plan")
    // pushdown proof: one scan-side Filter carries BOTH the shingle
    // precondition and the delta hash rule — that combined conjunct
    // only exists if the delta predicate sank below the band join
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains(">= 3)") && l.contains("% 10) = 0")),
      s"delta predicate not pushed onto the probe scan:\n$plan")
  }

  test("r6 sixth-wave ops hold their declared shuffle budgets") {
    for ((name, budget) <- Seq(
      // the audit primitive's whole claim: five scans, five 1-row
      // combine folds, ZERO data-scaled exchanges
      "q_table_fingerprint" -> 0,
      // (doc, token) combine shuffle + the doc-keyed window
      "q_doc_entropy" -> 2,
      // labels x 64 bounded combine shuffle
      "q_embedding_pool" -> 1,
      // the per-user lead window; the combine agg rides the same
      // partitioning
      "q_time_weighted_avg" -> 1,
      // band join sides + candidate distinct; the report is one
      // 1-row aggregate
      "q_lsh_tuning" -> 4,
      // labeled-frame funnel: two keep-first windows + band join +
      // pair agg + the fate join-back (the counted-branches
      // formulation re-derived the tier chain per count: 12)
      "q_dedup_cascade" -> 9,
      // IVF assignment windows + code argmin windows + the
      // cluster-scoped ADC join/agg — corpus-side movement is codes
      // and assignments, never float vectors
      "q_ann_ivfpq" -> 6,
      // one log-carrying key shuffle — the compaction floor; rn = 1
      // plans as WindowGroupLimit
      "q_cdc_apply" -> 1,
      // the report's uniform span-hash window + the doc-keyed packed
      // coverage combine (r16: coverage travels as a per-doc sorted
      // index array; the (doc, idx) distinct and the exploded-token
      // join are gone)
      "q_span_trim" -> 2,
      // three bounded-broadcast top-3 paths (per-qid rank windows +
      // recall joins over (queries x 3) frames); the corpus scans
      // themselves never shuffle
      "q_matryoshka_recall" -> 7,
      // minute-bucket partials + within-minute window + the
      // event-type agg; the minute offsets frame is bounded
      "q_late_events" -> 3,
      // two <=1024-key bucket-count combines + the 1-row totals +
      // the doc-keyed score agg; weight table broadcasts back
      "q_dsir_weights" -> 6,
      // price-group agg + bucket offsets + in-bucket window + the
      // broadcast join-back onto the scan
      "q_skyline_2d" -> 4,
      // base registers + two max-merge rollups (all sketch-sized:
      // <= groups x 512 rows) + three 2-phase exact distincts that
      // ride along only to exhibit the sketch error
      "q_distinct_rollup" -> 13,
      // (types x 32)-key replicate combine + types-keyed CI agg +
      // the plain-mean agg; the 32x explode never shuffles raw rows
      "q_bootstrap_ci" -> 3,
      // one (type x cohort) combine agg; the side-by-side pivot
      // self-join moves 2 rows per type
      "q_ab_test" -> 2,
      // per-key moments combine + the join-back + ONE per-key sort
      // serving all four windows + the final agg riding the same
      // partitioning
      "q_cusum_changepoint" -> 3,
      // 1-row "now" anchor broadcast + ONE user-keyed combine agg
      "q_decay_counts" -> 2,
      // ONE combine to the <= types x 24 grid; marginal windows span
      // the bounded grid frame only
      "q_event_heatmap" -> 2,
      // ref bigram/unigram vocab combines + the 1-row V + doc-bigram
      // combine + vocab-keyed scoring joins + the doc-keyed agg —
      // every shuffled frame is vocabulary- or doc-keyed
      "q_doc_perplexity" -> 7,
      // scan-side 3x explode + ONE combine to the <= 3 x langs x 10
      // grid + the per-feature agg; marginals ride the grid frame
      "q_feature_mi" -> 3,
      // every corpus-scale exchange keys on the uniform
      // (class, bucket): the counts combine, its re-executed target
      // branch, and the in-bucket rank window; the lang-keyed
      // exchanges (offset window, class totals) move only the
      // <= classes x 128 counts grid
      "q_class_rebalance" -> 5,
      // ONE LSH derivation (checkpointed — six references would
      // otherwise re-run the banding each): band join + distinct +
      // then candidate-graph-sized joins only (und/deg/wedges)
      "q_common_neighbors" -> 8,
      // posexplode scan-side; ONE |dims|-key combine agg
      "q_embedding_stats" -> 1,
      // two <= 64-key index combines (one per layout branch) + the
      // bounded (layouts x files x preds) final agg
      "q_skipping_audit" -> 3,
      // the pinned occurrence frame hides scan+window+cid-combine
      // (run once at construction); visible: the histogram combine on
      // each union branch's lineage. (The other two selection ops
      // aren't plan-assertable here: q_kcenter_select returns
      // driver-assembled picks after its k bounded scans and
      // q_mmr_rerank's greedy steps run over localCheckpointed
      // broadcast-size frames.)
      "q_hubness" -> 1,
      // quality scan -> bucket combine; per-bucket rank window; LSH
      // band join + pair distinct + dup-id distinct; dup join; 10-key
      // final agg (the offsets window is the bounded ~15k-bucket
      // frame, single partition by design)
      "q_quality_vs_dup" -> 9,
      // two-phase rank (r9): (type, bucket) counts + bounded offsets
      // window + (type, bucket) in-window + bounds/final combines —
      // one more exchange than the old per-type window, but every
      // data-scaled one is on the uniform (type, bucket) grain, never
      // a corpus sort serialized onto the ≤5-value type key
      "q_winsorize" -> 5,
      // two two-phase ranks (values, deviations) + two median
      // combines + final combine — same uniform-grain trade as
      // q_winsorize, twice
      "q_mad_outliers" -> 9,
      // two-phase RANGE prefix sums: (type, bucket) partials + the
      // bounded offsets window + in-bucket cum window + the totals
      // combine + final combine; no corpus-sized per-type window
      "q_ks_drift" -> 5,
      // two-phase sequential lag (r9): uniform-grain rank exchanges +
      // the (type, rank-block) carry window + the combine — no
      // corpus sort serialized onto the ≤5-value type key (r16: the
      // ranked frame is pinned, so main+carry share one rank pipeline)
      "q_lag_autocorr" -> 2,
      // two chained two-phase ranks (quantity, price) on uniform
      // (flag, cents-bucket) grains + final combine (r9)
      "q_median_percentile" -> 8,
      // two-phase prefix sum on the uniform 128-hash-bucket grain +
      // the (lang, pack) combine (r9)
      "q_sequence_pack" -> 4,
      // vocab count shuffle + per-lang rank window (combine reuses it)
      "q_gini_token" -> 2,
      // per-user navigation window + (model, touch_type) combine
      "q_attribution" -> 2,
      // per-user trigram window + bounded path-domain combine
      "q_path_trigrams" -> 2,
      // the (lang, source) grid count; marginal windows ride the
      // bounded grid
      "q_chi2_independence" -> 1)) {
      val n = hashExchanges(q(name))
      assert(n <= budget, s"$name over budget: $n > $budget")
    }
  }

  test("r7 seventh-wave ops hold their declared shuffle budgets") {
    for ((name, budget) <- Seq(
      // gram → min-slice combine collapses the corpus to the type
      // vocabulary; the 32-row cumulative is not data-scaled
      "q_vocab_saturation" -> 2,
      // distinct (gram, doc) + first-seer combine + gram-keyed join
      // back + per-doc combine — all on the uniform gram/doc hashes
      "q_ngram_novelty" -> 4,
      // the band-sig combine the dedup family already pays + the
      // bucket-count agg + the ≤ bands×64-row bin agg
      "q_lsh_bucket_skew" -> 3,
      // distinct-name combine; the block self-join rides a broadcast
      // of the vocabulary-bounded name frame
      "q_fuzzy_blocked_join" -> 2,
      // per-key count combine + ≤64-row bin agg; the audited join
      // itself never executes
      "q_join_size_audit" -> 2,
      // posexplode is scan-side; dim-centroid combine broadcasts
      // back; per-vector distance combine; top-20 is
      // TakeOrderedAndProject, not a sort shuffle
      "q_embedding_outliers" -> 3,
      // ONE user-keyed basket combine (ReusedExchange feeds both the
      // pair and support branches), pairs generated array-side (no
      // self-join), + pair and support combines; the optimizer plans
      // n_users as its own column-pruned two-phase distinct over the
      // scan (cheaper than reusing the basket agg) — budget covers it
      "q_event_lift" -> 5,
      // the bounded (type, hour) grid with exact two-phase distinct
      // users + the per-type rollup
      "q_kanon_audit" -> 3,
      // ONE gram-keyed source-set combine (reused by both branches),
      // pairs array-side (no self-join), + size and pair combines;
      // +1 for the planner re-deriving one branch instead of reusing
      "q_source_overlap" -> 4,
      // vocab count combine + per-lang rank window + regression agg
      // over vocab rows
      "q_zipf_fit" -> 3,
      // one per-user window exchange + the (user, session) combine;
      // exact distinct-type count costs the documented expand pass
      "q_session_features" -> 3,
      // the (type, minute) grid combine; peak window + rollup ride
      // the bounded grid
      "q_burst_detect" -> 2,
      // one combine to the bounded (lang, source) grid; the share
      // window rides the grid
      "q_write_plan" -> 1,
      // the shared per-user window exchange + the bounded |types|²
      // transition combine + the from_type re-key of that bounded
      // matrix for the per-state window/agg (not data-scaled)
      "q_transition_entropy" -> 3,
      // hashed-gram (source, gram) combine + the bounded per-source
      // rollup
      "q_repeat_ratio" -> 2)) {
      val n = hashExchanges(q(name))
      assert(n <= budget, s"$name over budget: $n > $budget")
    }
  }

  test("r8 eighth-wave ops hold their declared shuffle budgets") {
    for ((name, budget) <- Seq(
      // ONE (user, type) lag-window exchange + the two-phase
      // SELECTION order statistics' grid exchanges (counts combine,
      // bounded offsets window, selected-buckets-only rank) + the
      // 5-row stats combine and its pct join — r9: no corpus sort on
      // the ≤5-value type key; only target buckets ever sort
      "q_interarrival" -> 8,
      // base + delta combine aggs; the full-outer merge reuses their
      // partitioning (+1 headroom for an AQE broadcast at tiny SF)
      "q_delta_agg" -> 3,
      // uniqueness combine + the anti join's two sides; per-table
      // conditional aggs are 1-row single-partition reductions, not
      // hash movement
      "q_dq_rules" -> 4,
      // content-hash window + per-source combine
      "q_dup_inflation" -> 2,
      // (lang, gram) vocabulary combine + bounded per-lang rollup
      "q_hapax_ratio" -> 2,
      // the same vocabulary combine + ONE lang exchange shared by the
      // rank window, running sum, total window, and final agg
      "q_vocab_coverage" -> 2,
      // per-vector sum is scan-side; ONE dim combine; the share
      // window rides the bounded |dims| grid
      "q_pca_power" -> 1,
      // (label, dim) + (dim) combines over one scan; broadcast
      // centroid join; bounded per-label rollup
      "q_centroid_drift" -> 3,
      // ONE per-customer combine; corpus max day is a 1-row reduce
      // broadcast back; scoring is scan-side
      "q_rfm_segments" -> 1,
      // (type, user) mass combine + ONE type exchange for the
      // total/rank windows and rollup
      "q_whale_share" -> 2,
      // head hash scan-side + ONE combine on it; the exact distinct
      // source count costs the documented expand pass
      "q_prefix_cluster" -> 2,
      // everything scan-side; ONE combine to the bounded band grid
      "q_norm_bands" -> 1,
      // per-user window exchange + per-user lag combine riding it +
      // the bounded band combine
      "q_conversion_lag" -> 3,
      // ONE combine agg on the bounded hour grid
      "q_slo_burn" -> 1,
      // (source, lang) grid + per-source stats (expand pass for the
      // exact distinct) + the grid rollup; broadcast join adds none
      "q_dataset_card" -> 4,
      // fact-fact join (two sides) + the two-phase SELECTION order
      // statistics' grid exchanges + the 5-row stats combine (r9: no
      // fact-sized window on the 5-value priority key; only the
      // p50/p90-holding buckets sort)
      "q_ship_lag" -> 5,
      // ONE combine to the bounded (type, band) grid; the midpoint
      // is a 1-row reduce broadcast; PSI rollup rides grid rows
      "q_psi_drift" -> 2,
      // digit grid combine; shares ride grid windows
      "q_benford_audit" -> 2,
      // checkpointed candidate frame + symmetric degree combine +
      // two wedge/closure joins + the corner-explode combine
      "q_clustering_coeff" -> 9,
      // ONE 1-row reduce; sizing is pure arithmetic
      "q_ann_plan" -> 0,
      // candidate join (two sides on the uniform hash-derived id) +
      // the anchor window
      "q_negative_sampling" -> 3,
      // eval harness over the FIXED 500-doc window: gram distinct +
      // gh-keyed truth join + pair/size combines + the band pair
      // join + k-threshold agg — every frame window-bounded
      "q_lsh_recall" -> 12,
      // the shared band pair join + pair combine + the <= 3-row
      // split rollup; split sizes broadcast
      "q_split_leakage" -> 7,
      // two distinct combines on (user, day)-sized frames + the two
      // day-grid count combines + the grid-sized dau×wau join
      "q_dau_stickiness" -> 6,
      // one per-user sort window + the |types|² transition combine;
      // iteration mass vectors are pinned (r16), so the final plan
      // carries only the last grid join + combine
      "q_markov_stationary" -> 3,
      // ONE full-outer hash join on the key (two sides) + the
      // priority × class grid combine
      "q_snapshot_diff" -> 3,
      // broadcast-centroid assignment + per-vec argmax window +
      // ONE combine to the ≤ nlist grid; shares ride the grid
      "q_ivf_balance" -> 2,
      // broadcast-codebook assignment + per-(vec, sub) argmin
      // window + ONE combine to the m-row grid
      "q_pq_residual" -> 2,
      // fixed-window broadcast cross + per-query top-1 window +
      // the 100-row self-join + label combine
      "q_knn_reciprocity" -> 4,
      // the jaccard-est band join (two sides) + the pair distinct;
      // packing and popcount agreement are scan/pair-side
      "q_bbit_minhash" -> 4,
      // the per-doc NLL frame is pinned (r16), so the plan carries
      // only the two-phase rank's uniform (lang, bucket) exchanges +
      // the grid rollup (r9: no corpus-sized per-lang window)
      "q_ccnet_buckets" -> 5,
      // token counting scan-side; ONE combine to the |langs| grid
      "q_tokenizer_fertility" -> 1,
      // status filter + day arithmetic on the scan; 1-row anchor
      // broadcast; ONE combine to the priority × band grid
      "q_order_backlog" -> 1,
      // per candidate pair: two 2-phase distincts + the value join
      // (8 fixed pairs; each frame key-cardinality-bounded)
      "q_fk_discovery" -> 26,
      // 1-row span anchor broadcast + ONE combine to the
      // (type, hour-of-day) grid
      "q_seasonal_baseline" -> 1,
      // ONE content-hash combine + the hash join-back + the
      // |sources|² grid rollup
      "q_dedup_survivorship" -> 4,
      // broadcast-centroid cross + per-vec rank window + the
      // ≤ 21-band grid combine; share rides the grid
      "q_assign_margin" -> 2,
      // register combine + distinct frame + pair-side exact distinct;
      // the register CTE re-derives per reference (no CSE) but every
      // extra exchange moves register/distinct-frame rows only
      "q_hll_set_algebra" -> 14,
      // tie-collapse combine + ONE per-flag window exchange + grid
      "q_weighted_median" -> 2,
      // three per-user combines chained by user-keyed joins, one
      // final 1-row reduce — q_funnel's budget with window filters
      "q_funnel_windowed" -> 8,
      // the (flag, hash) distinct frame is pinned (r16); the ALL
      // re-distinct + the flag rank exchange (WindowGroupLimit) +
      // two ≤ 4-row grid combines remain
      "q_bottomk_sketch" -> 4,
      // signup combine + rank-window exchange + band grid combine
      "q_activation_time" -> 4,
      // signup/last-day combines + user join + cohort grid; anchor
      // is a 1-row broadcast
      "q_churn_cohorts" -> 5,
      // parse + plant + explode scan-side; ONE combine to the |keys|
      // grid; the 1-row total broadcast
      "q_props_schema" -> 2,
      // constant 36× pair explode scan-side; ONE combine to the grid
      "q_dim_covariance" -> 1,
      // two sketch combines + the 4×1024 grid join + 4-row reduce +
      // the exact join (two sides) kept as the error column
      "q_cm_join_estimate" -> 8,
      // signup/last-day combines + user join; offset fanout on the
      // user frame; ONE day-offset grid combine; 1-row broadcast
      "q_survival_curve" -> 6,
      // the simhash band join (both sides recompute the per-doc
      // fold) + pair distinct + the ≤ 33-row histogram combine
      "q_simhash_hamming" -> 8,
      // ten independent 1-row scan reduces; union + window ride the
      // ≤ 10-row grid
      "q_freshness_audit" -> 0,
      // fixed 64× posexplode scan-side + ONE dim combine + 1-row
      // reduce
      "q_effective_dims" -> 1,
      // broadcast truth block + the ADC assignment windows + the
      // (queries × 5)-row rank join
      "q_mrr_eval" -> 6,
      // payload hashing scan-side; ONE content-hash combine + the
      // ≤ 3-row mime rollup
      "q_media_dedup" -> 2)) {
      val n = hashExchanges(q(name))
      assert(n <= budget, s"$name over budget: $n > $budget")
    }
  }

  /** r9 (VERDICT item 3): the remaining 93 queries' ceilings, measured
    * under this spec's exact environment and grouped by shape. With
    * these, EVERY SparkEntry key has a declared exchange budget — the
    * completeness test below enforces it against the map. */
  private val r9Budgets: Seq[(String, Int)] = Seq(
    // scan-side projections/filters, broadcast-only joins (dims or
    // bounded probe sets), driver-bounded greedy selection
    // (kcenter's 8 tuples), and TakeOrderedAndProject top-k — zero
    // data-scaled hash movement at gate plans
    "q_bloom_semi_join" -> 0, "q_correlated_exists" -> 0,
    "q_frame_sample" -> 0, "q_hash_join_inner" -> 0, "q_join_anti" -> 0,
    "q_join_right_outer" -> 0, "q_join_semi" -> 0, "q_json_extract" -> 0,
    "q_kcenter_select" -> 0, "q_key_synthesis" -> 0, "q_map_pivot" -> 0,
    "q_mmr_rerank" -> 0, "q_multimodal_project" -> 0, "q_not_in_null" -> 0,
    "q_scalar_array" -> 0, "q_scalar_datetime" -> 0, "q_scalar_map" -> 0,
    "q_scalar_string" -> 0, "q_scalar_subquery" -> 0, "q_sort_limit" -> 0,
    "q_string_transforms" -> 0, "q_subquery_in" -> 0, "q_unpivot" -> 0,
    "q_weighted_sample" -> 0,
    // ONE data-scaled exchange: a combine agg, a keyed window, a
    // shuffle join whose second side broadcasts, a set-op's
    // distinct/tagged combine, or the LSH band join (its pair agg
    // rides the band partitioning)
    "q_agg_stats" -> 1, "q_anomaly_zscore" -> 1, "q_approx_percentile" -> 1,
    "q_asof_merge_join" -> 1, "q_asof_prev_event" -> 1,
    "q_compat_datadriven_window" -> 1, "q_cube" -> 1,
    "q_dedup_clusters" -> 1, "q_dedup_corpus" -> 1,
    "q_demux_window_agg_multi" -> 1, "q_demux_window_avg" -> 1,
    "q_demux_window_sliding" -> 1, "q_distinct" -> 1,
    "q_embedding_neardup" -> 1, "q_except" -> 1, "q_except_all" -> 1,
    "q_grouping_sets" -> 1, "q_intersect" -> 1, "q_intersect_all" -> 1,
    "q_join_left_outer" -> 1, "q_join_multiway" -> 1, "q_knn_classify" -> 1,
    "q_minhash_containment" -> 1, "q_minhash_dedup" -> 1,
    "q_minhash_jaccard_est" -> 1, "q_ngram_jaccard" -> 1,
    "q_parse_errors" -> 1, "q_range_join" -> 1, "q_rolling_stats" -> 1,
    "q_rollup" -> 1, "q_safe_cast_avg" -> 1, "q_scd2_intervals" -> 1,
    "q_sessionize" -> 1, "q_text_langdist" -> 1, "q_topk_per_group" -> 1,
    "q_union_all" -> 1, "q_window_analytic" -> 1,
    "q_window_distribution" -> 1, "q_window_first_meta" -> 1,
    "q_window_navigation" -> 1, "q_window_range_frame" -> 1,
    "q_window_rank" -> 1, "q_zorder_layout" -> 1,
    // two exchanges: partial + final (salted agg), spine + join
    // (gap_fill), two-sided full outer, dedup window + band join
    // (simhash), bucket offsets + in-bucket (token_budget's
    // two-phase prefix), count + rank (vocab_topk), distinct +
    // window (window_count_distinct), pivot/stratified/string_agg's
    // combine pairs
    "q_gap_fill" -> 2, "q_join_full_outer" -> 2, "q_pivot" -> 2,
    "q_salted_agg" -> 2, "q_simhash_dedup" -> 2,
    "q_stratified_sample" -> 2, "q_string_agg" -> 2, "q_token_budget" -> 2,
    "q_vocab_topk" -> 2, "q_window_count_distinct" -> 2,
    // three: a pairs/label derivation + two stacked combines
    // (cluster_stats over components, degree over the band join,
    // contamination's split joins, SRP's bucketed recall harness)
    "q_cluster_stats" -> 3, "q_contamination" -> 3, "q_dedup_degree" -> 3,
    "q_srp_recall" -> 3,
    // vocabulary pipelines and funnels: sketch/vocab combines +
    // doc- or user-keyed joins, each frame vocabulary- or key-bounded
    "q_countmin_freq" -> 4, "q_funnel" -> 4, "q_lang_id" -> 4,
    "q_retention_cohort" -> 4, "q_semantic_dedup" -> 4,
    "q_tfidf_topterms" -> 4,
    // ANN family: coarse-assignment windows + cluster-scoped ADC
    // joins/aggs — movement is codes and assignments, never raw
    // vectors; recall adds the exact-truth rank path per variant
    "q_ann_ivf" -> 5, "q_ann_ivf_multiprobe" -> 6, "q_ann_recall" -> 13,
    // per-column 2-phase distinct branches (the q_profile_stats
    // trade, narrower column set)
    "q_approx_distinct" -> 6,
    // two-snapshot vocabulary compare / three-list fusion: per-side
    // vocab combines + rank windows + the bounded merge
    "q_corpus_drift" -> 7, "q_rank_fusion" -> 7)

  test("r9: the remaining surface holds its measured budgets") {
    for ((name, budget) <- r9Budgets) {
      val n = hashExchanges(q(name))
      assert(n <= budget, s"$name over budget: $n > $budget")
    }
  }

  test("broadcast-side similarity search never shuffles the corpus scan") {
    // brute-force top-k: the only hash exchange allowed is the final
    // per-query ranking of the tiny (queries x k) candidate frame
    assert(hashExchanges(q("q_cosine_topk")) <= 1)
    // BM25: stats broadcast back against the scan - zero hash exchanges
    assert(hashExchanges(q("q_bm25_score")) == 0)
  }

  test("every SparkEntry query received a budget assertion") {
    // budgetedQueries accumulates from the q() calls the preceding
    // tests made — a query only counts as covered if its plan was
    // actually fetched for an assertion, not if its name merely
    // appears somewhere in this file.
    //
    // A FILTERED run (sbt testOnly … -z, or an early abort) executes
    // only some of those tests, so the accumulator is legitimately
    // partial. The cancel keys on the EXPLICIT execution record
    // (withFixture marks every test that ran): if any sibling test
    // was skipped, this is a filtered run — cancel. If every sibling
    // EXECUTED, the accumulator is authoritative, and a stripped-out
    // budget assertion FAILS below instead of hiding behind a size
    // heuristic (ADVICE r12 closed that mask).
    val siblings = testNames.toSet - "every SparkEntry query received a budget assertion"
    val notRun = siblings -- ranTests
    if (notRun.nonEmpty)
      cancel(s"filtered run: ${notRun.size} of ${siblings.size} suite " +
        s"tests did not execute (e.g. ${notRun.take(2).mkString("; ")}) — " +
        "completeness is only meaningful after the full suite")
    val missing = SparkEntry.queries.keySet -- budgetedQueries
    assert(missing.isEmpty,
      s"queries with no budget assertion: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
