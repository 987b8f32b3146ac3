#!/usr/bin/env python3
"""Consolidated sf10 gate (VERDICT r12 #5): re-run all three sf10
pillars — relational (GATE_sf10_rel_r10), vector (GATE_sf10_vec_r11),
event/dedup incl. the q_common_neighbors bounded oracle
(GATE_sf10_evt_r12) — in ONE invocation on current code, so the scale
evidence stops being a mix of vintages. Applies the r12 disk-budget
lesson up front (clear /tmp verify dumps BEFORE the 562 M-row runs)
and deletes each pillar's Spark dump as soon as its oracle check
passes, keeping headroom for the common-neighbors staging.

Usage:
  python3 scripts/gate_sf10_all.py [out.txt]        # default GATE_sf10_r13.txt

Pillar recipes are verbatim the per-round gate files':
  rel  : 30 keys @ target/testdata/sf10, SPARK_DRIVER_MEM=48g;
         check.py THREADS=8 MEM=24GB TEMP=20GiB
  vec  : 36 keys @ sf10, same budgets
  evt  : 16 keys @ sf10 with the fingerprint tier carrying the
         3 x 10^8-row outputs (checked WITHOUT materialize — forcing
         the CTE rewrite spools 562 M rows to temp and blows the cap);
         q_recursive_reach split into its own check WITH
         GRAFT_MATERIALIZE=1 (its bucket-BFS oracle inlines ~30 CTE
         copies otherwise); then the dedup-cascade second stage on the
         deduped corpora (sf10dd: q_semantic_dedup; sf10ddoc:
         q_dedup_clusters,q_cluster_stats,q_triangle_count)
  cn   : q_common_neighbors @ sf10 -> scripts/gate_cn_sf10.py
         (full 562 M-row degree-surface fingerprint + ~20 k-pair exact
         wedge sample), THREADS=20 MEM=36GB TEMP=45GiB — LAST, it
         needs the disk.
"""
import glob
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "target/testdata/sf10")
SF10DD = os.path.join(REPO, "target/testdata/sf10dd")
SF10DDOC = os.path.join(REPO, "target/testdata/sf10ddoc")
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "GATE_sf10_r13.txt")

REL_KEYS = ("q_approx_percentile,q_asof_merge_join,q_asof_prev_event,"
            "q_bloom_semi_join,q_groupby_agg,q_hash_join_inner,q_join_anti,"
            "q_join_full_outer,q_join_left_outer,q_join_multiway,"
            "q_join_right_outer,q_join_semi,q_lag_autocorr,q_mad_outliers,"
            "q_median_percentile,q_range_join,q_rolling_stats,q_salted_agg,"
            "q_salted_join,q_ship_lag,q_sort_boundaries,q_topk_per_group,"
            "q_weighted_median,q_window_analytic,q_window_count_distinct,"
            "q_window_distribution,q_window_navigation,q_window_range_frame,"
            "q_window_rank,q_winsorize")
VEC_KEYS = ("q_ann_ivf,q_ann_ivf_multiprobe,q_ann_ivfpq,q_ann_plan,"
            "q_ann_pq_search,q_ann_recall,q_assign_margin,q_centroid_drift,"
            "q_cosine_topk,q_dim_covariance,q_effective_dims,"
            "q_embedding_neardup,q_embedding_outliers,q_embedding_pool,"
            "q_embedding_quantize,q_embedding_stats,q_frame_sample,q_hubness,"
            "q_ivf_balance,q_kcenter_select,q_kmeans_step,q_knn_classify,"
            "q_knn_reciprocity,q_matryoshka_recall,q_media_dedup,q_mmr_rerank,"
            "q_mrr_eval,q_multimodal_binary,q_multimodal_project,q_norm_bands,"
            "q_pca_power,q_pq_recall,q_pq_residual,q_product_quantize,"
            "q_rank_fusion,q_srp_recall")
EVT_KEYS = ("q_ccnet_buckets,q_chunk_dedup,q_class_rebalance,q_contamination,"
            "q_dedup_degree,q_ks_drift,q_late_events,q_lsh_recall,"
            "q_minhash_dedup,q_ngram_jaccard,q_recursive_reach,"
            "q_sequence_pack,q_simhash_dedup,q_skyline_2d,q_span_trim,"
            "q_token_budget")
# q_lag_autocorr/q_mad_outliers/q_winsorize ride the rel pillar (same
# keys appear in both historical gates — run once here).


def log(msg):
    line = msg if msg.endswith("\n") else msg + "\n"
    sys.stdout.write(line)
    sys.stdout.flush()
    with open(OUT, "a") as f:
        f.write(line)


def run(cmd, env=None, cwd=REPO):
    e = dict(os.environ)
    if env:
        e.update(env)
    log(f"$ {' '.join(f'{k}={v}' for k, v in (env or {}).items())} {cmd}")
    t0 = time.time()
    p = subprocess.run(cmd, shell=True, cwd=cwd, env=e,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    dt = time.time() - t0
    tail = "\n".join(p.stdout.strip().splitlines()[-40:])
    log(tail)
    log(f"[exit={p.returncode}, {dt:.0f}s]")
    return p.returncode, p.stdout


def free_gb():
    st = os.statvfs("/tmp")
    return st.f_bavail * st.f_frsize / 2**30


def clean_tmp():
    for pat in ("/tmp/v_*", "/tmp/v1", "/tmp/sf10full*", "/tmp/gsf10_*"):
        for p in glob.glob(pat):
            shutil.rmtree(p, ignore_errors=True)
    log(f"# /tmp cleaned; {free_gb():.0f} GiB free")


def prepare_corpora():
    """Build the gate's inputs if absent (target/ is wiped between
    rounds, and the r11 derivation of the deduped corpora was never
    recorded — it is now THIS function).

    sf10        : scripts/make_sfN.py 100 (100 shifted replicas of
                  /root/testdata/sf0.1 — payloads identical, keys
                  offset, per the probe-corpus design).
    sf10dd/ddoc : the dedup-cascade SECOND-stage inputs — the exact-
                  dedup survivor frame of sf10 (one row per distinct
                  payload, min key wins; on the replica construction
                  that is copy 0, so survivor counts are 20 k vectors /
                  50 k docs). sf10dd dedups embeddings, sf10ddoc dedups
                  documents; every other table is symlinked from sf10
                  so Verify resolves the full schema either way.
    """
    import duckdb
    if not os.path.exists(os.path.join(SF10, "embeddings.parquet")):
        log("# sf10 corpus absent — building via make_sfN.py 100")
        rc, _ = run("python3 scripts/make_sfN.py 100 target/testdata/sf10")
        if rc != 0:
            log("FATAL: sf10 generation failed")
            sys.exit(1)
    con = duckdb.connect()
    dedup = {
        SF10DD: ("embeddings",
                 "SELECT min(vec_id) AS vec_id, embedding, label "
                 "FROM read_parquet('{src}') GROUP BY embedding, label "
                 "ORDER BY 1"),
        SF10DDOC: ("documents",
                   "SELECT min(doc_id) AS doc_id, text, lang, source, "
                   "n_chars FROM read_parquet('{src}') "
                   "GROUP BY text, lang, source, n_chars ORDER BY 1"),
    }
    for out_dir, (table, sql) in dedup.items():
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        os.makedirs(out_dir, exist_ok=True)
        src = os.path.join(SF10, f"{table}.parquet")
        con.execute(f"COPY ({sql.format(src=src)}) TO '{dst}' "
                    "(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        log(f"# {out_dir}: {table} exact-dedup survivors = {n} rows")
        for f in os.listdir(SF10):
            if f != f"{table}.parquet" and \
                    not os.path.exists(os.path.join(out_dir, f)):
                os.symlink(os.path.join(SF10, f), os.path.join(out_dir, f))
    con.close()


def verify(keys, sf_dir, dump):
    # resume-friendly: a dump that already holds every requested query
    # (a prior invocation's Spark side succeeded but its CHECK failed)
    # is reused — the expensive 562 M-row Verify never re-runs for an
    # oracle-side budget mistake
    want = set(keys.split(","))
    if os.path.exists(os.path.join(dump, "oracle_sql.json")) and \
            want <= set(os.listdir(dump)):
        log(f"# reusing existing Spark dump {dump} ({len(want)} queries present)")
        return
    shutil.rmtree(dump, ignore_errors=True)
    rc, _ = run(f'sbt -batch "runMain graft.Verify {sf_dir} {dump}"',
                env={"SPARK_DRIVER_MEM": "48g", "SPARK_GRAFT_ONLY": keys})
    if rc != 0:
        log(f"FATAL: Verify failed for {dump}")
        sys.exit(1)


def check(dump, sf_dir, env):
    rc, out = run(f"python3 scripts/check.py {dump} {os.path.abspath(sf_dir)}",
                  env=env)
    ok = rc == 0 and " 0 fail" in out
    if not ok:
        log(f"FATAL: oracle check failed for {dump}")
        sys.exit(1)
    shutil.rmtree(dump, ignore_errors=True)  # free disk for later pillars


def main():
    # GATE_FROM=evt resumes after an oracle-side failure without
    # re-running already-green pillars (their results stay in OUT,
    # which is appended to instead of truncated)
    stages = ["rel", "vec", "evt", "cn"]
    start = os.environ.get("GATE_FROM", "rel")
    def enabled(s):
        return stages.index(s) >= stages.index(start)
    if start == "rel":
        with open(OUT, "w") as f:
            f.write(f"# GATE_sf10_r13 — consolidated sf10 gate "
                    f"({time.strftime('%Y-%m-%d %H:%M')}, repo @ "
                    f"{subprocess.check_output(['git', 'rev-parse', '--short', 'HEAD'], cwd=REPO, text=True).strip()})\n"
                    "# All three pillars + the common-neighbors bounded oracle in one\n"
                    "# invocation on r13-final code (scripts/gate_sf10_all.py).\n")
        clean_tmp()
    else:
        log(f"\n# RESUME from stage '{start}' "
            f"({time.strftime('%Y-%m-%d %H:%M')}) — earlier pillars stand")
    prepare_corpora()
    duck = {"GRAFT_DUCKDB_THREADS": "8", "GRAFT_DUCKDB_MEM": "24GB",
            "GRAFT_DUCKDB_TEMP": "20GiB"}
    # the 10^8-row fingerprint-tier oracles need the streaming path —
    # GRAFT_MATERIALIZE would spool the full 562 M-row CTE to temp and
    # blow the cap (observed: 40 GiB cap hit); ONLY the bucket-BFS
    # reach oracle needs the materialize rewrite, so it checks apart
    duck_big = {"GRAFT_DUCKDB_THREADS": "20", "GRAFT_DUCKDB_MEM": "36GB",
                "GRAFT_DUCKDB_TEMP": "40GiB"}
    duck_mat = dict(duck, GRAFT_MATERIALIZE="1")

    if enabled("rel"):
        log("\n## Pillar 1/4 — relational (30 keys, 60 M-row lineitem)")
        verify(REL_KEYS, SF10, "/tmp/gsf10_rel")
        check("/tmp/gsf10_rel", SF10, duck)

    if enabled("vec"):
        log("\n## Pillar 2/4 — vector/ANN/multimodal (36 keys, 200 k embeddings)")
        verify(VEC_KEYS, SF10, "/tmp/gsf10_vec")
        check("/tmp/gsf10_vec", SF10, duck)

    log("\n## Pillar 3/4 — event/dedup (16+1+3 keys, 10 M events / 500 k docs)")
    verify(EVT_KEYS, SF10, "/tmp/gsf10_evt")
    # split the reach query into its own dump: it needs the
    # materialize rewrite the fingerprint-tier giants cannot afford
    rr = "/tmp/gsf10_evt_rr"
    if not os.path.exists(os.path.join(rr, "q_recursive_reach")):
        os.makedirs(rr, exist_ok=True)
        shutil.copy(os.path.join("/tmp/gsf10_evt", "oracle_sql.json"),
                    os.path.join(rr, "oracle_sql.json"))
        shutil.move(os.path.join("/tmp/gsf10_evt", "q_recursive_reach"),
                    os.path.join(rr, "q_recursive_reach"))
    check("/tmp/gsf10_evt", SF10, duck_big)
    check(rr, SF10, duck_mat)
    log("# dedup-cascade second stage (deduped corpora)")
    verify("q_semantic_dedup", SF10DD, "/tmp/gsf10_dd")
    check("/tmp/gsf10_dd", SF10DD, duck)
    verify("q_dedup_clusters,q_cluster_stats,q_triangle_count",
           SF10DDOC, "/tmp/gsf10_ddoc")
    check("/tmp/gsf10_ddoc", SF10DDOC, duck)

    log(f"\n## Pillar 4/4 — q_common_neighbors bounded oracle "
        f"({free_gb():.0f} GiB free before staging)")
    verify("q_common_neighbors", SF10, "/tmp/gsf10_cn")
    rc, out = run("python3 scripts/gate_cn_sf10.py /tmp/gsf10_cn/q_common_neighbors "
                  f"{SF10} /tmp/gsf10_cn_work",
                  env={"GRAFT_DUCKDB_THREADS": "20", "GRAFT_DUCKDB_MEM": "36GB",
                       "GRAFT_DUCKDB_TEMP": "45GiB"})
    if rc != 0:
        log("FATAL: common-neighbors gate failed")
        sys.exit(1)
    shutil.rmtree("/tmp/gsf10_cn", ignore_errors=True)
    shutil.rmtree("/tmp/gsf10_cn_work", ignore_errors=True)

    log("\n# ALL PILLARS GREEN — rel 30/30, vec 36/36, evt 16/16 raw + "
        "4/4 deduped-cascade + cn fingerprint/sample — on one code state.")


if __name__ == "__main__":
    main()
