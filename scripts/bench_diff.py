#!/usr/bin/env python3
"""Mechanical per-query regression table between two full-bench
artifacts (VERDICT r8 item 7).

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [threshold]

Reads the `queries` map (name -> median seconds) from each artifact,
prints every query whose new/old ratio exceeds the threshold (default
1.3) in either direction, plus added/removed keys and the subset/total
movements. Exit code 0 always — the table is evidence for the closing
chain, not a gate; deliberate trades (e.g. a scale-safety plan swap
that costs locally) belong in the committed output with a note.
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    qo, qn = old.get("queries", {}), new.get("queries", {})

    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    both = sorted(set(qo) & set(qn))

    slower = [(k, qo[k], qn[k], qn[k] / qo[k]) for k in both
              if qo[k] > 0 and qn[k] / qo[k] > thr]
    faster = [(k, qo[k], qn[k], qn[k] / qo[k]) for k in both
              if qn[k] > 0 and qo[k] / qn[k] > thr]

    print(f"# bench diff: {old_path} -> {new_path} (threshold {thr}x)")
    # Load-fingerprint header (VERDICT r11 #6): a run started on a busy
    # box produces spurious movers — r11's diff carried 15 >1.3x movers
    # that were pure box variance and needed manual adjudication. Print
    # both runs' env fingerprints so every diff records its measurement
    # conditions, and flag the diff as suspect when the starting loads
    # are high or not comparable (the bench itself drives load_end up,
    # so load_start is the honest before-work signal).
    eo, en = old.get("env", {}), new.get("env", {})
    for tag, e in (("old", eo), ("new", en)):
        if e:
            print(f"# {tag} env: load_start={e.get('load_start')} "
                  f"load_end={e.get('load_end')} jvms_start="
                  f"{e.get('jvms_start')} cpus={e.get('cpus')}")
    lo, ln = eo.get("load_start"), en.get("load_start")
    if lo is not None and ln is not None:
        if max(lo, ln) > 2.0 or abs(lo - ln) > 2.0:
            print(f"# WARNING: load fingerprints not comparable "
                  f"(old {lo} vs new {ln}) — re-measure on a quiet box "
                  f"before adjudicating movers")
    if eo.get("jvms_start") != en.get("jvms_start"):
        print(f"# WARNING: background JVM count differs "
              f"(old {eo.get('jvms_start')} vs new {en.get('jvms_start')})")
    for label, rows in (("SLOWER", sorted(slower, key=lambda r: -r[3])),
                        ("FASTER", sorted(faster, key=lambda r: r[3]))):
        print(f"\n## {label} than {thr}x ({len(rows)})")
        for k, o, n, r in rows:
            print(f"{k:32s} {o:8.3f}s -> {n:8.3f}s  ({r:.2f}x)")
    if added:
        print(f"\n## added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"\n## removed ({len(removed)}): {', '.join(removed)}")

    to = sum(qo[k] for k in both)
    tn = sum(qn[k] for k in both)
    print(f"\n## common-key totals: {to:.1f}s -> {tn:.1f}s "
          f"({tn / to:.2f}x) over {len(both)} queries")
    for art, tag in ((old, "old"), (new, "new")):
        if "baseline_subset" in art:
            print(f"{tag} baseline_subset: {art['baseline_subset']}")


if __name__ == "__main__":
    main()
