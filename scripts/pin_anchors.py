#!/usr/bin/env python3
"""Drift-anchor selection (round-14 verdict #1): pick 30-40 anchors
STRATIFIED across the shapes that dominate the runtime, from a fresh
full bench run's bench_queries.json, and emit the Scala map literal for
Bench.scala's anchorClose.

Selection rules per the verdict: spread <= 1.15 (the reported min
reproduced), runtime >= 0.25 s (timing signal above scheduler noise),
top-4 per family (PER_FAMILY, matching Bench.scala's anchor comment) so
no shape class dominates the median; further eligible anchors in a
family are deliberately dropped in favor of breadth across families.

Usage: python3 scripts/pin_anchors.py [bench_queries.json]
       python3 scripts/pin_anchors.py --check [bench_history.jsonl]

--check (round-16 verdict #6) makes the re-pin policy EXECUTABLE — the
two-strike rule the r16 maiden firing was resolved by judgment: scan the
history's FULL runs (drift_gap computed, i.e. not filtered), and
  - if the latest full run's |drift_gap| <= 3%: all clear, exit 0;
  - if exactly the latest is past the bar: strike 1 — re-evaluate at the
    next full (ideally close) run, exit 0 with a warning;
  - if the latest TWO consecutive full runs are past the bar: the anchor
    set no longer represents the population — emit the fresh anchor map
    from the latest full run's own per-query/spread data and exit 2. The
    commit convention: paste the map into Bench.anchorClose and update
    BASELINE.md's "Drift anchor" row IN THE SAME COMMIT.
"""
import json, re, sys

FAMILIES = {
    "graph-iterative": ["q_pagerank", "q_salsa", "q_components", "q_label_prop",
                        "q_core_numbers", "q_random_walk", "q_reach_hops",
                        "q_kcore", "q_local_clustering"],
    "delta-serve": ["q_bpe_delta", "q_bm25_delta", "q_concurrency_delta",
                    "q_sessionize_delta", "q_components_delta",
                    "q_containment_delta", "q_dedup_delta", "q_pq_encode_delta",
                    "q_ivf_assign_delta", "q_compact_plan_delta"],
    "artifact-serve": ["q_bpe_apply", "q_similarity_ivf", "q_ann_recall",
                       "q_pq_adc_recall", "q_mrr_ivfpq", "q_bm25",
                       "q_bpe_vocab", "q_embed_decontam", "q_recall_curve"],
    "census-statistical": ["q_corr_covar", "q_winsorize", "q_chisq_drift",
                           "q_benford", "q_gini", "q_histogram", "q_unpivot",
                           "q_autocorr", "q_mad"],
    "relational": ["q_group_agg", "q_join_3way", "q_set_ops", "q_window_rank",
                   "q_cube", "q_rollup", "q_pivot", "q_semi_anti"],
    "text-token": ["q_char_ngrams", "q_bigram_lm", "q_vocab_growth",
                   "q_cooccur_lift", "q_token_count", "q_rarity_score",
                   "q_lang_confusion"],
    "temporal": ["q_sessionize", "q_interval_join", "q_concurrency",
                 "q_funnel_latency", "q_twap", "q_gap_fill"],
    "dedup-similarity": ["q_dedup_clusters", "q_neardup_pipeline", "q_knn_graph",
                         "q_embed_near_dup", "q_dedup_sweep", "q_substring_dedup"],
    "cdc": ["q_partition_checksum", "q_snapshot_throughput", "q_cdc_diff",
            "q_table_checksum", "q_dq_audit"],
}
PER_FAMILY = 4


def emit_map(run):
    q, spread = run["queries"], run["spread"]
    picked = {}
    for fam, names in FAMILIES.items():
        ok = [(n, q[n]) for n in names
              if n in q and q[n] >= 0.25 and 0 < spread.get(n, -1) <= 1.15]
        # prefer the LARGEST reproducible runtimes: more timing signal
        ok.sort(key=lambda t: -t[1])
        for n, v in ok[:PER_FAMILY]:
            picked[n] = v
        if len(ok) < PER_FAMILY:
            print(f"// WARN {fam}: only {len(ok)} eligible of {len(names)}",
                  file=sys.stderr)
    print(f"// {len(picked)} anchors over {len(FAMILIES)} families "
          f"(spread<=1.15, t>=0.25s, top-{PER_FAMILY} per family)")
    items = sorted(picked.items())
    for i in range(0, len(items), 2):
        pair = items[i:i + 2]
        line = ", ".join(f'"{n}" -> {v:.4f}' for n, v in pair)
        sep = "," if i + 2 < len(items) else ")"
        print(f"      {line}{sep}")


GAP_BAR = 0.03


def check(history):
    """Two-strike re-pin policy over the committed bench history."""
    fulls = []
    for line in open(history):
        try:
            entry = json.loads(line)["line"]
        except (json.JSONDecodeError, KeyError):
            continue
        gap = entry.get("drift_gap", -1.0)
        # filtered runs and no-reference runs record -1 — not a verdict
        if gap == -1.0 or "spread" not in entry:
            continue
        fulls.append((gap, entry))
    if not fulls:
        print("pin_anchors --check: no full runs with a drift_gap verdict "
              "in history — nothing to check", file=sys.stderr)
        return 0
    # Strikes are same-sf only (mirrors Bench.lastFullHistories): a full
    # run at a different scale factor has its own runtime population and
    # must neither trigger nor mask a re-pin of the sf-of-record anchors.
    sf = fulls[-1][1].get("sf")
    skipped = [e.get("sf") for _, e in fulls if e.get("sf") != sf]
    fulls = [(g, e) for g, e in fulls if e.get("sf") == sf]
    if skipped:
        print(f"pin_anchors --check: ignoring {len(skipped)} full runs at "
              f"other sf dirs {sorted(set(map(str, skipped)))}; verdict is "
              f"over sf={sf}", file=sys.stderr)
    gaps = [g for g, _ in fulls]
    latest = gaps[-1]
    print(f"pin_anchors --check: {len(fulls)} full runs; "
          f"last gaps: {['%+.1f%%' % (g * 100) for g in gaps[-4:]]}")
    if abs(latest) <= GAP_BAR:
        print(f"all clear: latest drift_gap {latest * +100:+.1f}% inside "
              f"the ±{GAP_BAR * 100:.0f}% bar")
        return 0
    if len(gaps) < 2 or abs(gaps[-2]) <= GAP_BAR:
        print(f"STRIKE 1 of 2: latest drift_gap {latest * 100:+.1f}% is past "
              f"the bar but the previous full run was clean — re-evaluate at "
              f"the next full (ideally close) run before re-pinning",
              file=sys.stderr)
        return 0
    print(f"TWO STRIKES: the last two full runs read "
          f"{gaps[-2] * 100:+.1f}% and {latest * 100:+.1f}% — the anchor set "
          f"no longer represents the population. Fresh anchor map from the "
          f"latest full run (paste into Bench.anchorClose and update "
          f"BASELINE.md 'Drift anchor' in the SAME commit):",
          file=sys.stderr)
    emit_map(fulls[-1][1])
    return 2


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--check":
        path = sys.argv[2] if len(sys.argv) > 2 else "bench_history.jsonl"
        return check(path)
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_queries.json"
    emit_map(json.load(open(path)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
