#!/usr/bin/env python
"""Empirical scaling probe: time representative queries across the three
fixture scale factors (sf0.001 -> sf0.01 -> sf0.1, 10x data each step) and
report the growth ratio per step. This is the measured counterpart to
SCALING.md's design argument — a regression detector for scaling behavior:

- ratio << 10 : fixed overhead (scheduling, JVM) dominates at this SF;
- ratio ~= 10 : linear in the data — the target for scan/map/agg shapes;
- ratio >> 10 : superlinear — a pair-space or shuffle blowup crept in
  (e.g. the round-5 brand-only edit-distance blocking showed ~25x/step
  before the composite-key fix capped it).

Usage: python scripts/scale_probe.py [--queries a,b,c] [--threshold 15]
Exits 1 if any probed query grows faster than --threshold per 10x step.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# One representative per scaling family (see SCALING.md shuffle inventory).
DEFAULT_PROBES = [
    "q1_pricing_summary",        # scan + grouped agg (partial-agg)
    "flagship_wide",             # fact shuffle + broadcast dims + windows
    "sort_limit_topk",           # TakeOrdered global top-k
    "dedup_minhash_lsh",         # signature map + banded bucket join
    "dedup_token_jaccard",       # LSH candidates + exact verify
    "fn_edit_distance",          # composite-blocked fuzzy self-join
    "split_contamination_check", # shingle-hash keyed decontamination join
    "text_chunk_sliding",        # pure map-side chunking (zero shuffle)
    "pack_sequences",            # bucketed distributed prefix sum
    "events_retention_cohorts",  # user-keyed agg + co-partitioned join
    "window_percentiles",        # bucketed global distribution
    "similarity_lsh_buckets",    # embedding sign-LSH bucketing
    "text_ngram_topk",           # bucketed two-stage top-k (hot-key spread)
    "text_inverted_index",       # bucketed postings-head selection
    "window_ntile_cume",         # grouped distributed rank (5-value key)
    "similarity_topk_batch",     # batch ANN: bucket-join, never all-pairs
    "events_anomaly_mad",        # per-type median/MAD via percentile_approx
    "text_unigram_logprob",      # token explode + broadcast unigram LM join
    # r17 additions — the remaining high-scale-risk plan shapes:
    "asof_join_prior_view",      # as-of join (union + per-key window scan)
    "dedup_cluster_keepers",     # ITERATIVE min-label propagation rounds
    "window_time_range_rolling", # event-time RANGE frames per user
    "multimodal_decode_features",# Arrow-batched two-stage python decode
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_PROBES))
    ap.add_argument("--threshold", type=float, default=15.0,
                    help="max allowed time growth per 10x data step")
    ap.add_argument("--runs", type=int, default=2, help="best-of-N per cell")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_HASH_FAMILY", "xxhash64")
    from dbfs_spark_cache_spark.operators import QUERIES
    from dbfs_spark_cache_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    if not names:
        # an empty --queries list would run zero probes and crash on
        # max() over nothing — a traceback masquerading as a probe failure
        print("no queries selected (--queries was empty)", file=sys.stderr)
        sys.exit(2)

    def best_time(fn, sf: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn(spark, sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.monotonic() - t0)
        return best

    results, flagged = {}, []
    for name in names:
        times = [best_time(QUERIES[name], sf) for sf in SFS]
        ratios = [times[i + 1] / times[i] for i in range(len(times) - 1)]
        results[name] = {
            "sec": [round(t, 3) for t in times],
            "ratio_per_10x": [round(r, 2) for r in ratios],
        }
        worst = max(ratios)
        marker = ""
        if worst > args.threshold:
            flagged.append(name)
            marker = f"  !! SUPERLINEAR (x{worst:.1f} per 10x)"
        print(
            f"{name:28s} {times[0]:7.3f}s {times[1]:7.3f}s {times[2]:7.3f}s "
            f"ratios {ratios[0]:5.2f} {ratios[1]:5.2f}{marker}"
        )

    print(json.dumps({
        "metric": "scale_probe_worst_ratio_per_10x",
        "value": max(max(r["ratio_per_10x"]) for r in results.values()),
        "unit": "x",
        "threshold": args.threshold,
        "queries": results,
        "flagged": flagged,
    }))
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
