#!/usr/bin/env python
"""Benchmark harness: headline queries + cache-engine metrics at one scale
factor. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).

Cache metrics mirror BASELINE.md's profile: `cache_write_overhead` is
(write+read)/uncached-recompute for the flagship query, `cached_speedup` is
uncached-recompute/cache-hit-read. Targets: overhead <= ~1.5x, speedup >= ~10x.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Bench measures the PRODUCTION hash family (JVM xxhash64), not the
# md5-portable family the DuckDB-oracle correctness runs replay. Dedup
# semantics are invariant under the injective family (operators/dedup.py);
# export SPARK_GRAFT_HASH_FAMILY=portable to time oracle mode instead.
os.environ.setdefault("SPARK_GRAFT_HASH_FAMILY", "xxhash64")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "flagship_wide",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_profit",
    "join_broadcast_dim",
    "window_topk_per_group",
    "window_running_frames",
    "agg_cube",
    "asof_join_prior_view",
    "sessionization",
    "dedup_minhash_lsh",
    "dedup_token_jaccard",
    "similarity_topk_cosine",
    "text_stats",
    "multimodal_decode_features",
    "window_percentiles",
    "pipeline_dedup_survivors",
    # round-5 additions (headline grew 18 -> 23 timed queries here; compare
    # per-query across rounds, not the raw total)
    "q2_min_cost_supplier",
    "join_salted_skew",
    "pack_sequences",
    "text_repetition_scores",
    "embedding_quantize_int8",
    "pipeline_training_corpus",
    # round-6 additions (headline 24 -> 29 timed queries)
    "fn_edit_distance",
    "window_ntile_cume",
    "stats_corr_covar",
    "text_pii_scrub",
    "train_val_test_split",
    # round-6 corpus-analytics additions (headline 29 -> 32)
    "split_contamination_check",
    "text_chunk_sliding",
    "events_retention_cohorts",
]


def materialize(df) -> None:
    """Force full execution without a real sink."""
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    from dbfs_spark_cache_spark import cache_dataframe, reconfigure
    from dbfs_spark_cache_spark.operators import QUERIES
    from dbfs_spark_cache_spark.session import get_spark

    bench_root = "/tmp/bench_cache"
    shutil.rmtree(bench_root, ignore_errors=True)
    reconfigure(SPARK_CACHE_DIR=f"{bench_root}/cache/", CACHE_DATABASE="bench_cache_db")
    spark = get_spark(app_name="bench", warehouse_dir=f"{bench_root}/warehouse/")
    spark.sql("DROP DATABASE IF EXISTS bench_cache_db CASCADE")

    # One untimed warmup so JVM/codegen startup doesn't land on the first query.
    materialize(QUERIES["q1_pricing_summary"](spark, SF_DIR))

    # Best-of-2 per query, escalating to best-of-3 with worst-run discard
    # when the two runs disagree by more than 3x (VERDICT r4 #4): the first
    # execution of a plan pays codegen/JIT, and on a contended box a single
    # GC/scheduling stall can inflate one run by 10x+ (r4's headline read
    # 46.8 s vs a true ~24 s steady state for exactly this reason). One
    # outlier therefore never survives into either the best OR the reported
    # spread. The per-query spread is recorded so two bench invocations can
    # be compared within stated variance instead of read as a regression.
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:

        def timed_run() -> float:
            t0 = time.time()
            materialize(QUERIES[name](spark, SF_DIR))
            return time.time() - t0

        # Escalate whenever the spread exceeds the best run (subsumes the
        # old 3x rule, and also covers cache-staged queries whose FIRST run
        # pays the stage-cache write — r5's pipeline_dedup_survivors spread
        # 2.69 s vs value 1.62 s): re-run and discard the worst, up to two
        # extra runs, so neither a contention outlier nor a one-time cache
        # write survives into the best or the reported spread.
        runs = [timed_run(), timed_run()]
        for _ in range(2):
            if max(runs) - min(runs) <= min(runs):
                break
            runs.append(timed_run())
            runs.remove(max(runs))  # discard the outlier / cold write
        best = min(runs)
        timings[name] = round(best, 3)
        spread[name] = round(max(runs) - best, 3)
        total += best

    # Cache-engine profile on the multi-operator flagship query. DataFrame
    # construction (file listing + analysis) happens outside the timers:
    # BASELINE's methodology times repeated actions on a built DataFrame.
    # The trio (uncached / write+read / hit) is measured twice against
    # DISJOINT cache namespaces — a write is one-shot per key, so a repeat
    # needs a fresh key space — and the attempt with the faster uncached
    # run wins whole (ratios must come from one self-consistent trio; the
    # per-query escalation rule above cannot cover these single-shot
    # phases, and one contended attempt previously skewed the profile).
    flagship = QUERIES["flagship_wide"]

    def profile_attempt(i: int) -> tuple:
        reconfigure(
            SPARK_CACHE_DIR=f"{bench_root}/cache{i}/",
            CACHE_DATABASE=f"bench_cache_db{i}",
        )
        spark.sql(f"DROP DATABASE IF EXISTS bench_cache_db{i} CASCADE")

        df_a = flagship(spark, SF_DIR)
        t0 = time.time()
        materialize(df_a)
        t_uncached = time.time() - t0

        df_b = flagship(spark, SF_DIR)
        t0 = time.time()
        materialize(cache_dataframe(df_b, override_prefer_spark_cache=True))
        t_write_and_read = time.time() - t0

        df_c = flagship(spark, SF_DIR)
        t0 = time.time()
        materialize(cache_dataframe(df_c, override_prefer_spark_cache=True))
        t_hit = time.time() - t0
        return t_uncached, t_write_and_read, t_hit

    # Least-contended attempt overall: a min on the uncached leg alone can
    # select a trio whose WRITE phase caught the contention, skewing the
    # overhead ratio the profile exists to report.
    t_uncached, t_write_and_read, t_hit = min(
        (profile_attempt(i) for i in range(3)), key=sum
    )

    timings["cache_uncached_run"] = round(t_uncached, 3)
    timings["cache_write_and_read"] = round(t_write_and_read, 3)
    timings["cache_hit_read"] = round(t_hit, 3)
    timings["cache_write_overhead_ratio"] = round(t_write_and_read / max(t_uncached, 1e-9), 3)
    timings["cached_speedup"] = round(t_uncached / max(t_hit, 1e-9), 3)
    total += t_uncached + t_write_and_read + t_hit

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "run_spread": spread,
                "hash_family": os.environ["SPARK_GRAFT_HASH_FAMILY"],
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
