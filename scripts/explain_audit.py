#!/usr/bin/env python
"""Plan-quality audit: for every registered query, summarize the physical
plan properties that matter at scale — pushed filters, read schema width,
join strategies, exchange count, Python-eval presence — and flag
anti-patterns (cartesian products, row-wise Python, unpushed scans).

Usage: python scripts/explain_audit.py [--sf DIR] [--full name]
"""
from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PYTHON_OK = {
    "udf_pandas_scalar", "udaf_grouped_pandas", "grouped_map_pandas",
    "udtf_tokenize", "multimodal_decode_features", "multimodal_frame_sample",
}
# Broadcast-nested-loop is intentional where one side is a single broadcast
# row (scalar aggregates kept in-plan instead of collect()ed) or a tiny
# bounded aggregate (window_percentiles' 32-row bucket-offset self-join on
# bucket < bucket).
BNLJ_OK = {
    "similarity_topk_cosine",
    "similarity_ivf_search",
    "window_percentiles",
    "q22_global_sales_opportunity",
    # single-row corpus-count broadcast riding the tf-idf scoring join
    "text_tfidf_topk",
    # k centroid rows broadcast into the per-vector distance computation
    "embedding_kmeans_assign",
    # single-row total-stock-value broadcast for the HAVING threshold
    "q11_important_stock",
    # single-row corpus-max broadcasts (recency anchor / weight normalizer)
    "customer_rfm_features",
    "sample_weighted",
    # 1x1x1 stitch of three single-row stage-count aggregates
    "events_funnel_conversion",
    # single-row corpus-totals broadcast feeding the per-source weight
    "corpus_domain_mixture",
    # r8: 5-row query-batch broadcast into the map-side scoring pass
    # (same class as similarity_topk_cosine's single query row)
    "similarity_topk_batch",
    # r8: single-row corpus-token-total broadcast normalizing the vocab
    "text_unigram_logprob",
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _top_level_fields(schema_body: str) -> int:
    """Count TOP-LEVEL struct fields: commas inside nested map<>/struct<>
    type parameters must not count (the old split(',') reported an
    arbitrary width for any nested-type scan)."""
    depth = 0
    n = 1 if schema_body.strip() else 0
    for ch in schema_body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


# Multiplicative re-scan flag thresholds: the r8-r10 registry's widest
# honest plans read <= 9 pushed scans / <= 20 tree exchanges, while the
# one true outlier (pre-staging events_anomaly_mad) read 81 / 101 —
# an order of magnitude of daylight. A plan past these bounds is almost
# certainly re-deriving an upstream frame inside every pass of an
# iterative/banded consumer; the fix is staging the shared frame
# (staging.stage_cache), not raising the bound.
MAX_PUSHED_SCANS = 25
MAX_EXCHANGES = 40


def audit_one(name: str, plan: str) -> tuple[str, list]:
    joins = sorted(set(re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)",
        plan,
    )))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_pushed = sum(1 for p in pushed if p.strip())
    # Formatted explain renders each SHUFFLE node in the TREE as
    # "+- Exchange (7)" - AQE plans print only the tree, no numbered
    # detail section - with the partitioning on a separate Arguments
    # line; BroadcastExchange is excluded (shipping a small dim is not
    # the shuffle this count watches). The original single-line
    # "Exchange hashpartitioning" regex could never match, so every
    # audit row reported exchanges=0 and a silently-added shuffle was
    # invisible.
    exchanges = len(
        re.findall(r"(?<!Broadcast)(?<!Reused)Exchange \(\d+\)", plan)
    )
    schemas = re.findall(r"ReadSchema: struct<(.*)>", plan)
    widths = [_top_level_fields(s) for s in schemas] or [0]

    flags = []
    if "CartesianProduct" in joins:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in joins and name not in BNLJ_OK:
        flags.append("NESTED-LOOP")
    if "BatchEvalPython" in plan and name not in PYTHON_OK:
        flags.append("ROW-WISE-PYTHON")
    if n_pushed > MAX_PUSHED_SCANS or exchanges > MAX_EXCHANGES:
        flags.append("RESCAN-BLOWUP")
    summary = (
        f"{name:32s} joins={','.join(joins) or '-':24s} "
        f"pushed_scans={n_pushed} exchanges={exchanges} "
        f"max_read_cols={max(widths)}"
    )
    return summary, flags


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--full", default="", help="print the full plan for one query")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from dbfs_spark_cache_spark.operators import QUERIES
    from dbfs_spark_cache_spark.session import get_spark

    spark = get_spark(app_name="explain_audit")

    if args.full:
        print(plan_text(QUERIES[args.full](spark, args.sf)))
        return

    flagged = []
    for name, fn in QUERIES.items():
        try:
            summary, flags = audit_one(name, plan_text(fn(spark, args.sf)))
        except Exception as exc:
            print(f"{name:32s} ERROR: {exc}")
            flagged.append(name)
            continue
        marker = "  !! " + ",".join(flags) if flags else ""
        print(summary + marker)
        if flags:
            flagged.append(name)

    print(f"\n{len(QUERIES)} queries audited; {len(flagged)} flagged"
          + (f": {flagged}" if flagged else ""))
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
