#!/usr/bin/env python
"""Round-18 optimization measurement harness (guide §1).

Isolates registered queries one at a time: captures `.explain("formatted")`
to a plans directory and/or times the computation against the noop sink
(`df.write.format("noop")`) with warm best-of-N, labelling each job via
`setJobDescription` so the UI/event logs stay readable.

Usage:
  python scripts/opt_measure.py --explain-dir plans/r18 --suffix _before
  python scripts/opt_measure.py --time --runs 5 --only dedup_minhash_lsh q9_product_profit
  python scripts/opt_measure.py --time --headline            # bench.py's 32
  python scripts/opt_measure.py --conf spark.foo=bar ...     # A/B a config

Timing methodology matches bench.py (min of N warm runs after one untimed
warmup per query); numbers printed as one JSON line per query plus a
trailing summary line.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_HASH_FAMILY", "xxhash64")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", nargs="*", default=None, help="query names (default: bench HEADLINE)")
    ap.add_argument("--all", action="store_true", help="every registered query")
    ap.add_argument("--explain-dir", default=None, help="write <name><suffix>.txt explains here")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--time", action="store_true", help="time with the noop sink")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--conf", action="append", default=[], help="extra K=V session conf (repeatable)")
    args = ap.parse_args()

    from bench import HEADLINE

    from dbfs_spark_cache_spark.operators import QUERIES
    from dbfs_spark_cache_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(app_name="opt_measure", extra_conf=extra or None)

    if args.all:
        names = list(QUERIES)
    else:
        names = args.only or HEADLINE
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        df = QUERIES[name](spark, args.sf)
        if args.explain_dir:
            path = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan_text(df))
        if args.time:
            spark.sparkContext.setJobDescription(f"opt_measure: {name}")
            runs = []
            for i in range(args.runs + 1):
                df = QUERIES[name](spark, args.sf)
                t0 = time.time()
                df.write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
                if i > 0:  # run 0 is the untimed codegen/JIT warmup
                    runs.append(dt)
            spark.sparkContext.setJobDescription(None)
            timings[name] = round(min(runs), 3)
            print(json.dumps({"query": name, "best": min(runs),
                              "runs": [round(r, 3) for r in runs]}))
            sys.stdout.flush()
    if args.time:
        print(json.dumps({"total_best": round(sum(timings.values()), 3),
                          "timings": timings, "conf": extra}))
    spark.stop()


if __name__ == "__main__":
    main()
