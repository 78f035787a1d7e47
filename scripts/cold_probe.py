#!/usr/bin/env python
"""Cold-JVM per-query probe replicating the driver's bench contract
(round-19; guide §1 "measure first" under the RIGHT methodology).

The r18 lesson: warm best-of-N on a noisy box does NOT predict the
driver's contract — a fresh JVM, one suite pass, best-of-2 per query
(escalating exactly like bench.py). This script runs ONLY the named
queries but otherwise copies bench.py's timing discipline byte for byte:
same session bring-up, same untimed q1 warmup, same noop sink, same
best-of-2 with outlier escalation. Run it several times (fresh process
each) and compare minima/medians across invocations.

Usage:
  python scripts/cold_probe.py fn_edit_distance window_ntile_cume
  SPARK_GRAFT_CPUS=8 python scripts/cold_probe.py stats_corr_covar
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_HASH_FAMILY", "xxhash64")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: cold_probe.py <query> [<query> ...]")
    from dbfs_spark_cache_spark import reconfigure
    from dbfs_spark_cache_spark.operators import QUERIES
    from dbfs_spark_cache_spark.session import get_spark

    bench_root = "/tmp/cold_probe_cache"
    shutil.rmtree(bench_root, ignore_errors=True)
    reconfigure(SPARK_CACHE_DIR=f"{bench_root}/cache/", CACHE_DATABASE="cold_probe_db")
    spark = get_spark(app_name="cold_probe", warehouse_dir=f"{bench_root}/warehouse/")
    spark.sql("DROP DATABASE IF EXISTS cold_probe_db CASCADE")

    materialize(QUERIES["q1_pricing_summary"](spark, SF_DIR))

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:

        def timed_run() -> float:
            t0 = time.time()
            materialize(QUERIES[name](spark, SF_DIR))
            return time.time() - t0

        runs = [timed_run(), timed_run()]
        for _ in range(2):
            if max(runs) - min(runs) <= min(runs):
                break
            runs.append(timed_run())
            runs.remove(max(runs))
        timings[name] = round(min(runs), 3)
        spread[name] = round(max(runs) - min(runs), 3)

    print(json.dumps({"queries": timings, "spread": spread, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
