"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship cached TPC-H-Q1-style query at sf0.001
through the cache engine (miss -> materialize -> table-scan on rerun).
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the [NS] LLM-pipeline operators, checked against DuckDB.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# The engine package lives next to this file; make imports work regardless
# of the caller's working directory.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Q1 pricing summary through the content-addressed cache."""
    from dbfs_spark_cache_spark import cache_dataframe
    from dbfs_spark_cache_spark.operators import QUERIES

    df = QUERIES["flagship_wide"](spark, SMOKE_SF_DIR)
    try:
        return cache_dataframe(df, override_prefer_spark_cache=True)
    except Exception:
        # Cache storage unavailable (read-only fs, no metastore): the query
        # itself is still the contract.
        return df


# Oracle replay requires the md5-portable hash family (DuckDB has no
# xxhash64); the library default is the production xxhash64 family.
# Pin portable for everything reached through this driver contract —
# setdefault so an explicit caller override still wins.
os.environ.setdefault("SPARK_GRAFT_HASH_FAMILY", "portable")

# The driver verifies queries in registration order with a per-round cap
# of 50. Round-6 rotation (VERDICT r5 next-round #1): the window is
# _CHANGED (code changed or newly added in r6) + the 27 _R3_TRUSTED
# deferrals whose r3 greens are now the oldest rows in the repo, then a
# handful of the oldest r4-vintage rows to get ahead of the r7 refresh.
# Slot arithmetic is asserted below from the real list lengths (the r5
# narrative drifted from the code — ADVICE r5 #1).
_CHANGED = [
    # r6 code changes to already-green queries:
    # composite (brand, length-band) blocking replaced brand-only blocking
    "fn_edit_distance",
    # forced customer broadcast hint dropped (AQE decides that leg now)
    "flagship_wide",
    # salt derives from a row content hash instead of rand(seed)
    "join_salted_skew",
    # NEW in r6: JSON / CSV source connectors under the exact oracle
    "scan_json_source",
    "scan_csv_source",
    # NEW in r6: distribution windows, FILTER aggregation, growth,
    # histogram, date spine, datetime parts, exact-power-sum stats,
    # regexp extract-all, array set ops
    "window_ntile_cume",
    "agg_count_if_filtered",
    "orders_year_over_year",
    "events_value_histogram",
    "calendar_spine_orders",
    "fn_datetime_parts",
    "stats_corr_covar",
    "fn_regexp_extract_all",
    "fn_array_set_ops",
    # NEW in r6: PII scrubbing + deterministic train/val/test split
    "text_pii_scrub",
    "train_val_test_split",
]

# r3-green queries deferred from the r5 window (_R3_TRUSTED then); their
# r3 rows are the repo's oldest, so they fill the middle of the window.
_R3_REFRESH = [
    "scan_filter_project", "filter_like_between", "agg_global",
    "sort_limit_topk", "agg_distinct", "agg_grouped_multi",
    "agg_collect_sorted", "agg_percentile_exact", "pivot_status_qty",
    "unpivot_part_metrics", "exists_subquery", "correlated_subquery_min",
    "window_lag_lead", "window_rank_dense", "window_topk_per_group",
    "window_running_frames", "join_semi", "join_anti", "join_left",
    "join_full_outer", "grouped_map_pandas", "udaf_grouped_pandas",
    "udf_pandas_scalar", "udtf_tokenize", "dedup_simhash",
    "dedup_ngram_jaccard", "text_rolling_hash_shingles",
]

# Oldest r4-vintage rows (scalar-function family + streaming-window
# oracles), pulled forward into r6's spare slots so the r7 refresh of the
# remaining r4 rows fits one window.
_R4_EARLY = [
    "fn_string", "fn_date", "fn_math", "fn_json", "fn_conditional",
    "fn_hash", "window_tumbling",
]

_PRIORITY = _CHANGED + _R3_REFRESH + _R4_EARLY
assert len(_PRIORITY) == len(set(_PRIORITY)) and len(_PRIORITY) == 50, (
    f"r6 window must fill exactly the 50 verification slots; got "
    f"{len(_PRIORITY)} ({len(_CHANGED)} changed/new + {len(_R3_REFRESH)} "
    f"r3 refresh + {len(_R4_EARLY)} early r4)"
)


def _rotated(mapping: dict) -> dict:
    ordered = {n: mapping[n] for n in _PRIORITY if n in mapping}
    ordered.update({n: v for n, v in mapping.items() if n not in ordered})
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dbfs_spark_cache_spark.operators import QUERIES

    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dbfs_spark_cache_spark.operators import ORACLES

    return _rotated(ORACLES)
