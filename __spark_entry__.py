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


# The driver verifies queries in registration order with a per-round cap
# (round 1 covered exactly the first 50). Rotate coverage: queries WITHOUT a
# round-1 CORRECTNESS row come first (lighter ones earlier), followed by the
# queries changed or added this round, then the already-verified remainder.
_PRIORITY = [
    # -- no CORRECTNESS_r01 row: scalar-function / collection families
    "fn_array_explode", "fn_map_ops", "fn_from_json_struct", "agg_collect_sorted",
    # -- no row: TPC-H analogues q6-q22
    "q6_forecast_revenue", "q12_shipmode_priority", "q14_promo_share",
    "q18_large_orders", "q19_disjunctive_predicates", "q10_returned_items",
    "q13_order_count_distribution", "q16_supplier_part_counts",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "q22_global_sales_opportunity", "q7_nation_volume", "q8_market_share",
    "q21_sole_late_supplier",
    # -- no row: timeseries / streaming-twin windows
    "asof_join_prior_view", "range_join_pairs", "sessionization",
    "window_tumbling", "window_sliding",
    # -- no row: text analysis
    "text_stats", "text_lang_heuristic", "text_token_count_regex",
    "text_bag_fingerprint", "text_rolling_hash_shingles",
    # -- no row: pipeline composition
    "quality_filter", "embedding_label_centroids",
    # -- no row: dedup family
    "dedup_exact", "dedup_keep_first", "dedup_fingerprint",
    "dedup_token_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    # -- no row: similarity family (+ r2's new multiprobe)
    "embedding_norms", "similarity_topk_cosine", "similarity_lsh_buckets",
    "similarity_ivf_search", "similarity_multiprobe",
    # -- no row: multimodal
    "multimodal_binary_meta", "multimodal_decode_features",
    "multimodal_frame_sample",
    # -- no row: the funnel (heaviest of the unverified set)
    "pipeline_dedup_survivors",
    # -- changed or added in round 2: re-verify
    "dedup_embedding_cosine", "dedup_ngram_jaccard", "text_quality_scores",
    "window_percentiles", "sample_bernoulli",
    # (51+: udtf_tokenize [r1 row exists; new oracle pytest/selfcheck-pinned],
    # flagship_wide, q1_pricing_summary, ... — all carry CORRECTNESS_r01 rows)
]


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
