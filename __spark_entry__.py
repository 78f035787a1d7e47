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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dbfs_spark_cache_spark.operators import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dbfs_spark_cache_spark.operators import ORACLES

    return dict(ORACLES)
