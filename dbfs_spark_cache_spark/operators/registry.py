"""Query registry: name -> (Spark implementation, DuckDB oracle SQL).

Each query is a callable ``(spark, sf_dir) -> DataFrame``. The oracle is the
ANSI-SQL equivalent DuckDB runs on the same parquet files; queries without an
oracle (non-deterministic sampling, hash-function-specific pipelines) get a
rows-only check from the driver.

Float discipline (so value hashes match the oracle exactly): monetary/ratio
aggregates are summed as DECIMAL (exact, association-independent) and cast to
DOUBLE at the end; divisions happen in DOUBLE on both sides; orderings that
feed LIMIT/row_number always carry a unique tie-break key.
"""
from __future__ import annotations

import textwrap
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: Dict[str, QueryFn] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def decorator(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return decorator


def dec(col, scale: int = 2, precision: int = 22):
    """Exact decimal cast — the package-wide float discipline: sums over
    DECIMAL are association-independent, so results are bit-reproducible
    under any partitioning and match the DuckDB oracle exactly."""
    from pyspark.sql import functions as F

    target = f"decimal({precision},{scale})"
    return (F.col(col) if isinstance(col, str) else col).cast(target)
