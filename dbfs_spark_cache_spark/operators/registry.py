"""Query registry: name -> (Spark implementation, DuckDB oracle SQL).

Each query is a callable ``(spark, sf_dir) -> DataFrame``. The oracle is the
ANSI-SQL equivalent DuckDB runs on the same parquet files; queries without an
oracle (non-deterministic sampling, hash-function-specific pipelines) get a
rows-only check from the driver.

Float discipline (so value hashes match the oracle exactly): monetary/ratio
aggregates are summed as DECIMAL (exact, association-independent) and cast to
DOUBLE at the end; divisions happen in DOUBLE on both sides; orderings that
feed LIMIT/row_number always carry a unique tie-break key.

Exactness domain (r12 magnitude probe): the final DECIMAL->DOUBLE cast is
bit-identical across engines only while |sum| < 2^53 (~9e15) — beyond
that, doubles are spaced wider than 1 and the two engines' decimal->double
rounding can differ by 1 ULP on a value that is EXACTLY equal in decimal.
In practice the domain never binds: a sum that large requires corrupt
ledger magnitudes (a 9e17 "price"), which the DECIMAL casts reject LOUDLY
with ANSI overflow on both engines well before silent drift — measured:
poisoning every money column with ±9e17 crashed 17 queries loudly on BOTH
engines, left 130 exact, and produced exactly 2 one-ULP rendering diffs.
Ledger prices are deliberately outside the bad-telemetry guard scope
(finite_or_null covers sensor values/balances/embeddings): a NaN or
negative or 1e17 price is upstream corruption no engine should paper
over, and a loud failure is the correct response at 100 TB.
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


def finite_or_null(col):
    """Hostile-float guard (r9 NaN/Inf probe): TRUE for NULL or finite
    values, FALSE for NaN and ±Infinity — the float twin of the NULL-text
    exclusion contract. NULLs stay in (three-valued aggregate semantics
    are already oracle-aligned everywhere); non-finite values are
    excluded IDENTICALLY on both engines, because the engines disagree
    about them in silent ways: Spark's FLOOR(double)->LONG maps NaN to 0
    and ±Inf to Long.MIN/MAX (silent bin pollution, even under ANSI),
    a direct double->integral ANSI cast raises CAST_OVERFLOW, DuckDB's
    DECIMAL/INT casts of NaN raise, and pandas min/max SKIP NaN where
    SQL MIN/MAX sort it above +Inf. The SQL twin is
    ``(x IS NULL OR isfinite(x))``."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))))


def dec(col, scale: int = 2, precision: int = 22):
    """Exact decimal cast — the package-wide float discipline: sums over
    DECIMAL are association-independent, so results are bit-reproducible
    under any partitioning and match the DuckDB oracle exactly."""
    from pyspark.sql import functions as F

    target = f"decimal({precision},{scale})"
    return (F.col(col) if isinstance(col, str) else col).cast(target)
