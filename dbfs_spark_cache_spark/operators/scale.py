"""Scale patterns as first-class helpers: skew-salted joins and bucketed
co-located joins. These are the knobs a 100 TB deployment turns when AQE's
automatic handling isn't enough; both are demonstrated and pinned by
tests/test_scale_patterns.py."""
from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a random salt in
    [0, n_salts), the dim side is replicated n_salts times, and the join key
    becomes (key, salt). A single hot key spreads over n_salts tasks instead
    of melting one executor.

    Use when one side is too large to broadcast AND the key distribution is
    pathological beyond what AQE's skew-join splitting handles. The salt
    column is internal and dropped from the result.

    Only join types where the replicated dim side cannot surface unmatched
    rows are allowed: a right/full outer join would emit every unmatched
    dim row once per salt.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the dim side is "
            "replicated per salt, which duplicates unmatched rows in "
            "right/full outer joins"
        )
    salted_fact = fact.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_fact.join(exploded_dim, [key, "__salt"], how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_by: Optional[List[str]] = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Two tables bucketed the same way join WITHOUT a shuffle on either side —
    the physical plan reads co-located buckets directly into the sort-merge
    join. This is the pre-computation that turns a recurring 100 TB join
    into a scan-only operation.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
