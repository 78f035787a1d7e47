"""Pins for the r12 schema-evolution lens (clean sweep: 150/150 exact —
recorded in the changelog). The lens models the 100 TB reality every
long-lived corpus directory converges to: part files whose footers
disagree because a column was added mid-corpus. These tests pin the
READ SEMANTICS the clean sweep rests on, so a Spark-version or reader
change that silently alters them surfaces here instead of as 150
mysterious probe reds.
"""
from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from hostile_probe import build_evolve  # noqa: E402

import pandas as pd  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


def _evolved(tmp_path) -> str:
    dst = str(tmp_path / "evolved")
    os.makedirs(dst, exist_ok=True)
    build_evolve(SF_SMOKE, dst)
    return dst


def test_original_columns_complete_over_disagreeing_footers(spark, tmp_path):
    """load_table over an evolved directory must serve every ORIGINAL
    column for every row — the property all 150 registered queries
    depend on. Verified value-level against a pandas union read."""
    from dbfs_spark_cache_spark.sources import load_table

    dst = _evolved(tmp_path)
    got = (
        load_table(spark, dst, "documents")
        .select("doc_id", "text", "n_chars")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    parts = sorted(glob.glob(f"{dst}/documents.parquet/part-*.parquet"))
    want = (
        pd.concat([pd.read_parquet(p)[["doc_id", "text", "n_chars"]] for p in parts])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_merge_schema_exposes_added_column_with_null_backfill(spark, tmp_path):
    """The production recipe for READING the added column: mergeSchema
    unions the footers; rows from pre-evolution files read NULL. (Plain
    reads keep whatever single footer Spark picks — the registered
    queries never select the added column, so they are footer-choice
    independent; this pin is the contract for consumers that DO.)"""
    dst = _evolved(tmp_path)
    df = (
        spark.read.option("mergeSchema", True)
        .parquet(f"{dst}/documents.parquet")
    )
    assert "ingest_source" in df.columns
    parts = sorted(glob.glob(f"{dst}/documents.parquet/part-*.parquet"))
    n_evolved = sum(
        pq.read_table(p).num_rows
        for i, p in enumerate(parts)
        if i % 2 == 0
    )
    n_total = sum(pq.read_table(p).num_rows for p in parts)
    assert df.where(F.col("ingest_source").isNotNull()).count() == n_evolved
    assert df.count() == n_total


def test_evolution_changes_the_cache_fingerprint(spark, tmp_path):
    """The cache key over an input directory must MISS after evolution:
    the added part file contributes a fresh mtime to
    input_dir_mod_datetime, so a pre-evolution cache entry can never be
    served for the post-evolution relation."""
    import shutil
    import time

    from dbfs_spark_cache_spark.plans.fingerprint import (
        input_dir_mod_datetime,
    )

    src_dir = str(tmp_path / "corpus")
    os.makedirs(src_dir, exist_ok=True)
    shutil.copy(
        f"{SF_SMOKE}/nation.parquet", f"{src_dir}/part-00.parquet"
    )
    df = spark.read.parquet(src_dir)
    before = input_dir_mod_datetime(df)

    time.sleep(1.1)  # mtime resolution
    import pyarrow as pa

    t = pq.read_table(f"{src_dir}/part-00.parquet")
    evolved = t.append_column(
        "ingest_source", pa.array(["x"] * t.num_rows, pa.string())
    )
    pq.write_table(evolved, f"{src_dir}/part-01.parquet")

    df2 = spark.read.parquet(src_dir)
    after = input_dir_mod_datetime(df2)
    assert before != after, (
        "fingerprint unchanged after schema evolution — a stale cache "
        "entry would be served for the evolved relation"
    )
