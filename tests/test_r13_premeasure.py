"""Pre-measurement for the r13-queued fix (r10 'nulls' lens, target
r10-vintage -> due r13): dedup_cluster_keepers' Spark side still SIGNS
NULL-text documents (its edge build predates the NULL-text contract),
while its oracle — once the r11 duck_h62 '||' hardening lands — will
NULL-propagate their hashes and exclude them. The full fix is the
established head filter on the Spark side plus the WHERE in the oracle.

This premeasure proves the proposed end state on a hostile fixture: with
``WHERE text IS NOT NULL`` at the edge build AND at the singleton join
on the Spark side, and the same WHERE + '||'-hardened hashes in the
oracle, both engines agree exactly — NULL-text docs appear in NEITHER
the edge graph NOR the singleton set (an unreadable payload is not a
document to cluster).
"""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from selfcheck import compare as _selfcheck_compare  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


def test_cluster_keepers_r13_fix_excludes_null_text(spark, tmp_path, monkeypatch):
    """(a) today the oracle CRASHES on a NULL-text doc ('0x' cast — the
    shared _duck_minhash_cands fragility) while the Spark side still
    emits the doc as a singleton cluster; (b) the proposed r13 variant
    (head filter on both engines + the r11 '||' hash hardening in the
    oracle) reaches exact parity with NULL-text docs in neither output;
    (c) fixture text is never NULL, so current attestations are honest."""
    monkeypatch.setenv("SPARK_GRAFT_HASH_FAMILY", "portable")

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    src = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    poisoned = pd.concat(
        [
            src,
            pd.DataFrame(
                [
                    {**src.iloc[0].to_dict(), "doc_id": 970001, "text": None},
                    {**src.iloc[1].to_dict(), "doc_id": 970002, "text": None},
                ]
            ),
        ],
        ignore_index=True,
    )
    poisoned.to_parquet(f"{tmp_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )

    # (a) current shapes fail exactly as diagnosed
    got = QUERIES["dedup_cluster_keepers"](spark, str(tmp_path)).toPandas()
    assert {970001, 970002} <= set(got["doc_id"]), (
        "Spark still clusters NULL-text docs today; if not, the fix "
        "landed — retire this half"
    )
    with pytest.raises(Exception, match="0x"):
        con.execute(ORACLES["dedup_cluster_keepers"]).fetchdf()

    # (b) the PROPOSED r13 end state. Spark side: the head filter
    # commutes with pre-filtering the input file (per-row determinism),
    # so the registered query over a filtered copy IS the variant.
    filtered_dir = tmp_path / "filtered"
    os.makedirs(filtered_dir, exist_ok=True)
    poisoned[poisoned["text"].notna()].to_parquet(
        f"{filtered_dir}/documents.parquet"
    )
    fixed = QUERIES["dedup_cluster_keepers"](spark, str(filtered_dir)).toPandas()
    fixed_oracle = ORACLES["dedup_cluster_keepers"].replace(
        "CAST(concat('0x', substr(md5(", "CAST(('0x' || substr(md5("
    ).replace("FROM documents", "FROM documents WHERE text IS NOT NULL")
    fixed_want = con.execute(fixed_oracle).fetchdf()
    assert not (set(fixed["doc_id"]) & {970001, 970002})
    problems = _selfcheck_compare("dedup_cluster_keepers_r13", fixed, fixed_want)
    assert not problems, problems

    # (c) fixture-invisible at every SF
    assert (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where(F.col("text").isNull())
        .count()
        == 0
    )
