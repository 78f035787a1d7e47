"""Regression pins for the r13 due-slot batch (promoted from the
since-retired tests/test_r13_premeasure.py — every proposed diff those
tests encoded is now the REGISTERED implementation/oracle, so each pin
runs the registered query + oracle on the same hostile fixture and
asserts exact parity).

The batch (all six names r10-vintage, landed slot-neutral in their own
due round — see __spark_entry__._CHANGED):

- window_tumbling / window_sliding: ``finite_or_null("value")`` on BOTH
  engines (r11 nonfinite lens — a single NaN reading crashed the
  oracles' DECIMAL bucket sums while the Spark sides ran).
- q22_global_sales_opportunity: ``finite_or_null("c_acctbal")`` on BOTH
  engines (a NaN balance crashed the oracle's DECIMAL sum and silently
  emptied the Spark side's rich set via a NaN in-plan average).
- dedup_embedding_cosine: ``functions.vec_finite`` gate on BOTH engines
  (a NULL-component vector scored a finite cosine on DuckDB — list_sum
  skips NULLs — but NULL on Spark, whose fold propagates).
- dedup_cluster_keepers: ``WHERE text IS NOT NULL`` at the corpus head
  of BOTH engines (r10 'nulls' lens; the r11 NULL-text contract — Spark
  paired identical all-NULL signatures into one cluster while the
  '||'-hardened oracle emitted two singletons).
- fn_json: the integer gate bounded to ``^-?[0-9]{1,18}$`` on both
  engines (ADVICE r10 #2 — a 19+-digit k passed the unbounded gate and
  the BIGINT cast crashed BOTH engines).
"""
from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

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

_ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _assert_exact(name, spark, sf, con):
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    got = QUERIES[name](spark, sf).toPandas()
    want = con.execute(ORACLES[name]).fetchdf()
    problems = _selfcheck_compare(name, got, want)
    assert not problems, f"{name}: {problems}"
    return got


def _nonfinite_sf(tmp_path):
    """The r11 nonfinite lens fixture: TRUE NaN/±Inf stored via direct
    pyarrow arrays (a pandas round-trip would write NULL, nan_as_null)."""
    from hostile_probe import build_nonfinite

    sf = str(tmp_path / "nf")
    os.makedirs(sf, exist_ok=True)
    build_nonfinite(SF_SMOKE, sf)
    con = duckdb.connect()
    for name in _ALL_TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'")
    return sf, con


def test_tumbling_sliding_nonfinite_parity(spark, tmp_path):
    """The registered windowed aggs (finite_or_null since r13) drop the
    poisoned readings identically on both engines — exact parity on the
    fixture whose oracle side used to crash."""
    sf, con = _nonfinite_sf(tmp_path)
    # the poison is really there: at least one non-finite events.value
    n_bad = (
        spark.read.parquet(f"{sf}/events.parquet")
        .where(F.isnan("value") | (F.abs("value") == float("inf")))
        .count()
    )
    assert n_bad > 0
    for name in ("window_tumbling", "window_sliding"):
        _assert_exact(name, spark, sf, con)


def test_q22_nonfinite_parity(spark, tmp_path):
    """The registered q22 (finite_or_null on c_acctbal since r13) keeps
    its rich set non-empty and matches the oracle exactly on the
    poisoned-balance fixture."""
    sf, con = _nonfinite_sf(tmp_path)
    got = _assert_exact("q22_global_sales_opportunity", spark, sf, con)
    assert len(got) > 0, "the rich set must not be emptied by a NaN average"


def test_embedding_cosine_nonfinite_parity(spark, tmp_path):
    """The registered cosine dedup (vec_finite since r13) excludes
    unusable vectors from the candidate space on both engines."""
    from dbfs_spark_cache_spark.functions import vec_finite

    sf, con = _nonfinite_sf(tmp_path)
    n_bad = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .where(~vec_finite("embedding"))
        .count()
    )
    assert n_bad > 0
    got = _assert_exact("dedup_embedding_cosine", spark, sf, con)
    bad_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{sf}/embeddings.parquet")
        .where(~vec_finite("embedding"))
        .select("vec_id")
        .collect()
    }
    assert not (set(got["vec_a"]) | set(got["vec_b"])) & bad_ids


def test_cluster_keepers_null_text_parity(spark, tmp_path):
    """The registered cluster assignment (WHERE text IS NOT NULL since
    r13) emits NULL-text docs in NEITHER the edge graph NOR the
    singleton set, on both engines."""
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
    got = _assert_exact("dedup_cluster_keepers", spark, str(tmp_path), con)
    assert not (set(got["doc_id"]) & {970001, 970002})
    # fixture-invisible at every SF: fixture text is never NULL
    assert (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where(F.col("text").isNull())
        .count()
        == 0
    )


def test_fn_json_19_digit_parity(spark, tmp_path):
    """The registered fn_json ({1,18} gate since r13) survives a
    20-digit integer literal on both engines: the hostile row counts in
    n_events and contributes nothing to sum_k."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        shutil.copy(f, sf)
    t = pq.read_table(f"{sf}/events.parquet")
    pdf = t.to_pandas()
    hostile = pdf.iloc[[0]].copy()
    hostile["event_id"] = 970001
    hostile["props"] = '{"k": "99999999999999999999"}'
    merged = pd.concat([pdf, hostile], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(merged, schema=t.schema, preserve_index=False),
        f"{sf}/events.parquet",
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    got = _assert_exact("fn_json", spark, sf, con)
    hostile_type = pdf.iloc[0]["event_type"]
    base = (pdf["event_type"] == hostile_type).sum()
    assert (
        int(got.set_index("event_type").loc[hostile_type, "n_events"])
        == base + 1
    )
    # fixture-invisible: every fixture k is <= 18 digits
    for sfd in (SF_SMOKE, "/root/testdata/sf0.01"):
        ev = spark.read.parquet(f"{sfd}/events.parquet")
        over = ev.where(
            F.get_json_object("props", "$.k").rlike("^-?[0-9]{19,}$")
        ).count()
        assert over == 0
