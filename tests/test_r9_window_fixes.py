"""Hostile-parity pins for the r9 late-round due-cohort fixes.

A two-engine probe of the full r9 window (all 50 due queries on
poisoned fixtures) found seven members with fixture-invisible
divergences or crashes; since they were all IN the current due cohort,
the fixes landed immediately (frozen-policy rule 2b — slot-neutral)
rather than queueing for r12. These tests run the REGISTERED query and
oracle on the hostile fixtures and require exact parity — they are
regression pins, not pre-measures.

- orders_year_over_year: NULL-date year ordered NULLS FIRST on Spark
  vs LAST on DuckDB (re-chaining every prev_revenue), and a
  zero-revenue previous year crashed the ANSI division. Fixed:
  asc_nulls_last + NULLIF on both engines.
- window_lag_lead / window_running_frames: NULL-ts stragglers at the
  head of Spark's frames vs the tail of the oracle's. Fixed:
  asc_nulls_last.
- window_ntile_cume: the banded global-rank helper's partition joins
  used plain equality, silently DROPPING rows whose partition key is
  NULL — diverging from SQL PARTITION BY and Spark's own window alike.
  Fixed: null-safe (<=>)) joins in distributed_global_percentiles.
- dedup_ngram_jaccard / split_contamination_check /
  text_rolling_hash_shingles: the portable-hash oracle emitted a bare
  '0x' on NULL text (DuckDB concat skips NULL) and crashed its BIGINT
  cast, while Spark hashed a synthetic empty shingle. Fixed: NULL-text
  exclusion on both engines.
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

from tests.conftest import SF_SMOKE  # noqa: E402


def _poisoned_sf(tmp_path, poisons: dict):
    """Copy sf0.001 and append schema-preserving hostile rows per table."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        shutil.copy(f, sf)
    for table, extra_fn in poisons.items():
        t = pq.read_table(f"{sf}/{table}.parquet")
        pdf = t.to_pandas()
        merged = pd.concat([pdf, extra_fn(pdf)], ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(merged, schema=t.schema, preserve_index=False),
            f"{sf}/{table}.parquet",
        )
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'")
    return sf, con


def _assert_registered_parity(spark, sf, con, name, monkeypatch=None):
    if monkeypatch is not None:
        monkeypatch.setenv("SPARK_GRAFT_HASH_FAMILY", "portable")
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    got = QUERIES[name](spark, sf).toPandas()
    duck = con.execute(ORACLES[name]).fetchdf()
    problems = _selfcheck_compare(name, got, duck)
    assert not problems, f"{name}: {problems}"


def _null_priority_orders(pdf):
    e = pdf.head(2).copy()
    e["o_orderkey"] = [990001, 990002]
    e["o_orderpriority"] = [None, "5-LOW"]
    e["o_orderdate"] = [pd.NaT, pdf["o_orderdate"].iloc[0]]
    e["o_totalprice"] = [0.0, 1e9]
    return e


def _null_ts_events(pdf):
    e = pdf.head(3).copy()
    e["event_id"] = [970001, 970002, 970003]
    e["ts"] = [pd.NaT, pdf["ts"].iloc[0], pdf["ts"].iloc[0]]
    e["value"] = [None, 0.0, 5.0]
    e["event_type"] = [None, "singleton_type", "singleton_type2"]
    e["props"] = [None, "{}", '{"k": 2}']
    return e


def _null_text_docs(pdf):
    return pd.DataFrame(
        [
            {**pdf.iloc[0].to_dict(), "doc_id": 980001, "text": None},
            {**pdf.iloc[1].to_dict(), "doc_id": 980002, "text": ""},
        ]
    )


def test_year_over_year_survives_null_year_and_zero_revenue(spark, tmp_path):
    sf, con = _poisoned_sf(tmp_path, {"orders": _null_priority_orders})
    _assert_registered_parity(spark, sf, con, "orders_year_over_year")


def test_lag_lead_null_ts_orders_last_on_both_engines(spark, tmp_path):
    sf, con = _poisoned_sf(tmp_path, {"events": _null_ts_events})
    _assert_registered_parity(spark, sf, con, "window_lag_lead")


def test_running_frames_null_ts_orders_last_on_both_engines(spark, tmp_path):
    sf, con = _poisoned_sf(tmp_path, {"events": _null_ts_events})
    _assert_registered_parity(spark, sf, con, "window_running_frames")


def test_ntile_cume_keeps_null_partition_key_rows(spark, tmp_path):
    sf, con = _poisoned_sf(tmp_path, {"orders": _null_priority_orders})
    from dbfs_spark_cache_spark.operators import QUERIES

    got = QUERIES["window_ntile_cume"](spark, sf).toPandas()
    # the NULL-priority row must be PRESENT (was silently dropped by the
    # plain-equality partition joins) and ranked within its own group
    assert (got["o_orderkey"] == 990001).any()
    _assert_registered_parity(spark, sf, con, "window_ntile_cume")


def test_banded_helper_null_partition_matches_plain_window(spark, tmp_path):
    """The helper's contract is equality with Spark's OWN plain window —
    pin that a NULL partition key now ranks identically in both forms."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dbfs_spark_cache_spark.operators.scale import (
        distributed_global_percentiles,
    )

    rows = [(i, ["a", "b", None][i % 3], float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    banded = distributed_global_percentiles(
        df,
        value_col="v",
        tiebreak_col="id",
        partition_cols=["grp"],
        pct_col="p",
        cume_col="c",
        tile_col="t",
    ).toPandas()
    w = W.partitionBy("grp").orderBy("v")
    wd = W.partitionBy("grp").orderBy("v", "id")
    plain = df.select(
        "id",
        "grp",
        "v",
        F.percent_rank().over(w).alias("p"),
        F.cume_dist().over(w).alias("c"),
        F.ntile(10).over(wd).cast("long").alias("t"),
    ).toPandas()
    merged = banded.sort_values("id").reset_index(drop=True)
    plain = plain.sort_values("id").reset_index(drop=True)
    assert len(merged) == len(plain) == 60
    for col in ("p", "c", "t"):
        assert (merged[col] - plain[col]).abs().max() < 1e-12, col


def test_ngram_jaccard_survives_null_text(spark, tmp_path, monkeypatch):
    sf, con = _poisoned_sf(tmp_path, {"documents": _null_text_docs})
    _assert_registered_parity(
        spark, sf, con, "dedup_ngram_jaccard", monkeypatch
    )


def test_contamination_check_survives_null_text(spark, tmp_path, monkeypatch):
    sf, con = _poisoned_sf(tmp_path, {"documents": _null_text_docs})
    _assert_registered_parity(
        spark, sf, con, "split_contamination_check", monkeypatch
    )


def test_rolling_hash_survives_null_text(spark, tmp_path, monkeypatch):
    sf, con = _poisoned_sf(tmp_path, {"documents": _null_text_docs})
    _assert_registered_parity(
        spark, sf, con, "text_rolling_hash_shingles", monkeypatch
    )
