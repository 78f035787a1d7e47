"""Zero-row-probe regression pins (r9 fourth batch).

A new probe lens — every fixture table EMPTY but schema-preserving, the
"no data arrived for this partition/day" production shape — run
two-engine over the full 150-query registry found 4 divergences
(146/150 held exact parity; a single-row probe held 150/150):

- ``scan_json_source`` (r9-due, fixed HERE): the oracle's
  ``read_json_auto`` has nothing to infer from on an empty NDJSON
  sidecar and fails to bind the projected columns, while the
  schema-pinned Spark read correctly returns the empty relation. Fixed
  by declaring the same explicit columns in the oracle (the CSV twin's
  existing contract) — these tests pin empty-source parity end-to-end.
- ``agg_cube`` / ``agg_rollup`` / ``agg_grouping_sets`` (r8-vintage,
  QUEUED for r11): on empty input Spark's grouping-sets expansion emits
  zero rows while DuckDB (SQL standard) emits the grand-total ``()``
  row. Pre-measures live in tests/test_r11_premeasure.py.

A Unicode-hostile probe (case-mapping edges, ligatures, astral plane,
bidi controls) found 3 more — ``fn_string`` / ``dedup_fingerprint``
(r7-vintage, queued r10, pre-measures in test_r10_premeasure.py) and
``text_clean_normalize`` (r8-vintage, queued r11); the other 147 held
exact parity. All seven findings are fixture-invisible: every fixture
table is non-empty and pure ASCII at every SF (verified).
"""
from __future__ import annotations

import glob
import os
import sys

import duckdb
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


def _empty_sf(tmp_path):
    """Schema-preserving zero-row twin of the sf0.001 fixture dir."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    con = duckdb.connect()
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        name = os.path.basename(f)
        pq.write_table(pq.read_schema(f).empty_table(), f"{sf}/{name}")
        con.execute(
            f"CREATE VIEW {name.removesuffix('.parquet')} AS "
            f"SELECT * FROM '{sf}/{name}'"
        )
    return sf, con


def _registered_parity(spark, sf, con, name):
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    got = QUERIES[name](spark, sf).toPandas()
    duck = con.execute(ORACLES[name]).fetchdf()
    problems = _selfcheck_compare(name, got, duck)
    assert not problems, f"{name}: {problems}"
    return got


def test_scan_json_source_empty_source_returns_empty_on_both_engines(
    spark, tmp_path
):
    """The fixed oracle (explicit read_json columns) binds and returns
    the empty relation where read_json_auto raised a Binder Error; the
    Spark side already returned zero rows via its pinned schema."""
    sf, con = _empty_sf(tmp_path)
    got = _registered_parity(spark, sf, con, "scan_json_source")
    assert len(got) == 0


def test_scan_json_source_unchanged_on_populated_fixture(spark):
    """The explicit-columns oracle is value-identical to read_json_auto
    on real data — same rows, schema, and values at sf0.001."""
    con = duckdb.connect()
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        name = os.path.basename(f).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    got = _registered_parity(spark, SF_SMOKE, con, "scan_json_source")
    assert len(got) > 0
