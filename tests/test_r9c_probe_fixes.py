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
(r7-vintage, queued r10, pre-measures in the since-retired test_r10_premeasure.py; pins now in test_r10_window_fixes.py) and
``text_clean_normalize`` (r8-vintage, queued r11); the other 147 held
exact parity. All seven findings are fixture-invisible: every fixture
table is non-empty and pure ASCII at every SF (verified).

A NaN/±Infinity lens (bad-telemetry values poisoned into events.value,
c_acctbal and the embedding vectors) found 12 more: the four due-cohort
members are fixed HERE with the shared ``registry.finite_or_null``
guard (non-finite excluded identically on both engines, NULLs keep
flowing) and pinned below; the eight non-due ones are queued
(r10: q22_global_sales_opportunity, window_tumbling, window_sliding;
r11: events_anomaly_mad, events_value_zscore, window_time_range_rolling,
embedding_kmeans_assign, embedding_quantize_int8). An extreme-dates
lens (1678/1900/2261 instants — the pandas-ns-representable range; the
probe harness cannot compare wider because .toPandas() converts us->ns)
held 150/150: both engines are proleptic-Gregorian-consistent.
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


# ---------------------------------------------------------------------------
# NaN/±Infinity probe — due-cohort fixes landed at r9 (rule 2b)
# ---------------------------------------------------------------------------


def _nan_sf(tmp_path):
    """Copy sf0.001 and poison events.value / customer.c_acctbal with
    NaN/+Inf/-Inf plus a NULL control row (bad telemetry values).

    Appends go through pyarrow arrays, NOT pandas frames: pandas'
    parquet writer turns float NaN into parquet NULL (nan_as_null), so
    a pandas-built fixture silently tests the NULL path instead of the
    NaN one (this bit the first version of these pins)."""
    import glob as _glob
    import math
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path / "nan_sf")
    os.makedirs(sf, exist_ok=True)
    for f in _glob.glob(f"{SF_SMOKE}/*.parquet"):
        shutil.copy(f, sf)

    def append(table, rows_cols):
        path = f"{sf}/{table}.parquet"
        t = pq.read_table(path)
        base = {
            name: [t.column(name)[0].as_py()] * len(next(iter(rows_cols.values())))
            for name in t.schema.names
            if name not in rows_cols
        }
        extra = pa.table(
            {n: pa.array(v, type=t.schema.field(n).type)
             for n, v in {**base, **rows_cols}.items()},
            schema=t.schema,
        )
        pq.write_table(pa.concat_tables([t, extra]), path)

    append("events", {
        "event_id": [960001, 960002, 960003, 960004],
        "user_id": [42, 42, 42, 42],
        "value": [math.nan, math.inf, -math.inf, None],
    })
    append("customer", {
        "c_custkey": [960101, 960102, 960103],
        "c_acctbal": [math.nan, math.inf, -math.inf],
    })
    con = duckdb.connect()
    for f in _glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(f).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    return sf, con


def test_histogram_excludes_non_finite_on_both_engines(spark, tmp_path):
    """Spark's FLOOR(double)->LONG silently binned NaN at 0 and ±Inf at
    Long.MIN/MAX while DuckDB's bin cast raised; the finite guard drops
    the rows identically (NULL still flows to the NULL bin)."""
    sf, con = _nan_sf(tmp_path)
    got = _registered_parity(spark, sf, con, "events_value_histogram")
    assert got["bin"].isna().sum() == 1  # the NULL-value control row
    # no saturated ±Inf bins survived (Long.MIN/MAX // 5)
    finite_bins = got["bin"].dropna().astype("int64")
    assert finite_bins.abs().max() < 10**15


def test_running_frames_exclude_non_finite_on_both_engines(spark, tmp_path):
    sf, con = _nan_sf(tmp_path)
    got = _registered_parity(spark, sf, con, "window_running_frames")
    assert 960004 in set(got["event_id"])  # NULL control row kept
    assert not {960001, 960002, 960003} & set(got["event_id"])


def test_grouped_map_excludes_non_finite_on_both_engines(spark, tmp_path):
    """pandas min/max skip NaN where SQL MIN/MAX sort it above +Inf —
    the hostile user's summary row diverged per engine before the
    guard."""
    sf, con = _nan_sf(tmp_path)
    got = _registered_parity(spark, sf, con, "grouped_map_pandas")
    u42 = got.set_index("user_id").loc[42]
    assert int(u42["n_events"]) == 1  # only the NULL control row remains


def test_csv_source_survives_non_finite_balances(spark, tmp_path):
    """The cents integerization is an ANSI double->BIGINT cast, which
    raised CAST_OVERFLOW on NaN — one bad row killed the whole sidecar
    conversion; non-finite balances now drop before the cast on the
    derivation both engines read."""
    sf, con = _nan_sf(tmp_path)
    got = _registered_parity(spark, sf, con, "scan_csv_source")
    assert len(got) > 0
