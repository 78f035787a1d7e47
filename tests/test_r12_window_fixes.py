"""Regression pins for the r12 due-slot batch (promoted from the
since-retired tests/test_r12_premeasure.py — every proposed diff those
tests encoded is now the REGISTERED implementation/oracle, so each pin
runs the registered query + oracle on the same hostile fixture and
asserts exact parity).

The batch (all three names r9-vintage, landed slot-neutral in their own
due round — see __spark_entry__._CHANGED):

- scan_csv_source: ``.option("multiLine", True)`` — a quoted embedded
  newline (RFC4180-legal, and exactly what Spark's own CSV writer emits)
  now parses as one record on both engines (r10 hostile-content lens).
- agg_collect_sorted: the collection emits NULL (not '') over an
  all-NULL group — the SQL aggregate-over-no-values convention (r10
  'nulls' lens).
- dedup_simhash: ``WHERE text IS NOT NULL`` at the head of BOTH engines
  (r10 'nulls' lens; the unreadable-payload contract its MinHash /
  Jaccard siblings landed at r11).
"""
from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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

_HOSTILE_STRINGS = [
    'quote " inside',
    "comma, inside",
    "newline\ninside",
    "backslash \\ and tab\t",
    "unicode é ẞ 中",
]


def _hostile_sf(tmp_path):
    """Copy sf0.001 and poison supplier.s_name / customer.c_mktsegment
    with the CSV/JSON hazard strings (the r10 hostile-content shape)."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        shutil.copy(f, sf)
    for table, col in (("supplier", "s_name"), ("customer", "c_mktsegment")):
        t = pq.read_table(f"{sf}/{table}.parquet")
        pdf = t.to_pandas()
        for i, s in enumerate(_HOSTILE_STRINGS[: min(len(pdf), 5)]):
            pdf.loc[i, col] = s
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{sf}/{table}.parquet",
        )
    return sf


def _null_rows_table(src_path: str, dst_path: str, keep_cols: set, n: int = 3):
    """First n rows: every non-key column NULL, types preserved (the r10
    'nulls' lens shape)."""
    t = pq.read_table(src_path)
    mask = pa.array([i < n for i in range(t.num_rows)], type=pa.bool_())
    cols = []
    for field in t.schema:
        col = t.column(field.name).combine_chunks()
        if field.name not in keep_cols and t.num_rows:
            col = pc.if_else(mask, pa.nulls(t.num_rows, type=field.type), col)
        cols.append(col)
    pq.write_table(pa.table(cols, schema=t.schema), dst_path)


def test_scan_csv_quoted_newline_parity(spark, tmp_path):
    """The registered CSV scan (multiLine=True since r12) round-trips a
    quoted embedded newline as ONE record, exactly matching DuckDB."""
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    sf = _hostile_sf(tmp_path)
    got = QUERIES["scan_csv_source"](spark, sf).toPandas()
    con = duckdb.connect()
    want = con.execute(ORACLES["scan_csv_source"]).fetchdf()
    problems = _selfcheck_compare("scan_csv_source", got, want)
    assert not problems, problems
    # the hostile newline segment actually traveled through the CSV
    # round-trip intact (not silently dropped or split)
    assert "newline\ninside" in set(got["c_mktsegment"])


def test_scan_json_holds_parity_on_hostile_strings(spark, tmp_path):
    """The JSON twin held exact parity under the same hostile strings
    without any fix (JSON escapes newlines/quotes inside string
    literals, so there is no framing ambiguity) — pinned so a future
    writer-dialect change cannot silently regress it."""
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    sf = _hostile_sf(tmp_path)
    got = QUERIES["scan_json_source"](spark, sf).toPandas()
    con = duckdb.connect()
    want = con.execute(ORACLES["scan_json_source"]).fetchdf()
    problems = _selfcheck_compare("scan_json_source_hostile", got, want)
    assert not problems, problems
    assert "newline\ninside" in set(got["s_name"])


def test_collect_sorted_all_null_group_emits_null(spark, tmp_path):
    """All-NULL group -> NULL collection on both engines (was '' vs
    NULL); mixed group (NULL elements skipped) stays exact."""
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    _null_rows_table(
        f"{SF_SMOKE}/nation.parquet",
        f"{tmp_path}/nation.parquet",
        {"n_nationkey"},
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{tmp_path}/nation.parquet'"
    )
    got = QUERIES["agg_collect_sorted"](spark, str(tmp_path)).toPandas()
    want = con.execute(ORACLES["agg_collect_sorted"]).fetchdf()
    problems = _selfcheck_compare("agg_collect_sorted", got, want)
    assert not problems, problems
    # the all-NULL group is genuinely exercised and genuinely NULL
    g_null = got[got["n_regionkey"].isna()]["nation_csv"].iloc[0]
    assert pd.isna(g_null)

    # mixed group: NULL elements skipped identically (no code needed —
    # collect_list and STRING_AGG both skip NULLs; prove it stays so)
    mixed = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    mixed.loc[0, "n_name"] = None  # keep its real n_regionkey
    os.makedirs(f"{tmp_path}/mixed", exist_ok=True)
    mixed.to_parquet(f"{tmp_path}/mixed/nation.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{tmp_path}/mixed/nation.parquet'"
    )
    got2 = QUERIES["agg_collect_sorted"](spark, f"{tmp_path}/mixed").toPandas()
    want2 = con2.execute(ORACLES["agg_collect_sorted"]).fetchdf()
    problems = _selfcheck_compare("agg_collect_sorted_mixed", got2, want2)
    assert not problems, problems


def test_simhash_null_text_excluded_both_engines(spark, tmp_path, monkeypatch):
    """NULL-text docs drop at the head of BOTH engines: exact parity on
    the poisoned fixture, and no NULL-text doc appears in any pair."""
    monkeypatch.setenv("SPARK_GRAFT_HASH_FAMILY", "portable")

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    _null_rows_table(
        f"{SF_SMOKE}/documents.parquet",
        f"{tmp_path}/documents.parquet",
        {"doc_id"},
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    got = QUERIES["dedup_simhash"](spark, str(tmp_path)).toPandas()
    want = con.execute(ORACLES["dedup_simhash"]).fetchdf()
    problems = _selfcheck_compare("dedup_simhash", got, want)
    assert not problems, problems
    # the three NULL-text doc_ids (0,1,2) pair with nothing on either side
    null_ids = {0, 1, 2}
    assert not (set(want["doc_a"]) | set(want["doc_b"])) & null_ids
    assert not (set(got["doc_a"]) | set(got["doc_b"])) & null_ids
