"""Pre-measurement for the r12-queued fixes (r10 seventh lens: hostile
STRING CONTENT through the non-parquet source connectors — embedded
quotes, commas, backslashes, tabs, newlines, non-ASCII in the fields the
sidecars serialize).

scan_json_source and scan_csv_source are r9-vintage (re-attest r12), so
the one finding lands there; each test proves (a) the current shape
diverges exactly as diagnosed and (b) the proposed fix restores exact
parity, so landing is a mechanical edit at r12.

Finding: Spark's CSV READER defaults to multiLine=false — a quoted
embedded NEWLINE (RFC4180-legal, and exactly what Spark's own CSV WRITER
emits for such a field) is split into two broken records, while DuckDB's
read_csv parses it correctly. Quotes, commas, backslashes, tabs and
non-ASCII all round-trip exactly on both engines (held in the probe).
Fix: ``.option("multiLine", True)`` on the Spark read. Scale note for
the landing docstring: multiLine makes CSV files non-splittable (one
task per file) — the honest production trade is RFC4180 correctness
over intra-file parallelism; corpora needing splittable reads must
pre-escape newlines at write time instead.
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

_HOSTILE_STRINGS = [
    'quote " inside',
    "comma, inside",
    "newline\ninside",
    "backslash \\ and tab\t",
    "unicode é ẞ 中",
]


def _hostile_sf(tmp_path):
    """Copy sf0.001 and poison supplier.s_name / customer.c_mktsegment
    with the CSV/JSON hazard strings."""
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


def test_scan_csv_r12_fix_parses_quoted_newlines(spark, tmp_path):
    """(a) today a quoted embedded newline splits into two broken rows on
    the Spark side (multiLine=false default); (b) the proposed
    multiLine=True read restores exact parity; (c) fixture strings are
    newline-free at every SF, so current attestations are honest."""
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES
    from dbfs_spark_cache_spark.operators.source_scans import _CSV_DIR

    sf = _hostile_sf(tmp_path)
    got = QUERIES["scan_csv_source"](spark, sf).toPandas()
    con = duckdb.connect()
    want = con.execute(ORACLES["scan_csv_source"]).fetchdf()
    assert len(got) == len(want) + 1, (
        "expected exactly one broken extra record from the split quoted "
        "newline; if this now matches, the fix landed — retire this half"
    )
    # the two shards of the split record: the pre-newline fragment with
    # a NULL cents, and the orphaned cents value parsed as a segment
    frags = set(got["c_mktsegment"]) - set(want["c_mktsegment"])
    assert any("\n" not in f for f in frags) and "SEG\nNEWLINE" not in set(
        got["c_mktsegment"]
    )

    # (b) the PROPOSED r12 variant: multiLine=True over the same sidecar
    fixed = (
        spark.read.schema(
            "c_custkey bigint, c_mktsegment string, acctbal_cents bigint"
        )
        .option("header", True)
        .option("multiLine", True)
        .csv(_CSV_DIR)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("acctbal_cents").cast("bigint").alias("segment_cents"),
        )
        .toPandas()
    )
    problems = _selfcheck_compare("scan_csv_source_r12", fixed, want)
    assert not problems, problems

    # (c) fixture-invisible at every SF
    for sfd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        cust = spark.read.parquet(f"{sfd}/customer.parquet")
        assert (
            cust.where(F.col("c_mktsegment").rlike("[\\r\\n]")).count() == 0
        )


def test_scan_json_holds_parity_on_hostile_strings(spark, tmp_path):
    """The JSON twin HELD exact parity under the same hostile strings
    (JSON escapes newlines/quotes inside string literals, so there is no
    framing ambiguity) — pinned here so a future writer-dialect change
    cannot silently regress it."""
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    sf = _hostile_sf(tmp_path)
    got = QUERIES["scan_json_source"](spark, sf).toPandas()
    con = duckdb.connect()
    want = con.execute(ORACLES["scan_json_source"]).fetchdf()
    problems = _selfcheck_compare("scan_json_source_hostile", got, want)
    assert not problems, problems
    # the hostile names actually traveled through the NDJSON round-trip
    assert "newline\ninside" in set(got["s_name"])
