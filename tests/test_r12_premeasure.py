"""Pre-measurement for the r12-queued fixes. Each test proves (a) the
current shape diverges exactly as diagnosed and (b) the proposed fix
restores exact parity, so landing is a mechanical edit at r12 (the
target queries are all r9-vintage, re-attesting r12).

From the r10 hostile-content lens (embedded quotes/commas/backslashes/
tabs/newlines/non-ASCII through the source connectors):

- scan_csv_source: Spark's CSV READER defaults to multiLine=false — a
  quoted embedded NEWLINE (RFC4180-legal, and exactly what Spark's own
  CSV WRITER emits for such a field) splits into two broken records,
  while DuckDB's read_csv parses it correctly. Everything else
  round-trips exactly; the JSON twin held completely (parity pinned).
  Fix: ``.option("multiLine", True)``. Scale note for the landing
  docstring: multiLine makes CSV files non-splittable (one task per
  file) — the honest trade is RFC4180 correctness over intra-file
  parallelism; corpora needing splittable reads pre-escape newlines at
  write time instead.

From the r10 'nulls' lens (every non-key column NULL in a row slice):

- agg_collect_sorted: both engines skip NULL elements, but over an
  ALL-NULL group Spark's array_join of the empty array emits '' while
  STRING_AGG emits NULL. Fix: NULL for the empty collection.
- dedup_simhash: DuckDB's vote CASE gives NULL-text docs simhash 0 (so
  they pair with each other) while Spark's NULL chunks never join.
  Fix: WHERE text IS NOT NULL on both engines.
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


def _null_rows_table(src_path: str, dst_path: str, keep_cols: set, n: int = 3):
    """First n rows: every non-key column NULL, types preserved (the r10
    'nulls' lens shape)."""
    t = pq.read_table(src_path)
    import pyarrow.compute as pc

    mask = pa.array([i < n for i in range(t.num_rows)], type=pa.bool_())
    cols = []
    for field in t.schema:
        col = t.column(field.name).combine_chunks()
        if field.name not in keep_cols and t.num_rows:
            col = pc.if_else(mask, pa.nulls(t.num_rows, type=field.type), col)
        cols.append(col)
    pq.write_table(pa.table(cols, schema=t.schema), dst_path)


def test_collect_sorted_r12_fix_nulls_empty_collection(spark, tmp_path):
    """Pre-measure the r12-queued agg_collect_sorted fix (r10 'nulls'
    lens): both engines SKIP NULL elements in the collection (parity on
    mixed groups), but over an ALL-NULL group Spark's array_join of the
    empty array emits '' while SQL STRING_AGG emits NULL. Fix: emit NULL
    when the collected array is empty — ``when(size(collected) > 0,
    array_join(...))`` — the SQL aggregate-over-no-values convention."""
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES
    from dbfs_spark_cache_spark.sources import load_table

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
    g_null = got[got["n_regionkey"].isna()]["nation_csv"].iloc[0]
    w_null = want[want["n_regionkey"].isna()]["nation_csv"].iloc[0]
    assert g_null == "" and pd.isna(w_null), (
        "expected '' vs NULL on the all-NULL group; if this now matches, "
        "the fix landed — retire this half"
    )

    # the PROPOSED r12 variant
    nation = load_table(spark, str(tmp_path), "nation")
    collected = F.array_sort(F.collect_list("n_name"))
    fixed = (
        nation.groupBy("n_regionkey")
        .agg(
            F.when(F.size(collected) > 0, F.array_join(collected, ",")).alias(
                "nation_csv"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .toPandas()
    )
    problems = _selfcheck_compare("agg_collect_sorted_r12", fixed, want)
    assert not problems, problems

    # parity on a MIXED group (some NULL names, some real) needs no code:
    # collect_list and STRING_AGG both skip NULL elements — prove it
    mixed = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    mixed.loc[0, "n_name"] = None  # keep its real n_regionkey
    mixed.to_parquet(f"{tmp_path}/nation2.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{tmp_path}/nation2.parquet'"
    )
    os.makedirs(f"{tmp_path}/mixed", exist_ok=True)
    shutil.copy(f"{tmp_path}/nation2.parquet", f"{tmp_path}/mixed/nation.parquet")
    got2 = QUERIES["agg_collect_sorted"](spark, f"{tmp_path}/mixed").toPandas()
    want2 = con2.execute(ORACLES["agg_collect_sorted"]).fetchdf()
    problems = _selfcheck_compare("agg_collect_sorted_r12_mixed", got2, want2)
    assert not problems, problems


def test_simhash_r12_fix_excludes_null_text(spark, tmp_path, monkeypatch):
    """Pre-measure the r12-queued dedup_simhash NULL-text fix (r10
    'nulls' lens): DuckDB's vote CASE treats the NULL token list as zero
    votes, giving every NULL-text doc simhash 0 — so they all pair with
    each other (hamming 0) — while Spark's NULL simhash produces NULL
    chunks that never join. Fix: ``WHERE text IS NOT NULL`` on BOTH
    engines (the established unreadable-payload contract)."""
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
    extra = want.merge(got, on=["doc_a", "doc_b"], how="left", indicator=True)
    duck_only = extra[extra["_merge"] == "left_only"]
    null_ids = {0, 1, 2}
    assert len(duck_only) >= 3 and set(duck_only["doc_a"]).issubset(null_ids), (
        "expected the NULL-text docs to pair only on the DuckDB side; if "
        "this now matches, the fix landed — retire this half"
    )

    # The landing diff is a head filter on BOTH engines; a head filter
    # commutes with pre-filtering the input file (the pipeline is
    # per-row deterministic), so the registered query over a filtered
    # copy IS the proposed Spark variant, compared against the fixed
    # oracle (WHERE injected) over the poisoned view.
    import re

    fixed_oracle = re.sub(
        r"\bFROM documents\b",
        "FROM documents WHERE text IS NOT NULL",
        ORACLES["dedup_simhash"],
    )
    assert fixed_oracle != ORACLES["dedup_simhash"]
    filtered_dir = tmp_path / "filtered"
    os.makedirs(filtered_dir, exist_ok=True)
    pdf = pd.read_parquet(f"{tmp_path}/documents.parquet")
    pdf[pdf["text"].notna()].to_parquet(f"{filtered_dir}/documents.parquet")
    fixed = QUERIES["dedup_simhash"](spark, str(filtered_dir)).toPandas()
    fixed_want = con.execute(fixed_oracle).fetchdf()
    problems = _selfcheck_compare("dedup_simhash_r12", fixed, fixed_want)
    assert not problems, problems
