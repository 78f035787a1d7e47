"""Pre-measurement for the r13-queued fix (r10 'nulls' lens, target
r10-vintage -> due r13): dedup_cluster_keepers' Spark side still SIGNS
NULL-text documents (its edge build predates the NULL-text contract).
Since the r11 duck_h62 '||' hardening landed, the oracle no longer
CRASHES on them — it NULL-propagates their hashes, so they appear as two
separate singleton clusters — while the Spark side's null-safe signature
agreement pairs the identical all-NULL signatures into ONE cluster: a
one-row divergence on hostile input (verified live at r11; the exact
shape is pinned in part (a) below). The full fix is the established head
filter (``WHERE text IS NOT NULL``) on BOTH engines — an unreadable
payload is not a document to cluster, so NULL-text docs then appear in
NEITHER the edge graph NOR the singleton set.

This premeasure proves the proposed end state on a hostile fixture; at
r13 landing it is a mechanical edit (head filter both sides, move the
name into _CHANGED, selfcheck).
"""
from __future__ import annotations

import os
import re
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
    """(a) today the engines DIVERGE on a pair of NULL-text docs: Spark
    signs both with identical all-NULL signatures and its null-safe
    agreement clusters them together (the lower id keeps), while the
    '||'-hardened oracle NULL-propagates their hashes and emits them as
    two singleton keepers; (b) the proposed r13 variant (head filter on
    both engines) reaches exact parity with NULL-text docs in neither
    output; (c) fixture text is never NULL, so current attestations are
    honest."""
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

    # (a) current shapes diverge exactly as diagnosed
    got = QUERIES["dedup_cluster_keepers"](spark, str(tmp_path)).toPandas()
    want = con.execute(ORACLES["dedup_cluster_keepers"]).fetchdf()
    g = got.set_index("doc_id")
    w = want.set_index("doc_id")
    assert {970001, 970002} <= set(got["doc_id"]), (
        "Spark still clusters NULL-text docs today; if not, the fix "
        "landed — retire this half"
    )
    assert int(g.loc[970002, "cluster_id"]) == 970001, (
        "Spark pairs the two all-NULL signatures into one cluster today; "
        "if not, the fix landed — retire this half"
    )
    assert int(w.loc[970002, "cluster_id"]) == 970002 and bool(
        w.loc[970002, "is_keeper"]
    ), "the hardened oracle emits NULL-text docs as singletons"

    # (b) the PROPOSED r13 end state. Spark side: the head filter
    # commutes with pre-filtering the input file (per-row determinism),
    # so the registered query over a filtered copy IS the variant.
    filtered_dir = tmp_path / "filtered"
    os.makedirs(filtered_dir, exist_ok=True)
    poisoned[poisoned["text"].notna()].to_parquet(
        f"{filtered_dir}/documents.parquet"
    )
    fixed = QUERIES["dedup_cluster_keepers"](spark, str(filtered_dir)).toPandas()
    fixed_oracle = re.sub(
        r"\bFROM documents\b",
        "FROM documents WHERE text IS NOT NULL",
        ORACLES["dedup_cluster_keepers"],
    )
    assert fixed_oracle != ORACLES["dedup_cluster_keepers"]
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


def test_fn_json_r13_fix_bounds_integer_gate(spark, tmp_path):
    """Pre-measure the r13-queued fn_json gate bound (ADVICE r10 #2):
    (a) today a 19+-digit integer literal k passes the ^-?[0-9]+$ gate
    and the BIGINT cast CRASHES both engines; (b) the proposed
    ^-?[0-9]{1,18}$ bound restores exact parity (the hostile row counts
    in n_events, contributes nothing to sum_k); (c) fixture k values
    are far below the bound at every SF, so the tightened gate is
    fixture-identical."""
    import glob
    import shutil

    import pytest

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES
    from dbfs_spark_cache_spark.sources import load_table

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        shutil.copy(f, sf)
    import pyarrow as pa
    import pyarrow.parquet as pq

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

    # (a) both engines crash today (Spark raises CAST_INVALID_INPUT —
    # a 20-digit literal is "malformed" for BIGINT under ANSI; DuckDB a
    # conversion error)
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|CAST_OVERFLOW"):
        QUERIES["fn_json"](spark, sf).toPandas()
    with pytest.raises(Exception, match="[Cc]onvert|[Cc]ast"):
        con.execute(ORACLES["fn_json"]).fetchdf()

    # (b) the PROPOSED r13 variant: {1,18} bound on both engines
    events = load_table(spark, sf, "events")
    ks = F.get_json_object("props", "$.k")
    k = F.when(ks.rlike("^-?[0-9]{1,18}$"), ks.cast("long"))
    fixed = (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .toPandas()
    )
    fixed_oracle = ORACLES["fn_json"].replace("^-?[0-9]+$", "^-?[0-9]{1,18}$")
    assert fixed_oracle != ORACLES["fn_json"]
    fixed_want = con.execute(fixed_oracle).fetchdf()
    problems = _selfcheck_compare("fn_json_r13", fixed, fixed_want)
    assert not problems, problems

    # (c) fixture-invisible: every fixture k is <= 18 digits
    for sfd in (SF_SMOKE, "/root/testdata/sf0.01"):
        ev = spark.read.parquet(f"{sfd}/events.parquet")
        over = ev.where(
            F.get_json_object("props", "$.k").rlike("^-?[0-9]{19,}$")
        ).count()
        assert over == 0


# ---------------------------------------------------------------------------
# r11 nonfinite lens (TRUE NaN/Inf storage via direct pyarrow arrays — the
# r9 pandas-written NaN probe silently tested NULL instead, nan_as_null).
# The eight due-cohort findings landed at r11; these four targets are
# r10-vintage -> due r13. Fix shape is the established bad-telemetry
# contract: finite_or_null("value"/"c_acctbal") / functions.vec_finite on
# BOTH engines. A head filter commutes with pre-filtering the input file
# (per-row determinism), so each (b) half runs the REGISTERED query over a
# filtered copy against the WHERE-injected oracle.
# ---------------------------------------------------------------------------


def _nonfinite_sf(tmp_path):
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    from hostile_probe import build_nonfinite

    sf = str(tmp_path / "nf")
    os.makedirs(sf, exist_ok=True)
    build_nonfinite(SF_SMOKE, sf)
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'")
    return sf, con


def _finite_filtered_dir(tmp_path, sf, table: str, col: str, sub: str):
    """Copy of one table keeping rows where ``col`` IS NULL or finite —
    built with PURE pyarrow: a pandas round-trip cannot express the
    filter (pandas reads parquet NaN and NULL both as NaN, and
    ``to_parquet`` writes NaN back as NULL — the nan_as_null trap the
    nonfinite lens exists to escape)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = tmp_path / sub
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{sf}/{table}.parquet")
    v = t.column(col)
    keep = pc.or_kleene(pc.is_null(v), pc.is_finite(v))
    pq.write_table(t.filter(pc.fill_null(keep, True)), f"{out}/{table}.parquet")
    return str(out)


def test_tumbling_sliding_r13_fix_drops_nonfinite_values(spark, tmp_path):
    """(a) today one NaN reading crashes BOTH window oracles' DECIMAL
    sums while the Spark sides run; (b) finite_or_null on both engines
    restores exact parity; (c) every fixture value is finite."""
    sf, con = _nonfinite_sf(tmp_path)

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    filtered = _finite_filtered_dir(tmp_path, sf, "events", "value", "f_ev")
    for name in ("window_tumbling", "window_sliding"):
        got = QUERIES[name](spark, sf).toPandas()
        assert got is not None, f"{name}: Spark side must still run"
        with pytest.raises(Exception, match="[Cc]ast|[Cc]onvert"):
            con.execute(ORACLES[name]).fetchdf()

        fixed = QUERIES[name](spark, filtered).toPandas()
        fixed_oracle = ORACLES[name].replace(
            "WHERE ts IS NOT NULL",
            "WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))",
        )
        assert fixed_oracle != ORACLES[name], name
        fixed_want = con.execute(fixed_oracle).fetchdf()
        problems = _selfcheck_compare(f"{name}_r13", fixed, fixed_want)
        assert not problems, f"{name}: {problems}"

    assert (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .where(F.isnan("value") | (F.abs("value") == float("inf")))
        .count()
        == 0
    )


def test_q22_r13_fix_drops_nonfinite_balances(spark, tmp_path):
    """(a) today a NaN balance crashes the oracle's DECIMAL sum (and
    pollutes the Spark average into NaN, emptying the rich set); (b)
    finite_or_null on both engines restores exact parity."""
    import re

    sf, con = _nonfinite_sf(tmp_path)

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    with pytest.raises(Exception, match="[Cc]ast|[Cc]onvert"):
        con.execute(ORACLES["q22_global_sales_opportunity"]).fetchdf()

    out = _finite_filtered_dir(
        tmp_path, sf, "customer", "c_acctbal", "filtered_cust"
    )
    import shutil as _sh

    _sh.copy(f"{sf}/orders.parquet", f"{out}/orders.parquet")
    fixed = QUERIES["q22_global_sales_opportunity"](spark, str(out)).toPandas()
    fixed_oracle = re.sub(
        r"\bFROM customer\b",
        "FROM customer WHERE (c_acctbal IS NULL OR isfinite(c_acctbal))",
        ORACLES["q22_global_sales_opportunity"],
    )
    # fold a pre-existing WHERE (either read of customer) into AND
    fixed_oracle = re.sub(
        r"isfinite\(c_acctbal\)\)\s+WHERE\s+",
        "isfinite(c_acctbal)) AND ",
        fixed_oracle,
    )
    assert fixed_oracle != ORACLES["q22_global_sales_opportunity"]
    fixed_want = con.execute(fixed_oracle).fetchdf()
    problems = _selfcheck_compare("q22_r13", fixed, fixed_want)
    assert not problems, problems


def test_embedding_cosine_r13_fix_excludes_unusable_vectors(spark, tmp_path):
    """(a) today the NULL-component vector scores a finite cosine on
    DuckDB (list_sum skips NULLs) but NULL on Spark (fold propagates) —
    one pair exists on exactly one engine; (b) the vec_finite gate on
    both engines restores exact parity with the bad vectors in neither
    candidate space."""
    import re

    sf, con = _nonfinite_sf(tmp_path)

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    got = QUERIES["dedup_embedding_cosine"](spark, sf).toPandas()
    want = con.execute(ORACLES["dedup_embedding_cosine"]).fetchdf()
    assert _selfcheck_compare("cosine_current", got, want), (
        "expected the NULL-component divergence; if this now matches, "
        "the fix landed — retire this half"
    )

    out = tmp_path / "filtered_emb"
    os.makedirs(out, exist_ok=True)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")

    def usable(v):
        if v is None:
            return False
        arr = list(v)
        return all(
            x is not None and x == x and abs(x) != float("inf") for x in arr
        )

    emb[emb["embedding"].map(usable)].to_parquet(f"{out}/embeddings.parquet")
    fixed = QUERIES["dedup_embedding_cosine"](spark, str(out)).toPandas()
    fixed_oracle = re.sub(
        r"\bFROM embeddings\b",
        "FROM embeddings WHERE (embedding IS NOT NULL AND "
        "len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0)",
        ORACLES["dedup_embedding_cosine"],
    )
    assert fixed_oracle != ORACLES["dedup_embedding_cosine"]
    fixed_want = con.execute(fixed_oracle).fetchdf()
    problems = _selfcheck_compare("dedup_embedding_cosine_r13", fixed, fixed_want)
    assert not problems, problems

    # fixture-invisible at every SF: all embeddings finite and dense
    from dbfs_spark_cache_spark.functions import vec_finite

    assert (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .where(~vec_finite("embedding"))
        .count()
        == 0
    )
