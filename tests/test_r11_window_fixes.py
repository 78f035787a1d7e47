"""Regression pins for the r11 due-slot batch (promoted from the
since-retired tests/test_r11_premeasure.py — every proposed diff those
tests encoded is now the REGISTERED implementation/oracle, so each pin
runs the registered query + oracle on the same hostile fixture and
asserts exact parity).

The batch (all twenty-one names r8-vintage, landed slot-neutral in
their own due round — see __spark_entry__._CHANGED):

- dedup_minhash_lsh / dedup_token_jaccard / dedup_incremental_vs_corpus:
  duck_h62 '||' NULL-propagation + WHERE text IS NOT NULL at the corpus
  head on both engines.
- embedding_kmeans_assign: unquantizable vectors (|x| >= 9.2e18/_KM_Q)
  excluded on both engines.
- embedding_quantize_int8: NULL embeddings excluded on both engines.
- window_value_frames: asc_nulls_last on the Spark window.
- events_value_zscore: x^2 power sum widened to DECIMAL(38,12).
- pipeline_dedup_survivors: NULL-text dropped at the funnel head +
  distinct exact-survivor stage (both engines).
- agg_cube / agg_rollup / agg_grouping_sets: oracle HAVING COUNT(*) > 0
  (empty-input grand-total alignment; populated inputs byte-identical).
- text_clean_normalize / pipeline_training_corpus (canonical_clean):
  İ -> i folded before lowering on both engines.
- events_anomaly_mad: deviation frame staged through the cache engine —
  plan collapses from 81 pushed scans / 101 exchanges to ~2 / ~18.
- asof_join_union_window: final (event_id, user_id) grouping.
- multimodal_decode_features: oracle pmod header formulas + exploded
  byte-row dedup (both oracle-only).
- similarity_topk_batch: DISTINCT vec_id before ORDER BY/LIMIT.
- agg_approx_percentile: coalesce(within, e50 IS NULL) tolerance flag.
- r11 nonfinite lens (in-round): finite_or_null on events_value_zscore /
  window_time_range_rolling / events_resample_gapfill /
  events_anomaly_mad; functions.vec_finite on embedding_norms /
  embedding_kmeans_assign / embedding_quantize_int8 /
  similarity_topk_batch.
"""
from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
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

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _con_over(sf: str):
    con = duckdb.connect()
    for name in _TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'")
    return con


def _poisoned_sf(tmp_path, table: str, extra_fn):
    """Copy the sf0.001 fixture dir and append schema-preserving hostile
    rows to one table; returns (sf_dir, duckdb connection over it)."""
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        shutil.copy(f, sf)
    t = pq.read_table(f"{sf}/{table}.parquet")
    pdf = t.to_pandas()
    merged = pd.concat([pdf, extra_fn(pdf)], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(merged, schema=t.schema, preserve_index=False),
        f"{sf}/{table}.parquet",
    )
    return sf, _con_over(sf)


def _parity(name, spark, sf, con):
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    got = QUERIES[name](spark, sf).toPandas()
    want = con.execute(ORACLES[name]).fetchdf()
    problems = _selfcheck_compare(name, got, want)
    assert not problems, f"{name}: {problems}"
    return got


def _null_text_docs(pdf):
    return pd.DataFrame(
        [
            {**pdf.iloc[0].to_dict(), "doc_id": 980001, "text": None},
            {**pdf.iloc[1].to_dict(), "doc_id": 980002, "text": ""},
        ]
    )


def test_dedup_family_survives_null_text(spark, tmp_path, monkeypatch):
    """duck_h62 '||' + NULL-text head filter: the registered dedup trio
    reaches exact parity on a corpus holding a NULL-text and an
    empty-text document, and neither engine signs the NULL doc."""
    monkeypatch.setenv("SPARK_GRAFT_HASH_FAMILY", "portable")
    sf, con = _poisoned_sf(tmp_path, "documents", _null_text_docs)

    from dbfs_spark_cache_spark.operators.dedup import minhash_signatures
    from dbfs_spark_cache_spark.sources import load_table

    for name in (
        "dedup_minhash_lsh",
        "dedup_token_jaccard",
        "dedup_incremental_vs_corpus",
    ):
        _parity(name, spark, sf, con)

    n_null_sig = (
        minhash_signatures(
            load_table(spark, sf, "documents").where(F.col("text").isNotNull())
        )
        .where(F.col("doc_id") == 980001)
        .count()
    )
    assert n_null_sig == 0, "the NULL-text doc must not be signed"

    # fixture-invisible: no NULL text at any SF
    assert (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where(F.col("text").isNull())
        .count()
        == 0
    )


def test_kmeans_survives_unquantizable_vector(spark, tmp_path):
    def poison(pdf):
        dim = len(pdf["embedding"].iloc[0])
        return pd.DataFrame(
            [
                {**pdf.iloc[0].to_dict(), "vec_id": 960002, "embedding": None},
                {
                    **pdf.iloc[2].to_dict(),
                    "vec_id": 960003,
                    "embedding": np.full(dim, 1e20, dtype="float32"),
                },
            ]
        )

    sf, con = _poisoned_sf(tmp_path, "embeddings", poison)
    got = _parity("embedding_kmeans_assign", spark, sf, con)
    assert not ({960002, 960003} & set(got["vec_id"]))


def test_quantize_excludes_null_embeddings(spark, tmp_path):
    def poison(pdf):
        return pd.DataFrame(
            [{**pdf.iloc[0].to_dict(), "vec_id": 960002, "embedding": None}]
        )

    sf, con = _poisoned_sf(tmp_path, "embeddings", poison)
    got = _parity("embedding_quantize_int8", spark, sf, con)
    assert 960002 not in set(got["vec_id"])


def test_value_frames_orders_nulls_last(spark, tmp_path):
    def poison(pdf):
        e = pdf.head(2).copy()
        e["o_orderkey"] = [990001, 990002]
        e["o_orderdate"] = [pd.NaT, pdf["o_orderdate"].iloc[0]]
        return e

    sf, con = _poisoned_sf(tmp_path, "orders", poison)
    _parity("window_value_frames", spark, sf, con)


def test_zscore_survives_1e9_value(spark, tmp_path):
    def poison(pdf):
        return pd.DataFrame(
            [{**pdf.iloc[0].to_dict(), "event_id": 970001, "value": -1e9}]
        )

    sf, con = _poisoned_sf(tmp_path, "events", poison)
    _parity("events_value_zscore", spark, sf, con)


def test_survivors_drops_null_text_at_funnel_head(
    spark, tmp_path, monkeypatch, clean_cache
):
    monkeypatch.setenv("SPARK_GRAFT_HASH_FAMILY", "portable")
    sf, con = _poisoned_sf(tmp_path, "documents", _null_text_docs)
    got = _parity("pipeline_dedup_survivors", spark, sf, con)
    assert 980001 not in set(got["doc_id"])


def _empty_sf(tmp_path):
    """Schema-preserving zero-row twin of the fixture dir — the 'no data
    arrived for this partition/day' production shape."""
    sf = str(tmp_path / "empty_sf")
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


def test_grouping_trio_empty_input_parity(spark, tmp_path):
    """The oracle's HAVING COUNT(*) > 0 replays Spark's zero-rows-on-
    empty-input semantics exactly, and is row-identical to the HAVING-
    free form on populated fixtures (no non-empty group can count 0)."""
    sf, con = _empty_sf(tmp_path)
    full_con = _con_over(SF_SMOKE)

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    for name in ("agg_cube", "agg_rollup", "agg_grouping_sets"):
        got = QUERIES[name](spark, sf).toPandas()
        assert len(got) == 0
        duck_pdf = con.execute(ORACLES[name]).fetchdf()
        assert len(duck_pdf) == 0, f"{name}: oracle must align on empty input"

        assert "HAVING COUNT(*) > 0" in ORACLES[name]
        cur = full_con.execute(ORACLES[name]).fetchdf()
        unfixed = full_con.execute(
            ORACLES[name].replace("HAVING COUNT(*) > 0", "")
        ).fetchdf()
        problems = _selfcheck_compare(f"{name}_populated", cur, unfixed)
        assert not problems, f"{name}: {problems}"
        assert len(cur) > 0


def test_clean_normalize_folds_dotted_i(spark, tmp_path):
    """canonical_clean folds İ -> i before lowering on both engines, so
    'İstanbul and İZMİR' cleans to 3 tokens with matching md5."""
    src = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    rows = pd.concat(
        [
            src.head(3),
            pd.DataFrame(
                [
                    {**src.iloc[0].to_dict(), "doc_id": 990103,
                     "text": "İstanbul and İZMİR"},
                ]
            ),
        ],
        ignore_index=True,
    )
    rows.to_parquet(f"{tmp_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    got = _parity("text_clean_normalize", spark, str(tmp_path), con)
    assert int(got.set_index("doc_id").loc[990103, "clean_tokens"]) == 3

    # fixture-invisible: fixture text is pure ASCII at every SF
    assert (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where(F.col("text").rlike("[^\\x00-\\x7F]"))
        .count()
        == 0
    )


def test_training_corpus_folds_dotted_i(spark, tmp_path, clean_cache):
    """The capstone inlines the same cleaning chain in its oracle; parity
    must hold on a corpus whose İ document passes the token gate."""
    src = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    # 26 distinct tokens: clears the n >= 20 gate with dup_frac 0
    long_i = "İstanbul " + " ".join(f"word{i}" for i in range(25))
    rows = pd.concat(
        [
            src,
            pd.DataFrame(
                [{**src.iloc[0].to_dict(), "doc_id": 990104, "text": long_i}]
            ),
        ],
        ignore_index=True,
    )
    rows.to_parquet(f"{tmp_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    got = _parity("pipeline_training_corpus", spark, str(tmp_path), con)
    assert 990104 in set(got["doc_id"])


def _plan_shape(df) -> tuple:
    """(pushed_scans, exchanges) with exactly the explain_audit metrics."""
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_pushed = sum(1 for p in pushed if p.strip())
    exchanges = len(
        re.findall(r"(?<!Broadcast)(?<!Reused)Exchange \(\d+\)", plan)
    )
    return n_pushed, exchanges


def test_anomaly_mad_staged_parity_and_plan(spark, clean_cache):
    """The registered query now stages the deviation frame: value-exact
    against the oracle AND the plan stays inside the ordinary registry
    envelope (the pre-staging shape was 81 pushed scans / 101 exchanges
    — the registry's one scale outlier)."""
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    df = QUERIES["events_anomaly_mad"](spark, SF_SMOKE)
    got = df.toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    want = con.execute(ORACLES["events_anomaly_mad"]).fetchdf()
    problems = _selfcheck_compare("events_anomaly_mad_staged", got, want)
    assert not problems, problems

    # A second build (cache hit) must plan within the collapsed envelope.
    scans, exchanges = _plan_shape(QUERIES["events_anomaly_mad"](spark, SF_SMOKE))
    assert scans <= 15 and exchanges <= 25, (
        f"staged plan regressed: {scans} scans / {exchanges} exchanges "
        "(want <= 15 / <= 25; pre-fix shape was 81 / 101)"
    )


def _dup_fixture(tmp_path, tables):
    """Every row of each table exactly duplicated — the at-least-once
    log-replay production shape."""
    con = duckdb.connect()
    for name in tables:
        t = pq.read_table(f"{SF_SMOKE}/{name}.parquet")
        pq.write_table(pa.concat_tables([t, t]), f"{tmp_path}/{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{tmp_path}/{name}.parquet'"
        )
    return con


def test_survivors_dedup_under_duplication(
    spark, tmp_path, monkeypatch, clean_cache
):
    """A dedup funnel emits ONE row per surviving document even when
    every input row arrives twice."""
    monkeypatch.setenv("SPARK_GRAFT_HASH_FAMILY", "portable")
    con = _dup_fixture(tmp_path, ["documents"])
    got = _parity("pipeline_dedup_survivors", spark, str(tmp_path), con)
    assert got["doc_id"].is_unique


def test_asof_union_window_under_duplication(spark, tmp_path):
    con = _dup_fixture(tmp_path, ["events"])
    got = _parity("asof_join_union_window", spark, str(tmp_path), con)
    assert got.set_index(["event_id", "user_id"]).index.is_unique

    # and on the UNIQUE fixture the grouping is a no-op (groups of one)
    _parity("asof_join_union_window", spark, SF_SMOKE, _con_over(SF_SMOKE))


def test_multimodal_decode_under_duplication(spark, tmp_path):
    con = _dup_fixture(tmp_path, ["documents"])
    _parity("multimodal_decode_features", spark, str(tmp_path), con)


def test_multimodal_decode_negative_ids(spark, tmp_path):
    """The oracle's pmod header formulas match the Python container
    builder's floored modulo on negative doc_ids."""
    t = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    pdf = t.to_pandas()
    pdf["doc_id"] = -pdf["doc_id"]
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
        f"{tmp_path}/documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    got = _parity("multimodal_decode_features", spark, str(tmp_path), con)
    neg = got[got["doc_id"] < 0]
    assert len(neg) > 0
    assert (neg["width"] == neg["doc_id"] % 64 + 1).all()  # Python floored

    # fixture-invisible: doc_id is non-negative at every SF
    assert (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where(F.col("doc_id") < 0)
        .count()
        == 0
    )


def test_topk_batch_under_duplication(spark, tmp_path):
    con = _dup_fixture(tmp_path, ["embeddings"])
    got = _parity("similarity_topk_batch", spark, str(tmp_path), con)
    assert sorted(got["q_id"].unique()) == [0, 1, 2, 3, 4], (
        "the distinct query batch must be 5 real queries under duplication"
    )


def _null_rows_table(src_path: str, dst_path: str, keep_cols: set, n: int = 3):
    """First n rows: every non-key column NULL, types preserved (the r10
    'nulls' lens shape — a malformed record keeps its key, loses its
    payload)."""
    import pyarrow.compute as pc

    t = pq.read_table(src_path)
    mask = pa.array([i < n for i in range(t.num_rows)], type=pa.bool_())
    cols = []
    for field in t.schema:
        col = t.column(field.name).combine_chunks()
        if field.name not in keep_cols and t.num_rows:
            col = pc.if_else(mask, pa.nulls(t.num_rows, type=field.type), col)
        cols.append(col)
    pq.write_table(pa.table(cols, schema=t.schema), dst_path)


def test_approx_percentile_all_null_group_flag(spark, tmp_path):
    """A group whose prices are all NULL carries a vacuously-TRUE
    tolerance flag on both engines (coalesce(within, e50 IS NULL))."""
    _null_rows_table(
        f"{SF_SMOKE}/lineitem.parquet",
        f"{tmp_path}/lineitem.parquet",
        {"l_orderkey", "l_linenumber"},
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{tmp_path}/lineitem.parquet'"
    )
    got = _parity("agg_approx_percentile", spark, str(tmp_path), con)
    null_grp = got[got["l_returnflag"].isna()]
    assert len(null_grp) == 1
    assert bool(null_grp["approx_within_1pct"].iloc[0]) is True


# ---------------------------------------------------------------------------
# r11 nonfinite lens (run in-round): TRUE NaN/±Inf storage via direct
# pyarrow arrays — the r9 pandas-written NaN probe silently tested NULL
# instead (from_pandas nan_as_null). Eight due-cohort members landed the
# bad-telemetry contract in their r11 slots: events.value consumers take
# finite_or_null; embedding consumers take functions.vec_finite. The four
# r10-vintage findings (window_tumbling/sliding, q22, dedup_embedding_
# cosine) landed at r13 (pins in tests/test_r13_window_fixes.py).
# ---------------------------------------------------------------------------


def _nonfinite_sf(tmp_path):
    from hostile_probe import build_nonfinite

    sf = str(tmp_path / "nf")
    os.makedirs(sf, exist_ok=True)
    build_nonfinite(SF_SMOKE, sf)
    return sf, _con_over(sf)


def test_value_consumers_drop_nonfinite(spark, tmp_path, clean_cache):
    """finite_or_null on both engines: a NaN/Inf reading no longer
    crashes the oracle's DECIMAL sums or poisons group stats."""
    sf, con = _nonfinite_sf(tmp_path)
    for name in (
        "events_value_zscore",
        "window_time_range_rolling",
        "events_resample_gapfill",
        "events_anomaly_mad",
    ):
        got = _parity(name, spark, sf, con)
        assert len(got) > 0

    # the lens genuinely planted non-finite readings
    ev = spark.read.parquet(f"{sf}/events.parquet")
    assert ev.where(F.isnan("value")).count() == 1
    assert ev.where(F.abs("value") == float("inf")).count() == 2
    # fixture-invisible at every SF
    base = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert (
        base.where(F.isnan("value") | (F.abs("value") == float("inf"))).count()
        == 0
    )


def test_embedding_consumers_drop_unusable_vectors(spark, tmp_path):
    """vec_finite on both engines: NULL/NaN/Inf-component vectors are in
    neither engine's scoring space (a NULL component NULL-propagates
    Spark's folds while DuckDB's list_sum skips it — silent drift; an
    Inf scale crashed the quantizer's ANSI cast)."""
    sf, con = _nonfinite_sf(tmp_path)
    bad_ids = {920001, 920002, 920003}
    for name in (
        "embedding_norms",
        "embedding_kmeans_assign",
        "embedding_quantize_int8",
        "similarity_topk_batch",
    ):
        got = _parity(name, spark, sf, con)
        assert not (set(got["vec_id"]) & bad_ids), name

    from dbfs_spark_cache_spark.functions import vec_finite

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    assert emb.where(~vec_finite("embedding")).count() == 3
    # fixture-invisible at every SF: all embeddings finite and dense
    base = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert base.where(~vec_finite("embedding")).count() == 0
