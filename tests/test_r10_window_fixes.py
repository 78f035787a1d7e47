"""Regression pins for the eight r10 due-slot hostile-input fixes plus
the sign-bit LSH consolidation (queued at r9 with pre-measures in the
former tests/test_r10_premeasure.py; landed r10).

Each test runs the REGISTERED query and its REGISTERED oracle over the
hostile fixture that used to diverge and asserts exact two-engine parity
— the premeasure tests proved the divergence and the fix; these pin that
the registered shapes stay fixed.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from selfcheck import compare as _selfcheck_compare  # noqa: E402

from pyspark.sql import functions as F

from dbfs_spark_cache_spark.operators import ORACLES, QUERIES


def _check(name: str, spark, con, sf_dir: str) -> None:
    got = QUERIES[name](spark, sf_dir).toPandas()
    want = con.execute(ORACLES[name]).fetchdf()
    problems = _selfcheck_compare(name, got, want)
    assert not problems, problems


def test_sessionization_tumbling_sliding_null_ts_parity(spark, tmp_path):
    """The three NULL-ts fixes: sessionization's asc_nulls_last window
    (the straggler joins the user's last session on BOTH engines instead
    of opening a phantom one) and the explicit identical NULL-ts drop in
    window_tumbling / window_sliding (was: F.window silently dropped
    them while DATE_TRUNC grouped a NULL bucket)."""
    from tests.conftest import SF_SMOKE

    base = spark.read.parquet(f"{SF_SMOKE}/events.parquet").where(
        F.col("user_id") < 5
    )
    nulls = (
        base.groupBy("user_id")
        .agg(F.max("event_id").alias("event_id"))
        .select(
            (F.col("event_id") + 1_000_000).alias("event_id"),
            "user_id",
            F.lit(None).cast("timestamp_ntz").alias("ts"),
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
        )
    )
    hostile = base.select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).unionByName(nulls)
    hostile.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    for name in ("sessionization", "window_tumbling", "window_sliding"):
        _check(name, spark, con, str(tmp_path))


def test_fn_json_hostile_props_parity(spark, tmp_path):
    """Integer-literal gate + json_valid guard: non-integer k, malformed
    JSON and NULL props resolve identically on both engines (was: ANSI
    cast crash on Spark, malformed-JSON error on DuckDB, and a rounding
    divergence under the naive try_cast repair)."""
    rows = [
        (1, "2024-01-01T00:00:00", 1, "view", 1.0, '{"k": 3}'),
        (2, "2024-01-01T01:00:00", 1, "view", 2.0, '{"k": 1.5}'),
        (3, "2024-01-01T02:00:00", 2, "click", 3.0, '{"k": "abc"}'),
        (4, "2024-01-01T03:00:00", 2, "click", 4.0, "not json"),
        (5, "2024-01-01T04:00:00", 3, "buy", 5.0, None),
        (6, "2024-01-01T05:00:00", 3, "buy", 6.0, '{"k": -7}'),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(f"{tmp_path}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    _check("fn_json", spark, con, str(tmp_path))
    # the hostile rows resolved as intended: view keeps only k=3, buy
    # keeps only k=-7, click has no integer k at all
    got = QUERIES["fn_json"](spark, str(tmp_path)).toPandas().set_index("event_type")
    assert int(got.loc["view", "sum_k"]) == 3
    assert int(got.loc["buy", "sum_k"]) == -7
    assert pd.isna(got.loc["click", "sum_k"])


def test_text_bag_fingerprint_null_text_parity(spark, tmp_path):
    """NULL-text docs excluded on both engines (was: merged into the
    md5('') group on Spark, a NULL group on DuckDB)."""
    rows = [
        (1, None, "en", "web", 0),
        (2, "", "en", "web", 0),
        (3, "b a b", "en", "web", 5),
        (4, "a b", "en", "web", 3),
        (5, None, None, None, None),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{tmp_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    _check("text_bag_fingerprint", spark, con, str(tmp_path))
    got = QUERIES["text_bag_fingerprint"](spark, str(tmp_path)).toPandas()
    # permutation docs 3 and 4 still collide into one bag group, and the
    # NULL-text docs 1/5 are gone (3 groups: empty, {a,b}, nothing else)
    assert int(got["n_docs"].sum()) == 3
    assert int(got["n_docs"].max()) == 2


def test_window_percentiles_null_value_parity(spark, tmp_path):
    """NULL balances excluded on both engines (was: rank 1 on Spark's
    banded helper vs rank N on DuckDB's PERCENT_RANK, shifting every
    row)."""
    cust = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    poisoned = pd.concat(
        [
            cust,
            pd.DataFrame(
                [{**cust.iloc[0].to_dict(), "c_custkey": 900001, "c_acctbal": None}]
            ),
        ]
    )
    poisoned.to_parquet(f"{tmp_path}/customer.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{tmp_path}/customer.parquet'"
    )
    _check("window_percentiles", spark, con, str(tmp_path))
    got = QUERIES["window_percentiles"](spark, str(tmp_path)).toPandas()
    assert 900001 not in set(got["c_custkey"])


def test_fn_string_case_mapping_parity(spark, tmp_path):
    """name_upper pinned to the portable ASCII translate on both engines
    (was: Java FULL vs utf8proc SIMPLE Unicode case mapping)."""
    from tests.conftest import SF_SMOKE

    src = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    rows = pd.concat(
        [
            src.head(3),
            pd.DataFrame(
                [
                    {**src.iloc[0].to_dict(), "p_partkey": 990301,
                     "p_name": "ﬁne ﬂoral tin"},
                    {**src.iloc[1].to_dict(), "p_partkey": 990302,
                     "p_name": "straße brass bolt"},
                ]
            ),
        ],
        ignore_index=True,
    )
    rows.to_parquet(f"{tmp_path}/part.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{tmp_path}/part.parquet'")
    _check("fn_string", spark, con, str(tmp_path))
    got = (
        QUERIES["fn_string"](spark, str(tmp_path))
        .toPandas()
        .set_index("p_partkey")["name_upper"]
    )
    # non-ASCII passes through untouched; ASCII uppercases
    assert got[990301] == "ﬁNE ﬂORAL TIN"
    assert got[990302] == "STRAßE BRASS BOLT"


def test_dedup_fingerprint_lower_parity(spark, tmp_path):
    """İ (U+0130) and final sigma — the only two full-vs-simple
    lowercase divergences in Unicode — folded explicitly on both
    engines, so the same document fingerprints identically."""
    from tests.conftest import SF_SMOKE

    src = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    rows = pd.concat(
        [
            src.head(3),
            pd.DataFrame(
                [
                    {**src.iloc[0].to_dict(), "doc_id": 990101,
                     "text": "İstanbul dotted capital"},
                    {**src.iloc[1].to_dict(), "doc_id": 990102,
                     "text": "ΣΙΣΥΦΟΣ sigma"},
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
    _check("dedup_fingerprint", spark, con, str(tmp_path))


def test_sign_bits_helpers_match_inline_variants(spark):
    """The consolidated functions.sign_bits_str / sign_bits_int must
    reproduce the documented NULL-past-the-end comprehension bit-for-bit
    — including on hostile vectors (NULL embedding, SHORT embedding,
    exact 0.0 / -0.0 components). The inline reference uses
    try_element_at: the r13 giant lens showed plain element_at RAISES
    past the array end under ANSI (Spark 4 default) — the retired
    hand-kept comprehensions and the r10 version of this very pin
    carried that latent crash, so the helper now uses 0-based F.get and
    this test ALSO asserts the short vector no longer kills the pass."""
    from tests.conftest import SF_SMOKE

    from dbfs_spark_cache_spark.functions import sign_bits_int, sign_bits_str

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    hostile = emb.limit(2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.when(
            F.col("vec_id") % 2 == 0, F.expr("array(0.0F, -0.0F, 1.5F)")
        ).alias("embedding"),  # short vec / NULL embedding alternating
    )
    allv = emb.unionByName(hostile)

    for n in (4, 8):
        inline_str = F.concat(
            *[
                F.when(F.try_element_at("embedding", F.lit(i + 1)) >= 0, "1")
                .otherwise("0")
                for i in range(n)
            ]
        )
        mismatch = (
            allv.select(
                inline_str.alias("cur"),
                sign_bits_str("embedding", n).alias("new"),
            )
            .where(~F.col("cur").eqNullSafe(F.col("new")))
            .count()
        )
        assert mismatch == 0, f"string variant n={n}"

    inline_int = sum(
        F.when(
            F.try_element_at("embedding", F.lit(i + 1)) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i in range(4)
    ).cast("int")
    mismatch = (
        allv.select(
            inline_int.alias("cur"),
            sign_bits_int("embedding", 4).alias("new"),
        )
        .where(~F.col("cur").eqNullSafe(F.col("new")))
        .count()
    )
    assert mismatch == 0, "integer variant n=4"
    # the short (3-component) hostile vector flows through an 8-bit
    # signature WITHOUT the ANSI element_at crash — missing dims read '0'
    short_sig = (
        allv.where(F.size("embedding") == 3)
        .select(sign_bits_str("embedding", 8).alias("sig"))
        .collect()
    )
    assert [r.sig for r in short_sig] == ["11100000"]


def _dup_fixture(tmp_path, tables):
    """Every row of every listed table exactly duplicated — the
    at-least-once / log-replay production shape the r10 fifth probe lens
    modeled. Full-row duplicates keep output multisets well-defined."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import SF_SMOKE

    con = duckdb.connect()
    for name in tables:
        t = pq.read_table(f"{SF_SMOKE}/{name}.parquet")
        pq.write_table(
            pa.concat_tables([t, t]), f"{tmp_path}/{name}.parquet"
        )
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{tmp_path}/{name}.parquet'"
        )
    return con


def test_dedup_cluster_keepers_duplication_parity(spark, tmp_path):
    """One output row PER DOCUMENT even under at-least-once duplicated
    input (was: the singleton anti-join read the raw docs table and
    emitted every singleton twice — 955 rows vs the oracle's 500)."""
    from tests.conftest import SF_SMOKE

    con = _dup_fixture(tmp_path, ["documents"])
    _check("dedup_cluster_keepers", spark, con, str(tmp_path))
    got = QUERIES["dedup_cluster_keepers"](spark, str(tmp_path)).toPandas()
    base = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    assert len(got) == base["doc_id"].nunique()
    assert got["doc_id"].is_unique

    # fixture-invisible: doc_id is unique at every SF, so pre-fix
    # attestations were honest
    assert base["doc_id"].is_unique
