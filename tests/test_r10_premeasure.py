"""Pre-measurement for the r10-queued timeseries NULL-timestamp fixes
(r9 adversarial review; exact notes in timeseries.py docstrings).

Each test builds the PROPOSED r10 variant inline — the registered
operators are untouched, so no rotation slot is spent — and proves on a
hostile NULL-ts fixture that (a) the current shape diverges between
engines exactly as diagnosed, and (b) the proposed fix restores exact
parity. At r10, landing the fix is then a mechanical edit: apply the
diff these tests encode, move the name into _CHANGED, selfcheck.

r9 fourth batch (Unicode probe) appended two more queued findings, both
in the Java-full-vs-utf8proc-simple case-mapping dialect gap:
fn_string's UPPER (pin name_upper to portable ASCII translate on both
engines) and dedup_fingerprint's LOWER (fold İ and final sigma
explicitly on both engines). Notes in the operator docstrings.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from selfcheck import compare as _selfcheck_compare  # noqa: E402

from pyspark.sql import Window as W
from pyspark.sql import functions as F


@pytest.fixture()
def hostile_events(spark, tmp_path):
    """A small events table with one NULL-ts straggler per user."""
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
    path = str(tmp_path / "events_nullts")
    hostile.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}/*.parquet'")
    return spark.read.parquet(path), con


_SESSION_ORACLE = """
    WITH flagged AS (
        SELECT user_id, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 12 HOUR
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
"""


def _sessionize(events, null_ordering_aligned: bool):
    order = (
        [F.col("ts").asc_nulls_last(), "event_id"]
        if null_ordering_aligned
        else [F.col("ts"), F.col("event_id")]
    )
    w = W.partitionBy("user_id").orderBy(*order)
    prev_ts = F.lag("ts").over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(
            prev_ts.isNull()
            | (F.col("ts") - prev_ts > F.expr("INTERVAL 12 HOURS")),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def test_sessionization_r10_fix_restores_null_ts_parity(hostile_events):
    """Diagnosed divergence: Spark orders NULLS FIRST so the first real
    event sees lag(ts)=NULL and opens an extra session; DuckDB orders
    NULLS LAST so the NULL row joins the last session via the
    three-valued CASE. asc_nulls_last on the Spark window is the fix."""
    events, con = hostile_events
    want = {
        u: (s, n) for u, s, n in con.execute(_SESSION_ORACLE).fetchall()
    }

    current = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in _sessionize(events, null_ordering_aligned=False).collect()
    }
    assert current != want, (
        "the diagnosed divergence no longer reproduces — re-check whether "
        "the r10 fix is still needed"
    )
    # every divergence is exactly one extra session on the Spark side
    assert all(
        current[u] == (want[u][0] + 1, want[u][1])
        for u in want
        if current[u] != want[u]
    )

    fixed = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in _sessionize(events, null_ordering_aligned=True).collect()
    }
    assert fixed == want, "asc_nulls_last must restore exact parity"


def _sign_bits_str(col, n):
    """The r10-proposed consolidated helper: string sign-bit signature,
    '1' per non-negative dim over the first n dims."""
    return F.concat(
        *[
            F.when(F.element_at(col, i + 1) >= 0, "1").otherwise("0")
            for i in range(n)
        ]
    )


def _sign_bits_int(col, n):
    """The r10-proposed consolidated helper: integer signature, bit i set
    iff dim i+1 is non-negative."""
    acc = F.lit(0)
    for i in range(n):
        acc = acc + F.when(
            F.element_at(col, i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return acc.cast("int")


def test_sign_bits_helper_matches_all_four_inline_variants(spark):
    """Pre-measurement for the r10-queued sign-bit LSH consolidation
    (similarity.py module docstring): the proposed sign_bits helpers must
    reproduce each of the four hand-kept comprehensions bit-for-bit —
    similarity_lsh_buckets / dedup_embedding_cosine (8-bit string),
    similarity_ivf_search (4-bit string), similarity_multiprobe (4-bit
    integer) — including on hostile vectors (NULL embedding, short
    embedding, exact 0.0 components: element_at past the end is NULL, so
    both formulations emit '0'/clear-bit identically)."""
    from tests.conftest import SF_SMOKE

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
                F.when(F.element_at("embedding", i + 1) >= 0, "1").otherwise("0")
                for i in range(n)
            ]
        )
        mismatch = (
            allv.select(
                inline_str.alias("cur"),
                _sign_bits_str(F.col("embedding"), n).alias("new"),
            )
            .where(~F.col("cur").eqNullSafe(F.col("new")))
            .count()
        )
        assert mismatch == 0, f"string variant n={n}"

    inline_int = sum(
        F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i in range(4)
    ).cast("int")
    mismatch = (
        allv.select(
            inline_int.alias("cur"),
            _sign_bits_int(F.col("embedding"), 4).alias("new"),
        )
        .where(~F.col("cur").eqNullSafe(F.col("new")))
        .count()
    )
    assert mismatch == 0, "integer variant n=4"


_TUMBLING_ORACLE = """
    SELECT DATE_TRUNC('hour', ts) AS bucket_start, event_type,
           COUNT(*) AS n_events
    FROM events {where}
    GROUP BY bucket_start, event_type
"""


def test_tumbling_r10_fix_restores_null_ts_parity(hostile_events):
    """Diagnosed divergence: F.window silently DROPS NULL-ts rows while
    DATE_TRUNC groups them into a NULL bucket. An explicit
    ts-IS-NOT-NULL filter on BOTH engines is the fix."""
    events, con = hostile_events

    def spark_counts(filtered: bool):
        src = events.where(F.col("ts").isNotNull()) if filtered else events
        return {
            (r.bucket_start, r.event_type): r.n_events
            for r in src.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").alias("bucket_start"),
                "event_type",
                "n_events",
            )
            .collect()
        }

    def duck_counts(where: str):
        return {
            (b, t): n
            for b, t, n in con.execute(
                _TUMBLING_ORACLE.format(where=where)
            ).fetchall()
        }

    # current shapes diverge: the oracle has a NULL bucket Spark lacks
    assert spark_counts(False) != duck_counts("")
    assert None not in {b for b, _ in spark_counts(False)}
    assert None in {b for b, _ in duck_counts("")}

    # proposed fix: identical explicit drop on both engines
    assert spark_counts(True) == duck_counts("WHERE ts IS NOT NULL")


def test_bag_fingerprint_r10_fix_restores_null_text_parity(spark, tmp_path):
    """Pre-measure the r10-queued text_bag_fingerprint NULL-text fix (r9
    third review batch; note in text.py): Spark's concat_ws SKIPS NULL,
    merging NULL-text docs into the md5('') empty-text group, while
    DuckDB's array_to_string(NULL) yields a NULL fingerprint group — a
    row-count + value divergence on hostile data. The proposed fix
    (WHERE text IS NOT NULL on both engines — the multimodal contract:
    unreadable payloads are excluded, not fingerprinted) restores exact
    parity."""
    import pandas as pd

    from tests.conftest import SF_SMOKE

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

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    # (a) the CURRENT registered shapes diverge exactly as diagnosed
    got = QUERIES["text_bag_fingerprint"](spark, str(tmp_path)).toPandas()
    duck = ORACLES["text_bag_fingerprint"]
    duck_pdf = con.execute(duck).fetchdf()
    assert len(got) != len(duck_pdf), (
        "expected the NULL-text divergence; if this now matches, the fix "
        "landed — retire this half of the test"
    )
    # Spark merged doc 1/2/5 under md5(''); DuckDB grouped 1/5 under NULL
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert int(got.set_index("bag_fp").loc[empty_md5, "n_docs"]) == 3
    assert int(duck_pdf[duck_pdf["bag_fp"].isna()]["n_docs"].iloc[0]) == 2

    # (b) the PROPOSED r10 variant: text IS NOT NULL on both engines
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " ")))))
    fixed = (
        docs.groupBy(fp.alias("bag_fp"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .toPandas()
    )
    fixed_duck = con.execute(
        duck.replace("FROM documents", "FROM documents WHERE text IS NOT NULL")
    ).fetchdf()
    problems = _selfcheck_compare("text_bag_fingerprint_r10", fixed, fixed_duck)
    assert not problems, problems
    # permutation docs 3 and 4 still collide into one bag group
    assert int(fixed.sort_values("n_docs", ascending=False)["n_docs"].iloc[0]) == 2

    # (c) the real fixtures carry zero NULL text, so the CURRENT green
    # attestations are honest until the fix lands in its due slot
    assert (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where(F.col("text").isNull())
        .count()
        == 0
    )


def test_fn_json_r10_fix_restores_hostile_props_parity(spark, tmp_path):
    """Pre-measure the r10-queued fn_json hardening (r9 third review
    batch; note in relational.py): a non-integer k crashes Spark's ANSI
    cast and a malformed props crashes DuckDB's json_extract_string —
    and the naive try_cast repair would DIVERGE, because DuckDB's
    string->BIGINT cast rounds ('1.5' -> 2) where Spark's try_cast
    yields NULL. The proposed fix gates k on an integer-literal regex on
    both engines and json_valid-guards the oracle."""
    import pandas as pd

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
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    # (a) the CURRENT shapes fail exactly as diagnosed
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|1.5"):
        QUERIES["fn_json"](spark, str(tmp_path)).toPandas()
    with pytest.raises(Exception, match="[Mm]alformed"):
        con.execute(ORACLES["fn_json"]).fetchdf()

    # (b) the PROPOSED r10 variant: integer-literal gate on both engines,
    # json_valid guard in the oracle
    ev = spark.read.parquet(f"{tmp_path}/events.parquet")
    ks = F.get_json_object("props", "$.k")
    k = F.when(ks.rlike("^-?[0-9]+$"), ks.cast("long"))
    fixed = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .toPandas()
    )
    fixed_oracle = """
    WITH g AS (
        SELECT event_type,
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END AS ks
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN regexp_matches(ks, '^-?[0-9]+$')
                         THEN CAST(ks AS BIGINT) END) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN regexp_matches(ks, '^-?[0-9]+$')
                         THEN CAST(ks AS BIGINT) END) AS DOUBLE) / COUNT(*) AS avg_k
    FROM g
    GROUP BY event_type
    """
    fixed_duck = con.execute(fixed_oracle).fetchdf()
    problems = _selfcheck_compare("fn_json_r10", fixed, fixed_duck)
    assert not problems, problems
    # the hostile rows resolved as intended: view keeps only k=3,
    # buy keeps only k=-7, click has no integer k at all
    by_type = fixed.set_index("event_type")
    assert int(by_type.loc["view", "sum_k"]) == 3
    assert int(by_type.loc["buy", "sum_k"]) == -7
    assert pd.isna(by_type.loc["click", "sum_k"])


def test_window_percentiles_r10_fix_restores_null_value_parity(spark, tmp_path):
    """Pre-measure the r10-queued window_percentiles NULL-value fix (r9
    third review batch; note in relational.py): the banded global-rank
    helper lands a NULL c_acctbal at global rank 1 (Spark's NULLS-FIRST
    window shape) while DuckDB's PERCENT_RANK orders NULLS LAST —
    shifting every row's rank. The proposed fix excludes NULL balances
    on both engines (a percentile of an unknown balance is undefined)."""
    import pandas as pd

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

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    # (a) the CURRENT shapes diverge exactly as diagnosed
    got = QUERIES["window_percentiles"](spark, str(tmp_path)).toPandas()
    duck = con.execute(ORACLES["window_percentiles"]).fetchdf()
    s_null = got[got["c_custkey"] == 900001].iloc[0]
    d_null = duck[duck["c_custkey"] == 900001].iloc[0]
    assert s_null["bal_pct_rank"] == 0.0, "Spark ranks the NULL row first"
    assert d_null["bal_pct_rank"] == 1.0, "DuckDB ranks the NULL row last"

    # (b) the PROPOSED r10 variant: exclude NULL balances on both engines
    from dbfs_spark_cache_spark.operators.scale import (
        distributed_global_percentiles,
    )

    customer = (
        spark.read.parquet(f"{tmp_path}/customer.parquet")
        .select("c_custkey", "c_acctbal")
        .where(F.col("c_acctbal").isNotNull())
    )
    fixed = distributed_global_percentiles(
        customer,
        value_col="c_acctbal",
        tiebreak_col="c_custkey",
        pct_col="bal_pct_rank",
        cume_col="bal_cume_dist",
        tile_col="bal_decile",
    ).toPandas()
    fixed_duck = con.execute(
        ORACLES["window_percentiles"].replace(
            "FROM customer", "FROM customer WHERE c_acctbal IS NOT NULL"
        )
    ).fetchdf()
    problems = _selfcheck_compare("window_percentiles_r10", fixed, fixed_duck)
    assert not problems, problems


# ---------------------------------------------------------------------------
# r9 fourth batch: Unicode-hostile probe findings (case-mapping dialect)
# ---------------------------------------------------------------------------

_AZ = "abcdefghijklmnopqrstuvwxyz"


def test_fn_string_r10_fix_restores_case_mapping_parity(spark, tmp_path):
    """Pre-measure the r10-queued fn_string portable-uppercase fix (r9
    Unicode probe; note in relational.py): Spark's UPPER is Java's FULL
    case mapping (ligature fi -> "FI" expands, sharp-s -> "SS") while
    DuckDB's is utf8proc's SIMPLE per-codepoint mapping (the ligature
    has no single-codepoint uppercase and stays; sharp-s maps to capital
    sharp-s U+1E9E) — a value divergence on any non-trivially-cased
    name. The proposed fix pins name_upper to the portable ASCII
    mapping, translate(a-z -> A-Z) on BOTH engines (the portable-hash-
    family precedent: full Unicode case mapping is library-defined and
    not part of the cross-engine contract; non-ASCII passes through
    untouched on both)."""
    import pandas as pd

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

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    # (a) the CURRENT registered shapes diverge exactly as diagnosed
    got = QUERIES["fn_string"](spark, str(tmp_path)).toPandas()
    duck_pdf = con.execute(ORACLES["fn_string"]).fetchdf()
    s_up = got.set_index("p_partkey")["name_upper"]
    d_up = duck_pdf.set_index("p_partkey")["name_upper"]
    assert s_up[990301] == "FINE FLORAL TIN"          # Java full mapping
    assert d_up[990301] == "ﬁNE ﬂORAL TIN"  # utf8proc simple
    assert s_up[990302] == "STRASSE BRASS BOLT"
    assert d_up[990302] == "STRAẞE BRASS BOLT"

    # (b) the PROPOSED r10 variant: portable ASCII uppercase both sides
    fixed = (
        spark.read.parquet(f"{tmp_path}/part.parquet")
        .select(
            "p_partkey",
            F.translate("p_name", _AZ, _AZ.upper()).alias("name_upper"),
        )
        .toPandas()
    )
    fixed_duck = con.execute(
        f"SELECT p_partkey, translate(p_name, '{_AZ}', '{_AZ.upper()}')"
        " AS name_upper FROM part"
    ).fetchdf()
    problems = _selfcheck_compare("fn_string_r10", fixed, fixed_duck)
    assert not problems, problems
    # and on plain-ASCII names the portable mapping IS uppercase
    assert (
        fixed.set_index("p_partkey")["name_upper"][990302]
        == "straße brass bolt".translate(
            str.maketrans(_AZ, _AZ.upper())
        )
    )

    # (c) fixture-invisible: every fixture p_name/p_brand/p_type is pure
    # ASCII (verified at all SFs), so current attestations are honest
    ascii_bad = (
        spark.read.parquet(f"{SF_SMOKE}/part.parquet")
        .where(
            F.col("p_name").rlike("[^\\x00-\\x7F]")
            | F.col("p_brand").rlike("[^\\x00-\\x7F]")
            | F.col("p_type").rlike("[^\\x00-\\x7F]")
        )
        .count()
    )
    assert ascii_bad == 0


def test_dedup_fingerprint_r10_fix_restores_lower_parity(spark, tmp_path):
    """Pre-measure the r10-queued dedup_fingerprint case-fold alignment
    (r9 Unicode probe; note in dedup.py): Spark's LOWER is Java's FULL
    lowercase mapping — dotted capital I (U+0130) becomes i + combining
    dot (U+0069 U+0307) and capital sigma lowers CONTEXTUALLY to final
    sigma at word end — while DuckDB's utf8proc simple mapping gives
    U+0130 -> i and sigma everywhere, so the same document fingerprints
    differently per engine. Those two are the ONLY full-vs-simple
    lowercase divergences in Unicode (SpecialCasing.txt lowercase
    entries), so the proposed fix pins them explicitly on BOTH engines:
    translate(lower(translate(text, 'İ', 'i')), 'ς', 'σ') — İ folds to
    plain i before lowering, final sigma folds to σ after."""
    import pandas as pd

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

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    # (a) the CURRENT registered shapes diverge exactly as diagnosed:
    # the two hostile docs fingerprint differently per engine
    got = QUERIES["dedup_fingerprint"](spark, str(tmp_path)).toPandas()
    duck_pdf = con.execute(ORACLES["dedup_fingerprint"]).fetchdf()
    s_fp = set(got["fingerprint"])
    d_fp = set(duck_pdf["fingerprint"])
    assert len(s_fp ^ d_fp) == 4, (
        "expected exactly the two hostile docs to fingerprint "
        "differently per engine; if this now matches, the fix landed — "
        "retire this half of the test"
    )

    # (b) the PROPOSED r10 variant reaches exact parity
    ws = r"[ \t\n\x0B\f\r]+"
    normalized = F.translate(
        F.lower(
            F.trim(F.regexp_replace(F.translate("text", "İ", "i"), ws, " "))
        ),
        "ς",
        "σ",
    )
    fixed = (
        spark.read.parquet(f"{tmp_path}/documents.parquet")
        .groupBy(F.md5(normalized).alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .toPandas()
    )
    fixed_duck = con.execute(
        """
        SELECT MD5(translate(LOWER(TRIM(REGEXP_REPLACE(
                   translate(text, 'İ', 'i'),
                   '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), 'ς', 'σ'))
                   AS fingerprint,
               MIN(doc_id) AS keeper_doc_id,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1
        """
    ).fetchdf()
    problems = _selfcheck_compare("dedup_fingerprint_r10", fixed, fixed_duck)
    assert not problems, problems

    # (c) fixture-invisible: fixture text is pure ASCII at every SF
    assert (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .where(F.col("text").rlike("[^\\x00-\\x7F]"))
        .count()
        == 0
    )
