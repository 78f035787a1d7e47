"""Regression pins for fn_edit_distance's byte-level Levenshtein
contract (landed r18 in the query's due slot; found by the r17 `astral`
hostile lens at sf0.01, 150/1).

Spark's ``levenshtein`` counts CODE POINTS while DuckDB's counts UTF-8
BYTES (every DuckDB distance function — levenshtein/editdist3/
damerau_levenshtein — is byte-based; 'café'~'cafe' = 1 vs 2, one astral
char ~ 'a' = 1 vs 4). The registered contract is the BYTE distance —
the one semantic exactly expressible on both engines: Spark folds names
through ``decode(encode(x,'UTF-8'),'ISO-8859-1')`` (each UTF-8 byte
becomes exactly one Latin-1 code point, so code-point levenshtein over
the fold IS the byte distance) and bands on ``octet_length`` (the
band-adjacency bound is only sound in the distance's own unit).

Pins:
(1) the registered form matches a DuckDB brute-force exactly on a
    hostile frame of astral/multibyte names straddling the threshold
    (the exact shape the r17 lens poisoned);
(2) fixture identity — on the real (pure-ASCII) fixture the byte fold
    and octet bands are no-ops, so the r18 landing moved no green
    attestation (the historical ledger stays honest);
(3) the DuckDB byte-semantics premise itself, so a future DuckDB that
    switches to code-point distances flips a test here instead of
    silently inverting the contract.

Promoted from tests/test_r18_premeasure.py (deleted at r18), which
additionally demonstrated the pre-fix divergence on the then-registered
code-point form.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


# One brand of names where code-point and byte distances STRADDLE the
# <=3 threshold differently: an astral char is 1 point but 4 bytes.
_HOSTILE_ROWS = [
    (1, "B#1", "alpha widget"),
    (2, "B#1", "alpha widge\U0001D400"),   # 2 point-edits, 5 byte-edits
    (3, "B#1", "alpha widget!"),
    (4, "B#1", "\U00020731\U00020731 cog"),  # astral pair
    (5, "B#1", "xy cog"),                    # 2 point-edits, 8 byte-edits
    (6, "B#1", "café brake"),
    (7, "B#1", "cafe brake"),                # 1 point-edit, 2 byte-edits
]

_BRUTE_ORACLE = """
    SELECT a.k AS part_a, b.k AS part_b, a.n AS name_a, b.n AS name_b,
           CAST(levenshtein(a.n, b.n) AS BIGINT) AS edit_dist
    FROM t a JOIN t b ON a.brand = b.brand AND a.k < b.k
    WHERE levenshtein(a.n, b.n) <= 3
"""


def _duck_pairs(rows):
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "brand", "n"]))
    return {
        (r.part_a, r.part_b, r.edit_dist)
        for r in con.execute(_BRUTE_ORACLE).fetchdf().itertuples()
    }


def _spark_pairs(df):
    return {(r.part_a, r.part_b, r.edit_dist) for r in df.collect()}


def test_registered_form_matches_byte_oracle_on_astral_names(spark):
    """The r17 astral-lens red, reduced to seven rows — green since the
    r18 byte-level contract: the registered banded form agrees with the
    byte-based DuckDB brute-force on threshold-straddling multibyte
    names (including the code-point-band trap: a <=3-byte edit whose
    code-POINT length delta exceeds 3)."""
    from dbfs_spark_cache_spark.operators.extras import banded_edit_pairs

    df = spark.createDataFrame(
        _HOSTILE_ROWS, "k long, brand string, n string"
    )
    got = _spark_pairs(banded_edit_pairs(df, "k", "brand", "n"))
    want = _duck_pairs(_HOSTILE_ROWS)
    assert got == want, (
        f"missing={want - got} extra={got - want} — the byte-level "
        "contract regressed to code-point semantics somewhere"
    )
    # the pairs that USED to diverge must now be judged byte-wise:
    # (1,2) is 1 point-edit but 5 byte-edits -> excluded
    assert not any(p[:2] == (1, 2) for p in got)
    # (6,7) is 1 point-edit, 2 byte-edits -> included with byte dist 2
    assert (6, 7, 2) in got


def test_byte_contract_is_fixture_identical(spark):
    """On the pure-ASCII fixture the byte fold and octet bands are
    no-ops: the registered form returns exactly the rows a plain
    code-point implementation would, so the r18 landing moved no green
    attestation. Guards the ASCII premise itself — if the fixture ever
    grows non-ASCII names, this fails loudly instead of silently
    re-dating the ledger."""
    from dbfs_spark_cache_spark.operators.extras import banded_edit_pairs

    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    names = [r.p_name for r in part.select("p_name").collect()]
    assert all(max(map(ord, n)) < 128 for n in names if n), (
        "fixture p_name is no longer pure ASCII — the fixture-identity "
        "claim in the r18 ledger note needs re-derivation"
    )
    registered = _spark_pairs(
        banded_edit_pairs(part, "p_partkey", "p_brand", "p_name")
    )
    # reference: brute-force code-point form (equal on ASCII by
    # construction — one code point per byte)
    a = part.selectExpr(
        "p_partkey AS ka", "p_brand AS ba", "p_name AS na"
    )
    b = part.selectExpr(
        "p_partkey AS kb", "p_brand AS bb", "p_name AS nb"
    )
    brute = {
        (r.ka, r.kb, r.d)
        for r in a.join(
            b, (F.col("ba") == F.col("bb")) & (F.col("ka") < F.col("kb"))
        )
        .withColumn("d", F.levenshtein("na", "nb").cast("long"))
        .where(F.col("d") <= 3)
        .collect()
    }
    assert registered == brute


def test_duckdb_distance_functions_are_byte_based():
    """The premise, pinned so a future DuckDB that switches to
    code-point semantics flips this test instead of silently inverting
    the r18 contract."""
    con = duckdb.connect()
    assert con.execute("SELECT levenshtein('café','cafe')").fetchone()[0] == 2
    assert con.execute("SELECT levenshtein(chr(133137),'a')").fetchone()[0] == 4


# ------------------------------------------------------- property pin

from hypothesis import given, settings, strategies as hs  # noqa: E402

# alphabet spanning 1-byte ASCII, 2-byte Latin, 3-byte BMP CJK, and
# 4-byte astral codepoints — every UTF-8 width the byte contract folds
_ALPHABET = "ab é漢\U0001D400"


@settings(max_examples=25, deadline=None)
@given(
    hs.lists(
        hs.text(alphabet=_ALPHABET, min_size=0, max_size=14),
        min_size=2, max_size=8,
    )
)
def test_banded_pairs_match_byte_oracle_on_random_multibyte_names(
    spark, names
):
    """Property form of the r18 contract: for ARBITRARY mixed-width
    names in one block, the banded Spark result equals DuckDB's
    brute-force byte-Levenshtein filter — completeness of the
    octet-length banding and exactness of the Latin-1 fold together,
    not just on the hand-picked hostile frame."""
    from dbfs_spark_cache_spark.operators.extras import banded_edit_pairs

    rows = [(i + 1, "B", n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "k long, brand string, n string")
    got = _spark_pairs(banded_edit_pairs(df, "k", "brand", "n"))
    want = _duck_pairs(rows)
    assert got == want, (
        f"names={names!r}: missing={want - got} extra={got - want}"
    )
