"""r18 premeasure: fn_edit_distance byte-level Levenshtein contract.

Found by the r17 `astral` lens at sf0.01 (150/1): Spark's
``levenshtein`` counts CODE POINTS while DuckDB's counts UTF-8 BYTES
(every DuckDB distance function — levenshtein/editdist3/
damerau_levenshtein — is byte-based; verified: 'café'~'cafe' = 1 vs 2,
one astral char ~ 'a' = 1 vs 4). Any non-ASCII name whose pair
straddles the <=3 threshold diverges; at sf0.01 the lens's poisoned
part names produce 7 such pairs (spark=4820 rows vs duck=4813). Every
real fixture name is pure ASCII at every SF (asserted below), so all
existing attestations are honest.

THE LANDING DIFF (fn_edit_distance's natural due slot is r18 — it is
r15-vintage; never fix off-slot): adopt the BYTE-LEVEL contract, the
one semantic exactly expressible on both engines.

* distance: ``levenshtein(decode(encode(x,'UTF-8'),'ISO-8859-1'),...)``
  — each UTF-8 byte becomes exactly one Latin-1 code point, so Spark's
  code-point levenshtein over the folded strings IS the byte distance
  DuckDB natively computes. ASCII is a byte-for-byte no-op.
* banding: ``octet_length`` instead of ``length`` (byte_dist <= 3
  implies |byte-length diff| <= 3; the code-POINT band bound does NOT
  hold under byte semantics — a <=3-byte edit can move code-point
  length by more than 3 across multi-byte boundaries).
* oracle: UNCHANGED (already byte-based).

``_byte_faithful_edit_pairs`` below is that diff, verbatim. Pins:
(1) the current form diverges from the oracle on astral names
    (demonstrates the live defect);
(2) the byte-faithful form matches a DuckDB brute-force exactly on the
    same hostile frame;
(3) fixture identity — on the real (pure-ASCII) fixture the fixed form
    returns bit-identical rows to the registered implementation, so
    the r18 landing cannot move any green attestation.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


def _bytes_as_latin1(col):
    """Each UTF-8 byte of ``col`` as ONE Latin-1 code point: Spark's
    code-point levenshtein over this fold is DuckDB's byte distance."""
    return F.decode(F.encode(col, "UTF-8"), "ISO-8859-1")


def _byte_faithful_edit_pairs(
    df: DataFrame,
    key_col: str,
    block_col: str,
    name_col: str,
    max_dist: int = 3,
    band_width: int = 4,
) -> DataFrame:
    """banded_edit_pairs with the r18 byte-level contract: octet_length
    bands + byte-folded thresholded distance. Everything else verbatim
    from operators/extras.py (the diff is exactly these two changes)."""
    spark = df.sparkSession
    a = df.select(
        F.col(key_col).alias("part_a"),
        F.col(block_col).alias("brand_a"),
        F.col(name_col).alias("name_a"),
        (F.octet_length(name_col) / band_width).cast("int").alias("band_a"),
    )
    base_band = (F.octet_length(name_col) / band_width).cast("int")
    b = df.select(
        F.col(key_col).alias("part_b"),
        F.col(block_col).alias("brand_b"),
        F.col(name_col).alias("name_b"),
        F.explode(
            F.array(base_band - 1, base_band, base_band + 1)
        ).alias("band_b"),
    )
    dist_t = F.levenshtein(
        _bytes_as_latin1(F.col("name_a")),
        _bytes_as_latin1(F.col("name_b")),
        max_dist,
    )
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except (TypeError, ValueError):
        n_parts = spark.sparkContext.defaultParallelism
    return (
        a.repartition(n_parts)
        .join(
            b,
            (F.col("brand_a") == F.col("brand_b"))
            & (F.col("band_a") == F.col("band_b"))
            & (F.col("part_a") < F.col("part_b"))
            & (
                F.abs(F.octet_length("name_a") - F.octet_length("name_b"))
                <= max_dist
            ),
        )
        .where(dist_t >= 0)
        .select(
            "part_a", "part_b", "name_a", "name_b",
            dist_t.cast("long").alias("edit_dist"),
        )
    )


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
    return {
        (r.part_a, r.part_b, r.edit_dist) for r in df.collect()
    }


def test_current_form_diverges_on_astral_names(spark):
    """The live defect: the registered code-point form disagrees with
    the byte-based oracle on astral/multibyte names near the threshold
    (this is the r17 astral-lens red, reduced to seven rows)."""
    from dbfs_spark_cache_spark.operators.extras import banded_edit_pairs

    df = spark.createDataFrame(
        _HOSTILE_ROWS, "k long, brand string, n string"
    )
    got = _spark_pairs(banded_edit_pairs(df, "k", "brand", "n"))
    want = _duck_pairs(_HOSTILE_ROWS)
    assert got != want, (
        "expected the code-point form to diverge from the byte-based "
        "oracle on astral names — if this now PASSES, the r18 fix "
        "landed and this premeasure should be promoted to a regression "
        "pin"
    )
    # the divergence is exactly the threshold-straddling pairs
    assert (1, 2, 1) in got and not any(
        p[:2] == (1, 2) for p in want
    ), "pair (1,2): 1 point-edit but 5 byte-edits"


def test_byte_faithful_form_matches_oracle_on_astral_names(spark):
    df = spark.createDataFrame(
        _HOSTILE_ROWS, "k long, brand string, n string"
    )
    got = _spark_pairs(_byte_faithful_edit_pairs(df, "k", "brand", "n"))
    want = _duck_pairs(_HOSTILE_ROWS)
    assert got == want


def test_byte_faithful_form_is_fixture_identical(spark):
    """On the pure-ASCII fixture the byte fold and octet bands are
    no-ops: the fixed form returns exactly the registered form's rows,
    so landing it at r18 cannot move any green attestation."""
    from dbfs_spark_cache_spark.operators.extras import banded_edit_pairs

    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    names = [r.p_name for r in part.select("p_name").collect()]
    assert all(max(map(ord, n)) < 128 for n in names if n), (
        "fixture p_name is no longer pure ASCII — re-derive this "
        "premeasure's fixture-identity claim"
    )
    cur = _spark_pairs(
        banded_edit_pairs(part, "p_partkey", "p_brand", "p_name")
    )
    fixed = _spark_pairs(
        _byte_faithful_edit_pairs(part, "p_partkey", "p_brand", "p_name")
    )
    assert cur == fixed


def test_duckdb_distance_functions_are_byte_based():
    """The premise, pinned so a future DuckDB that switches to
    code-point semantics flips this test instead of silently inverting
    the r18 contract."""
    con = duckdb.connect()
    assert con.execute("SELECT levenshtein('café','cafe')").fetchone()[0] == 2
    assert con.execute("SELECT levenshtein(chr(133137),'a')").fetchone()[0] == 4
