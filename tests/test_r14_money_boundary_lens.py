"""r14 '2^53-boundary money' lens (VERDICT r13 #4b): probe the documented
exactness-domain edge of the package-wide float discipline (DECIMAL sums
cast to DOUBLE at the end — operators/registry.py module docstring).

What the probe established, now pinned:

* BELOW and AT 2^53 (~9.007e15), and at every non-tie value above it,
  the DECIMAL(22,2) -> DOUBLE cast is BIT-identical across engines —
  the fixture domain (sums <= ~1e12) sits 3+ orders of magnitude inside
  the safe region.
* The ONLY drift class above 2^53 is the EXACT TIE: a decimal value
  exactly halfway between two representable doubles (e.g.
  9007199254740993.00 — odd integer just past 2^53, where ULP = 2).
  Spark's Decimal.toDouble is correctly rounded (round-half-EVEN ->
  ...992); DuckDB's decimal->double is not correctly rounded at ties
  (half-away -> ...994). 1 ULP, render-visible, tolerated per the
  registry contract — and structurally the same exact-rational-half
  class as the text_unigram_logprob tie fixed this round (that one was
  fixable in integer space because the target scale is fixed; a generic
  decimal->double cast has no integer-space dodge).
* A SECOND face of the same class, found by this lens: far above 2^53
  (measured at 9.5e19) DuckDB's decimal->double goes through the scaled
  int128 (hundredths -> double, then /100 -> double) and the DOUBLE
  ROUNDING can land 1 ULP from Spark's correctly-rounded
  Decimal.toDouble even at values that ARE exactly representable. Still
  bounded at 1 ULP; still unreachable from fixture magnitudes.
* LOUD overflow begins at the DECIMAL(22,2) precision bound (10^20):
  a value that cannot be represented raises on BOTH engines (Spark ANSI
  NUMERIC_VALUE_OUT_OF_RANGE, DuckDB ConversionException) — corrupt
  ledger magnitudes crash loudly well before silent drift, exactly as
  the registry docstring claims (r12 magnitude probe, re-pinned here at
  the precise boundary).
"""
from __future__ import annotations

import os
import struct
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bits(x: float) -> str:
    return struct.pack("<d", x).hex()


def _spark_dec_to_double(spark, literal: str) -> float:
    return spark.sql(
        f"SELECT CAST(CAST('{literal}' AS DECIMAL(22,2)) AS DOUBLE)"
    ).first()[0]


def _duck_dec_to_double(literal: str) -> float:
    return duckdb.connect().execute(
        f"SELECT CAST(CAST('{literal}' AS DECIMAL(22,2)) AS DOUBLE)"
    ).fetchone()[0]


# (literal, bit_identical_across_engines)
BOUNDARY_CASES = [
    ("9007199254740991.00", True),   # 2^53 - 1: exactly representable
    ("9007199254740992.00", True),   # 2^53: exactly representable
    ("9007199254740993.00", False),  # 2^53 + 1: EXACT TIE between doubles
    ("9007199254740994.00", True),   # 2^53 + 2: exactly representable
    ("9007199254740992.50", True),   # fractional, not a tie (rounds down both)
    ("9007199254740993.50", True),   # fractional, not a tie (rounds up both)
]


def test_decimal_to_double_agrees_except_exact_ties(spark):
    """Bit-compare the final cast of the money discipline across engines
    at the 2^53 edge: identical everywhere except the exact-tie decimal,
    where the two engines pick opposite neighbors (1 ULP)."""
    for literal, same in BOUNDARY_CASES:
        s = _spark_dec_to_double(spark, literal)
        d = _duck_dec_to_double(literal)
        assert (_bits(s) == _bits(d)) == same, (
            f"{literal}: spark={s!r} duck={d!r} — boundary contract moved"
        )
        if not same:
            # the tolerated drift is exactly 1 ULP, never more: Spark
            # correctly rounds half-even (down to 2^53), DuckDB half-away
            assert s == 9007199254740992.0
            assert d == 9007199254740994.0


def test_sum_path_reproduces_the_tie_class(spark):
    """The drift is a property of the final cast, not of the DECIMAL sum:
    two halves summing exactly to the tie value reproduce it through the
    real aggregation path (the sum itself is exact on both engines)."""
    q = (
        "SELECT CAST(SUM(h) AS DOUBLE) FROM ("
        "SELECT CAST('4503599627370496.50' AS DECIMAL(22,2)) AS h "
        "UNION ALL SELECT CAST('4503599627370496.50' AS DECIMAL(22,2)))"
    )
    s = spark.sql(q).first()[0]
    d = duckdb.connect().execute(q).fetchone()[0]
    assert s == 9007199254740992.0 and d == 9007199254740994.0
    # and a non-tie sum in the same region is bit-identical
    q2 = q.replace("'4503599627370496.50'", "'4503599627370497.00'")
    s2 = spark.sql(q2).first()[0]
    d2 = duckdb.connect().execute(q2).fetchone()[0]
    assert _bits(s2) == _bits(d2)


def _ulp_distance(a: float, b: float) -> int:
    ia = struct.unpack("<q", struct.pack("<d", a))[0]
    ib = struct.unpack("<q", struct.pack("<d", b))[0]
    return abs(ia - ib)


def test_overflow_is_loud_on_both_engines(spark):
    """Where the loud boundary begins: 20 integer digits is the last
    DECIMAL(22,2)-representable magnitude — it still CONVERTS on both
    engines (within the tolerated 1 ULP: at 9.5e19 DuckDB's scaled-int
    double-rounding — int128 hundredths -> double, then /100 -> double —
    lands one ULP from Spark's correctly-rounded Decimal.toDouble, the
    second face of the same drift class the tie test pins); 21 digits
    raises on BOTH — never NULL, never wraparound."""
    fits = "95000000000000000000.00"   # 9.5e19: 20 integer digits
    s = _spark_dec_to_double(spark, fits)
    d = _duck_dec_to_double(fits)
    assert _ulp_distance(s, d) <= 1, f"drift beyond 1 ULP: {s!r} vs {d!r}"

    too_big = "950000000000000000000.00"  # 9.5e20: 21 integer digits
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE|Decimal"):
        _spark_dec_to_double(spark, too_big)
    with pytest.raises(duckdb.ConversionException):
        _duck_dec_to_double(too_big)


def test_fixture_sums_sit_deep_inside_the_safe_region(spark):
    """Non-vacuity + headroom: the largest money sum any fixture query
    can produce is orders of magnitude below 2^53, so the tie class is
    unreachable on real data — the registry docstring's 'the domain
    never binds' claim, measured."""
    from tests.conftest import SF_ORACLE

    total = spark.sql(
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(22,2))) AS DOUBLE) "
        f"FROM parquet.`{SF_ORACLE}/lineitem.parquet`"
    ).first()[0]
    assert 0 < total < 2**53 / 1000, f"headroom eroded: {total!r}"
