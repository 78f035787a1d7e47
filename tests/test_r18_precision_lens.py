"""r18 'decimal overflow / aggregate precision' lens (VERDICT r17 #3):
aggregate arithmetic at precision limits, two-engine.

After 24 file lenses the untested cross-engine family was aggregate
arithmetic at the representation edges. Fixtures carry no decimal
columns (asserted below — every money column is double), so like the
r14 money-boundary lens this one is pytest-shaped: controlled frames,
deterministic sums.

What the probe established, now pinned:

* **Decimal sum overflow is LOUD on both engines under session
  defaults**: sum(DECIMAL(38,2)) past 38 digits raises (Spark ANSI
  NUMERIC_VALUE_OUT_OF_RANGE, DuckDB OutOfRangeException) — corrupt
  magnitudes crash before silent drift. Spark with ANSI OFF silently
  NULLs the overflow, which is why the session keeps ANSI on (pinned).
* **sum(double) is NOT a cross-engine contract**: identical inputs near
  2^53 hundredths sum to DIFFERENT doubles on the two engines (planted
  here: Spark ...998 vs DuckDB ...992 for 100 copies of the same
  value) — partial-aggregation association differs. This is the reason
  for the registry-wide discipline: exact DECIMAL power sums, double
  cast at the end (operators/registry.py).
* **The discipline's own domain bound**, found live by this lens: the
  stats_corr_covar ORACLE's DECIMAL(12,2) products are int64-backed in
  DuckDB and crashed (OutOfRangeException) at |x| >= ~1e9.2 —
  magnitudes the Spark side's (12,2)->(25,4) products handle. The r18
  in-slot fix widens the oracle casts to int128-backed DECIMAL(19,2);
  the registered query is now EXACT against its oracle at the full
  decimal(12,2) magnitude ceiling (planted test below), and fixture
  results are bit-identical (oracle values unchanged, storage only).
* **Near-epsilon ratio ordering is cross-engine stable**: adjacent-ULP
  doubles (1 and nextafter(1)) rank identically on both engines — both
  read the same parquet bits and compare the same IEEE values; only
  EXACT ties need the tiebreak discipline the `ties` lens already
  proves corpus-wide.
"""
from __future__ import annotations

import glob
import itertools
import math
import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"

_OVERFLOW_LITERAL = "9" * 36 + ".99"  # 36 integer digits: fits DECIMAL(38,2); x3 does not


def test_fixtures_carry_no_decimal_columns():
    """The premise that makes this lens pytest-shaped (and the registry
    immune to decimal-SOURCE overflow): every fixture column is
    non-decimal at every SF — decimals enter only through registered
    queries' own bounded casts."""
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01"):
        for f in glob.glob(f"/root/testdata/{sf}/*.parquet"):
            schema = pq.read_schema(f)
            bad = [
                fld.name for fld in schema
                if "decimal" in str(fld.type).lower()
            ]
            assert not bad, f"{f}: decimal columns appeared: {bad}"


def test_decimal_sum_overflow_is_loud_on_both_engines(spark):
    from pyspark.errors.exceptions.captured import ArithmeticException

    with pytest.raises(ArithmeticException):
        spark.sql(
            f"SELECT sum(CAST('{_OVERFLOW_LITERAL}' AS DECIMAL(38,2))) "
            "FROM range(3)"
        ).collect()
    with pytest.raises(duckdb.OutOfRangeException):
        duckdb.connect().execute(
            f"SELECT sum(CAST('{_OVERFLOW_LITERAL}' AS DECIMAL(38,2))) "
            "FROM range(3)"
        ).fetchone()


def test_session_keeps_ansi_on_so_overflow_cannot_silently_null(spark):
    """ANSI off turns the loud overflow above into a silent NULL — the
    exact shape an oracle comparison can't catch if both sides NULL for
    different reasons. The engine session never disables ANSI."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        row = spark.sql(
            f"SELECT sum(CAST('{_OVERFLOW_LITERAL}' AS DECIMAL(38,2))) AS s "
            "FROM range(3)"
        ).first()
        assert row.s is None  # the silent shape ANSI-on forbids
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_sum_double_drifts_cross_engine_where_decimal_sum_does_not(spark):
    """The planted 2^53 trap from the analytics2.py power-sum note: 100
    copies of the same hundredths value near 2^53. The double sums land
    on DIFFERENT doubles per engine (association order); the decimal
    sums agree exactly — the registry discipline in one test."""
    v = "90071992547409.94"  # x100 = 9007199254740994.00, exactly representable
    s_double = spark.sql(
        f"SELECT sum(CAST({v} AS DOUBLE)) AS s FROM range(100)"
    ).first().s
    d_double = duckdb.connect().execute(
        f"SELECT sum(CAST({v} AS DOUBLE)) FROM range(100)"
    ).fetchone()[0]
    # the drift class is real: at least one engine misses the exact sum
    exact = 9007199254740994.0
    assert s_double != d_double or s_double != exact or d_double != exact

    s_dec = spark.sql(
        f"SELECT CAST(sum(CAST('{v}' AS DECIMAL(22,2))) AS DOUBLE) AS s "
        "FROM range(100)"
    ).first().s
    d_dec = duckdb.connect().execute(
        f"SELECT CAST(sum(CAST('{v}' AS DECIMAL(22,2))) AS DOUBLE) "
        "FROM range(100)"
    ).fetchone()[0]
    assert s_dec == d_dec == exact


def _planted_extreme_dir(tmp_path) -> str:
    """sf0.001 with 200 lineitem rows at the decimal(12,2) magnitude
    ceiling (~1e10, 2dp) — the largest money values the registered
    stats_corr_covar contract admits."""
    dst = str(tmp_path / "extreme")
    os.makedirs(dst)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        name = os.path.basename(f)
        if name != "lineitem.parquet":
            shutil.copy(f, f"{dst}/{name}")
            continue
        t = pq.read_table(f)
        pdf = t.to_pandas()
        q = list(itertools.islice(
            itertools.cycle([9999999999.99, 9999999999.97]), 200))
        p = list(itertools.islice(
            itertools.cycle([9999999999.93, 9999999999.91]), 200))
        pdf.loc[:199, "l_quantity"] = q
        pdf.loc[:199, "l_extendedprice"] = p
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}",
        )
    return dst


def test_stats_corr_covar_exact_at_decimal_magnitude_ceiling(spark, tmp_path):
    """The lens's live find, now the regression pin: before the r18
    DECIMAL(19,2) widening the ORACLE raised OutOfRangeException here
    (int64-backed (12,2) products) while the query returned rows. Both
    sides must now agree exactly at the contract's magnitude ceiling."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from selfcheck import compare

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    dst = _planted_extreme_dir(tmp_path)
    got = QUERIES["stats_corr_covar"](spark, dst).toPandas()
    con = duckdb.connect()
    for tb in ("lineitem",):
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM '{dst}/{tb}.parquet'"
        )
    want = con.execute(ORACLES["stats_corr_covar"]).fetchdf()
    assert compare("stats_corr_covar", got, want) == []


def test_oracle_widening_is_fixture_identical():
    """The (12,2)->(19,2) storage widening changes no VALUE: on the real
    fixture the widened oracle returns the same frame the narrow form
    did — so the r18 landing moves no attestation. (The narrow form is
    inlined here as the historical comparand.)"""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from selfcheck import compare

    from dbfs_spark_cache_spark.operators import ORACLES

    widened = ORACLES["stats_corr_covar"]
    narrow = widened.replace("DECIMAL(19,2)", "DECIMAL(12,2)")
    assert narrow != widened, "oracle no longer carries the (19,2) casts"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'"
    )
    a = con.execute(widened).fetchdf()
    b = con.execute(narrow).fetchdf()
    assert compare("stats_corr_covar", a, b) == []


def test_near_epsilon_ratio_order_is_cross_engine_stable(spark):
    """Adjacent-ULP ratio values order identically on both engines: the
    parquet bits are shared, the comparison is IEEE — only EXACT ties
    need the corpus-wide tiebreak discipline (ties lens). Probed through
    a rank over a derived ratio, the shape rank queries actually use."""
    eps_up = math.nextafter(1.0, 2.0)
    rows = [(1, 1.0), (2, eps_up), (3, 0.5), (4, math.nextafter(0.5, 0.0))]
    sdf = spark.createDataFrame(rows, "k long, v double")
    got = [
        (r.k, r.rnk)
        for r in spark.sql(
            "SELECT k, RANK() OVER (ORDER BY v / 2.0 DESC, k) AS rnk FROM {t}",
            t=sdf,
        ).collect()
    ]
    import pandas as pd

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k", "v"]))
    want = [
        tuple(r)
        for r in con.execute(
            "SELECT k, RANK() OVER (ORDER BY v / 2.0 DESC, k) AS rnk FROM t"
        ).fetchall()
    ]
    assert sorted(got) == sorted(want)
    # and the adjacent-ULP pair is genuinely distinct, not a tie
    assert dict(got)[2] < dict(got)[1]
