"""Regression pin for the r15 due-slot fix (promoted from the
since-retired tests/test_r15_premeasure.py — the proposed diff that test
encoded is now the REGISTERED implementation/oracle, so the pin runs the
registered query + oracle on the same hostile fixture and asserts exact
parity).

The fix (r12-vintage, landed slot-neutral in its own due round — see
__spark_entry__._CHANGED):

- grouped_map_pandas (r14 'negzero' lens): a group carrying BOTH +0.0
  and -0.0 rendered a signed-zero coin flip — pandas ``Series.min()``
  preserves the winner's SIGN BIT (numpy selection) while Spark's own
  JVM aggregates normalize -0.0 to +0.0 in UnsafeRow and DuckDB's MIN
  returns whichever stored sign its scan order favors. Impl and oracle
  now both aggregate over ``value + 0.0`` (IEEE: -0.0 + 0.0 = +0.0
  under round-to-nearest, identity for every other value; NaN is
  already gated by finite_or_null) — after the normalization there is
  only one zero for MIN/MAX to pick on any scan order, so the
  selection nondeterminism is ELIMINATED, not dodged.
"""
from __future__ import annotations

import glob
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from hostile_probe import build_negzero  # noqa: E402
from selfcheck import compare as _selfcheck_compare  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


def _con_over(sf: str):
    con = duckdb.connect()
    for f in sorted(glob.glob(f"{sf}/*.parquet")):
        tbl = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{f}'")
    return con


def _assert_exact(name, spark, sf, con):
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    got = QUERIES[name](spark, sf).toPandas()
    want = con.execute(ORACLES[name]).fetchdf()
    problems = _selfcheck_compare(name, got, want)
    assert not problems, f"{name}: {problems}"
    return got


def test_grouped_map_signed_zero_parity(spark, tmp_path):
    """(a) non-vacuity: the negzero lens genuinely plants BOTH zeros in
    one user's group (so this pin cannot rot into a vacuous pass);
    (b) the registered pair is exact under the lens — the divergence the
    r14 matrix flagged is gone; (c) the pin renders +0.0, i.e. the
    normalization actually fires on the poisoned group; (d) the real
    fixture stays exact (the change is fixture-invisible)."""
    dst = str(tmp_path / "negzero")
    os.makedirs(dst, exist_ok=True)
    build_negzero(SF_SMOKE, dst)
    con = _con_over(dst)

    # (a) the poison shape: one user's group carries >= 2 zeros of
    # MIXED sign
    ev = pd.read_parquet(f"{dst}/events.parquet")
    zero_rows = ev[ev["value"] == 0.0]
    by_user = zero_rows.groupby("user_id")["value"].apply(
        lambda s: np.signbit(s.to_numpy())
    )
    mixed_users = [u for u, bits in by_user.items() if bits.any() and not bits.all()]
    assert mixed_users, "negzero lens no longer plants a mixed-sign-zero group"

    # (b) registered pair exact under the lens
    got = _assert_exact("grouped_map_pandas", spark, dst, con)

    # (c) the poisoned group's min renders POSITIVE zero after the fix
    for u in mixed_users:
        row = got[got["user_id"] == u]
        assert len(row) == 1
        mn = float(row["min_value"].iloc[0])
        if mn == 0.0:
            assert not np.signbit(mn), (
                "pandas path leaked a -0.0 the JVM path would normalize"
            )

    # (d) real fixture stays exact
    con_f = _con_over(SF_SMOKE)
    _assert_exact("grouped_map_pandas", spark, SF_SMOKE, con_f)
