"""Pre-measurement for the r15-queued fix (target r12-vintage, natural
re-attest r15). One entry:

- grouped_map_pandas (r14 'negzero' lens): when a group carries BOTH
  +0.0 and -0.0, pandas ``Series.min()`` preserves the winner's SIGN
  BIT (numpy selection) while Spark's own JVM aggregates normalize
  -0.0 to +0.0 in UnsafeRow and DuckDB's MIN returns whichever stored
  sign its scan order favors. The three paths agree numerically
  (IEEE/SQL say -0.0 = 0.0) but the render layer rightly distinguishes
  them — and the deeper problem is ENGINE-INTERNAL: the pandas escape
  hatch leaks a sign bit the JVM path of the very same engine would
  have normalized, so the same query refactored between the two paths
  changes its rendered output.

  Fix when due: aggregate over ``value + 0.0`` on BOTH engines
  (IEEE: -0.0 + 0.0 = +0.0 under round-to-nearest, identity for every
  other value; NaN is already gated by finite_or_null). This removes
  the selection nondeterminism rather than dodging it — after the
  normalization there is only one zero for MIN/MAX to pick on any scan
  order. FIXTURE-INVISIBLE: no fixture column carries a negative zero
  (asserted by the lens honesty pin), so the registered and proposed
  pairs are byte-identical on real fixtures and the driver pair stays
  green when impl and oracle land together in the r15 slot.
"""
from __future__ import annotations

import glob
import os
import sys
import tempfile

import duckdb
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

_PROPOSED_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(MIN(value + 0.0) AS DOUBLE) AS min_value,
       CAST(MAX(value + 0.0) AS DOUBLE) AS max_value,
       CAST(MAX(value + 0.0) - MIN(value + 0.0) AS DOUBLE) AS value_range
FROM events
WHERE value IS NULL OR isfinite(value)
GROUP BY user_id
"""


def _proposed_spark(spark, sf: str):
    from dbfs_spark_cache_spark.operators.registry import finite_or_null
    from dbfs_spark_cache_spark.operators.relational import load_table

    events = load_table(spark, sf, "events").where(finite_or_null("value"))

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        # + 0.0 folds -0.0 into +0.0 — the same normalization Spark's
        # UnsafeRow applies on the JVM path this function bypasses
        vals = pdf["value"] + 0.0
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "min_value": [vals.min()],
                "max_value": [vals.max()],
                "value_range": [vals.max() - vals.min()],
            }
        )

    return events.groupBy("user_id").applyInPandas(
        summarize,
        schema=(
            "user_id long, n_events long, min_value double, "
            "max_value double, value_range double"
        ),
    )


def _con_over(sf: str):
    con = duckdb.connect()
    for f in sorted(glob.glob(f"{sf}/*.parquet")):
        tbl = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{f}'")
    return con


def test_grouped_map_r15_fix_signed_zero_normalization(spark):
    """(a) the registered pair diverges TODAY under the negzero lens
    (pandas min preserves -0.0); (b) the proposed +0.0-normalized pair
    is exact under the lens; (c) the proposed pair is exact AND
    byte-identical to the registered pair on the real fixture
    (fixture-invisible); (d) non-vacuity: the lens really gives a group
    both zeros, so (a) cannot rot into a vacuous pass."""
    import numpy as np

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    dst = tempfile.mkdtemp(prefix="negzero_r15_")
    build_negzero(SF_SMOKE, dst)
    con = _con_over(dst)

    # (d) first — the poison shape the other assertions rely on
    ev = pd.read_parquet(f"{dst}/events.parquet")
    tail = ev.tail(3)
    both = tail[np.signbit(tail["value"].to_numpy()) == False]  # noqa: E712
    assert len(both) == 1
    twin_user = int(both["user_id"].iloc[0])
    user_vals = ev.loc[ev["user_id"] == twin_user, "value"].to_numpy()
    zeros = user_vals[user_vals == 0.0]
    assert len(zeros) >= 2 and np.signbit(zeros).any() and not np.signbit(zeros).all()

    # (a) registered pair diverges under the lens
    got = QUERIES["grouped_map_pandas"](spark, dst).toPandas()
    want = con.execute(ORACLES["grouped_map_pandas"]).fetchdf()
    assert _selfcheck_compare("registered_under_lens", got, want), (
        "expected the registered pair to diverge under the negzero lens; "
        "if it now matches, the fix landed — retire this half"
    )

    # (b) proposed pair: exact under the lens
    fixed = _proposed_spark(spark, dst).toPandas()
    fixed_want = con.execute(_PROPOSED_ORACLE).fetchdf()
    assert not _selfcheck_compare("proposed_under_lens", fixed, fixed_want)

    # (c) proposed pair on the real fixture: exact, and identical to the
    # registered pair's values (fixture-invisible change)
    con_f = _con_over(SF_SMOKE)
    got_f = _proposed_spark(spark, SF_SMOKE).toPandas()
    want_f = con_f.execute(_PROPOSED_ORACLE).fetchdf()
    assert not _selfcheck_compare("proposed_on_fixture", got_f, want_f)
    reg_f = QUERIES["grouped_map_pandas"](spark, SF_SMOKE).toPandas()
    assert not _selfcheck_compare("proposed_vs_registered_fixture", got_f, reg_f)
