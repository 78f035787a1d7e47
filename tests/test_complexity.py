"""Pin the cost-model constants (reference constants, SURVEY.md §4.2) on
REALISTIC canonical-analyzed-plan fragments.

Expected multipliers derive from: baseline 0.6; per-op factor
(base/0.6) * inc^(n-1); complexity = GB * multiplier; calibration
count() on 1 GB => 1.0. The plan snippets mirror what Spark's analyzed
plan actually prints (one "window [" per Window node with its
windowspecdefinition sub-expressions, "deduplicate" for DISTINCT,
"aggregate [keys], [exprs]" for grouped aggregates) — the earlier
synthetic strings contained tokens like "groupingexpressions" that no
real plan ever prints, so they pinned branches real queries never hit."""
import pytest

from dbfs_spark_cache_spark.complexity import (
    MULTIPLIER_BASE,
    complexity_from_plan,
    plan_cost_multiplier,
)

W1 = (
    "window [row_number() windowspecdefinition(k, o asc nulls first, "
    "specifiedwindowframe(rowframe, unboundedpreceding$(), currentrow$())) "
    "as rn], [k], [o asc nulls first]"
)
W2 = (
    "window [rank() windowspecdefinition(k, o asc nulls first, "
    "specifiedwindowframe(rowframe, unboundedpreceding$(), currentrow$())) "
    "as r], [k], [o asc nulls first]"
)

CASES = [
    # (lowercased plan text, expected multiplier)
    ("aggregate [count(1) as n]", 1.00),                 # calibration anchor
    ("join inner, (k = k) +- aggregate [count(1) as n]", 3.33),
    (W1, 2.50),  # ONE window node = one count despite 3 'window' tokens
    (f"join inner, (k = k) +- {W1}", 8.33),
    ("aggregate [k], [k, sum(x) as s]", 1.60),           # grouped => complex
    ("join inner, (k = k) +- aggregate [k], [k, sum(x) as s]", 5.33),
    ("sort [x asc nulls first], true", 1.40),
    ("aggregate [count(1) as n] +- deduplicate [k]", 2.50),
    ("project [udf_scorer(x) as y]", 1.20),
    ("join inner, (a = a) +- join inner, (b = b) +- aggregate [count(1) as n]", 5.00),
    (f"{W1} +- {W2}", 4.50),
    ("aggregate [k], [k, sum(x) as s] +- aggregate [y], [y, max(y) as m]", 2.24),
    ("sort [x asc nulls first], true +- sort [y desc nulls last], true", 1.82),
    (
        "join inner, (a = a) +- sort [x asc nulls first], true "
        "+- join inner, (b = b) +- sort [y desc nulls last], true",
        9.10,
    ),
    ("aggregate [count(1) as n] +- deduplicate [k] +- deduplicate [j]", 3.50),
    ("project [udf_a(x) as y, udf_b(y) as z]", 1.44),
    # Grouping key containing ']' (array access): still classifies
    # COMPLEX — a [^]]* regex choked on the inner bracket and returned
    # the 1.0 simple factor.
    ("aggregate [arr[0], k], [arr[0], k, sum(x) as s]", 1.60),
    # Global aggregate followed by a window: the aggregate must stay
    # SIMPLE — a non-greedy ".*?], [" match would borrow the window's
    # bracket lists and misclassify it complex (expected: agg_simple x
    # window = (1.0/0.6)*(2.5/0.6)*0.6 = 4.17).
    (f"aggregate [count(1) as n] +- {W1}", 4.17),
]


@pytest.mark.parametrize("plan,expected", CASES)
def test_multiplier_constants(plan, expected):
    assert plan_cost_multiplier(plan) == pytest.approx(expected, abs=0.01)


def test_projection_baseline():
    assert plan_cost_multiplier("project [a, b] relation parquet") == pytest.approx(
        MULTIPLIER_BASE
    )


def test_complexity_scales_with_size():
    complexity, multiplier = complexity_from_plan("aggregate [count(1)]", 10.0)
    assert multiplier == pytest.approx(1.0)
    assert complexity == pytest.approx(10.0)


def test_count_on_one_gb_is_exactly_one():
    complexity, _ = complexity_from_plan("aggregate [count(1)]", 1.0)
    assert complexity == pytest.approx(1.0)


def test_real_plan_classification(spark):
    """The counting must hold on plans Spark ACTUALLY prints: a grouped
    rollup classifies complex (1.6), a bare count stays at the 1.0
    anchor, one window expression counts once (2.5 not ~13.5), and
    distinct is seen through its Deduplicate node."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dbfs_spark_cache_spark.plans.fingerprint import canonical_plan
    from tests.conftest import SF_SMOKE

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")

    def mult(d):
        return plan_cost_multiplier(canonical_plan(d).lower())

    assert mult(df.agg(F.count(F.lit(1)).alias("n"))) == pytest.approx(1.0)
    assert mult(
        df.groupBy("r_regionkey").agg(F.sum("r_regionkey").alias("s"))
    ) == pytest.approx(1.6)
    assert mult(
        df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("r_regionkey").orderBy("r_name")
            ),
        )
    ) == pytest.approx(2.5)
    assert mult(df.select("r_regionkey").distinct()) == pytest.approx(1.5)


def test_estimate_on_real_files(spark):
    """complexity == file-size GB x multiplier for a real parquet scan."""
    import os

    from dbfs_spark_cache_spark.complexity import estimate_compute_complexity
    from tests.conftest import SF_SMOKE

    path = f"{SF_SMOKE}/lineitem.parquet"
    df = (
        spark.read.parquet(path)
        .groupBy("l_returnflag")
        .count()
        .orderBy("l_returnflag")
    )
    complexity, multiplier, size_gb = estimate_compute_complexity(df)
    expected_gb = os.path.getsize(path) / 1024**3 if os.path.isfile(path) else size_gb
    assert size_gb == pytest.approx(expected_gb, rel=0.01)
    assert multiplier > 1.0  # aggregate + sort
    assert complexity == pytest.approx(size_gb * multiplier)


def test_catalyst_size_fallback(spark):
    """Sources with no listable files but known stats (range here; ANALYZEd
    catalog tables in production) still get a non-zero size from the CBO
    estimate; truly-unknown sources (local relations -> Long.MaxValue
    sentinel) correctly report 0."""
    from dbfs_spark_cache_spark.complexity import (
        catalyst_size_estimate_gb,
        get_input_file_sizes,
    )

    ranged = spark.range(100_000)
    assert get_input_file_sizes(ranged) == []
    assert catalyst_size_estimate_gb(ranged) > 0

    unknown = spark.createDataFrame([(1, "x")], ["id", "pad"])
    assert catalyst_size_estimate_gb(unknown) == 0.0
