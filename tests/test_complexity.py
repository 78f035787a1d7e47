"""Pin the cost-model constants (reference behavior, SURVEY.md §4.2).

Expected multipliers derive from: baseline 0.6; per-op factor
(base/0.6) * inc^(n-1); complexity = GB * multiplier; calibration
count() on 1 GB => 1.0."""
import pytest

from dbfs_spark_cache_spark.complexity import (
    MULTIPLIER_BASE,
    complexity_from_plan,
    plan_cost_multiplier,
)

CASES = [
    # (lowercased plan text, expected multiplier)
    ("aggregate [count(1)]", 1.00),                      # calibration anchor
    ("join inner, aggregate", 3.33),
    ("window [row_number]", 2.50),
    ("join inner, window [row_number]", 8.33),
    ("aggregate [sum(x)], groupingexpressions", 1.60),
    ("join inner, aggregate [sum(x)], groupingexpressions", 5.33),
    ("sort [x asc]", 1.40),
    ("aggregate [count(1)], distinct", 2.50),
    ("udf pythoneval", 1.20),
    ("join inner, join inner, aggregate", 5.00),
    ("window [row_number], window [rank]", 4.50),
    ("aggregate [sum(x)], groupingexpressions, aggregate [max(y)], groupingexpressions", 2.24),
    ("sort [x asc], sort [y desc]", 1.82),
    ("join inner, sort [x asc], join inner, sort [y desc]", 9.10),
    ("aggregate [count(1)], distinct, distinct", 3.50),
    ("udf pythoneval, udf pythoneval", 1.44),
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
