"""Regression pins for the r9 verdict/advice findings: the hardened
PythonUDF plan-JSON counter (suffix-anchored class regex + version-rename
canary), and this round's other engine-review fixes."""
from __future__ import annotations

import logging
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE


def test_udf_counter_sees_plain_and_pandas_udfs(spark):
    """VERDICT r8 #6: the counter must read >=1 on BOTH a plain and a
    pandas UDF frame — on Spark 4.1 both render a
    catalyst.expressions.PythonUDF expression, and the suffix-anchored
    regex must keep matching it."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    from dbfs_spark_cache_spark.complexity import count_python_udfs

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")

    plain = F.udf(lambda x: float(x), DoubleType())
    assert count_python_udfs(df.select(plain("r_regionkey").alias("s"))) >= 1

    @F.pandas_udf(DoubleType())
    def vec(x: pd.Series) -> pd.Series:
        return x.astype(float) + 1.0

    assert count_python_udfs(df.select(vec("r_regionkey").alias("s"))) >= 1

    # grouped-map (FlatMapGroupsInPandas) carries a PythonUDF too
    gm = df.groupBy("r_regionkey").applyInPandas(
        lambda p: p, "r_regionkey long, r_name string, r_comment string"
    )
    assert count_python_udfs(gm) >= 1


def test_udf_counter_regex_survives_package_move():
    """ADVICE r8 #3: the match anchors on the .PythonUDF class-name
    suffix, not the full Catalyst package path, so a package move or
    JSON spacing change keeps counting."""
    from dbfs_spark_cache_spark.complexity import _PYTHON_UDF_CLASS_RE

    for js in (
        '"class":"org.apache.spark.sql.catalyst.expressions.PythonUDF"',
        '"class":"org.apache.spark.sql.internal.expressions.PythonUDF"',
        '"class" : "whatever.moved.PythonUDF"',
        '"class":"x.PythonUDAF"',
        '"class":"x.PythonUDTF"',
    ):
        assert _PYTHON_UDF_CLASS_RE.search(js), js
    # and never a false positive on non-UDF classes or prose
    for js in (
        '"class":"org.apache.spark.sql.catalyst.expressions.Add"',
        '"name":"my_python_udf_helper"',
        '"class":"x.PythonUDFRunner"',  # runner infra, not an expression
    ):
        assert not _PYTHON_UDF_CLASS_RE.search(js), js


def test_udf_counter_warns_on_rename_not_silence(spark, caplog, monkeypatch):
    """VERDICT r8 #5: a Spark rename of the expression class must produce
    a WARNING (plan still mentions a Python-execution marker while the
    count reads 0), not a silent revival of the dead-factor bug."""
    import re

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    import dbfs_spark_cache_spark.complexity as cx

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")

    @F.pandas_udf(DoubleType())
    def vec(x: pd.Series) -> pd.Series:
        return x.astype(float)

    frame = df.select(vec("r_regionkey").alias("s"))
    # simulate the rename: the class regex no longer matches anything,
    # but the plan JSON still carries the PythonUDF marker text
    monkeypatch.setattr(
        cx, "_PYTHON_UDF_CLASS_RE", re.compile(r"(?!x)x")
    )
    with caplog.at_level(logging.WARNING, logger="dbfs_spark_cache_spark.complexity"):
        n = cx.count_python_udfs(frame)
    assert n == 0
    assert any(
        "renamed" in rec.message or "marker" in rec.message
        for rec in caplog.records
    ), "zero-count-with-marker plan must fire the rename canary warning"
