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


def test_checkpoint_rdd_id_reads_the_persisted_id(spark):
    """ADVICE r8 #1 fix: the cluster-keepers reclaim attributes its own
    checkpoint by reading the id off the checkpointed DataFrame's
    LogicalRDD plan node — the id must be exactly the one the
    persistent-RDD registry carries, available before materialization."""
    from dbfs_spark_cache_spark.operators.dedup import (
        _checkpoint_rdd_id,
        _persistent_rdd_entries,
    )

    ck = spark.range(50).selectExpr("id", "id % 5 as g").localCheckpoint(
        eager=False
    )
    rid = _checkpoint_rdd_id(ck)
    assert rid is not None
    assert rid in _persistent_rdd_entries(spark.sparkContext), (
        "checkpoint RDD must be registered at creation time under the id "
        "read from the LogicalRDD node"
    )
    # non-checkpointed plans are not LogicalRDD -> None, never a bogus id
    assert _checkpoint_rdd_id(spark.range(3)) is None
    ck.unpersist()


def test_cluster_keepers_spares_concurrent_checkpoints(spark):
    """ADVICE r8 #1: the old reclaim diffed the session-global
    persistent-RDD registry around each round, so ANY RDD persisted
    concurrently by another thread was swept into the diff and
    unpersisted a round later — for a lineage-truncated localCheckpoint
    that makes its blocks unrecoverable and later actions FAIL (not
    recompute). Run the query while a bystander thread checkpoints small
    frames; every bystander must remain fully usable afterwards."""
    import threading

    from dbfs_spark_cache_spark.operators import QUERIES

    bystanders: list = []
    stop = threading.Event()
    errors: list = []

    def persist_bystanders():
        i = 0
        while not stop.is_set() and i < 40:
            try:
                ck = (
                    spark.range(100 + i)
                    .selectExpr("id", f"id * {i + 1} as v")
                    .localCheckpoint(eager=True)
                )
                bystanders.append((i, ck))
            except Exception as exc:  # pragma: no cover - diagnostic only
                errors.append(exc)
            i += 1

    t = threading.Thread(target=persist_bystanders, daemon=True)
    t.start()
    try:
        QUERIES["dedup_cluster_keepers"](spark, SF_SMOKE).count()
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errors, f"bystander checkpointing itself failed: {errors[:1]}"
    assert bystanders, "bystander thread produced nothing — test is vacuous"
    # every bystander's truncated-lineage blocks must still be readable
    for i, ck in bystanders:
        assert ck.count() == 100 + i
        ck.unpersist()


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
