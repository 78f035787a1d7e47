"""Regression pins for the ADVICE r10 engine items (slot-free fixes).

#3 fs.list_dir: only ENOENT (vanished entry / dangling symlink) is
   swallowed during a directory scan; a PermissionError must propagate —
   silently dropping an unreadable entry would undercount tree_size and
   the size-budget eviction footprint.
#4 streaming._sink_data_columns: the recorded (latest-batch) sink schema
   is sound only for REFUSING include_batch_id; ALLOWING requires the
   union of every committed dir's schema (mergeSchema inference),
   because a redeploy may have dropped a batch_id column earlier commits
   carried — partition discovery would silently shadow those dirs' data
   column.
"""
from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_list_dir_skips_vanished_but_propagates_permission(tmp_path, monkeypatch):
    from dbfs_spark_cache_spark import fs

    d = tmp_path / "scan"
    d.mkdir()
    (d / "ok.txt").write_text("x")
    (d / "gone.txt").write_text("y")
    (d / "locked.txt").write_text("z")

    real_stat = os.DirEntry.stat

    def fake_stat(entry, *a, **k):
        if entry.name == "gone.txt":
            raise FileNotFoundError(2, "vanished", entry.path)
        if entry.name == "locked.txt":
            raise PermissionError(13, "denied", entry.path)
        return real_stat(entry, *a, **k)

    monkeypatch.setattr(os.DirEntry, "stat", fake_stat)

    # PermissionError propagates (loud undercount refusal)...
    with pytest.raises(PermissionError):
        fs.list_dir(str(d))

    # ...while a vanished-only scan still succeeds, minus the ghost.
    def fake_stat2(entry, *a, **k):
        if entry.name == "gone.txt":
            raise FileNotFoundError(2, "vanished", entry.path)
        return real_stat(entry, *a, **k)

    monkeypatch.setattr(os.DirEntry, "stat", fake_stat2)
    names = {s.name for s in fs.list_dir(str(d))}
    assert names == {"ok.txt", "locked.txt"}


def test_sink_data_columns_sees_batch_id_dropped_by_schema_evolution(
    spark, tmp_path
):
    """Older committed dirs carry a data batch_id column; the redeployed
    pipeline's latest batch (and therefore the recorded schema) dropped
    it. The shadow refusal must still see it."""
    from dbfs_spark_cache_spark import fs
    from dbfs_spark_cache_spark.streaming import (
        _LEDGER_SCHEMA,
        _sink_data_columns,
    )

    base = str(tmp_path / "sink")
    d1 = f"{base}/batch_id=0"
    d2 = f"{base}/batch_id=1"
    os.makedirs(f"{base}/_committed", exist_ok=True)
    # old shape: data column batch_id
    spark.createDataFrame(
        [(1, 100)], "user_id bigint, batch_id bigint"
    ).write.parquet(d1)
    # evolved shape: batch_id dropped
    spark.createDataFrame([(2,)], "user_id bigint").write.parquet(d2)
    # recorded schema = LATEST batch's (no batch_id)
    from pyspark.sql.types import LongType, StructField, StructType

    latest = StructType([StructField("user_id", LongType())])
    with open(f"{base}/_committed/{_LEDGER_SCHEMA}", "w") as fh:
        fh.write(latest.json())

    cols = _sink_data_columns(spark, fs, base, [d1, d2])
    assert "batch_id" in cols, (
        "the evolved-away batch_id data column in older dirs must still "
        "trigger the include_batch_id shadow refusal"
    )

    # and the cheap refuse path still works when the RECORDED schema
    # itself carries batch_id
    both = StructType(
        [StructField("user_id", LongType()), StructField("batch_id", LongType())]
    )
    with open(f"{base}/_committed/{_LEDGER_SCHEMA}", "w") as fh:
        fh.write(both.json())
    cols = _sink_data_columns(spark, fs, base, [d1, d2])
    assert "batch_id" in cols


def test_expectations_refuse_colliding_rule_names(spark):
    """r11 fresh-eyes review of quality.py: a custom rule named like a
    generated alias (or the reserved 'passed' key) planned fine but
    collapsed to one dict key in the report — a rule the caller believes
    is gated was silently un-checked. The frame builder now refuses."""
    import pytest

    from pyspark.sql import functions as F

    from dbfs_spark_cache_spark.quality import (
        expectations_frame,
        expectations_report,
    )

    df = spark.createDataFrame([(1, 5.0)], "id bigint, v double")

    with pytest.raises(ValueError, match="collide"):
        expectations_frame(
            df, not_null=["id"], custom={"null_id": F.col("v") > 0}
        )
    with pytest.raises(ValueError, match="collide"):
        expectations_frame(df, unique=["id", "id"])
    with pytest.raises(ValueError, match="reserved"):
        expectations_frame(df, custom={"passed": F.col("v") > 0})

    # the happy path is untouched
    report = expectations_report(df, not_null=["id"], unique=["id"])
    assert report["passed"] and report["n_rows"] == 1
