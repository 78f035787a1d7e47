"""Regression pins for the r8 engine review findings: the dead UDF cost
factor, plain-UDF warnings naming Catalyst builtins, tiering's
schema-change orphan + pure-scan re-materialization, and the maintenance
CLI's unscoped destructive stages."""
from __future__ import annotations

import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE


def test_udf_multiplier_counts_real_python_udfs(spark):
    """The analyzed plan prints a UDF call as its bare function name, so
    the old plan.count('udf') scored UDF pipelines as bare projections
    (0.6 < the 1.01 auto-cache gate). The JSON-node count must see
    lambda, named, and pandas UDFs alike."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    from dbfs_spark_cache_spark.complexity import (
        count_python_udfs,
        estimate_compute_complexity,
    )

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    lam = F.udf(lambda x: float(x), DoubleType())

    with_udf = df.select(lam("r_regionkey").alias("s"))
    assert count_python_udfs(with_udf) == 1
    _, multiplier, _ = estimate_compute_complexity(with_udf)
    assert multiplier >= 1.2 - 1e-9, (
        f"one-UDF projection must clear the 1.01 gate, got {multiplier}"
    )

    two = df.select(lam("r_regionkey").alias("a"), lam("r_regionkey").alias("b"))
    assert count_python_udfs(two) == 2

    no_udf = df.select(F.sqrt("r_regionkey").alias("s"))
    assert count_python_udfs(no_udf) == 0
    _, base_mult, _ = estimate_compute_complexity(no_udf)
    assert base_mult == pytest.approx(0.6)


def test_find_plain_udfs_reports_only_outer_function(spark):
    """A builtin nested in the UDF's argument expression (cast, substring)
    is not a Python function; flagging it as one is misleading noise."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    from dbfs_spark_cache_spark.plans.fingerprint import find_plain_udfs

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    lam = F.udf(lambda x: float(x), DoubleType())
    frame = df.select(lam(F.col("r_regionkey").cast("string")).alias("s"))
    assert find_plain_udfs(frame) == ["<lambda>"]


def test_backup_skips_schema_changed_inputs(spark, clean_cache, monkeypatch):
    """A SCHEMA_CHANGE failure from inputFiles() yields a key embedding
    now() — unmatchable forever. Backup must skip, like the
    listing-failure guard next to it, instead of orphaning a full write."""
    from dbfs_spark_cache_spark.config import config
    from dbfs_spark_cache_spark.tiering import backup_spark_cached_to_storage

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet").select("r_name")

    def boom():
        raise Exception("SCHEMA_CHANGE detected on source")

    monkeypatch.setattr(df, "inputFiles", boom)
    backed = backup_spark_cached_to_storage([df])
    assert backed == []
    # nothing materialized: the cache database was never even created
    if spark.catalog.databaseExists(config.CACHE_DATABASE):
        tables = spark.sql(
            f"SHOW TABLES IN {config.CACHE_DATABASE}"
        ).filter("isTemporary = false").count()
        assert tables == 0, "schema-changed frame must not materialize"


def test_backup_skips_pure_scan_of_existing_entry(spark, clean_cache):
    """A frame that IS a scan of a cache table already lives in the
    persistent tier under that key; backing it up again wrote the whole
    table a second time under a different (stranded) key."""
    from dbfs_spark_cache_spark import write_cache
    from dbfs_spark_cache_spark.config import config
    from dbfs_spark_cache_spark.tiering import backup_spark_cached_to_storage

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    write_cache(df)
    listing = spark.sql(f"SHOW TABLES IN {config.CACHE_DATABASE}").filter(
        "isTemporary = false"
    )
    h = listing.collect()[0].tableName
    scan = spark.table(f"{config.CACHE_DATABASE}.{h}")

    backed = backup_spark_cached_to_storage([scan])
    assert backed == []
    assert listing.count() == 1, "pure-scan backup must not create a twin entry"


class _NoStopSession:
    """Real session, but stop() is a no-op so the CLI can't kill the
    shared test fixture."""

    def __init__(self, real):
        self._real = real

    def stop(self):
        pass

    def __getattr__(self, name):
        return getattr(self._real, name)


def test_cli_refuses_unscoped_destructive_stages(
    spark, clean_cache, monkeypatch, caplog
):
    """--size-budget-bytes / --repair-inconsistent act on the CONFIGURED
    database; under --database they must refuse instead of silently
    deleting from the namespace the operator scoped away from."""
    from dbfs_spark_cache_spark import maintenance_cli, write_cache
    from dbfs_spark_cache_spark.config import config

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    write_cache(df)
    default_db_tables = spark.sql(
        f"SHOW TABLES IN {config.CACHE_DATABASE}"
    ).filter("isTemporary = false")
    assert default_db_tables.count() == 1

    import dbfs_spark_cache_spark.session as session_mod

    monkeypatch.setattr(
        session_mod, "get_spark", lambda **kw: _NoStopSession(spark)
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS cli_scoped_db")
    try:
        monkeypatch.setattr(
            sys,
            "argv",
            [
                "spark-cache-maintenance",
                "--database", "cli_scoped_db",
                "--days", "9999",
                "--size-budget-bytes", "1",
                "--repair-inconsistent", "--force",
            ],
        )
        with caplog.at_level(logging.WARNING):
            assert maintenance_cli.main() == 0
        assert any("do not honor --database" in r.message for r in caplog.records)
        # the configured namespace survives untouched
        assert default_db_tables.count() == 1
    finally:
        spark.sql("DROP DATABASE IF EXISTS cli_scoped_db CASCADE")
