"""Shared fixtures: one local SparkSession per test run, isolated cache dirs."""
from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest

# Pin the host process to UTC before any JVM/session starts: collect()
# renders TimestampType (LTZ) in the OS zone while TIMESTAMP_NTZ collects
# naive, so the streaming LTZ-vs-NTZ parity assertions only hold when the
# driver host zone is UTC. The session TZ is already pinned UTC in
# get_spark; this makes the PYTHON side match on non-UTC dev machines.
os.environ["TZ"] = "UTC"
if hasattr(time, "tzset"):
    time.tzset()

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_ORACLE = f"{TESTDATA}/sf0.01"

_TMP_ROOT = tempfile.mkdtemp(prefix="spark_cache_test_")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from dbfs_spark_cache_spark import reconfigure
    from dbfs_spark_cache_spark.session import get_spark

    reconfigure(
        SPARK_CACHE_DIR=f"{_TMP_ROOT}/cache/",
        CACHE_DATABASE="test_cache_db",
        DATABASE_PATH=f"{_TMP_ROOT}/warehouse/",
    )
    spark = get_spark(
        app_name="engine_tests",
        warehouse_dir=f"{_TMP_ROOT}/warehouse/",
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield spark
    spark.stop()
    shutil.rmtree(_TMP_ROOT, ignore_errors=True)


@pytest.fixture()
def clean_cache(spark):
    """Empty cache dir + database before a test that exercises caching."""
    from dbfs_spark_cache_spark.config import config

    spark.sql(f"DROP DATABASE IF EXISTS {config.CACHE_DATABASE} CASCADE")
    shutil.rmtree(config.SPARK_CACHE_DIR, ignore_errors=True)
    os.makedirs(config.SPARK_CACHE_DIR, exist_ok=True)
    yield
