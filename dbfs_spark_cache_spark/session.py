"""Tuned SparkSession factory.

One place to encode the scale-aware defaults every entry point shares:
AQE on (runtime re-planning + skew-join handling), shuffle partitions sized
to the machine instead of the 200 default, Arrow enabled for the pandas
boundary, UTC session timezone so timestamp semantics match columnar stores
and the DuckDB oracle.

getOrCreate caveat (r15 fresh-eyes note): when a SparkSession already
exists in the process, Spark applies the builder's RUNTIME confs
(``spark.sql.*`` — shuffle partitions, AQE, timezone) to that session but
silently ignores the STATIC ones — ``master``, ``spark.driver.memory``
and ``spark.sql.warehouse.dir`` keep the first session's values. Callers
that need a different warehouse or driver size must stop the existing
session first (the test suite's one-session-per-process rule exists for
the same reason: the embedded Derby metastore also locks the warehouse).
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbfs_spark_cache_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Read TIMESTAMP(NANOS) parquet columns (Spark has no nanos type):
        # they surface as LONG nanos; sources.load_table converts to
        # microsecond timestamps, matching how columnar stores downcast.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    if warehouse_dir is None:
        from .config import config

        warehouse_dir = config.DATABASE_PATH
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
