"""Table sources for the fixture star schema.

Everything reads Parquet through ``spark.read.parquet`` so Catalyst gets
vectorized scans, predicate pushdown, and column pruning. ``register_views``
exposes the same tables to ``spark.sql`` queries.
"""
from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception as exc:
        # Sessions built outside session.get_spark may lack the nanos
        # setting; it is a runtime SQL conf, so self-heal and retry.
        if "TIMESTAMP(NANOS" in str(exc) or "PARQUET_TYPE_ILLEGAL" in str(exc):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        else:
            raise
    # TIMESTAMP(NANOS) parquet columns arrive as LONG nanos (see session.py);
    # normalize to TIMESTAMP_NTZ microseconds — naive like every other
    # fixture timestamp, and immune to both the session timezone and the
    # driver host's OS timezone (PySpark collect() renders TimestampType in
    # the OS zone, which silently shifts values on non-UTC hosts). The
    # NTZ cast itself is session-TZ-dependent, so UTC is pinned first.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: Optional[Iterable[str]] = None
) -> None:
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
