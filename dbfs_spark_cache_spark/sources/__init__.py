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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # TIMESTAMP(NANOS) parquet columns arrive as LONG nanos (see session.py);
    # normalize to Spark's microsecond timestamps.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: Optional[Iterable[str]] = None
) -> None:
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
