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
        if "TIMESTAMP(NANOS" in str(exc) or "ILLEGAL_PARQUET_TYPE" in str(exc):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        else:
            raise
    if name == "events":
        df = normalize_event_ts(df, ntz=True)
    return df


def normalize_event_ts(df: DataFrame, ntz: bool = True) -> DataFrame:
    """Normalize the events ``ts`` column across fixture vintages.

    The driver has shipped ``events.parquet`` with two physical ts types:
    TIMESTAMP(NANOS) — which Spark surfaces as LONG nanos under the
    ``nanosAsLong`` legacy conf (session.py) — and plain ``timestamp[us]``,
    which surfaces natively as a timestamp column. Convert the former to
    microsecond timestamps; pass the latter through unchanged. Used by BOTH
    the batch loader (``load_table``) and the streaming reader
    (``streaming.read_events_stream``) so the two paths can never diverge
    on the unit again (round-4 regression: streaming kept an unconditional
    ``div 1000`` and placed every event in January 1970).

    ``ntz=True`` yields TIMESTAMP_NTZ — the batch convention: naive like
    every other fixture timestamp and immune to the driver host's OS
    timezone on ``collect()``. ``ntz=False`` yields TIMESTAMP_LTZ — the
    streaming convention: watermarks reject NTZ event time
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). The session timezone is
    pinned UTC before any tz-sensitive cast so both conventions carry
    identical wall-clock values.
    """
    dt = dict(df.dtypes).get("ts")
    if dt is None:
        return df
    target = "timestamp_ntz" if ntz else "timestamp"
    if dt == "bigint":  # legacy TIMESTAMP(NANOS) fixture surfaced as nanos
        col = F.timestamp_micros(F.expr("ts div 1000"))
    elif dt != target:  # native timestamp[us] fixture, wrong tz flavor
        col = F.col("ts")
    else:
        # Already in the target flavor: pure pass-through. The UTC pin
        # below is only needed when a tz-sensitive cast actually runs —
        # flipping a foreign session's timezone on this path would
        # silently change rendering for all their unrelated queries.
        return df
    spark = df.sparkSession
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    return df.withColumn("ts", col.cast(target))


def register_views(
    spark: SparkSession, sf_dir: str, names: Optional[Iterable[str]] = None
) -> None:
    # `names or TABLES` would silently register all ten tables for an
    # explicitly-empty iterable (a dynamically computed list that came up
    # empty should be a no-op).
    for name in TABLES if names is None else names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
