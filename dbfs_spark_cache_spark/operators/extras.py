"""Remaining SURVEY.md §2 coverage: generators, renames, correlated
subqueries, percentiles, and the full Python-function surface (grouped-agg
pandas UDAF, applyInPandas grouped map, Python UDTF)."""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table, register_views
from .registry import register


@register(
    "range_generate",
    oracle="""
    SELECT CAST(gs.generate_series AS BIGINT) AS id,
           CAST(gs.generate_series * gs.generate_series AS BIGINT) AS id_squared
    FROM generate_series(0, 999, 3) gs
    """,
)
def range_generate(spark: SparkSession, sf: str) -> DataFrame:
    """The range generator source (no input files — pure computation)."""
    return spark.range(0, 1000, 3).select(
        "id", (F.col("id") * F.col("id")).alias("id_squared")
    )


@register(
    "project_rename",
    oracle="""
    SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
           CAST(s_acctbal AS DOUBLE) AS balance
    FROM supplier
    """,
)
def project_rename(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "supplier")
        .withColumnRenamed("s_suppkey", "supplier_id")
        .withColumnRenamed("s_name", "supplier_name")
        .withColumnRenamed("s_acctbal", "balance")
        .select("supplier_id", "supplier_name", "balance")
    )


@register(
    "correlated_subquery_min",
    oracle="""
    SELECT p_brand, p_partkey, p_name, CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part p
    WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                           WHERE p2.p_brand = p.p_brand)
    """,
)
def correlated_subquery_min(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery (cheapest part per brand) — Catalyst
    rewrites it to an aggregate + join; min() is exact so the equality
    predicate is engine-stable."""
    register_views(spark, sf, ["part"])
    return spark.sql(
        """
        SELECT p_brand, p_partkey, p_name, p_retailprice
        FROM part p
        WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                               WHERE p2.p_brand = p.p_brand)
        """
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT o_orderpriority,
           ROUND(CAST(QUANTILE_CONT(o_totalprice, 0.5) AS DOUBLE), 4) AS median_price,
           ROUND(CAST(QUANTILE_CONT(o_totalprice, 0.9) AS DOUBLE), 4) AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use the same
    linear-interpolation definition; rounded to absorb ULP drift)."""
    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "udaf_grouped_pandas",
    oracle="""
    SELECT o_orderpriority,
           CAST(MAX(o_totalprice) - MIN(o_totalprice) AS DOUBLE) AS price_spread
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (a Python UDAF): Arrow-batched, one value per
    group. max-min is order-independent, so the result is exact."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def spread(prices: pd.Series) -> float:
        return float(prices.max() - prices.min())

    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        spread("o_totalprice").alias("price_spread")
    )


@register(
    "grouped_map_pandas",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value,
           CAST(MAX(value) - MIN(value) AS DOUBLE) AS value_range
    FROM events
    GROUP BY user_id
    """,
)
def grouped_map_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """applyInPandas grouped map: whole group in, one summary row out.
    The custom-stateful-operator escape hatch; outputs are exact
    (count/min/max only)."""
    events = load_table(spark, sf, "events")

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "min_value": [pdf["value"].min()],
                "max_value": [pdf["value"].max()],
                "value_range": [pdf["value"].max() - pdf["value"].min()],
            }
        )

    return events.groupBy("user_id").applyInPandas(
        summarize,
        schema=(
            "user_id long, n_events long, min_value double, max_value double, "
            "value_range double"
        ),
    )


@register(
    "udtf_tokenize",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(u.gs - 1 AS INT) AS pos, ts[u.gs] AS token
    FROM toks, UNNEST(generate_series(1, len(ts))) AS u(gs)
    """,
)
def udtf_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF: one input row -> many output rows (token stream with
    positions). The tokenization itself is SQL-expressible, so the UDTF
    *mechanism* gets a full value oracle (split+unnest in DuckDB);
    equivalence with explode-based tokenization is additionally pinned in
    tests/test_operators_pipeline.py. Deterministic subset via a doc_id
    predicate, not LIMIT (unordered LIMIT is layout-dependent)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for pos, token in enumerate(text.split(" ")):
                yield doc_id, pos, token

    docs = load_table(spark, sf, "documents").where(F.col("doc_id") < 50)
    spark.udtf.register("tokenize_udtf", Tokenize)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM udtf_docs, LATERAL tokenize_udtf(doc_id, text) t"
    )
