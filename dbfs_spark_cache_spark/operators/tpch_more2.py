"""TPC-H Q10/Q13/Q16/Q17/Q22 analogues — the remaining distinctive plan
shapes: returned-item ranking, double aggregation (distribution of
aggregates), NOT-IN anti-semantics, correlated-average filters, and
substring-keyed anti-join aggregation."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import dec as _dec, register


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10: who returned the most revenue — 4-way join, grouped sum,
    top-k."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf, "nation")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer GROWS with the corpus (TPC-H scales it 1:10 with orders):
        # no hard broadcast hint — AQE broadcasts it when actually small
        # and shuffle-joins otherwise (the r5 flagship scale-killer class).
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_dec(net, 6)).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_customer AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_customer
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13: double aggregation — distribution of a per-key aggregate.
    Two shuffles by construction (per-customer counts, then histogram)."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_customer = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size NOT IN (1, 4, 7)
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN filtering + distinct counting per group."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#1") & (~F.col("p_size").isin(1, 4, 7))
    )
    return (
        # part grows with the corpus: no hard hint, AQE decides
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(22,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17: correlated-average filter (lines below half their part's
    mean quantity). The correlated subquery becomes an aggregate + re-join
    on the fact table. avg computed decimal-exact for the oracle."""
    li = load_table(spark, sf, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH rich AS (
        SELECT c_custkey, c_acctbal, SUBSTRING(c_name, 17, 2) AS cust_code
        FROM customer
        WHERE (c_acctbal IS NULL OR isfinite(c_acctbal)) AND c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(22,2))) AS DOUBLE) / COUNT(*)
            FROM customer
            WHERE (c_acctbal IS NULL OR isfinite(c_acctbal)) AND c_acctbal > 0)
    )
    SELECT r.cust_code,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(r.c_acctbal AS DECIMAL(22,2))) AS DOUBLE) AS totacctbal
    FROM rich r
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY r.cust_code
    ORDER BY r.cust_code
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: above-average balances, substring-derived grouping
    key, NOT EXISTS anti-join, grouped aggregate.

    The average balance stays inside the plan as a broadcast single-row
    aggregate (crossJoin + filter) — Catalyst's scalar-subquery shape — not a
    driver ``collect()``: one job, and the plan fingerprint doesn't bake in a
    data-dependent literal.

    r13 (landed in this query's due slot; pre-measured at r11's
    nonfinite lens; premeasure since promoted to
    tests/test_r13_window_fixes.py): a single NaN balance crashed the
    oracle's DECIMAL sum and polluted this side's in-plan average into
    NaN, silently emptying the rich set. Both engines now drop
    non-finite balances (``finite_or_null("c_acctbal")`` / the oracle
    WHERE riders) — the bad-telemetry contract. Fixture-invisible
    (every fixture balance is finite)."""
    from .registry import finite_or_null

    customer = load_table(spark, sf, "customer").where(
        finite_or_null("c_acctbal")
    )
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    recent = load_table(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_acctbal", F.substring("c_name", 17, 2).alias("cust_code"))
    )
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cust_code")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cust_code")
    )
