"""TPC-H Q7/Q15 analogues: nation-pair trade volume (two dimension legs on
one fact row) and argmax-by-aggregate (top supplier via CTE + max)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import dec as _dec, register


@register(
    "q7_nation_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS volume,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_name <> nc.n_name
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY supp_nation, cust_nation, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume — the same fact row joins
    two independent dimension legs (supplier nation, customer nation).
    Bounded dims (nation) carry broadcast hints; the growing customer/
    supplier legs are AQE-decided; the fact table shuffles once for the agg."""
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # supplier grows with the corpus: no hard hint, AQE decides
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        # customer GROWS with the corpus (TPC-H scales it 1:10 with orders):
        # no hard broadcast hint — AQE broadcasts it when actually small
        # and shuffle-joins otherwise (the r5 flagship scale-killer class).
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.sum(_dec(net, 6)).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q8_market_share",
    oracle="""
    WITH region_trade AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS order_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6)) AS volume,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation ncust ON ncust.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = ncust.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT order_year,
           CAST(CAST(COALESCE(SUM(volume) FILTER (WHERE supp_nation = 'NATION_7'), 0) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM region_trade
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's (NATION_7) share of a region's trade per year —
    a ratio of conditional to total decimal sums over a 7-way join."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    supplier = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    ncust = nation.select(
        F.col("n_nationkey").alias("ncust_key"), F.col("n_regionkey").alias("ncust_region")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    volume = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    china_volume = F.when(F.col("supp_nation") == "NATION_7", volume)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer GROWS with the corpus (TPC-H scales it 1:10 with orders):
        # no hard broadcast hint — AQE broadcasts it when actually small
        # and shuffle-joins otherwise (the r5 flagship scale-killer class).
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(ncust), F.col("c_nationkey") == F.col("ncust_key"))
        .join(F.broadcast(region), F.col("ncust_region") == region.r_regionkey)
        # supplier grows with the corpus: no hard hint, AQE decides
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.coalesce(F.sum(china_volume), F.lit(0)).cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("order_year")
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    WITH lines AS (
        SELECT l.l_suppkey, l.l_orderkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT a.l_suppkey AS s_suppkey, COUNT(DISTINCT a.l_orderkey) AS n_blamed_orders
    FROM lines a
    WHERE a.is_late
      AND EXISTS (SELECT 1 FROM lines b
                  WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lines c
                      WHERE c.l_orderkey = a.l_orderkey
                        AND c.l_suppkey <> a.l_suppkey AND c.is_late)
    GROUP BY a.l_suppkey
    ORDER BY n_blamed_orders DESC, s_suppkey
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: lateness = shipped >60 days after order
    date): suppliers solely responsible for a multi-supplier order's delay —
    the EXISTS + NOT-EXISTS double-correlation, expressed as a semi join
    plus an anti join on the same derived frame."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    lines = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_suppkey",
            "l_orderkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    late = lines.where(F.col("is_late")).alias("a")
    others = lines.alias("b")
    other_late = lines.where(F.col("is_late")).alias("c")
    return (
        late.join(
            others,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_suppkey") != F.col("a.l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("c.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("c.l_suppkey") != F.col("a.l_suppkey")),
            "left_anti",
        )
        .groupBy(F.col("a.l_suppkey").alias("s_suppkey"))
        .agg(F.countDistinct("a.l_orderkey").alias("n_blamed_orders"))
        .orderBy(F.desc("n_blamed_orders"), F.asc("s_suppkey"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH supplier_revenue AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN supplier_revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM supplier_revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15: argmax by aggregate — suppliers whose quarterly revenue
    equals the maximum. The max comes from an exact decimal-derived double,
    so the equality predicate is engine-stable."""
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_dec(net, 6)).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    supplier = load_table(spark, sf, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == F.col("m"))
        # supplier grows with the corpus: no hard hint, AQE decides
        .join(supplier, revenue.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )
