"""Additional TPC-H-shaped queries (Q4/Q6/Q12/Q14/Q18/Q19 analogues,
adapted to the fixture schema) plus ordered-collection aggregates.

Same float discipline as relational.py: DECIMAL sums, double division,
deterministic orderings.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import dec as _dec, register


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4: EXISTS-gated priority counts (semi join + grouped count)."""
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem")
    # EXISTS compiles directly to a left-semi join with the correlated
    # condition folded into the join predicate — no distinct needed.
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(22,6))) AS DOUBLE)
               AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: the pure scan-filter-sum query — everything pushes to the
    parquet scan; no shuffle at all beyond the final global agg."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount"), 6))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation."""
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            # ~is_high, not otherwise(1): a NULL priority must count in
            # NEITHER bucket (the oracle's NOT IN is NULL -> ELSE 0; the
            # old otherwise(1) branch counted NULL rows as low)
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6)))
                    FILTER (WHERE p.p_type = 'PROMO') AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6))) AS DOUBLE)
               AS DOUBLE) AS promo_share_pct,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
      AND l.l_shipdate < TIMESTAMP '1997-09-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total revenue (broadcast
    dim join + two exact decimal sums)."""
    li = load_table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
    )
    part = load_table(spark, sf, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_sum = F.sum(F.when(F.col("p_type") == "PROMO", _dec(net, 6))).cast("double")
    total_sum = F.sum(_dec(net, 6)).cast("double")
    return (
        # part grows with the corpus: no hard hint, AQE decides
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * promo_sum / total_sum).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(22,2))) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate driving a two-level join,
    top-k output."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .where(F.col("qty_dec") > 150)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        # customer GROWS with the corpus (TPC-H scales it 1:10 with orders):
        # no hard broadcast hint — AQE broadcasts it when actually small
        # and shuffle-joins otherwise (the r5 flagship scale-killer class).
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_type = 'LARGE' AND l.l_quantity >= 20)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive join-side predicates —
    the optimizer-stress case (OR across both join sides)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | ((F.col("p_type") == "LARGE") & (F.col("l_quantity") >= 20))
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part grows with the corpus: no hard hint, AQE decides
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.sum(_dec(net, 6)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nation_csv,
           COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered collection aggregates: collect_list made deterministic via
    array_sort (collection order is partition-dependent otherwise — sorting
    is mandatory for reproducible results at any scale). The collected array
    is serialized with array_join so the result is flat-typed: the driver's
    pandas canonicalizer cannot hash list-valued cells (r2 finding), and a
    delimited string carries the identical information for comparison.

    Empty-collection NULL (landed r12, this query's due slot; found by
    the r10 'nulls' lens): both engines SKIP NULL elements (mixed-group
    parity needs no code — collect_list and STRING_AGG agree), but over
    an ALL-NULL group Spark's array_join of the empty array emitted ''
    while STRING_AGG emits NULL. The collection now emits NULL when the
    collected array is empty — the SQL aggregate-over-no-values
    convention. Parity pinned in tests/test_r12_window_fixes.py; no
    fixture group is all-NULL."""
    nation = load_table(spark, sf, "nation")
    collected = F.array_sort(F.collect_list("n_name"))
    return nation.groupBy("n_regionkey").agg(
        F.when(F.size(collected) > 0, F.array_join(collected, ",")).alias(
            "nation_csv"
        ),
        F.count(F.lit(1)).alias("n_nations"),
    )
