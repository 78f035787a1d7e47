"""Scale-pattern pins: salted joins preserve semantics; bucketed joins
run shuffle-free; partitioned cache writes prune on re-read."""
import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    from dbfs_spark_cache_spark.operators.scale import salted_join

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(orders, customer, "o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark, clean_cache):
    from dbfs_spark_cache_spark.config import config
    from dbfs_spark_cache_spark.operators.scale import write_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {config.CACHE_DATABASE}")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed(orders, f"{config.CACHE_DATABASE}.b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"{config.CACHE_DATABASE}.b_lineitem",
        "o_orderkey",
        8,
    )
    # Fixture tables are broadcast-small; force the sort-merge path the
    # bucketing optimizes (at real scale neither side broadcasts anyway).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{config.CACHE_DATABASE}.b_orders").join(
            spark.table(f"{config.CACHE_DATABASE}.b_lineitem"), "o_orderkey"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-located buckets: no exchange feeds the join
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
        assert "Bucketed: true" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_cache_write_prunes(spark, clean_cache):
    from dbfs_spark_cache_spark import write_cache

    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_quantity", "l_returnflag")
    )
    cached = write_cache(li, partition_by=["l_returnflag"])
    filtered = cached.where(F.col("l_returnflag") == "A")
    assert filtered.count() > 0
    plan = _plan(filtered)
    # partition filter must prune, not scan-and-filter
    assert re.search(r"PartitionFilters: \[[^\]]*l_returnflag", plan)


import pytest


@pytest.mark.parametrize(
    "values",
    [
        [5.0],                                     # single row (N-1 == 0)
        [3.0, 3.0, 3.0, 3.0],                      # all equal (hi == lo)
        [1.0, 2.0, 2.0, 2.0, 3.0, 3.0, 9.0],       # heavy ties, N < n_tiles
        [-50.0, -1.0, 0.0, 0.0, 7.5, 7.5, 7.5, 100.0, 100.0, 101.0, 102.0,
         103.0, 104.0, 105.0, 106.0, 107.0],       # negatives + tie runs
        [float(x % 13) for x in range(101)],       # many ties, N > buckets
        [None, 4.0, None, 1.0, 1.0, None, 8.0],    # NULLs rank first
        [None, None, None],                        # all NULL
    ],
)
def test_distributed_percentiles_match_global_window(spark, values):
    """The bucket-offset formulation must reproduce Spark's own
    unpartitioned-window percent_rank/cume_dist/ntile EXACTLY on adversarial
    inputs — ties across bucket boundaries, all-equal values, N < n_tiles."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dbfs_spark_cache_spark.operators.scale import (
        distributed_global_percentiles,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v double"
    )
    got = {
        r.id: (r.pct_rank, r.cume_dist, r.tile)
        for r in distributed_global_percentiles(
            df, value_col="v", tiebreak_col="id", n_buckets=4, n_tiles=10
        ).collect()
    }
    w_val = W.orderBy("v")
    w_det = W.orderBy("v", "id")
    expected = {
        r.id: (r.pct_rank, r.cume_dist, r.tile)
        for r in df.select(
            "id",
            F.percent_rank().over(w_val).alias("pct_rank"),
            F.cume_dist().over(w_val).alias("cume_dist"),
            F.ntile(10).over(w_det).cast("long").alias("tile"),
        ).collect()
    }
    assert got == expected


def test_grouped_percentiles_match_partitioned_window(spark):
    """partition_cols mode must reproduce Spark's own
    Window.partitionBy(key) distribution functions EXACTLY, across
    adversarial group shapes living side by side: a singleton group, an
    all-equal group, a group with tie runs crossing band boundaries, and
    a group smaller than n_tiles."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dbfs_spark_cache_spark.operators.scale import (
        distributed_global_percentiles,
    )

    groups = {
        "singleton": [5.0],
        "allequal": [3.0] * 9,
        "ties": [-2.0, 0.0, 0.0, 0.0, 1.5, 1.5, 9.0, 9.0, 9.0, 9.0, 10.0],
        "tiny": [2.0, 1.0],  # fewer rows than n_tiles
    }
    rows = [
        (g, i, v)
        for g, vals in groups.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        (r.g, r.id): (r.pct_rank, r.cume_dist, r.tile)
        for r in distributed_global_percentiles(
            df,
            value_col="v",
            tiebreak_col="id",
            n_buckets=3,
            n_tiles=4,
            partition_cols=["g"],
        ).collect()
    }
    w_val = W.partitionBy("g").orderBy("v")
    w_det = W.partitionBy("g").orderBy("v", "id")
    expected = {
        (r.g, r.id): (r.pct_rank, r.cume_dist, r.tile)
        for r in df.select(
            "g",
            "id",
            F.percent_rank().over(w_val).alias("pct_rank"),
            F.cume_dist().over(w_val).alias("cume_dist"),
            F.ntile(4).over(w_det).cast("long").alias("tile"),
        ).collect()
    }
    assert got == expected


def test_salt_is_layout_stable(spark):
    """The salt must be a pure function of row content: the same row gets
    the same salt under any partition layout, so a task retry after a
    repartition cannot re-salt mid-job (rand(seed) broke this)."""
    from pyspark.sql import functions as F

    orders = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in orders.columns]), F.lit(16)
    ).cast("int")
    a = {r.o_orderkey: r.s for r in orders.withColumn("s", salt).collect()}
    b = {
        r.o_orderkey: r.s
        for r in orders.repartition(7).withColumn("s", salt).collect()
    }
    assert a == b
    # and the salt actually spreads rows (not constant)
    assert len(set(a.values())) > 1
