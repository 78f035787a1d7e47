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
