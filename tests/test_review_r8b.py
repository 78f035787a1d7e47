"""Regression pins for the round-8 second review batch (an independent
review of the round's own diff): the nanos-vintage streaming schema fed
normalized instead of raw, an id()-reuse hole in the sidecar stat-failure
marker, one-level-deep instability left in the UDF set canonicalization,
and the plan scanner dropping UDF names after a paren string literal."""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_udf_tag_stable_for_nested_containers_across_seeds(tmp_path):
    """Sorting raw element reprs fixed flat set literals but left a set
    OF frozensets (and a closure tuple containing a set) unstable: each
    inner frozenset's repr is itself ordered by the per-process string
    hash, so the outer sort keys changed per process and the persistent
    cache still never hit. Elements now canonicalize recursively."""
    # The containers must be CLOSURE CELLS (globals reach the tag only by
    # NAME via co_names, never by value — a module-level set is vacuously
    # stable and tests nothing).
    prog = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql.types import DoubleType\n"
        "from dbfs_spark_cache_spark.functions import content_addressed_udf\n"
        "def make(groups, lookup, mixed):\n"
        "    def fn(s):\n"
        "        return s.map(lambda t: 1.0 if frozenset(t) in groups\n"
        "                     else lookup.get(frozenset(t), float(len(mixed))))\n"
        "    return fn\n"
        "fn = make(\n"
        "    frozenset({frozenset({'aa', 'bb'}), frozenset({'cc', 'dd'})}),\n"
        "    {frozenset({'ee', 'ff'}): 1.0, frozenset({'gg'}): 2.0},\n"
        "    ({'hh', 'ii'}, 'jj'),\n"
        ")\n"
        "assert fn.__closure__, 'containers did not become closure cells'\n"
        "u = content_addressed_udf(fn, DoubleType())\n"
        "print(u.func.__name__.rsplit('__', 1)[1])\n"
    )
    tags = set()
    for seed in ("1", "2", "3"):
        out = subprocess.run(
            [sys.executable, "-c", prog],
            capture_output=True, text=True,
            env={**os.environ, "PYTHONHASHSEED": seed},
        )
        assert out.returncode == 0, out.stderr[-500:]
        tags.add(out.stdout.strip().splitlines()[-1])
    assert len(tags) == 1, f"tag varies with PYTHONHASHSEED: {tags}"


def test_udf_tag_distinguishes_nested_container_content():
    """The recursive canonicalization must still SEPARATE different
    contents — collapsing every container to one digest would serve one
    UDF's cache for another."""
    from pyspark.sql.types import DoubleType

    from dbfs_spark_cache_spark.functions import content_addressed_udf

    def build(elems: str):
        ns: dict = {}
        # Closure cell, not a global — globals reach the tag by name only.
        exec(
            "def make(groups):\n"
            "    def fn(s):\n"
            "        return s.map(lambda t: 1.0 if frozenset(t) in groups else 0.0)\n"
            "    return fn\n"
            f"fn = make(frozenset({{frozenset({elems})}}))\n",
            ns,
        )
        assert ns["fn"].__closure__
        return content_addressed_udf(ns["fn"], DoubleType())

    def tag(u):
        return u.func.__name__.rsplit("__", 1)[1]

    assert tag(build("{'aa', 'bb'}")) == tag(build("{'bb', 'aa'}"))  # same value
    assert tag(build("{'aa', 'bb'}")) != tag(build("{'aa', 'zz'}"))


def test_sidecar_stat_failure_marker_never_matches():
    """The stat-failed marker must be unmatchable across CALLS, not just
    across runs: id(object()) reuses the freed address deterministically,
    so the 'unmatchable' marker compared equal on the very next call in
    the same process and the stale sidecar was served anyway."""
    from dbfs_spark_cache_spark.operators.source_scans import _sf_fingerprint

    missing = "/nonexistent-sf-dir-for-marker-test"
    a = _sf_fingerprint(missing, "documents")
    b = _sf_fingerprint(missing, "documents")
    assert "<stat-failed" in a and "<stat-failed" in b
    assert a != b, "stat-failure marker is matchable: stale sidecar hazard"


def test_find_plain_udfs_survives_paren_string_literal(spark):
    """The plan prints string literals RAW, so lit(')') drove the depth
    scanner negative: every top-level UDF after it silently missed the
    warning, and nested builtins got promoted to depth 0 ('cast' was
    reported as a plain Python UDF)."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType

    from dbfs_spark_cache_spark.plans.fingerprint import find_plain_udfs

    def my_udf_one(s):
        return s

    def my_udf_two(s):
        return s + "x"

    u1 = F.udf(my_udf_one, StringType())
    u2 = F.udf(my_udf_two, StringType())
    df = spark.range(3).select(
        u1(F.concat(F.lit(")"), F.col("id").cast("string"))).alias("a"),
        u2(F.col("id").cast("string")).alias("b"),
    )
    found = find_plain_udfs(df)
    assert "my_udf_two" in found, "UDF after a paren literal dropped"
    assert "cast" not in found, "nested builtin promoted by a paren literal"


def test_events_stream_heals_nanos_vintage_end_to_end(spark, tmp_path):
    """read_events_stream on a legacy TIMESTAMP(NANOS) fixture: the file
    source must be given the RAW schema (ts as LONG nanos under the
    nanosAsLong conf) so normalize_event_ts can heal it. Feeding the
    batch loader's NORMALIZED schema (timestamp_ntz) declared ntz against
    a physical INT64-nanos column — the read failed and the bigint heal
    downstream was dead code (the r4 January-1970 regression class)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dbfs_spark_cache_spark.streaming import (
        read_events_stream,
        run_to_memory_sink,
    )

    instants = [
        dt.datetime(2024, 3, 1, 12, 30, 45, 123456),
        dt.datetime(2025, 7, 4, 8, 0, 0, 250000),
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(instants, pa.timestamp("ns")),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(table, path, coerce_timestamps=None)
    # Precondition: the file really is the nanos vintage, or this test
    # silently degrades into a second copy of the us-vintage path.
    assert pa.types.is_timestamp(pq.read_schema(path).field("ts").type)
    assert pq.read_schema(path).field("ts").type.unit == "ns"

    stream = read_events_stream(spark, str(tmp_path))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    got = {
        r.event_id: r.ts
        for r in run_to_memory_sink(
            stream.select("event_id", "ts"), "t_nanos_vintage"
        ).collect()
    }
    assert got == {1: instants[0], 2: instants[1]}, (
        f"nanos vintage mis-decoded: {got}"
    )
