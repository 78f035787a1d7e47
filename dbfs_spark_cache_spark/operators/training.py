"""Training-data assembly operators ([NS]): sequence packing and
deterministic shuffle-sharding — the last mile between a deduped corpus
and a pretraining data loader.

Both are pure DataFrame compositions (no UDFs) and both are exactly
replayable by the DuckDB oracle: packing is a distributed prefix sum over
a deterministic document order, sharding is content-hash partitioning (the
same md5-portable discipline as ``sample_bernoulli`` — stable under any
partition layout, task retry, or engine, unlike seeded ``df.sample``).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

SEQ_BUDGET = 2048  # tokens per packed training sequence
_PACK_BUCKET = 64  # docs per prefix-sum bucket (tune to partition size)


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), c AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) - n_tokens AS seq_start
        FROM t
    )
    SELECT doc_id, n_tokens,
           seq_start // {SEQ_BUDGET} AS seq_id,
           seq_start % {SEQ_BUDGET} AS seq_offset
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences by
    contiguous concatenation in doc_id order (GPT-style pretraining
    packing): each document gets the sequence id and in-sequence offset
    where its tokens start.

    The semantics are a single global running sum, but the plan is NOT a
    single-partition window (the 100 TB killer): documents are bucketed by
    doc_id range, the running sum runs per bucket in parallel, and only
    the per-bucket totals — one row per bucket — pass through the tiny
    ordered window that turns them into bucket prefix offsets, which then
    broadcast back onto the per-bucket sums. Same distributed prefix-sum
    shape as ``scale.distributed_percentiles``; the oracle spells the
    equivalent global window directly.

    r18 opt note: an input spread (scale.spread_unsplittable_scan) was
    A/B-measured here and REGRESSED ~2x (0.30 -> 0.65 s at sf0.1): the
    tokenize feeds two window/aggregate branches that each hash-exchange
    on `bucket` anyway, so the spread added a round-robin hop per branch
    without removing any serial work that mattered. Left unchanged.
    """
    docs = load_table(spark, sf, "documents")
    tokens = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_tokens"),
        F.expr(f"doc_id div {_PACK_BUCKET}").alias("bucket"),
    )
    w_in = (
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_cum = tokens.withColumn("cum_in_bucket", F.sum("n_tokens").over(w_in))
    # Bucket totals derive from the windowed frame (a bucket's total is
    # its max running sum — the increments are non-negative). NOTE the
    # plan still re-derives the tokenize upstream for this branch: the
    # two consumers prune different columns, so their exchange subtrees
    # are not identical and Catalyst cannot reuse one (verified with AQE
    # on and off). At bench scale the duplicated pass is map-side and
    # cheap; at corpus scale, stage the `tokens` frame through the cache
    # engine (``staging.stage_cache(tokens, ...)``) so both consumers
    # read the materialization — the same write-once-read-twice lever the
    # pipeline_* queries demonstrate.
    bucket_totals = with_cum.groupBy("bucket").agg(
        F.max("cum_in_bucket").alias("bucket_tokens")
    )
    # Ordered window over one row per bucket — tiny by construction.
    w_prev = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    bucket_offsets = bucket_totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_prev), F.lit(0)).alias(
            "bucket_offset"
        ),
    )
    return (
        with_cum.join(F.broadcast(bucket_offsets), "bucket")
        .withColumn(
            "seq_start", F.col("bucket_offset") + F.col("cum_in_bucket") - F.col("n_tokens")
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"seq_start div {SEQ_BUDGET}").alias("seq_id"),
            (F.col("seq_start") % SEQ_BUDGET).alias("seq_offset"),
        )
    )


@register(
    "shuffle_shard_assign",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hkey FROM documents
    )
    SELECT doc_id,
           CAST(strpos('0123456789abcdef', substr(hkey, 1, 1)) - 1 AS BIGINT)
               AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY substr(hkey, 1, 1)
                                   ORDER BY hkey, doc_id) AS BIGINT)
               AS shard_pos
    FROM h
    """,
)
def shuffle_shard_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training:
    every document gets a shard (here 16, one hex nibble of its content
    hash) and a stable position within the shard (ordered by the full
    hash) — a reproducible random permutation of the corpus with no RNG
    state anywhere.

    Content hashing, not seeded sampling, is the reproducible primitive at
    scale (same rationale as ``sample_bernoulli``: seeded RNG streams are
    partition-layout-dependent). Scale shape: the hash is map-side; the
    only shuffle is the per-shard ordering. At 100 TB extend the prefix to
    more nibbles (256/4096/65536 shards) so each shard's sort fits one
    task — shard count is the parallelism knob, and the data loader reads
    shards independently. md5 here is the oracle-portable family; swap via
    SPARK_GRAFT_HASH_FAMILY for xxhash64 in production (hashing.py).
    """
    docs = load_table(spark, sf, "documents")
    hashed = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hkey")
    )
    shard = (F.expr("locate(substr(hkey, 1, 1), '0123456789abcdef')") - 1).cast(
        "long"
    )
    w = W.partitionBy("shard").orderBy("hkey", "doc_id")
    return (
        hashed.withColumn("shard", shard)
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "shard_pos")
    )


def _split_oracle() -> str:
    from .dedup import duck_h62

    b = duck_h62("'split:' || doc_id") + " % 100"
    return f"""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               CASE WHEN {b} < 80 THEN 'train'
                    WHEN {b} < 90 THEN 'val'
                    ELSE 'test' END AS split_label
        FROM documents
    )
    SELECT split_label,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM assigned
    GROUP BY split_label
    """


@register("train_val_test_split", oracle=_split_oracle())
def train_val_test_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) — the assignment is
    a content hash of the salted doc_id, NOT an RNG draw, so every row
    lands in the same split under any partition layout, task retry,
    cluster size, or engine. That is the property a training pipeline
    needs: re-running corpus prep must not leak documents across splits
    (a rand(seed)-based split reshuffles whenever the layout changes —
    the same failure mode the salted-join fix removed). The 'split:' salt
    decorrelates this hash from every other doc_id-hash use in the
    pipeline (sampling, sharding), so splits stay independent of sample
    membership. Map-side hash + tiny 3-group aggregate; the per-doc
    assignment (the ungrouped `assigned` frame) is what a real pipeline
    joins against, summarized here for the oracle."""
    from .dedup import h62_sql

    docs = load_table(spark, sf, "documents")
    bucket = F.expr(h62_sql("concat('split:', cast(doc_id as string))")) % 100
    assigned = docs.select(
        "doc_id",
        "n_chars",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
        .alias("split_label"),
    )
    return assigned.groupBy("split_label").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
