"""Behavioral invariants of the round-6 corpus-analytics operators —
the properties the DuckDB value oracle cannot express: planted-overlap
recall for the contamination check, coverage/overlap laws for sliding
chunking, funnel monotonicity, and mixture-weight mass conservation.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def queries():
    from dbfs_spark_cache_spark.operators import QUERIES

    return QUERIES


def test_contamination_check_finds_planted_overlap(spark):
    """Plant one 12-token span shared between a train-bucket doc and a
    test-bucket doc: the report must flag exactly that test doc (and not
    the clean control docs), with n_shared = 12 - 8 + 1 = 5 shingle hits."""
    from dbfs_spark_cache_spark.operators.corpus_analytics import (
        _CONTAM_W,
        contamination_report,
    )
    from dbfs_spark_cache_spark.operators.dedup import h62_sql

    # Find ids in the train (<80) and test (>=90) buckets with the same
    # salted-hash arithmetic the operator ships.
    ids = spark.range(0, 500).toDF("doc_id")
    bucket = F.expr(
        h62_sql("concat('split:', cast(doc_id as string))")
    ) % 100
    assigned = {r["doc_id"]: r["b"] for r in ids.select("doc_id", bucket.alias("b")).collect()}
    train_ids = [i for i, b in assigned.items() if b < 80]
    test_ids = [i for i, b in assigned.items() if b >= 90]
    assert train_ids and len(test_ids) >= 2

    span = " ".join(f"planted{k}" for k in range(12))  # 12 unique tokens
    filler = lambda tag: " ".join(f"{tag}{k}" for k in range(30))  # noqa: E731
    rows = [
        (train_ids[0], filler("trainpad") + " " + span),       # contaminated train doc
        (test_ids[0], span + " " + filler("testpad")),         # contaminated TEST doc
        (test_ids[1], filler("cleantest")),                    # clean test control
        (train_ids[1], filler("cleantrain")),                  # clean train control
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    report = {r["doc_id"]: r.asDict() for r in contamination_report(docs).collect()}

    assert set(report) == {test_ids[0]}, f"expected only the planted test doc, got {report}"
    hit = report[test_ids[0]]
    assert hit["n_shared"] == 12 - _CONTAM_W + 1  # every shingle inside the span
    assert hit["contamination_mass"] == hit["n_shared"]  # one train doc per shingle
    assert 0 < hit["contaminated_frac"] <= 1.0


def test_chunking_covers_every_token_with_fixed_overlap(spark, queries):
    """Chunk layout laws on the real fixture: chunks start every 48
    tokens, each holds <=64 tokens, the last chunk reaches exactly the
    document end, and consecutive chunks overlap by 16 tokens (except a
    possibly-shorter final chunk)."""
    from dbfs_spark_cache_spark.operators.corpus_analytics import _CHUNK, _STRIDE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    chunks = queries["text_chunk_sliding"](spark, SF_SMOKE)
    joined = chunks.join(docs, "doc_id").collect()
    assert joined, "no chunks produced"
    per_doc: dict[int, list] = {}
    for r in joined:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        n = rows[0]["n"]
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r["chunk_tokens"] == _CHUNK  # every non-final chunk is full
        last = rows[-1]
        # the final chunk ends exactly at the document end
        assert last["chunk_id"] * _STRIDE + last["chunk_tokens"] == n
        # and starts within the document (no empty trailing chunk)
        assert last["chunk_tokens"] >= 1
        expected_chunks = 1 if n <= _CHUNK else -(-(n - _CHUNK) // _STRIDE) + 1
        assert len(rows) == expected_chunks, f"doc {doc_id}: {len(rows)} != {expected_chunks}"


@pytest.mark.parametrize("name", ["text_ngram_topk", "text_inverted_index"])
def test_topk_heads_are_bucketed_not_windowed(spark, queries, name):
    """The top-k head selection must be the bucketed two-stage form: a
    per-key window (or a single collect_list over the full postings)
    funnels a stop-word-grade key's entire list through one task at
    corpus scale. Pin: no window specs in the plan, and the bucket column
    participates in the first aggregation."""
    df = queries[name](spark, SF_SMOKE)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "windowspecdefinition" not in analyzed.lower(), (
        f"{name}: per-key window resurfaced"
    )
    assert "bkt" in analyzed, f"{name}: bucketed stage-1 aggregation missing"


def test_funnel_stage_counts_are_monotone(spark, queries):
    row = queries["events_funnel_conversion"](spark, SF_ORACLE).collect()[0]
    assert row["n_view_users"] >= row["n_click_users"] >= row["n_purchase_users"] > 0
    assert 0 < row["view_to_click"] <= 1.0
    assert 0 < row["click_to_purchase"] <= 1.0


def test_mixture_weights_conserve_mass(spark, queries):
    """Applying the computed weights must reproduce a uniform mixture:
    sum(n_docs * weight) == total docs, and every weighted share equals
    1/n_sources."""
    rows = queries["corpus_domain_mixture"](spark, SF_ORACLE).collect()
    total = sum(r["n_docs"] for r in rows)
    weighted = sum(r["n_docs"] * r["mix_weight"] for r in rows)
    assert abs(weighted - total) < 1e-6 * total
    for r in rows:
        assert abs(r["n_docs"] * r["mix_weight"] - total / len(rows)) < 1e-6 * total
