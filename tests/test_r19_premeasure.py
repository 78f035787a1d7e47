"""r19 premeasure: shared min-label propagation helper (+ pointer
jumping) for dedup_cluster_keepers' due slot.

``dedup_cluster_keepers``' convergence-cap error message has always
prescribed "rerun with pointer-jumping" for a component deeper than 64
rounds — but no such code existed. r18 adds
``dedup.propagate_min_labels`` (slot-free: the registered query is
untouched), the reusable form of the query's inner loop with an optional
Shiloach-Vishkin label-of-label doubling step: O(log diameter) rounds
instead of O(diameter).

THE r19 LANDING OPTION (the query is r16-vintage — a member of r19's
zero-slack due cohort): replace the inline loop with
``labels = propagate_min_labels(sym, labels)`` — value-identical
(pinned below on the real fixture at sf0.001, full three-column output
including is_keeper and singletons), one code path for both modes.
Decide at r19 with a fresh measurement, the r17 MinHash-refutation way;
the helper is live and tested either way.

Pins:
(1) ground truth — both modes equal a Python union-find on random
    graphs (chains, stars, cliques, forests);
(2) the escape hatch is REAL: a 45-edge chain exhausts plain
    propagation capped at 8 rounds (loud RuntimeError naming
    pointer_jumping), while pointer_jumping converges within 8;
(3) fixture identity — an alternative dedup_cluster_keepers assembled
    from the helper returns bit-identical rows to the registered query
    at sf0.001, so the r19 adoption cannot move any attestation.
"""
from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


def _sym_labels(spark, edges):
    """(sym, labels) frames from an undirected edge list."""
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    sym = e.union(
        e.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    return sym, labels


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("pointer_jumping", [False, True])
def test_propagation_matches_union_find_on_random_graphs(
    spark, pointer_jumping
):
    from dbfs_spark_cache_spark.operators.dedup import propagate_min_labels

    rng = random.Random(42)
    graphs = [
        [(i, i + 1) for i in range(10, 20)],                     # chain
        [(100, h) for h in range(101, 109)],                     # star
        [(a, b) for a in range(200, 205) for b in range(a + 1, 205)],  # clique
    ]
    # random forest + cross links
    nodes = list(range(300, 340))
    graphs.append(
        [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
    )
    edges = [e for g in graphs for e in g if e[0] != e[1]]

    sym, labels = _sym_labels(spark, edges)
    got = {
        r.doc_id: r.cluster_id
        for r in propagate_min_labels(
            sym, labels, pointer_jumping=pointer_jumping
        ).collect()
    }
    assert got == _union_find(edges)


def test_pointer_jumping_is_a_real_escape_hatch(spark):
    """A 45-edge chain has diameter 45: plain propagation capped at 8
    rounds must raise LOUDLY (naming the remedy), pointer jumping must
    converge within the same 8 rounds (log2(45) ~ 5.5)."""
    from dbfs_spark_cache_spark.operators.dedup import propagate_min_labels

    chain = [(i, i + 1) for i in range(1000, 1045)]
    sym, labels = _sym_labels(spark, chain)

    with pytest.raises(RuntimeError, match="pointer_jumping=True"):
        propagate_min_labels(sym, labels, max_rounds=8)

    got = {
        r.doc_id: r.cluster_id
        for r in propagate_min_labels(
            sym, labels, max_rounds=8, pointer_jumping=True
        ).collect()
    }
    assert set(got.values()) == {1000}
    assert len(got) == 46


def _keepers_via_helper(spark, sf):
    """dedup_cluster_keepers re-assembled on propagate_min_labels — the
    exact r19 landing candidate (everything outside the loop verbatim
    from the registered query)."""
    from dbfs_spark_cache_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        propagate_min_labels,
    )
    from dbfs_spark_cache_spark.sources import load_table

    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    edges = (
        lsh_candidate_pairs(minhash_signatures(docs))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    sym = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    labels = propagate_min_labels(sym, labels)
    singletons = (
        docs.select("doc_id")
        .distinct()
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    return labels.unionByName(singletons).select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


def test_helper_form_is_fixture_identical_to_registered(spark):
    from dbfs_spark_cache_spark.operators import QUERIES

    registered = {
        tuple(r) for r in QUERIES["dedup_cluster_keepers"](
            spark, SF_SMOKE
        ).collect()
    }
    candidate = {tuple(r) for r in _keepers_via_helper(spark, SF_SMOKE).collect()}
    assert candidate == registered
