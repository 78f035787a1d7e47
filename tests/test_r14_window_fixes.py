"""Regression pins for the r14 due-slot batch (promoted from the
since-retired tests/test_r14_premeasure.py — every proposed diff those
tests encoded is now the REGISTERED implementation/oracle, so each pin
runs the registered query + oracle on the same hostile fixture and
asserts exact parity).

The batch (all five names r11-vintage, landed slot-neutral in their own
due round — see __spark_entry__._CHANGED):

- text_unigram_logprob: the per-doc mean rounds in pure INTEGER space on
  BOTH engines (r12 'unicode' lens — mechanism is exact-rational-half
  rounding, not Unicode; the old ROUND(SUM/n, 6) coin-flipped whenever
  the mean landed exactly on a 6th-decimal half, which 5-7 REAL fixture
  docs do).
- multimodal_decode_features: the oracle's byte stats group AND join
  back by (doc_id, hx) — the payload identity — instead of doc_id alone
  (r12 'conflict' lens: conflicting duplicate keys pooled two different
  payloads' stats while the Spark decode is a per-row map pass).
- embedding_kmeans_assign: the FULL usable-embedding contract
  (dimension + finite — similarity.DUCK_VEC_USABLE / _vec_usable) on
  BOTH engines (r13 'giant' lens: a truncated-but-finite vector crashed
  Spark's centroid sums via ANSI element_at OOB while the oracle ran).
- embedding_norms: empty-vector NULL norm on the Spark side (the SQL
  aggregate-over-no-values convention; the fold-over-nothing yielded
  0.0 vs DuckDB's NULL list_sum([])). Diagnostic query — wrong-dim rows
  stay VISIBLE on both engines rather than being gated out.
- similarity_topk_batch: the same dim gate as kmeans (the finite-only
  gate's green was coincidental: wrong-dim vectors scored NULL cosine
  on Spark — zip_with pads NULL, the fold propagates — vs a FINITE
  cosine on DuckDB, whose list_sum skips the pads; only random-vector
  luck kept them out of the top-10).
"""
from __future__ import annotations

import glob
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from selfcheck import compare as _selfcheck_compare  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


def _con_over(sf: str):
    con = duckdb.connect()
    for f in sorted(glob.glob(f"{sf}/*.parquet")):
        tbl = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{f}'")
    return con


def _assert_exact(name, spark, sf, con):
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    got = QUERIES[name](spark, sf).toPandas()
    want = con.execute(ORACLES[name]).fetchdf()
    problems = _selfcheck_compare(name, got, want)
    assert not problems, f"{name}: {problems}"
    return got


def _lens_sf(tmp_path, builder_name: str):
    import hostile_probe

    sf = str(tmp_path / builder_name)
    os.makedirs(sf, exist_ok=True)
    getattr(hostile_probe, f"build_{builder_name}")(SF_SMOKE, sf)
    return sf, _con_over(sf)


def test_unigram_logprob_integer_tie_parity(spark, tmp_path):
    """The registered pair is exact under the unicode lens (whose fixture
    carries a doc with an exact-rational-half mean that used to coin-flip)
    AND on the real fixture — and the tie class the integer-space rounding
    eliminates is genuinely present on the real fixture, so the pin is
    non-vacuous."""
    sf, con = _lens_sf(tmp_path, "unicode")
    _assert_exact("text_unigram_logprob", spark, sf, con)

    con_f = _con_over(SF_SMOKE)
    _assert_exact("text_unigram_logprob", spark, SF_SMOKE, con_f)

    # the fixture genuinely carries exact-tie docs (sum_micro*2 % 2n == n)
    ties = con_f.execute(
        """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        vocab AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
        total AS (SELECT SUM(cnt) AS total FROM vocab),
        logp AS (
            SELECT token,
                   CAST(ROUND(LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 6)
                        AS DECIMAL(18,6)) AS logp
            FROM vocab CROSS JOIN total
        ),
        agg AS (
            SELECT t.doc_id, COUNT(*) AS n, SUM(l.logp) AS s
            FROM toks t JOIN logp l ON t.token = l.token GROUP BY t.doc_id
        )
        SELECT COUNT(*) FROM agg
        WHERE (2 * CAST(abs(s) * 1000000 AS BIGINT)) % (2 * n) = n
        """
    ).fetchone()[0]
    assert ties >= 1, "no exact-tie docs on the fixture — the pin went vacuous"


def test_decode_features_conflict_and_dup_parity(spark, tmp_path):
    """The registered pair is exact under the conflict lens (same doc_id,
    DIFFERENT payload — the shape whose stats used to pool) AND under
    plain at-least-once duplication (identical copies must still collapse
    — the r11 contract survives the (doc_id, hx) re-key)."""
    sf_c, con_c = _lens_sf(tmp_path, "conflict")
    # the conflict shape is really there: some doc_id carries 2+ payloads
    n_conflicted = con_c.execute(
        "SELECT COUNT(*) FROM (SELECT doc_id FROM documents "
        "WHERE text IS NOT NULL GROUP BY doc_id "
        "HAVING COUNT(DISTINCT text) > 1)"
    ).fetchone()[0]
    assert n_conflicted > 0
    _assert_exact("multimodal_decode_features", spark, sf_c, con_c)

    sf_d, con_d = _lens_sf(tmp_path, "dup")
    _assert_exact("multimodal_decode_features", spark, sf_d, con_d)


def test_kmeans_assign_giant_parity(spark, tmp_path):
    """The registered pair is exact under the giant lens — the fixture
    whose truncated vector used to CRASH Spark's centroid sums outright
    (ANSI INVALID_ARRAY_INDEX) while the oracle served rows. The wrong-dim
    vectors are really present and really excluded on both engines."""
    sf, con = _lens_sf(tmp_path, "giant")
    n_wrong_dim = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .where(F.col("embedding").isNotNull() & (F.size("embedding") != 64))
        .count()
    )
    assert n_wrong_dim > 0
    got = _assert_exact("embedding_kmeans_assign", spark, sf, con)
    assert len(got) > 0


def test_embedding_norms_giant_empty_vector(spark, tmp_path):
    """The registered pair is exact under the giant lens; the empty vector
    reports a NULL norm on BOTH engines, and the wrong-dim diagnostic rows
    stay VISIBLE (this query reports dim per vector — it must not gate
    them out)."""
    sf, con = _lens_sf(tmp_path, "giant")
    got = _assert_exact("embedding_norms", spark, sf, con)
    g = got.set_index("vec_id")
    # 980003 is the giant lens's empty vector; 980001/980002 wrong-dim
    assert {980001, 980002, 980003} <= set(got["vec_id"])
    assert g.loc[980003, "dim"] == 0
    assert pd.isna(g.loc[980003, "l2_norm"])


def test_topk_batch_giant_near_dup_parity(spark, tmp_path):
    """The registered pair is exact under the giant lens EVEN WITH the
    coin-flip shape added: a near-duplicate of query vector 0 carrying two
    extra trailing dims (the shape DuckDB used to rank ~first while
    Spark's NULL cosine dropped it). Both engines now exclude it via the
    dimension gate, and neither output contains it."""
    sf, con = _lens_sf(tmp_path, "giant")

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    qvec = list(emb.set_index("vec_id").loc[0, "embedding"])
    near_dup = pd.DataFrame(
        [{
            "vec_id": 980004,
            "embedding": [float(x) for x in qvec] + [0.1, 0.1],
            "label": 0,
        }]
    )
    poisoned = pd.concat([emb, near_dup], ignore_index=True)
    poisoned["embedding"] = poisoned["embedding"].map(
        lambda v: [float(x) for x in v]
    )
    poisoned.to_parquet(f"{sf}/embeddings.parquet")
    con.execute("DROP VIEW embeddings")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )

    got = _assert_exact("similarity_topk_batch", spark, sf, con)
    assert 980004 not in set(got["vec_id"])


def test_expected_dim_is_single_sourced():
    """ADVICE r13 #2: every oracle that gates on the embedding dimension
    derives the literal from similarity.EXPECTED_DIM (f-string
    interpolation of DUCK_VEC_USABLE) — no oracle may hardcode the dim as
    a string literal that could silently diverge from the Spark gate."""
    from dbfs_spark_cache_spark.operators import ORACLES
    from dbfs_spark_cache_spark.operators.similarity import (
        DUCK_VEC_USABLE,
        EXPECTED_DIM,
    )

    gated = [
        "similarity_topk_cosine",
        "similarity_lsh_buckets",
        "similarity_multiprobe",
        "similarity_ivf_search",
        "similarity_topk_batch",
        "dedup_embedding_cosine",
        "embedding_kmeans_assign",
    ]
    for name in gated:
        assert DUCK_VEC_USABLE in ORACLES[name], (
            f"{name}: oracle does not embed the shared DUCK_VEC_USABLE "
            f"predicate — dim gate not single-sourced"
        )
    assert f"len(embedding) = {EXPECTED_DIM}" in DUCK_VEC_USABLE
