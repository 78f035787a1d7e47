"""Pre-measurement for the r14-queued fixes (targets r11-vintage,
natural re-attest r14). Two entries:

- text_unigram_logprob (r12 'unicode' lens — though the mechanism has
  nothing to do with Unicode: the NFC/NFD poison merely reshaped the
  vocabulary until one document's mean landed on the boundary), below.
- multimodal_decode_features (r12 'conflict' lens): the oracle pools
  byte stats by doc_id alone, so conflicting duplicate keys (same id,
  different payload) share pooled stats while the Spark decode is
  per-row. Oracle-only fix: key the stats by (doc_id, hx) — see
  test_decode_features_r14_fix_payload_keyed_stats.

- text_unigram_logprob: the per-doc mean is ROUND(SUM(logp)/n, 6) where
  SUM(logp) is an exact DECIMAL(18,6). Whenever SUM*1e6 is an odd
  multiple of n/gcd... i.e. the mean in micro-units is an EXACT
  RATIONAL HALF (sum_micro*2 % (2n) == n), the IEEE double of sum/n
  cannot represent the tie and the engines' rounding paths disagree:
  Spark's round() applies HALF_UP to the full decimal expansion of the
  double (which sits strictly on one side), while DuckDB's ROUND
  multiplies by 1e6 first (the multiply can re-land exactly on .5) and
  rounds half-away. Under the lens fixture doc 60's mean is exactly
  -6807083.5 micro-units: Spark says -3.403541, DuckDB -3.403542.

  The REAL fixtures carry such exact-tie docs too (5 at sf0.001, 7 at
  sf0.01) where the two float paths currently agree BY COINCIDENCE —
  every one is a latent coin flip against a libm or JVM revision.

  Fix when due: compute the rounded mean in pure INTEGER space on both
  engines — sum_micro = CAST(s*1000000 AS BIGINT) (exact: s has scale
  6), mean_micro = sign(s) * ((2*|sum_micro| + n) DIV (2*n)) (half-away
  -from-zero by construction), mean = CAST(mean_micro AS DOUBLE)/1e6.
  Integer division is bit-specified on both engines, so the tie class
  is eliminated rather than dodged. FIXTURE-VISIBLE: the exact rounding
  shifts the currently-coin-flipped tie docs by 1e-6 (1 row at
  sf0.001) — impl and oracle land together in the same slot, so the
  driver pair stays green.
"""
from __future__ import annotations

import glob
import os
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from hostile_probe import build_unicode  # noqa: E402
from selfcheck import compare as _selfcheck_compare  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402

_PROPOSED_ORACLE = """
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
    SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(l.logp) AS s
    FROM toks t JOIN logp l ON t.token = l.token
    GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END
            * ((2 * CAST(abs(s) * 1000000 AS BIGINT) + n_tokens)
               // (2 * n_tokens)) AS DOUBLE) / 1000000.0 AS mean_logprob
FROM agg
"""


def _proposed_spark(spark, sf):
    from dbfs_spark_cache_spark.sources import load_table

    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    logp = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("logp"),
    )
    agg = (
        toks.join(logp, "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("logp").alias("s"))
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END "
            "* ((2*CAST(abs(s)*1000000 AS BIGINT) + n_tokens) "
            "DIV (2*n_tokens)) AS DOUBLE) / 1000000.0"
        ).alias("mean_logprob"),
    )


def _con_over(sf: str):
    con = duckdb.connect()
    for f in sorted(glob.glob(f"{sf}/*.parquet")):
        tbl = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{f}'")
    return con


def test_unigram_logprob_r14_fix_integer_tie_rounding(spark):
    """(a) the registered pair diverges TODAY under the unicode lens
    (exact rational tie at doc 60); (b) the proposed integer-space
    rounding restores exact parity under the lens; (c) the proposed
    pair also agrees on the REAL fixture (fixture-VISIBLE relative to
    the registered values on the tie docs, but impl+oracle move
    together); (d) the real fixture genuinely carries exact-tie docs,
    so the coincidence the fix removes is non-vacuous."""
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    dst = tempfile.mkdtemp(prefix="uni_r14_")
    build_unicode(SF_SMOKE, dst)
    con = _con_over(dst)

    got = QUERIES["text_unigram_logprob"](spark, dst).toPandas()
    want = con.execute(ORACLES["text_unigram_logprob"]).fetchdf()
    assert _selfcheck_compare("registered_under_lens", got, want), (
        "expected the registered pair to diverge under the unicode lens; "
        "if it now matches, the fix landed — retire this half"
    )

    # (b) proposed pair: exact under the lens
    fixed = _proposed_spark(spark, dst).toPandas()
    fixed_want = con.execute(_PROPOSED_ORACLE).fetchdf()
    assert not _selfcheck_compare("proposed_under_lens", fixed, fixed_want)

    # (c) proposed pair: exact on the real fixture too
    con_f = _con_over(SF_SMOKE)
    got_f = _proposed_spark(spark, SF_SMOKE).toPandas()
    want_f = con_f.execute(_PROPOSED_ORACLE).fetchdf()
    assert not _selfcheck_compare("proposed_on_fixture", got_f, want_f)

    # (d) the tie class is real on the fixture (coin-flip docs exist)
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
    assert ties >= 1, "no exact-tie docs on the fixture — premise gone"


def _mm_fixed_oracle() -> str:
    """The proposed r14 oracle for multimodal_decode_features: byte stats
    grouped (and joined back) by (doc_id, hx) — the PAYLOAD identity —
    instead of doc_id alone."""
    from dbfs_spark_cache_spark.operators.multimodal import _STAT_WINDOW

    return f"""
    WITH h AS (
        SELECT doc_id, source AS asset_source,
               hex(encode(text)) AS hx,
               OCTET_LENGTH(ENCODE(text)) AS n_bytes
        FROM documents
        WHERE text IS NOT NULL
    ), d AS (
        SELECT doc_id, asset_source, n_bytes, hx,
               ((doc_id % 64) + 64) % 64 + 1 AS width,
               n_bytes % 64 + 1 AS height,
               ((doc_id % 3) + 3) % 3 + 1 AS channels,
               LEAST(n_bytes, {_STAT_WINDOW}) AS wn
        FROM h
    ), u AS (
        SELECT DISTINCT doc_id, hx, i FROM (SELECT doc_id, hx, unnest(generate_series(0, wn - 1)) AS i FROM d)
    ), b AS (
        SELECT doc_id, hx,
               (strpos('0123456789ABCDEF', substr(hx, 2 * i + 1, 1)) - 1) * 16
               + (strpos('0123456789ABCDEF', substr(hx, 2 * i + 2, 1)) - 1) AS byte
        FROM u
    ), s AS (
        SELECT doc_id, hx, AVG(byte) AS byte_mean, MIN(byte) AS byte_min,
               MAX(byte) AS byte_max,
               CAST(SUM(byte) % 65536 AS BIGINT) AS window_checksum
        FROM b GROUP BY doc_id, hx
    )
    SELECT d.doc_id, d.asset_source, d.n_bytes, d.width, d.height, d.channels,
           COALESCE(s.byte_mean, 0.0) AS byte_mean,
           COALESCE(s.byte_min, 0) AS byte_min,
           COALESCE(s.byte_max, 0) AS byte_max,
           COALESCE(s.window_checksum, 0) AS window_checksum
    FROM d LEFT JOIN s ON d.doc_id = s.doc_id AND d.hx = s.hx
"""


def test_decode_features_r14_fix_payload_keyed_stats(spark, tmp_path):
    """Pre-measure the r14-queued multimodal_decode_features fix (r12
    'conflict' lens — conflicting duplicate keys: the same doc_id
    reappears with a DIFFERENT payload). The registered oracle's byte
    stats GROUP BY doc_id alone, so the two conflicting payloads' bytes
    POOL into one group and both output rows read the pooled stats,
    while Spark's decode is a per-row map pass. Fix when due
    (oracle-only): group AND join back by (doc_id, hx) — the payload
    identity. Identical at-least-once copies still collapse (same hx —
    the r11 duplication contract survives, proved below), and doc_id is
    unique at every SF so the registered pair is fixture-identical."""
    from hostile_probe import build_conflict, build_dup

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    dst = str(tmp_path / "conflict")
    os.makedirs(dst, exist_ok=True)
    build_conflict(SF_SMOKE, dst)
    con = _con_over(dst)

    got = QUERIES["multimodal_decode_features"](spark, dst).toPandas()
    want = con.execute(ORACLES["multimodal_decode_features"]).fetchdf()
    assert _selfcheck_compare("mm_registered_under_conflict", got, want), (
        "expected the registered pair to diverge under the conflict lens; "
        "if it now matches, the fix landed — retire this half"
    )

    # (b) proposed oracle: exact under conflict AND under plain
    # at-least-once duplication (the r11 contract must survive)
    fixed = _mm_fixed_oracle()
    want_fixed = con.execute(fixed).fetchdf()
    assert not _selfcheck_compare("mm_fixed_under_conflict", got, want_fixed)

    dup_dst = str(tmp_path / "dup")
    os.makedirs(dup_dst, exist_ok=True)
    build_dup(SF_SMOKE, dup_dst)
    con_dup = _con_over(dup_dst)
    got_dup = QUERIES["multimodal_decode_features"](spark, dup_dst).toPandas()
    want_dup = con_dup.execute(fixed).fetchdf()
    assert not _selfcheck_compare("mm_fixed_under_dup", got_dup, want_dup)

    # (c) fixture-identical: registered and fixed oracles agree on the
    # real fixture (doc_id unique -> (doc_id, hx) ≡ doc_id grouping)
    con_f = _con_over(SF_SMOKE)
    a = con_f.execute(ORACLES["multimodal_decode_features"]).fetchdf()
    b = con_f.execute(fixed).fetchdf()
    assert not _selfcheck_compare("mm_fixture_identity", a, b)


# ---------------------------------------------------------------------------
# r13 'giant' lens findings on r11-vintage targets (natural re-attest
# r14) — the corrupt-DIMENSION shapes the nonfinite lens cannot see
# (every component is a healthy float). The four r10-vintage siblings
# (similarity trio + topk_cosine; dedup_embedding_cosine) landed the
# DUCK_VEC_USABLE dimension gate in their own r13 due slots; these two
# queue for r14:
#
# - embedding_kmeans_assign: a truncated (6-dim) vector passes the
#   finite+quant-bound gate and CRASHES Spark's centroid sums (ANSI
#   element_at over _KM_DIM positions) while DuckDB's q[d] returns NULL
#   past the end. Fix when due: `len(embedding) = 64 AND` in the
#   oracle's q-CTE WHERE + `_vec_usable()` on the Spark head.
# - embedding_norms: the EMPTY vector [] passes vec_finite on both
#   engines (no bad component to find), then Spark's fold-over-nothing
#   yields norm 0.0 while DuckDB's list_sum([]) is NULL. The query is a
#   DIAGNOSTIC (it reports dim per vector), so wrong-dim rows stay
#   VISIBLE; the fix is the SQL aggregate-over-no-values convention on
#   the Spark side: `when(size(embedding) > 0, round(sqrt(...), 6))`.
# ---------------------------------------------------------------------------


def _giant_sf(tmp_path):
    from hostile_probe import build_giant

    sf = str(tmp_path / "giant")
    os.makedirs(sf, exist_ok=True)
    build_giant(SF_SMOKE, sf)
    con = duckdb.connect()
    for f in sorted(glob.glob(f"{sf}/*.parquet")):
        tbl = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{f}'")
    return sf, con


def test_kmeans_assign_r14_fix_dim_gate(spark, tmp_path):
    """(a) today a truncated vector crashes Spark's centroid sums while
    the oracle runs; (b) the proposed dim gate on both engines restores
    exact parity; (c) every fixture embedding is 64-dim."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pytest

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    sf, con = _giant_sf(tmp_path)

    with pytest.raises(Exception, match="INVALID_ARRAY_INDEX"):
        QUERIES["embedding_kmeans_assign"](spark, sf).toPandas()
    want = con.execute(ORACLES["embedding_kmeans_assign"]).fetchdf()
    assert len(want) > 0  # the oracle side serves rows today

    # (b) head filter commutes with pre-filtering the file, so the
    # REGISTERED query over a dim-filtered copy IS the proposed variant
    out = tmp_path / "dimmed"
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{sf}/embeddings.parquet")
    keep = pc.equal(pc.list_value_length(t.column("embedding")), 64)
    pq.write_table(t.filter(pc.fill_null(keep, False)),
                   f"{out}/embeddings.parquet")
    fixed = QUERIES["embedding_kmeans_assign"](spark, str(out)).toPandas()
    fixed_oracle = ORACLES["embedding_kmeans_assign"].replace(
        "FROM embeddings WHERE", "FROM embeddings WHERE len(embedding) = 64 AND"
    )
    assert fixed_oracle != ORACLES["embedding_kmeans_assign"]
    fixed_want = con.execute(fixed_oracle).fetchdf()
    problems = _selfcheck_compare("kmeans_r14", fixed, fixed_want)
    assert not problems, problems

    # (c) fixture-invisible
    assert (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .where(F.size("embedding") != 64)
        .count()
        == 0
    )


def test_embedding_norms_r14_fix_empty_vector_null(spark, tmp_path):
    """(a) today the empty vector diverges (Spark 0.0 vs DuckDB NULL);
    (b) the proposed when(size > 0) Spark-side fix reaches exact parity
    with the UNCHANGED oracle, keeping the wrong-dim diagnostic rows
    visible on both engines."""
    from dbfs_spark_cache_spark.functions import vec_finite, vec_sq_norm
    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES
    from dbfs_spark_cache_spark.sources import load_table

    sf, con = _giant_sf(tmp_path)

    got = QUERIES["embedding_norms"](spark, sf).toPandas()
    want = con.execute(ORACLES["embedding_norms"]).fetchdf()
    assert _selfcheck_compare("norms_current", got, want), (
        "expected the empty-vector divergence; if this matches, the fix "
        "landed — retire this half"
    )
    g = got.set_index("vec_id")
    assert g.loc[980003, "l2_norm"] == 0.0  # today's wrong Spark answer

    # (b) the proposed variant, inline
    emb = load_table(spark, sf, "embeddings").where(vec_finite("embedding"))
    fixed = emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.when(
            F.size("embedding") > 0,
            F.round(F.sqrt(vec_sq_norm("embedding")), 6),
        ).alias("l2_norm"),
    ).toPandas()
    problems = _selfcheck_compare("norms_r14", fixed, want)
    assert not problems, problems
    # the wrong-dim rows stay VISIBLE (diagnostics contract)
    assert {980001, 980002, 980003} <= set(fixed["vec_id"])


def test_topk_batch_r14_fix_dim_gate(spark, tmp_path):
    """similarity_topk_batch's giant-lens green is COINCIDENTAL — the
    hostile wrong-dim vectors score NULL cosine on Spark (fold
    propagates the zip_with pads) vs a FINITE cosine on DuckDB
    (list_sum skips), and only random-vector luck kept them out of the
    top-10. (a) One near-duplicate-of-a-query vector with two extra
    trailing dims flips the coin: DuckDB ranks it ~first, Spark drops
    it — rows diverge today; (b) the proposed fix (the full
    usable-embedding contract — dimension + finite, DUCK_VEC_USABLE —
    replacing the finite-only gate on BOTH engines) restores exact
    parity; (c) every fixture embedding is 64-dim."""
    import pandas as pd
    import pytest

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    sf, con = _giant_sf(tmp_path)

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    qvec = list(emb.set_index("vec_id").loc[0, "embedding"])
    near_dup = pd.DataFrame(
        [{"vec_id": 980004,
          "embedding": [float(x) for x in qvec] + [0.1, 0.1],
          "label": 0}]
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

    # (a) today the engines DIVERGE: DuckDB ranks the 66-dim near-dup in
    # query 0's top-10, Spark's NULL cosine drops it
    got = QUERIES["similarity_topk_batch"](spark, sf).toPandas()
    want = con.execute(ORACLES["similarity_topk_batch"]).fetchdf()
    assert 980004 in set(want["vec_id"]), (
        "the near-dup must enter DuckDB's top-10 for the coin to flip"
    )
    assert 980004 not in set(got["vec_id"])
    assert _selfcheck_compare("topk_batch_current", got, want), (
        "expected the wrong-dim divergence; if this matches, the fix "
        "landed — retire this half"
    )

    # (b) head filter commutes with pre-filtering the file: the
    # REGISTERED query over a dim-filtered copy vs the USABLE-gated oracle
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = tmp_path / "dimmed_tb"
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{sf}/embeddings.parquet")
    keep = pc.equal(pc.list_value_length(t.column("embedding")), 64)
    pq.write_table(t.filter(pc.fill_null(keep, False)),
                   f"{out}/embeddings.parquet")
    fixed = QUERIES["similarity_topk_batch"](spark, str(out)).toPandas()
    fixed_oracle = ORACLES["similarity_topk_batch"].replace(
        "WHERE (embedding IS NOT NULL",
        "WHERE len(embedding) = 64 AND (embedding IS NOT NULL",
    )
    assert fixed_oracle != ORACLES["similarity_topk_batch"]
    fixed_want = con.execute(fixed_oracle).fetchdf()
    problems = _selfcheck_compare("topk_batch_r14", fixed, fixed_want)
    assert not problems, problems

    # (c) fixture-invisible
    assert (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .where(F.size("embedding") != 64)
        .count()
        == 0
    )
