"""Composed training-data pipeline operators ([NS]): quality filtering,
label centroids, and the full dedup funnel. These are the "put it
together" queries a 100 TB data-curation run executes — each stage is an
operator defined elsewhere in this package."""
from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register
from .staging import stage_cache as _stage_cache

log = logging.getLogger(__name__)


@register(
    "quality_filter",
    oracle="""
    WITH feats AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS ttr,
               CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                   / len(string_split(text, ' ')) AS avg_token_len
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(ttr, 4) AS ttr,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN ttr < 0.2 THEN 'too_repetitive'
                WHEN avg_token_len < 2.0 OR avg_token_len > 12.0 THEN 'bad_token_shape'
                ELSE 'keep' END AS verdict
    FROM feats
    """,
)
def quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style quality gate: cheap per-document features -> rule-based
    verdict with a reason code (auditable filtering beats a silent drop).
    Map-only; at 100 TB this is the first pass over the corpus and its
    selectivity decides every downstream cost — so the tokenize runs ONCE
    per row (staged projections; the inlined form split the text 8x)."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("toks"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_nonspace"),
    )
    sized = toks.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tok"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        "n_nonspace",
    )
    n_tokens = F.col("n_tok")
    ttr = F.col("n_distinct").cast("double") / n_tokens
    avg_len = F.col("n_nonspace").cast("double") / n_tokens
    return sized.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(ttr, 4).alias("ttr"),
        F.when(n_tokens < 20, "too_short")
        .when(ttr < 0.2, "too_repetitive")
        .when((avg_len < 2.0) | (avg_len > 12.0), "bad_token_shape")
        .otherwise("keep")
        .alias("verdict"),
    )


@register(
    "embedding_label_centroids",
    oracle="""
    WITH dims AS (
        SELECT label,
               CAST(gs - 1 AS INT) AS dim_idx,
               CAST(embedding[gs] AS DOUBLE) AS v
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(gs)
    )
    SELECT label, dim_idx,
           ROUND(SUM(v) / COUNT(*), 7) AS centroid_value,
           COUNT(*) AS n_vectors
    FROM dims
    GROUP BY label, dim_idx
    """,
)
def embedding_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid vectors (classification prototypes / IVF coarse
    quantizer training). float32 inputs summed as doubles are exact up to
    far larger group sizes than these (24-bit mantissas, 53-bit
    accumulator), so the mean is order-independent; rounded to absorb the
    residual ULP at extreme exponent spreads. (DECIMAL casts of floats are
    avoided: exact-tie roundings differ between engines.)"""
    emb = load_table(spark, sf, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim_idx", "v")
    ).select("label", "dim_idx", F.col("v").cast("double").alias("v"))
    return exploded.groupBy("label", "dim_idx").agg(
        F.round(F.sum("v") / F.count(F.lit(1)), 7).alias("centroid_value"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


def _funnel_oracle() -> str:
    from .dedup import N_BANDS, N_MINHASH, _duck_minhash_cands, _shingle_hs_body

    head = f"""WITH feats AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS ttr,
               CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                   / len(string_split(text, ' ')) AS avg_token_len
        FROM documents WHERE text IS NOT NULL
    ),
    qual AS (
        SELECT doc_id FROM feats
        WHERE n_tokens >= 20 AND ttr >= 0.2
          AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
    ),
    docs_q AS (
        SELECT d.* FROM documents d JOIN qual q ON d.doc_id = q.doc_id
    ),
    keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM docs_q GROUP BY text
    ),
    survivors0 AS (
        SELECT DISTINCT * FROM docs_q WHERE doc_id IN (SELECT doc_id FROM keepers)
    ),
    {_shingle_hs_body("survivors0")}"""
    cands = _duck_minhash_cands(head, N_MINHASH, N_BANDS)
    return f"""{cands},
    losers AS (
        SELECT DISTINCT GREATEST(doc_a, doc_b) AS doc_id
        FROM cand WHERE est_jaccard >= 0.5
    )
    SELECT doc_id, lang, source, n_chars
    FROM survivors0
    WHERE doc_id NOT IN (SELECT doc_id FROM losers)"""


@register("pipeline_dedup_survivors", oracle=_funnel_oracle())
def pipeline_dedup_survivors(spark: SparkSession, sf: str) -> DataFrame:
    """The full dedup funnel: quality gate -> exact dedup (keep lowest
    doc_id) -> MinHash-LSH near-dup removal over the survivors (keep the
    lower id of each candidate pair). Returns surviving documents.

    The funnel is staged through the engine's content-addressed cache:
    stage 1 (quality + exact dedup survivors, WITH text) is materialized
    once, then BOTH its consumers — the MinHash signature build and the
    final anti-join — read the cached table instead of recomputing the
    scan+filter+dedup plan; the signature frame is likewise materialized
    before the (explode-heavy) band join. Cold runs write the two tables;
    every re-run is a pure cache hit. The portable md5-based minhash family
    makes even the LSH stage oracle-reproducible, so the whole composed
    funnel is value-checked end-to-end; monotonicity + cache-reuse asserted
    in tests/test_operators_pipeline.py. At 100 TB this staging is the
    difference between one recompute-heavy mega-plan (the documents scan
    re-read by three consumers) and three linear passes.

    NULL-text contract (r11, this query's due slot; r9 third review
    batch): on a NULL-text document the engines DIVERGED at the quality
    gate — the Spark side reuses quality_filter, whose CASE falls
    through to 'keep' on NULL features, while this oracle re-expresses
    the gate as a WHERE conjunction where NULL comparisons exclude the
    row (one survivor more on Spark). ``WHERE text IS NOT NULL`` now
    applies at the funnel head on BOTH engines (a dedup funnel over
    unreadable docs is meaningless — the multimodal contract).

    At-least-once contract (r10 duplication lens, same due slot): a
    dedup funnel must emit ONE row per surviving document, but under
    duplicated input BOTH engines over-kept — the semi-join chain
    preserves input multiplicity (2 copies/survivor) and the oracle's
    ``doc_id IN keepers`` over the qual-join-multiplied docs_q kept 4.
    Fixed with ``.distinct()`` on the exact-survivor stage (identical
    full-row copies collapse; it rides the already-staged frame) +
    ``SELECT DISTINCT * FROM docs_q`` in the oracle's survivors0.
    Regression pins for both in ``tests/test_r11_window_fixes.py``;
    doc_id is unique and text never NULL at every SF
    (fixture-identical)."""
    from .dedup import lsh_candidate_pairs, minhash_signatures

    quality = quality_filter(spark, sf).where(F.col("verdict") == "keep")
    docs = (
        load_table(spark, sf, "documents")
        .where(F.col("text").isNotNull())
        .join(quality.select("doc_id"), "doc_id", "left_semi")
    )
    exact_keepers = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    exact_survivors = docs.join(
        exact_keepers.select("doc_id"), "doc_id", "left_semi"
    ).distinct()
    exact_survivors = _stage_cache(exact_survivors, "quality_exact_survivors")

    # r19 opt: spread=False — the survivor stage above is already
    # materialized through the cache engine, so the signature build reads
    # a cached table; the r18 spread's exchange + per-construction gate
    # probes cost this rider 0.68x cold on the driver box (VERDICT r18
    # next-round item #4) for a signature stage that is immediately
    # re-materialized by the stage cache below anyway.
    sigs = _stage_cache(
        minhash_signatures(exact_survivors, spread=False), "minhash_signatures"
    )
    near_dup_losers = (
        lsh_candidate_pairs(sigs)
        .select(F.greatest("doc_a", "doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = exact_survivors.join(near_dup_losers, "doc_id", "left_anti")
    return survivors.select("doc_id", "lang", "source", "n_chars")


_TRAINING_CORPUS_ORACLE = """
    WITH cleaned AS (
        SELECT doc_id, lang, source,
               trim(regexp_replace(
                   regexp_replace(lower(translate(text, 'İ', 'i')),
                                  '[^a-z0-9 ]', ' ', 'g'),
                   '  +', ' ', 'g')) AS clean
        FROM documents
    ), toks AS (
        SELECT doc_id, lang, source, clean,
               string_split(clean, ' ') AS t
        FROM cleaned
    ), scored AS (
        SELECT doc_id, lang, source, clean,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CASE WHEN len(t) >= 3 THEN
                   1.0 - CAST(len(list_distinct(
                       list_transform(generate_series(1, len(t) - 2),
                                      i -> t[i] || ' ' || t[i + 1] || ' '
                                           || t[i + 2]))) AS DOUBLE)
                         / (len(t) - 2)
               ELSE 0.0 END AS dup_frac
        FROM toks
    ), gated AS (
        SELECT doc_id, lang, source, clean, n_tokens
        FROM scored
        WHERE n_tokens >= 20 AND dup_frac <= 0.5
    ), keepers AS (
        SELECT md5(clean) AS clean_md5, MIN(doc_id) AS doc_id,
               COUNT(*) AS n_exact_dups
        FROM gated GROUP BY md5(clean)
    )
    SELECT g.doc_id, g.lang, g.source, g.n_tokens,
           k.clean_md5, k.n_exact_dups
    FROM gated g JOIN keepers k ON k.doc_id = g.doc_id"""


@register("pipeline_training_corpus", oracle=_TRAINING_CORPUS_ORACLE)
def pipeline_training_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The round-5 capstone composition — the front half of a training-
    corpus builder, assembled from this round's operators: canonical
    cleaning (lower/strip/collapse/trim) -> token + duplicate-trigram
    quality gate (Gopher-style, computed on the CLEANED tokens) -> exact
    dedup on the canonical md5 (so case/punctuation/spacing variants
    collapse to one keeper). Emits the surviving documents with their
    canonical fingerprint and exact-dup multiplicity.

    Like pipeline_dedup_survivors, the cleaned+gated stage materializes
    through the content-addressed cache: both consumers (the keeper
    aggregation and the final join) read the cached table, and re-runs
    are pure cache hits. Everything else is map-only expressions — the
    only shuffles are the md5 group-by (16-byte keys) and the keeper
    join.
    """
    from .text import canonical_clean, token_trigram_expr

    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id", "lang", "source", canonical_clean("text").alias("clean")
    ).withColumn("t", F.split("clean", " "))
    n_tokens = F.size("t").cast("long")
    trigrams = token_trigram_expr("t")
    dup_frac = F.when(
        F.size("t") >= 3,
        1.0
        - F.size(F.array_distinct(trigrams)).cast("double")
        / (F.size("t") - 2),
    ).otherwise(F.lit(0.0))
    gated = (
        toks.withColumn("n_tokens", n_tokens)
        .withColumn("dup_frac", dup_frac)
        .where((F.col("n_tokens") >= 20) & (F.col("dup_frac") <= 0.5))
        .select("doc_id", "lang", "source", "clean", "n_tokens")
    )
    gated = _stage_cache(gated, "training_corpus_gated")
    keepers = gated.groupBy(F.md5("clean").alias("clean_md5")).agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_exact_dups"),
    )
    return (
        gated.join(keepers, "doc_id")
        .select("doc_id", "lang", "source", "n_tokens", "clean_md5", "n_exact_dups")
    )
