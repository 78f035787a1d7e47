"""Deduplication operators over the documents table ([NS] north-star).

Five strategies, cheapest first:

* exact        — group on the raw text (or its hash): one shuffle
* keep-first   — window rank over the dup group, keeps the lowest doc_id
* fingerprint  — normalize (lowercase, collapse whitespace) then hash
* token-Jaccard — blocked self-join + exact set similarity (SQL-checkable)
* MinHash-LSH  — shingle -> minhash signature -> banded bucket join
  (the 100 TB path: work is linear in corpus size + bucket collisions;
  no all-pairs comparison ever materializes)
* SimHash      — 64-bit weighted-token signature, hamming-banded candidates

All tokenization is whitespace-splitting on the fixture's pre-normalized
text; swap the regex for real corpora.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "dedup_exact",
    oracle="""
    SELECT MD5(text) AS text_md5,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY MD5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one shuffle on the content hash.
    Grouping on md5(text) rather than text keeps shuffle rows narrow —
    at 100 TB that is the difference between shuffling hashes and shuffling
    the corpus."""
    docs = load_table(spark, sf, "documents")
    return docs.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "dedup_keep_first",
    oracle="""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents)
    WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf: str) -> DataFrame:
    """Window-rank keep-first: survivors of exact dedup with full rows."""
    docs = load_table(spark, sf, "documents")
    w = W.partitionBy("text").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


@register(
    "dedup_fingerprint",
    oracle="""
    SELECT MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) AS fingerprint,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def dedup_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Normalized-content fingerprint: whitespace/case-insensitive dedup."""
    docs = load_table(spark, sf, "documents")
    normalized = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.groupBy(F.md5(normalized).alias("fingerprint")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "dedup_token_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, n_chars % 10 AS bucket,
               list_distinct(string_split(text, ' ')) AS tokens
        FROM documents
    ),
    sized AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.tokens, b.tokens)) AS n_inter,
               len(list_distinct(list_concat(a.tokens, b.tokens))) AS n_union
        FROM toks a JOIN toks b
          ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_inter AS DOUBLE) / n_union, 4) AS jaccard
    FROM sized
    WHERE CAST(n_inter AS DOUBLE) / n_union >= 0.5
    """,
)
def dedup_token_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact token-set Jaccard on blocked candidate pairs.

    Blocking on (lang, n_chars bucket) keeps the self-join quadratic only
    within small blocks — the standard guard before exact verification of
    near-dup candidates. Spark-side token sets are xxhash64'd to LONGs
    before the pair join (set ops over fixed-width longs beat strings;
    Jaccard is invariant under an injective hash, so the string-based
    DuckDB oracle computes identical values). Integer set sizes divide
    exactly, so the oracle matches bit-for-bit."""
    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") % 10).alias("bucket"),
        F.array_distinct(
            F.transform(F.split("text", " "), lambda t: F.xxhash64(t))
        ).alias("tokens"),
    )
    a = docs.alias("a")
    b = docs.alias("b")
    # Materialize the set sizes once in a projection so the (expensive)
    # array intersect/union run a single time per pair, not once for the
    # filter and again for the output.
    sized = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size(F.array_intersect(F.col("a.tokens"), F.col("b.tokens"))).alias("n_inter"),
            F.size(F.array_union(F.col("a.tokens"), F.col("b.tokens"))).alias("n_union"),
        )
    )
    jaccard = F.col("n_inter").cast("double") / F.col("n_union")
    return sized.where(jaccard >= 0.5).select(
        "doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard")
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH g AS (
        SELECT doc_id, lang, n_chars % 20 AS bucket,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(len(substr(text, 1, 120)) - 4, 1)),
                   i -> substr(substr(text, 1, 120), CAST(i AS INT), 5))) AS grams
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.grams, b.grams)) AS n_inter,
               len(list_distinct(list_concat(a.grams, b.grams))) AS n_union
        FROM g a JOIN g b
          ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_inter AS DOUBLE) / n_union, 4) AS jaccard
    FROM pairs
    WHERE CAST(n_inter AS DOUBLE) / n_union >= 0.25
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Character 5-gram Jaccard near-dup detection (tokenization-free: robust
    to word-boundary edits where token-Jaccard is not).

    Gram sets are built over a 120-char prefix — prefix fingerprinting keeps
    the per-row set bounded regardless of document length, which at 100 TB
    bounds both the map-side memory and the pairwise verification cost.
    Blocked on lang x fine-grained length bucket (%20): quadratic only
    within small blocks, never all-pairs.

    Spark-side, each gram is xxhash64'd to a LONG before the pair join:
    set intersection over fixed-width longs is several times cheaper than
    over strings, and Jaccard is invariant under an injective hash — so the
    DuckDB oracle computes the same values from the raw string grams.
    Integer set sizes divide exactly; the oracle matches bit-for-bit.
    Threshold 0.25 is fixture-calibrated (synthetic corpus maxes at ~0.29);
    real corpora use ~0.8.
    """
    prefix = "substring(text, 1, 120)"
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({prefix}) - 4, 1)), "
            f"i -> xxhash64(substring({prefix}, i, 5)))"
        )
    )
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", (F.col("n_chars") % 20).alias("bucket"), grams.alias("grams")
    )
    a, b = docs.alias("a"), docs.alias("b")
    sized = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).alias("n_inter"),
            F.size(F.array_union(F.col("a.grams"), F.col("b.grams"))).alias("n_union"),
        )
    )
    jaccard = F.col("n_inter").cast("double") / F.col("n_union")
    return sized.where(jaccard >= 0.25).select(
        "doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard")
    )


N_MINHASH = 32
N_BANDS = 8  # 8 bands x 4 rows: ~0.5 detection threshold around j ~ 0.6

# Universal-hash permutation family: perm_i(x) = (a_i*x + b_i) mod p over a
# 31-bit domain. Bounded in 62 bits, so it is ANSI-overflow-safe in Spark,
# and the mod genuinely reorders (a plain affine map without mod would give
# every permutation the same argmin). Constants fixed by seed for
# reproducibility.
_MERSENNE_P31 = (1 << 31) - 1


def _perm_constants(n: int, seed: int = 0x5EED):
    import random

    rng = random.Random(seed)
    return (
        [rng.randrange(1, _MERSENNE_P31) for _ in range(n)],
        [rng.randrange(0, _MERSENNE_P31) for _ in range(n)],
    )


_PERM_MULTIPLIERS, _PERM_OFFSETS = _perm_constants(64)


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """doc_id -> MinHash signature (array<long>) over 3-token shingles.

    Entirely per-row array expressions (higher-order functions, JVM-side):
    shingle -> one xxhash64 -> n universal-family permutations -> array_min.
    No explode, no shuffle — the signature stage is a pure map over the
    corpus, which is exactly what you want in front of 100 TB: the first
    exchange in the whole pipeline is the (tiny) band-bucket shuffle.
    """
    # Tokenize ONCE into a column; the shingle lambda slices the materialized
    # array instead of re-evaluating split(text) inside every iteration.
    shingle_hashes = F.expr(
        "transform(sequence(0, greatest(size(toks) - 3, 0)), "
        f"i -> xxhash64(concat_ws(' ', slice(toks, i + 1, 3))) & {_MERSENNE_P31}L)"
    )
    def perm_min(i: int):
        a, b = _PERM_MULTIPLIERS[i], _PERM_OFFSETS[i]
        # single-arg lambda: F.transform must not see an index parameter
        return F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_P31)),
            )
        )

    mins = [perm_min(i) for i in range(n_hashes)]
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", shingle_hashes.alias("hs"))
        .select("doc_id", F.array(*mins).alias("sig"))
    )


def lsh_candidate_pairs(sigs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Banded LSH candidate pairs from a MinHash signature frame
    ``(doc_id, sig: array<long>)``.

    per-band bucket hash -> explode -> bucket self-join -> estimated Jaccard
    (= fraction of agreeing minhashes) >= ``threshold``. The full signature
    array travels WITH each banded row, so verification happens inside the
    bucket join — the signature aggregation runs once, and no second join
    against the signature table is needed. Linear in corpus size; the only
    join is within identical band buckets, so at 100 TB the plan is
    shuffle-on-band-hash + AQE skew handling.

    Measured alternative (slim band rows + two sig re-joins to verify):
    identical wall time at sf0.1 (4.9s vs 4.9s, same pairs) with two extra
    shuffled joins in the plan — carrying the 32-long sig through the 8x
    band explode is the better trade until per-row signature width, not
    join count, dominates (e.g. 256+ hashes).
    """
    rows_per_band = N_MINHASH // N_BANDS
    band_cols = [
        F.struct(
            F.lit(band).alias("band"),
            F.xxhash64(
                *[F.element_at("sig", band * rows_per_band + r + 1) for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for band in range(N_BANDS)
    ]
    banded = sigs.select(
        "doc_id", "sig", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", "sig", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    agree = F.size(
        F.filter(
            F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (agree.cast("double") / N_MINHASH).alias("est_jaccard"),
        )
        .distinct()
        .where(F.col("est_jaccard") >= threshold)
    )


@register("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash + LSH near-duplicate candidates over the documents table:
    map-only signatures (``minhash_signatures``) -> banded bucket join
    (``lsh_candidate_pairs``). No oracle: the xxhash64 permutations are
    Spark-specific (rows-only check; recall/precision asserted in
    tests/test_operators_pipeline.py).
    """
    docs = load_table(spark, sf, "documents")
    return lsh_candidate_pairs(minhash_signatures(docs))


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH b AS (
        SELECT vec_id, embedding,
               CONCAT(CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
                      CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
                      CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
                      CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
                      CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
                      CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END,
                      CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END,
                      CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (SQRT(list_sum(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * SQRT(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, ROUND(cos, 4) AS cosine, vec_a AS keeper_vec_id
    FROM pairs WHERE cos >= 0.30
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-bit LSH bucketing prunes
    the candidate space (same 8-bit signature => same bucket), exact cosine
    verifies inside the bucket join, keep-lower-id picks the survivor.

    The scale shape mirrors MinHash-LSH: a map-only signature pass, then a
    self-join only WITHIN buckets — never all-pairs. At 100 TB the bucket
    join shuffles on an 8-bit key (256-way; widen the signature for more
    pruning). The 0.30 threshold is calibrated to the synthetic fixture
    (random embeddings, max bucket-pair cosine ~0.43); real corpora use
    ~0.95+. All vector math is JVM-side (zip_with/aggregate folds in
    functions.vectors) and per-pair, so the DuckDB oracle matches exactly.
    """
    emb = load_table(spark, sf, "embeddings")
    bits = [
        F.when(F.element_at("embedding", i + 1) >= 0, "1").otherwise("0")
        for i in range(8)
    ]
    from ..functions import vec_dot, vec_l2_norm

    # Norm computed once per ROW before the join — the per-pair formulation
    # folds each vector twice per candidate pair (O(pairs x dim) instead of
    # O(rows x dim) for the norms).
    bucketed = emb.select(
        "vec_id",
        "embedding",
        F.concat(*bits).alias("bucket"),
        vec_l2_norm("embedding").alias("norm"),
    )

    a, b = bucketed.alias("a"), bucketed.alias("b")
    cos = vec_dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= 0.30)
        .select(
            "vec_a",
            "vec_b",
            F.round("cos", 4).alias("cosine"),
            F.col("vec_a").alias("keeper_vec_id"),
        )
    )


@register("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """64-bit SimHash near-dup candidates.

    Each document's tokens vote (+count/-count) on every signature bit of
    their xxhash64; candidate pairs share at least one of eight 8-bit chunks
    (pigeonhole: guarantees detection at hamming <= 7, high probability well
    beyond) and are emitted with their exact hamming distance. One explode +
    groupBy + chunk-join: linear, shuffle-friendly. No oracle (hash-function
    specific); invariants tested in tests/test_operators_pipeline.py.
    """
    docs = load_table(spark, sf, "documents")
    # Map-only signature: hash every token instance per row (frequency
    # weighting falls out naturally — each instance votes ±1), then fold 64
    # per-bit votes over the hash array. No explode, no shuffle: like the
    # MinHash pipeline, the first exchange is the candidate-chunk join.
    hashed = docs.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda t: F.xxhash64(t)).alias("hs"),
    )

    def bit_vote(i: int):
        return F.aggregate(
            F.col("hs"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ).alias(f"s_{i}")

    votes = hashed.select("doc_id", *[bit_vote(i) for i in range(64)])
    simhash = votes.select(
        "doc_id",
        sum(
            F.when(F.col(f"s_{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(64)
        ).alias("simhash"),
    )

    chunks = simhash.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), c * 8)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("chunk"),
                    )
                    for c in range(8)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk"))

    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= 8)
    )
