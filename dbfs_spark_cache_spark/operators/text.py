"""Text-analysis operators over the documents table ([NS] north-star).

Everything is built-in expression work (split/regexp/array functions) —
integer arithmetic end-to-end so every query is exactly SQL-checkable.
At 100 TB these are map-only passes (no shuffle except final aggregations).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS type_token_ratio,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) AS avg_token_len,
           LENGTH(text) AS n_chars_measured
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-scoring features: token counts, type-token ratio, token
    length. All integer-derived — exact across engines.

    Staged projections materialize the token array (and its sizes) ONCE;
    inlining the split() into every output column makes Catalyst evaluate
    it per column (5 splits per row measured) — at 100 TB the tokenize pass
    IS the cost, so it runs once."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_nonspace"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )
    sized = toks.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        "n_nonspace",
        "n_chars_measured",
    )
    return sized.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct_tokens"),
        F.round(F.col("n_distinct").cast("double") / F.col("n_tok"), 4).alias(
            "type_token_ratio"
        ),
        (F.col("n_nonspace").cast("double") / F.col("n_tok")).alias("avg_token_len"),
        "n_chars_measured",
    )


@register(
    "text_lang_heuristic",
    oracle="""
    WITH hits AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS en_hits,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('der', 'die', 'das', 'und', 'ist'))) AS de_hits,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('le', 'la', 'et', 'les', 'est'))) AS fr_hits
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang, en_hits, de_hits, fr_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                WHEN de_hits >= fr_hits THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM hits
    """,
)
def text_lang_heuristic(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-count language ID — the classic cheap n-gram-free heuristic.
    (The fixture corpus is synthetic token salad, so prediction quality is
    not the point; the deterministic pipeline is.)

    Tokenizes once and materializes the three hit counts before the argmax
    projection (the inlined form split the text 9x per row)."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )

    def hits(words):
        return F.size(F.filter(F.col("toks"), lambda t: t.isin(*words)))

    counted = toks.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits(["the", "a", "of", "and", "is"]).cast("long").alias("en_hits"),
        hits(["der", "die", "das", "und", "ist"]).cast("long").alias("de_hits"),
        hits(["le", "la", "et", "les", "est"]).cast("long").alias("fr_hits"),
    )
    en, de, fr = F.col("en_hits"), F.col("de_hits"), F.col("fr_hits")
    return counted.select(
        "doc_id",
        "labeled_lang",
        "en_hits",
        "de_hits",
        "fr_hits",
        F.when((en >= de) & (en >= fr), "en")
        .when(de >= fr, "de")
        .otherwise("fr")
        .alias("predicted_lang"),
    )


@register(
    "text_token_count_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_tokens,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces
    FROM documents
    """,
)
def text_token_count_regex(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish regex token counting (word runs / digit runs) — the token
    budgeting primitive for training-data pipelines."""
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_word_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_number_tokens"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
        .cast("long")
        .alias("n_spaces"),
    )


@register(
    "text_bag_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               MD5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fp
        FROM documents
        WHERE text IS NOT NULL
    )
    SELECT bag_fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_docs
    FROM fp
    GROUP BY bag_fp
    """,
)
def text_bag_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Bag-of-words fingerprint: order-insensitive content identity (docs
    that are permutations of the same vocabulary collide). A cheap
    complement to MinHash for shuffled-content dedup.

    r10 (landed in this query's due slot; pre-measured at r9;
    premeasure since retired, pins in tests/test_r10_window_fixes.py): NULL-text documents are
    excluded on BOTH engines (``WHERE text IS NOT NULL`` — the
    multimodal r9 contract: an unreadable payload is excluded, not
    fingerprinted). Without the filter the engines diverged AND both
    were semantically wrong: Spark's ``concat_ws`` skips NULL so
    NULL-text docs landed in the md5('') empty-text group, while
    DuckDB's ``array_to_string(NULL)`` grouped them under a NULL
    fingerprint — either way electing a dedup keeper among mutually
    unrelated unreadable docs. Fixture-identical (no NULL text at any
    SF); hostile parity pinned in tests/test_r10_window_fixes.py.
    """
    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    )
    return docs.groupBy(fp.alias("bag_fp")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "text_quality_scores",
    oracle="""
    WITH f AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS n_stop,
               len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digit,
               LENGTH(text) AS n_chars_m
        FROM documents
    )
    SELECT doc_id, lang,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
           ROUND(CAST(n_punct AS DOUBLE) / NULLIF(n_chars_m, 0), 4) AS punct_ratio,
           ROUND(CAST(n_digit AS DOUBLE) / NULLIF(n_chars_m, 0), 4) AS digit_ratio,
           CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens < 0.01
                     AND CAST(n_digit AS DOUBLE) / NULLIF(n_chars_m, 0) > 0.3
                THEN 'suspect' ELSE 'ok' END AS quality_flag
    FROM f
    """,
)
def text_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher/C4-style quality ratios: stopword density, punctuation
    density, digit density, plus a composed flag. All integer-count /
    integer-count double divisions — exact across engines. Map-only; this
    is the per-document scoring pass that feeds threshold-based corpus
    filtering at 100 TB."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", "lang", "text", F.split("text", " ").alias("toks"))
    counted = toks.select(
        "doc_id",
        "lang",
        F.size("toks").alias("n_tok"),
        F.size(
            F.filter(
                F.col("toks"),
                lambda t: t.isin("the", "a", "of", "and", "is", "to", "in"),
            )
        ).alias("n_stop"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.,!?;:]"), F.lit(0))).alias(
            "n_punct"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]"), F.lit(0))).alias(
            "n_digit"
        ),
        F.length("text").alias("n_chars_m"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tok")
    # NULLIF on the length: an empty-text document is DIVIDE_BY_ZERO
    # under ANSI mode (Spark 4 default) — one bad row must not kill the
    # whole corpus-scale scoring pass. Ratios are NULL for empty text on
    # both engines, and the NULL comparison routes the flag to 'ok'.
    # (n_tok needs no guard: split('', ' ') is [''], size 1.)
    chars = F.nullif(F.col("n_chars_m"), F.lit(0))
    punct_ratio = F.col("n_punct").cast("double") / chars
    digit_ratio = F.col("n_digit").cast("double") / chars
    return counted.select(
        "doc_id",
        "lang",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.when((stop_ratio < 0.01) & (digit_ratio > 0.3), "suspect")
        .otherwise("ok")
        .alias("quality_flag"),
    )


def _rolling_hash_oracle() -> str:
    from .dedup import duck_h62

    shingle = "array_to_string(list_slice(toks, i + 1, i + 5), ' ')"
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents WHERE text IS NOT NULL),
    hs AS (
        SELECT doc_id,
               list_transform(generate_series(0, greatest(len(toks) - 5, 0)),
                   i -> {duck_h62(shingle)}) AS hs
        FROM toks
    )
    SELECT doc_id,
           list_min(hs) AS min_shingle_hash,
           list_max(hs) AS max_shingle_hash,
           len(hs) AS n_shingles
    FROM hs"""


@register("text_rolling_hash_shingles", oracle=_rolling_hash_oracle())
def text_rolling_hash_shingles(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-style document fingerprint: minimum of the rolling-hash
    values over 5-token shingles (the document's 'rarest shingle' id).
    Shingle hashes use the pluggable 60-bit family (dedup.h62_sql):
    xxhash64 in production, md5-portable under the driver so the DuckDB
    oracle reproduces every fingerprint bit-for-bit.
    The shingle-hash array is materialized once and min/max/size read it;
    tokenization is staged into a column so split() runs once per row.

    NULL-text contract (r9 window fix, this query's due slot;
    fixture-identical — no NULL text at any SF): unreadable documents
    are excluded on BOTH engines; without the filter Spark fingerprinted
    a synthetic empty shingle for the NULL doc while the portable-hash
    oracle crashed on DuckDB's '0x' NULL-concat artifact."""
    from .dedup import h62_sql

    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    shingle_sql = h62_sql("concat_ws(' ', slice(toks, i + 1, 5))")
    shingles = F.expr(
        f"transform(sequence(0, greatest(size(toks) - 5, 0)), i -> {shingle_sql})"
    )
    hashed = docs.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", shingles.alias("hs")
    )
    return hashed.select(
        "doc_id",
        F.array_min("hs").alias("min_shingle_hash"),
        F.array_max("hs").alias("max_shingle_hash"),
        F.size("hs").cast("long").alias("n_shingles"),
    )


@register(
    "text_vocabulary",
    oracle="""
    WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    agg AS (
        SELECT token, COUNT(*) AS total_count,
               COUNT(DISTINCT doc_id) AS doc_freq
        FROM t GROUP BY token
    )
    SELECT token, total_count, doc_freq
    FROM agg ORDER BY total_count DESC, token LIMIT 100
    """,
)
def text_vocabulary(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by total occurrence count with
    per-token document frequency — the first table a tokenizer-training or
    corpus-statistics job builds.

    Scale shape: explode shuffles (doc_id, token) pairs but the groupBy
    aggregates map-side first (partial_count), so the exchange carries one
    row per distinct (partition, token), not one per occurrence; the final
    top-100 is a TakeOrdered (no global sort). At 100 TB the token-key
    shuffle is the narrowest possible representation of the corpus."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("total_count"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    return agg.orderBy(F.desc("total_count"), F.asc("token")).limit(100)


@register(
    "sample_stratified",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rn * 5 <= n + 4 THEN 'heldout' ELSE 'train' END AS split
    FROM ranked
    """,
)
def sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified train/heldout split: EXACTLY ceil(20%) of every language
    stratum goes to heldout, chosen by content-hash order — reproducible
    under any partition layout, task retry, or engine (same rationale as
    sample_bernoulli; seeded df.sample drifts with partitioning).

    The per-stratum window is partitioned by lang — parallel across
    strata, never a global sort. The ceil(n/5) cut is the integer
    inequality rn*5 <= n+4, identical arithmetic in Spark and DuckDB.
    Train-data pipelines use exactly this shape to hold out evaluation
    slices per language/source without skewing low-resource strata."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    wn = W.partitionBy("lang")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        F.when(F.col("rn") * 5 <= F.col("n") + 4, "heldout")
        .otherwise("train")
        .alias("split"),
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH t AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf,
               ROUND(tf.tf * (LN((CAST(n.n_docs AS DOUBLE) + 1)
                                 / (CAST(df.df AS DOUBLE) + 1)) + 1), 6) AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, token, tf, tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
        FROM scored
    )
    SELECT doc_id, token, tf, tfidf, rank FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed tf-idf
    (idf = ln((N+1)/(df+1)) + 1, sklearn's smoothing) — the classic
    keyword-extraction / near-dup-explanation pass.

    Scale shape: term frequencies aggregate map-side off one explode; the
    document-frequency table joins back UNHINTED — it is vocabulary-sized,
    which Heaps' law plus URL/typo noise puts in the billions of entries
    at 100 TB of web text, so a forced broadcast there is the r5 flagship
    OOM class (r8 verdict finding #1). AQE broadcasts it while it is
    actually small and falls back to a shuffle hash join on `token` (both
    sides already partial-aggregated) when it is not. Only the single-row
    corpus count keeps its hint (bounded by construction); the top-3
    window is partitioned by doc_id. Scores are rounded to 6 decimals BEFORE ranking so the
    ordering (and hence the oracle comparison) is engine-exact despite
    ln() being correctly-rounded-ish on both engines: distinct (tf, df)
    pairs differ by far more than one ulp, and equal pairs tie-break on
    the token."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.col("n_docs").cast("double") + 1) / (F.col("df").cast("double") + 1)) + 1
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "token", "tf",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "tfidf", "rank")
    )


def canonical_clean(col="text"):
    """The canonical cleaning chain — lowercase, strip non-alphanumerics,
    collapse whitespace runs, trim. ONE definition shared by
    ``text_clean_normalize`` and the training-corpus capstone
    (``pipeline.pipeline_training_corpus``): the capstone's exact-dedup
    md5 is only comparable to ``clean_md5`` because these expressions are
    character-identical, so the chain must never fork (an inline copy
    silently diverges the first time one side is fixed — the r7
    regex-drift class).

    Dotted-İ contract (r11, both consumers' due slot; r9 Unicode
    probe): Spark's LOWER (Java FULL mapping) turns U+0130 İ into i + a
    COMBINING dot, which the strip step then replaces with a SPACE
    ('İstanbul' -> 'i stanbul'), while DuckDB's simple mapping gives
    'istanbul' — different md5, length AND token count. İ now folds to
    i BEFORE lowering on BOTH engines — ``F.translate`` here and
    ``lower(translate(text, 'İ', 'i'))`` in the two oracles that inline
    this chain (text_clean_normalize and the pipeline_training_corpus
    capstone). İ is the only character whose Java full lowercase grows
    to a combining sequence that this chain then mangles; final sigma
    needs no handling — σ/ς strip to spaces identically either way.
    Regression pin in tests/test_r11_window_fixes.py;
    fixture-identical: fixture text is pure ASCII at every SF."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.translate(col, "İ", "i")), "[^a-z0-9 ]", " "
            ),
            "  +",
            " ",
        )
    )


def token_trigram_expr(tokens_col):
    """In-row token-trigram array over an array column (sequence +
    transform, no explode). Shared by ``text_repetition_scores`` and the
    capstone's Gopher gate — same cross-operator-consistency contract as
    :func:`canonical_clean`. Callers guard size(tokens) >= 3 themselves
    (sequence(1, size-2) on a shorter array would count DOWN)."""
    return F.expr(
        f"transform(sequence(1, size({tokens_col}) - 2),"
        f" i -> concat_ws(' ', slice({tokens_col}, i, 3)))"
    )


@register(
    "text_repetition_scores",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                                  i -> toks[i] || ' ' || toks[i + 1] || ' '
                                       || toks[i + 2])
               ELSE [] END AS trigrams
        FROM t
    )
    SELECT doc_id,
           CAST(len(trigrams) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(trigrams)) AS BIGINT) AS n_distinct_trigrams,
           CASE WHEN len(trigrams) > 0 THEN
               ROUND(1.0 - CAST(len(list_distinct(trigrams)) AS DOUBLE)
                           / len(trigrams), 6)
           ELSE 0.0 END AS dup_trigram_fraction,
           len(trigrams) > 0
               AND 1.0 - CAST(len(list_distinct(trigrams)) AS DOUBLE)
                         / len(trigrams) > 0.5 AS flag_repetitive
    FROM g
    """,
)
def text_repetition_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition-based quality signal (Gopher-style): the fraction of
    duplicated token trigrams per document, plus a filter flag at the
    >0.5 threshold published for web-scale corpora. Boilerplate, template
    spam, and degenerate generations all light this up while ordinary
    prose stays low.

    Scale shape: map-only — one split, one in-row trigram construction
    (sequence + transform over the token array, no explode, no shuffle),
    sizes from array_distinct. The whole scorer fuses into the scan's
    codegen stage; rounding before the flag threshold keeps the double
    arithmetic engine-exact against the oracle.

    r19 opt: the r18 input spread ahead of the trigram build was REFUTED
    by the driver's cold-JVM single-pass ground truth (PERF_r18:
    0.46 -> 0.61 s at local[32], speedup 0.76; the warm best-of-N -48%
    measured in r18 did not survive the cold contract — the exchange's
    fixed cost dominates a sub-second query). REVERTED per VERDICT r18
    next-round item #2.
    """
    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", "text").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    trigrams = F.when(
        F.size("toks") >= 3, token_trigram_expr("toks")
    ).otherwise(F.array().cast("array<string>"))
    g = toks.select("doc_id", trigrams.alias("trigrams"))
    n = F.size("trigrams").cast("long")
    nd = F.size(F.array_distinct("trigrams")).cast("long")
    dup_frac = F.when(
        n > 0, F.round(1.0 - nd.cast("double") / n.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    flag = (n > 0) & (1.0 - nd.cast("double") / n.cast("double") > 0.5)
    return g.select(
        "doc_id",
        n.alias("n_trigrams"),
        nd.alias("n_distinct_trigrams"),
        dup_frac.alias("dup_trigram_fraction"),
        flag.alias("flag_repetitive"),
    )


@register(
    "text_clean_normalize",
    oracle="""
    WITH cleaned AS (
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(lower(translate(text, 'İ', 'i')),
                                  '[^a-z0-9 ]', ' ', 'g'),
                   '  +', ' ', 'g')) AS clean
        FROM documents
    )
    SELECT doc_id,
           md5(clean) AS clean_md5,
           CAST(length(clean) AS BIGINT) AS clean_len,
           CAST(CASE WHEN length(clean) = 0 THEN 0
                     ELSE length(clean) - length(replace(clean, ' ', '')) + 1
                END AS BIGINT) AS clean_tokens
    FROM cleaned
    """,
)
def text_clean_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical text cleaning — lowercase, strip non-alphanumerics,
    collapse whitespace, trim — the normalization pass that fronts every
    exact-dedup and fingerprint stage (two documents differing only in
    case/punctuation/spacing canonicalize to the same md5 here).

    Map-only; the regexes ([^a-z0-9 ] and '  +') mean the same thing in
    Java regex and RE2, so Spark and DuckDB produce identical cleaned
    strings — pinned by comparing md5 of the full cleaned text, not just
    summary stats.
    """
    docs = load_table(spark, sf, "documents")
    cleaned = docs.select("doc_id", canonical_clean("text").alias("clean"))
    return cleaned.select(
        "doc_id",
        F.md5("clean").alias("clean_md5"),
        F.length("clean").cast("long").alias("clean_len"),
        # spaces+1 counts tokens only for NON-EMPTY text: a document that
        # cleans to '' has 0 tokens, not 1 (both engines shared the same
        # off-by-one, so the oracle check never caught it).
        F.when(F.length("clean") == 0, F.lit(0))
        .otherwise(
            F.length("clean")
            - F.length(F.replace(F.col("clean"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("clean_tokens"),
    )


_U6 = " + ".join(
    f"(strpos('0123456789abcdef', substr(hkey, {i + 1}, 1)) - 1) * {16 ** (5 - i)}"
    for i in range(6)
)

_SAMPLE_WEIGHTED_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR)) AS hkey,
               CAST(n_chars AS DOUBLE)
                   / (SELECT MAX(n_chars) FROM documents) AS keep_p
        FROM documents
    )
    SELECT doc_id, n_chars, keep_p
    FROM w
    WHERE CAST({_U6} AS DOUBLE) / 16777216.0 < keep_p
"""


@register("sample_weighted", oracle=_SAMPLE_WEIGHTED_ORACLE)
def sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted Bernoulli sampling — keep probability proportional to a
    per-row weight (here document length, standing in for a quality
    score): the pass that up-weights high-value documents when
    subsampling a corpus for training.

    Same reproducibility discipline as ``sample_bernoulli``: the uniform
    draw is a content hash (first 6 md5 nibbles / 16^6), not an RNG, so
    the sample is identical under any partition layout, retry, or engine
    — and therefore exactly verifiable. The max weight stays in-plan as a
    broadcast single-row aggregate. Map-only plus one tiny broadcast.
    """
    docs = load_table(spark, sf, "documents")
    max_chars = docs.agg(F.max("n_chars").alias("max_chars"))
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
        "double"
    ) / F.lit(float(16 ** 6))
    return (
        docs.crossJoin(F.broadcast(max_chars))
        .select(
            "doc_id",
            "n_chars",
            (F.col("n_chars").cast("double") / F.col("max_chars")).alias("keep_p"),
            u.alias("u"),
        )
        .where(F.col("u") < F.col("keep_p"))
        .drop("u")
    )


_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com call 555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS body
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(body, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(body, '{_PHONE_RE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_PHONE_RE}', '[PHONE]', 'g') AS scrubbed
    FROM enriched
    """,
)
def text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrubbing — regex-mask emails and phone-like digit runs, the
    redaction pass every training-data pipeline runs before a corpus
    leaves quarantine. The fixture text is synthetic word soup with no
    natural PII, so each document is first enriched with a deterministic
    email + phone derived from its doc_id; the scrubber then has known
    planted targets and the oracle replays the whole enrich -> count ->
    mask chain exactly. Patterns stay in the shared Java-regex/RE2
    subset; Spark's regexp_replace is global by default, DuckDB needs the
    explicit 'g' flag. Pure map-side string work — fuses into the scan.

    r19 opt: the r18 input spread ahead of the regex passes was flat on
    the driver's cold-JVM ground truth (PERF_r18: 0.36 -> 0.36 s,
    speedup 1.01 — the warm -42% did not reproduce cold). REVERTED per
    VERDICT r18 next-round item #2: a neutral exchange is a pure risk at
    32 concurrent tasks (the stats_corr_covar failure mode) with no
    driver-confirmed win to buy.
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(body, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(body, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(body, F.lit(_PHONE_RE), 0)).alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )
