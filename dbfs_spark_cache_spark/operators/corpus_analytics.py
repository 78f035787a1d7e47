"""Round-6 corpus & behavioral analytics: event funnels, retention
cohorts, sliding-window document chunking, train/test contamination
checking, domain-mixture reweighting, per-source n-gram summaries, and an
inverted token index. These extend the [NS] LLM-training-pipeline surface
(SURVEY.md §2) — each is a shape a 100 TB corpus-prep or product-analytics
job runs daily, expressed Spark-first with an exact DuckDB oracle.

Scale notes are per-query in the docstrings; the common discipline:
- every join is keyed and co-partitioned (user_id / shingle-hash / token),
  never all-pairs;
- contamination joins against a per-shingle AGGREGATE of the train side
  (one row per shingle), so a super-common shingle cannot quadratically
  explode the join the way a postings×postings join would;
- hashes use the portable md5-62-bit family (dedup.h62_sql) so DuckDB
  replays values bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .dedup import duck_h62, h62_sql
from .registry import register

# ---------------------------------------------------------------------------
# Event funnel: view -> click -> purchase, strictly time-ordered per user.
# ---------------------------------------------------------------------------


@register(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS first_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.first_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view_users,
           (SELECT count(*) FROM c) AS n_click_users,
           (SELECT count(*) FROM p) AS n_purchase_users,
           CAST((SELECT count(*) FROM c) AS DOUBLE)
             / NULLIF((SELECT count(*) FROM v), 0) AS view_to_click,
           CAST((SELECT count(*) FROM p) AS DOUBLE)
             / NULLIF((SELECT count(*) FROM c), 0) AS click_to_purchase
    """,
)
def events_funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Strictly-ordered conversion funnel: first view, first click AFTER
    that view, first purchase AFTER that click, per user; one summary row
    of stage populations and step conversion rates.

    Scale shape: three aggregates and two joins, every one keyed on
    user_id — after the first shuffle the stage frames are co-partitioned,
    so AQE plans the later joins without re-shuffling the big side. No
    window over the full event stream (the naive formulation sorts every
    user's events; this one only aggregates min() which is partial-agg
    friendly — map-side combine keeps the shuffle tiny). The final
    5-scalar row is a constant-size reduce.
    """
    events = load_table(spark, sf, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view_users"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_users"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_users"))
    # Three single-row frames: the cross joins are 1x1x1 scalar stitching
    # (allowlisted single-row broadcast pattern, scripts/explain_audit.py).
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view_users",
            "n_click_users",
            "n_purchase_users",
            # NULLIF: an events slice with an empty stage population is a
            # NULL rate, not an ANSI DIVIDE_BY_ZERO that kills the funnel.
            (
                F.col("n_click_users").cast("double")
                / F.nullif(F.col("n_view_users"), F.lit(0))
            ).alias("view_to_click"),
            (
                F.col("n_purchase_users").cast("double")
                / F.nullif(F.col("n_click_users"), F.lit(0))
            ).alias("click_to_purchase"),
        )
    )


# ---------------------------------------------------------------------------
# Retention cohorts: first-seen week x weeks-since-first-seen.
# ---------------------------------------------------------------------------


@register(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT date_trunc('week', f.first_ts) AS cohort_week,
           CAST(floor(date_diff('day', CAST(f.first_ts AS DATE),
                                CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
               AS week_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Classic retention matrix: users are cohorted by the ISO week of
    their first event; each later event lands in a (cohort_week,
    week_offset) cell counted by distinct active users.

    Scale shape: one groupBy(user_id) for first-seen (partial-agg min),
    one user_id-keyed join back to the fact (co-partitioned with the
    first shuffle), then a distinct-count over a cell space bounded by
    weeks² — tiny regardless of fact size. At 100 TB the first-seen frame
    is users-sized (≪ fact) and AQE broadcast-joins it; nothing here
    materializes per-event state beyond the two keyed shuffles.
    """
    events = load_table(spark, sf, "events")
    first_seen = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        events.join(first_seen, "user_id")
        .select(
            F.date_trunc("week", "first_ts").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("first_ts").cast("date"))
                / 7.0
            )
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (context-window packing precursor).
# ---------------------------------------------------------------------------

_CHUNK = 64
_STRIDE = 48


@register(
    "text_chunk_sliding",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    base AS (
        SELECT doc_id, toks, len(toks) AS n,
               CASE WHEN len(toks) <= {_CHUNK} THEN 1
                    ELSE CAST(ceil((len(toks) - {_CHUNK}) * 1.0 / {_STRIDE})
                              AS BIGINT) + 1 END AS n_chunks
        FROM toks
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           least({_CHUNK}, n - i * {_STRIDE}) AS chunk_tokens,
           {duck_h62(f"array_to_string(list_slice(toks, i * {_STRIDE} + 1, "
                     f"i * {_STRIDE} + {_CHUNK}), ' ')")} AS chunk_h62
    FROM base, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
    """,
)
def text_chunk_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping sliding-window chunking — 64-token chunks at a
    48-token stride, the standard way long documents are cut for a
    fixed context window with overlap so no span is split across a hard
    boundary. Emits (doc_id, chunk_id, chunk_tokens, chunk_h62); the
    portable content hash stands in for the chunk text so the row stays
    flat and the oracle replays it bit-for-bit.

    Scale shape: pure map-side — tokenize once, compute start offsets with
    sequence(), slice inside a transform() lambda, posexplode. No shuffle
    at all; fuses into the scan's whole-stage codegen. Output rows ≈
    tokens/stride per doc, linear in corpus bytes.

    r18 opt note: an input spread (scale.spread_unsplittable_scan) was
    A/B-measured here and did NOT help (plain ~0.15 s stable vs spread
    0.15-0.47 s at sf0.1): the chunk-hash compute is cheap relative to
    materializing the exploded output rows, so there is no serial
    hotspot for the spread to unlock. Left unchanged.
    """
    docs = load_table(spark, sf, "documents")
    with_chunks = docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").alias("n"),
        "toks",
        F.expr(
            f"case when size(toks) <= {_CHUNK} then 1 "
            f"else cast(ceil((size(toks) - {_CHUNK}) * 1.0 / {_STRIDE}) as bigint)"
            " + 1 end"
        ).alias("n_chunks"),
    )
    chunk_slice = f"concat_ws(' ', slice(toks, s + 1, {_CHUNK}))"
    chunk_exprs = F.expr(
        f"transform(sequence(0, (n_chunks - 1) * {_STRIDE}, {_STRIDE}), "
        f"s -> {h62_sql(chunk_slice)})"
    )
    return (
        with_chunks.select(
            "doc_id", "n", F.posexplode(chunk_exprs).alias("pos", "chunk_h62")
        )
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("chunk_id"),
            F.least(F.lit(_CHUNK).cast("bigint"), F.col("n") - F.col("pos") * _STRIDE)
            .alias("chunk_tokens"),
            "chunk_h62",
        )
    )


# ---------------------------------------------------------------------------
# Train/test contamination check over the deterministic split.
# ---------------------------------------------------------------------------

_CONTAM_W = 8  # shingle width: long enough that only real overlap collides


def _split_bucket_sql(engine_h62) -> str:
    """The train/val/test bucket expression — MUST stay identical to
    training.train_val_test_split so the contamination check audits the
    exact split the pipeline ships."""
    return f"{engine_h62} % 100"


@register(
    "split_contamination_check",
    oracle=f"""
    WITH split AS (
        SELECT doc_id, text,
               {duck_h62("concat('split:', CAST(doc_id AS VARCHAR))")} % 100
                   AS bucket
        FROM documents WHERE text IS NOT NULL
    ),
    toks AS (
        SELECT doc_id, bucket, string_split(text, ' ') AS toks FROM split
    ),
    sh AS (
        SELECT doc_id, bucket,
               unnest(list_distinct(list_transform(
                   generate_series(0, greatest(len(toks) - {_CONTAM_W}, 0)),
                   i -> {duck_h62(f"array_to_string(list_slice(toks, i + 1, i + {_CONTAM_W}), ' ')")}
               ))) AS sh
        FROM toks
    ),
    train_sh AS (
        SELECT sh, count(*) AS train_df FROM sh WHERE bucket < 80 GROUP BY sh
    ),
    test_sh AS (
        SELECT doc_id, sh FROM sh WHERE bucket >= 90
    ),
    test_tot AS (
        SELECT doc_id, count(*) AS n_shingles FROM test_sh GROUP BY doc_id
    ),
    hits AS (
        SELECT t.doc_id, count(*) AS n_shared,
               CAST(sum(tr.train_df) AS BIGINT) AS contamination_mass
        FROM test_sh t JOIN train_sh tr ON t.sh = tr.sh
        GROUP BY t.doc_id
    )
    SELECT h.doc_id, h.n_shared, h.contamination_mass,
           CAST(h.n_shared AS DOUBLE) / tt.n_shingles AS contaminated_frac
    FROM hits h JOIN test_tot tt ON h.doc_id = tt.doc_id
    """,
)
def split_contamination_check(spark: SparkSession, sf: str) -> DataFrame:
    """Decontamination audit: which TEST documents share 8-token
    shingles with ANY train document, under the exact deterministic
    train/val/test assignment of training.train_val_test_split (same
    'split:' salt, same bucket arithmetic). Reports, per contaminated test
    doc, the number of shared shingles, the contamination mass (sum of
    train document frequency over those shingles) and the contaminated
    fraction of its shingle set.

    Scale shape — the part that matters at 100 TB: the train side is
    aggregated to ONE ROW PER SHINGLE (shingle -> train_df) before the
    join, so the join cost is |test shingles| + |distinct train shingles|
    and a super-common shingle contributes one row, not a postings×
    postings pair blowup. Both sides shuffle once on the shingle hash —
    the standard decontamination shape (hash-partition the n-gram space).
    Shingle sets are list_distinct-ed map-side, bounding work per doc at
    its token count.

    NULL-text contract (r9 window fix, this query's due slot;
    fixture-identical — no NULL text at any SF): unreadable documents
    are excluded on BOTH engines. Without the filter the Spark side
    hashed an empty synthetic shingle for the NULL doc while the
    portable-hash oracle crashed on DuckDB's '0x' NULL-concat artifact.
    """
    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    return contamination_report(docs)


def contamination_report(docs: DataFrame) -> DataFrame:
    """DataFrame-level form of :func:`split_contamination_check` — takes
    any (doc_id, text) relation so the planted-overlap recall pytest can
    feed a corpus with known cross-split contamination.

    r19 opt: the r18 input spread ahead of the shingle stage was REFUTED
    by the driver's cold-JVM single-pass ground truth (PERF_r18:
    split_contamination_check 0.78 -> 1.65 s at local[32], speedup 0.47;
    the 8-core control ran ~prev at 0.89 s — the added exchange loses
    cold at 32 cores). REVERTED per VERDICT r18 next-round item #2; the
    warm best-of-N -18% did not survive the driver contract."""
    docs = docs.select("doc_id", "text")
    bucket = F.expr(
        _split_bucket_sql(h62_sql("concat('split:', cast(doc_id as string))"))
    )
    shingle_slice = f"concat_ws(' ', slice(toks, i + 1, {_CONTAM_W}))"
    sh_expr = F.expr(
        f"array_distinct(transform(sequence(0, greatest(size(toks) - {_CONTAM_W}, 0)), "
        f"i -> {h62_sql(shingle_slice)}))"
    )
    sh = (
        docs.select(
            "doc_id", bucket.alias("bucket"), F.split("text", " ").alias("toks")
        )
        .select("doc_id", "bucket", F.explode(sh_expr).alias("sh"))
    )
    train_sh = (
        sh.where(F.col("bucket") < 80).groupBy("sh").agg(F.count("*").alias("train_df"))
    )
    test_sh = sh.where(F.col("bucket") >= 90).select("doc_id", "sh")
    test_tot = test_sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        test_sh.join(train_sh, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shared"),
            F.sum("train_df").cast("bigint").alias("contamination_mass"),
        )
    )
    return hits.join(test_tot, "doc_id").select(
        "doc_id",
        "n_shared",
        "contamination_mass",
        (F.col("n_shared").cast("double") / F.col("n_shingles")).alias(
            "contaminated_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Domain-mixture reweighting.
# ---------------------------------------------------------------------------


@register(
    "corpus_domain_mixture",
    oracle="""
    WITH per_source AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS all_docs,
               count(*) AS n_sources
        FROM per_source
    )
    SELECT p.source, p.n_docs, p.total_chars,
           CAST(p.n_docs AS DOUBLE) / t.all_docs AS actual_share,
           (1.0 / t.n_sources) /
               (CAST(p.n_docs AS DOUBLE) / t.all_docs) AS mix_weight
    FROM per_source p CROSS JOIN tot t
    """,
)
def corpus_domain_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mixture reweighting: per source domain, the corpus share it
    actually has and the sampling weight that would equalize the mixture
    (target = uniform over observed sources). This is the knob a training
    pipeline turns to hit a prescribed domain mix — weight > 1 means
    upsample, < 1 downsample.

    Scale shape: one partial-agg groupBy(source) over the fact (source
    cardinality is tiny), then a single-row totals frame cross-joined back
    — the allowlisted 1-row broadcast scalar pattern. Nothing here scales
    with corpus size except the first map-side-combined aggregate.
    """
    docs = load_table(spark, sf, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    tot = per_source.agg(
        F.sum("n_docs").cast("bigint").alias("all_docs"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    actual_share = F.col("n_docs").cast("double") / F.col("all_docs")
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "total_chars",
        actual_share.alias("actual_share"),
        ((F.lit(1.0) / F.col("n_sources")) / actual_share).alias("mix_weight"),
    )


# ---------------------------------------------------------------------------
# Per-source top-k bigrams.
# ---------------------------------------------------------------------------


_TOPK_BUCKETS = 16  # 100 TB knob: bounds per-task candidate-set size


def _bucketed_head(df, group_cols, key, k, bucket_expr):
    """Exact bounded k-smallest-keys-per-group WITHOUT a per-group global
    sort: stage 1 keeps k candidates per (group, hash-bucket) via
    sort_array over a collected list that is never larger than the
    bucket's share; stage 2 re-sorts only the <= _TOPK_BUCKETS * k
    survivors. Exact because any global head element is a head element
    within its own bucket. The single source of the two-stage pattern
    shared by ``text_ngram_topk`` and ``text_inverted_index`` — one place
    to tune the bucket count or slice bound. Returns one row per group
    with a sorted ``head`` array of at most k keys."""
    stage1 = (
        df.withColumn("__bkt", bucket_expr)
        .groupBy(*group_cols, "__bkt")
        .agg(F.slice(F.sort_array(F.collect_list(key)), 1, k).alias("__head"))
        .select(*group_cols, F.explode("__head").alias("__k"))
    )
    return stage1.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_list("__k")), 1, k).alias("head")
    )


@register(
    "text_ngram_topk",
    oracle="""
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS toks FROM documents
    ),
    bigrams AS (
        SELECT source,
               unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM toks WHERE len(toks) >= 2
    ),
    counted AS (
        SELECT source, bigram, count(*) AS n FROM bigrams GROUP BY 1, 2
    ),
    ranked AS (
        SELECT source, bigram, n,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n DESC, bigram) AS rk
        FROM counted
    )
    SELECT source, bigram, n, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def text_ngram_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 bigrams per source domain — the n-gram frequency profile used
    for corpus QA (boilerplate detection, domain drift). Deterministic: the
    rank orders by (count DESC, bigram ASC), a total order.

    Scale shape: bigrams are built map-side from one tokenize (slice
    inside transform — no re-split per gram) and counted with a partial
    agg keyed (source, bigram). The top-5 is then a BUCKETED two-stage
    selection, not a per-source window: a `row_number over (partition by
    source)` sorts each source's entire distinct-bigram set (billions of
    rows per source at corpus scale) in ONE task, while here stage 1 keeps
    the 5 best per (source, bigram-hash bucket) — per-task state bounded
    by distinct-bigrams/B — and stage 2 ranks the <= 5*B survivors per
    source, a constant. Global top-5 ⊆ union of per-bucket top-5s, so the
    result is exact. Same pattern as distributed_global_percentiles /
    pack_sequences; B (=16) is the scale knob. The struct sort key
    (-n, bigram) makes sort_array deliver (count DESC, bigram ASC)
    directly.
    """
    docs = load_table(spark, sf, "documents")
    bigram_expr = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat_ws(' ', toks[i - 1], toks[i]))"
    )
    counted = (
        docs.select("source", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 2)
        .select("source", F.explode(bigram_expr).alias("bigram"))
        .groupBy("source", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    key = F.struct((-F.col("n")).alias("negn"), F.col("bigram"), F.col("n"))
    final = _bucketed_head(
        counted, ["source"], key, 5,
        F.pmod(F.expr(h62_sql("bigram")), F.lit(_TOPK_BUCKETS)),
    )
    return final.select(
        "source", F.posexplode("head").alias("pos", "k")
    ).select(
        "source",
        F.col("k.bigram").alias("bigram"),
        F.col("k.n").alias("n"),
        (F.col("pos") + 1).cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# Inverted token index with bounded postings.
# ---------------------------------------------------------------------------


@register(
    "text_inverted_index",
    oracle="""
    WITH tf AS (
        SELECT token, doc_id, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY token, doc_id
    )
    SELECT token,
           count(*) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 10), ',')
               AS postings_head
    FROM tf GROUP BY token
    """,
)
def text_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted index: token -> document frequency, total term frequency,
    and the first 10 doc_ids of the postings list (ascending, joined to a
    flat string — the driver canonicalizer hashes scalars, not lists).

    Scale shape: explode+count keyed (token, doc_id) with map-side
    combine. df/total_tf are plain partial aggregates (constant state).
    The postings head is a BUCKETED two-stage min-10: a naive
    `sort_array(collect_list(doc_id))[:10]` gathers a stop-word token's
    ENTIRE postings list into one aggregation buffer before slicing (the
    bound would apply after the blow-up, not before); instead stage 1
    keeps the 10 smallest doc_ids per (token, doc_id-hash bucket) —
    buffer bounded by postings/B — and stage 2 selects the 10 smallest of
    the <= 10*B survivors, a constant. Global min-10 ⊆ union of
    per-bucket min-10s, so the head is exact. B (=16) is the 100 TB knob,
    same pattern as distributed_global_percentiles. Full postings at
    scale are a TABLE you write partitioned by token prefix, not an
    aggregate — this query is the driver-visible summary.
    """
    docs = load_table(spark, sf, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    heads = _bucketed_head(
        tf, ["token"], F.col("doc_id"), 10,
        F.pmod(F.col("doc_id"), F.lit(_TOPK_BUCKETS)),
    ).select("token", F.concat_ws(",", "head").alias("postings_head"))
    return stats.join(heads, "token").select(
        "token", "df", "total_tf", "postings_head"
    )
