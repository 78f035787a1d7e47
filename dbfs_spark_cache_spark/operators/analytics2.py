"""Round-6 analytic widening: distribution windows (ntile / percent_rank /
cume_dist), FILTER-clause conditional aggregation, year-over-year growth,
fixed-width histograms, calendar date spines, datetime part extraction,
exact-power-sum correlation/covariance, regexp extract-all, and array
set operations. Each query carries an exact DuckDB oracle; float results
follow the package decimal-power-sum discipline (registry.dec) so values
are bit-reproducible under any partitioning.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources import load_table
from .registry import dec, finite_or_null, register


@register(
    "window_ntile_cume",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(NTILE(4) OVER wt AS BIGINT) AS price_quartile,
           PERCENT_RANK() OVER wv AS pct_rank,
           CUME_DIST() OVER wv AS cume
    FROM orders
    WINDOW wv AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC),
           wt AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ntile_cume(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution window functions — quartile bucketing (ntile),
    relative rank (percent_rank) and cumulative distribution (cume_dist)
    of each order's price within its priority class, with the standard
    tie semantics (pct/cume treat equal prices as peers; ntile's
    row-placement is made deterministic by the o_orderkey tie-break).
    Completes the ranking-window family.

    Scale shape: o_orderpriority has FIVE values, so the textbook
    ``Window.partitionBy(priority)`` funnels ~1/5 of the fact through one
    sort task each — partitioned in name only. This delegates to
    ``scale.distributed_global_percentiles(partition_cols=[priority])``:
    price bands within each priority, per-band counts -> broadcast
    offsets, local windows bounded by band population (32 bands is the
    knob), distribution values from (global rank, n) arithmetically —
    semantics equal to the plain window, verified against Spark's own
    window form in tests/test_scale_patterns.py and against DuckDB here.
    Descending order rides the negated price.
    """
    from .scale import distributed_global_percentiles

    orders = load_table(spark, sf, "orders")
    # r18 opt note: an input spread (scale.spread_unsplittable_scan) was
    # A/B-measured here and REGRESSED (0.62 -> 1.11 s at sf0.1): the
    # banded helper consumes its input through several self-join
    # branches, and each branch re-paid the round-robin exchange instead
    # of the cheap serial re-scan. Left unchanged.
    base = orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        (-F.col("o_totalprice")).alias("__negprice"),
    )
    ranked = distributed_global_percentiles(
        base,
        value_col="__negprice",
        tiebreak_col="o_orderkey",
        n_tiles=4,
        pct_col="pct_rank",
        cume_col="cume",
        tile_col="price_quartile",
        partition_cols=["o_orderpriority"],
    )
    return ranked.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.col("price_quartile").cast("bigint").alias("price_quartile"),
        "pct_rank",
        "cume",
    )


@register(
    "agg_count_if_filtered",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_rev,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS DOUBLE)
               / COUNT(*) AS heavy_share
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_if_filtered(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional aggregation — count_if and FILTER-style selective sums
    in one grouped pass (one shuffle, fully partial-aggregatable: every
    branch is a plain sum/count under a CASE, so map-side combine still
    applies). The discounted-revenue sum runs over DECIMAL so the value
    is partitioning-independent."""
    li = load_table(spark, sf, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n_heavy = F.count_if(F.col("l_quantity") > 25)
    n_total = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n_total.alias("n_total"),
        n_heavy.alias("n_heavy"),
        F.sum(F.when(F.col("l_discount") > 0.05, dec(net, 6)))
        .cast("double")
        .alias("discounted_rev"),
        (n_heavy.cast("double") / n_total).alias("heavy_share"),
    )


@register(
    "orders_year_over_year",
    oracle="""
    WITH yr AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT order_year, revenue, n_orders,
           LAG(revenue) OVER (ORDER BY order_year) AS prev_revenue,
           revenue / NULLIF(LAG(revenue) OVER (ORDER BY order_year), 0)
               AS growth_ratio
    FROM yr
    """,
)
def orders_year_over_year(spark: SparkSession, sf: str) -> DataFrame:
    """Year-over-year growth — yearly revenue with a lag window and a
    growth ratio (NULL for the first year). The heavy work is the grouped
    aggregation (one fact shuffle); the window runs over a handful of
    year rows, so the unpartitioned ORDER BY is bounded by the calendar,
    not the corpus. Revenue sums over DECIMAL; the ratio divides two
    exact-decimal-derived doubles, so it is bit-stable.

    Hostile contract (r9 window fix, landed in this query's own due
    slot; fixture-identical — no NULL order date and no zero-revenue
    year exists at any SF): a NULL-date year group orders NULLS LAST on
    both engines (Spark's default NULLS FIRST silently re-chained every
    year's prev_revenue relative to the oracle), and a zero-revenue
    previous year yields a NULL growth_ratio via NULLIF instead of an
    ANSI DIVIDE_BY_ZERO that kills the query (the r8 crash class —
    decimal-derived doubles take the ANSI division path).

    EXPECTED LOG NOISE (r9 verdict nit #5): Spark's WindowExec warns
    "No Partition Defined for Window operation" on every run — correct
    and deliberately accepted here, because the window's input is the
    post-aggregate YEAR table (a few dozen rows bounded by the
    calendar), not the corpus; partitioning it (e.g. by lit(1)) would
    add an exchange to silence a warning about a single-task sort over
    ~30 rows. Do not "fix" the warning."""
    orders = load_table(spark, sf, "orders")
    yr = orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("order_year")
    ).agg(
        F.sum(dec(F.col("o_totalprice"), 6)).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = W.orderBy(F.col("order_year").asc_nulls_last())
    prev = F.lag("revenue").over(w)
    return yr.select(
        "order_year",
        "revenue",
        "n_orders",
        prev.alias("prev_revenue"),
        (F.col("revenue") / F.nullif(prev, F.lit(0.0))).alias("growth_ratio"),
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 5) AS BIGINT) AS bin,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS bin_sum,
           MIN(value) AS bin_min,
           MAX(value) AS bin_max
    FROM events
    WHERE value IS NULL OR isfinite(value)
    GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram — floor-binning is a map-side expression, so
    the whole histogram is one partial-aggregated shuffle over ~n_bins
    keys regardless of corpus size (the 100 TB-safe way to histogram;
    never a driver-side value sweep). Min/max on raw doubles are exact;
    the per-bin sum goes through DECIMAL.

    Non-finite values are excluded on both engines (r9 NaN/Inf probe,
    this query's due slot; fixture-identical — every fixture value is
    finite): Spark's FLOOR(double)->LONG silently bins NaN at 0 and
    ±Inf at Long.MIN/MAX while DuckDB's bin cast raises — the guard
    makes bad-telemetry rows drop identically instead (NULL values
    still flow to the NULL bin on both engines)."""
    events = load_table(spark, sf, "events").where(finite_or_null("value"))
    return events.groupBy(
        F.floor(F.col("value") / 5).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec(F.col("value"), 6)).cast("double").alias("bin_sum"),
        F.min("value").alias("bin_min"),
        F.max("value").alias("bin_max"),
    )


@register(
    "calendar_spine_orders",
    oracle="""
    WITH spine AS (
        SELECT CAST(gs AS DATE) AS day
        FROM generate_series(DATE '1995-01-01', DATE '1995-03-31',
                             INTERVAL 1 DAY) t(gs)
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
        GROUP BY 1
    )
    SELECT CAST(spine.day AS TIMESTAMP) AS day,
           COALESCE(daily.n, CAST(0 AS BIGINT)) AS n_orders
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
)
def calendar_spine_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar date spine with zero-fill — generate an explicit day
    spine (sequence + explode; 90 rows for Q1 1995), left-join daily
    order counts onto it, and fill gaps with 0. The densification twin of
    the events gap-fill query, on dates instead of hours. The spine is
    calendar-bounded (tiny), so the left join broadcasts the aggregated
    daily counts; the fact side is filtered BEFORE aggregation so the
    scan prunes on the date predicate."""
    orders = load_table(spark, sf, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.expr("sequence(DATE'1995-01-01', DATE'1995-03-31', interval 1 day)")
        ).alias("day")
    )
    daily = (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        F.col("day").cast("timestamp").alias("day"),
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_orders"),
    )


@register(
    "fn_datetime_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(dayofyear(o_orderdate) AS INT) AS order_doy,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date
    FROM orders
    """,
)
def fn_datetime_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Datetime part extraction and date arithmetic — the scalar date
    family (year/quarter/month/day/dayofyear/last_day/date_add) as pure
    map-side expressions that fuse into the scan's codegen stage.
    Week-number and day-of-week are deliberately absent: their numbering
    conventions differ across engines, so portable pipelines derive them
    from ISO strings instead."""
    orders = load_table(spark, sf, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofyear("o_orderdate").alias("order_doy"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
    )


@register(
    "stats_corr_covar",
    oracle="""
    WITH d AS (
        -- DECIMAL(19,2), not (12,2): DuckDB multiplies decimals in their
        -- STORAGE type, and (12,2) is int64-backed, so xd*xd overflows at
        -- |x| >= ~1e9.2 — magnitudes Spark's (12,2)->(25,4) product
        -- handles fine (r18 precision lens: the oracle crashed before the
        -- query's own loud ANSI domain bound). (19,2) is int128-backed:
        -- products are exact across the full (12,2) value domain, and the
        -- values themselves are unchanged, so fixture results are
        -- bit-identical (pinned in tests/test_r18_precision_lens.py).
        SELECT l_returnflag,
               CAST(l_quantity AS DECIMAL(19,2)) AS xd,
               CAST(l_extendedprice AS DECIMAL(19,2)) AS yd
        FROM lineitem
    ),
    sums AS (
        -- Rescale each exact-decimal sum to an integer before the DOUBLE
        -- cast: the scaled integer stays under 2^53, so the cast is a
        -- single exact-operand rounding in both engines (DuckDB's
        -- decimal->double is not correctly rounded above 2^53 scaled
        -- units). DuckDB TRUNCATES on decimal rescale where Spark rounds
        -- HALF_UP, so add 0.5 first (all sums are positive).
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(xd) + 0.5 AS DECIMAL(28,0)) AS DOUBLE) AS sx,
               CAST(CAST(SUM(yd) + 0.5 AS DECIMAL(28,0)) AS DOUBLE) AS sy,
               CAST(CAST(SUM(xd * xd) + 0.5 AS DECIMAL(28,0)) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(yd * yd) + 0.5 AS DECIMAL(28,0)) AS DOUBLE) AS syy,
               CAST(CAST(SUM(xd * yd) + 0.5 AS DECIMAL(28,0)) AS DOUBLE) AS sxy
        FROM d GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy)
             / NULLIF(sqrt(GREATEST(
                   (n * sxx - sx * sx) * (n * syy - sy * sy), 0)), 0)
               AS qty_price_corr,
           (sxy - sx * sy / n) / n AS qty_price_covar_pop,
           sqrt(GREATEST((sxx - sx * sx / n) / n, 0)) AS qty_stddev_pop
    FROM sums
    """,
)
def stats_corr_covar(spark: SparkSession, sf: str) -> DataFrame:
    """Correlation / covariance via exact power sums — the native corr()
    and covar_pop() aggregates accumulate floats in partition order, so
    their results drift across partitionings AND across engines. Instead:
    the five power sums (Sx, Sy, Sxx, Syy, Sxy) run over exact decimals
    (inputs cast to DECIMAL(12,2) BEFORE multiplying, so products are
    exact and sums association-independent — bit-reproducible under any
    layout), and
    the closed-form moments are computed from the exact sums in one final
    map step. Same one-shuffle plan shape as any grouped agg; the per-row
    products stay in the scan's codegen stage.

    r19 opt (guide §1 measure first): the r18 input spread ahead of the
    five decimal power sums was REFUTED by the driver's cold-JVM
    ground truth — 0.94 s -> 18.3 s at local[32] with 14.2 s
    intra-session spread (PERF_r18: speedup 0.05, scaling ratio 0.06 —
    8 cores ran it 17x faster than 32). Partial decimal aggregates are
    cheap codegen (the r18 §9 boundary lesson); the added round-robin
    exchange bought nothing and turned pathological under 32 concurrent
    tasks. REVERTED to the plain projected scan (VERDICT r18 next-round
    item #1); the warm best-of-N -18% that motivated it does not
    survive the driver's single-pass contract."""
    li = load_table(spark, sf, "lineitem")
    li = li.select("l_returnflag", "l_quantity", "l_extendedprice")
    # Cast INPUTS to exact decimals, then multiply in the decimal domain:
    # the fixture values are 2dp, so xd/yd are exact and every product is
    # exact — no double->decimal rounding of a ~17-digit product, which is
    # where engines disagree on half-way boundaries.
    xd = F.col("l_quantity").cast("decimal(12,2)")
    yd = F.col("l_extendedprice").cast("decimal(12,2)")
    # Rescale sums to integer decimals (scaled int < 2^53) before the
    # double cast — see the oracle comment: above 2^53 scaled units the
    # engines' decimal->double casts disagree by 1 ULP. Spark's decimal
    # rescale rounds HALF_UP natively; the oracle emulates it.
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xd).cast("decimal(28,0)").cast("double").alias("sx"),
        F.sum(yd).cast("decimal(28,0)").cast("double").alias("sy"),
        F.sum(xd * xd).cast("decimal(28,0)").cast("double").alias("sxx"),
        F.sum(yd * yd).cast("decimal(28,0)").cast("double").alias("syy"),
        F.sum(xd * yd).cast("decimal(28,0)").cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # Degenerate groups (singleton, or constant x or y) zero the variance
    # product: under ANSI mode (Spark 4 default) the unguarded divide is
    # DIVIDE_BY_ZERO and kills the query; correlation is undefined there,
    # so both engines emit NULL (GREATEST absorbs the hair-negative
    # rounding of an exactly-zero variance, where sqrt would be NaN here
    # but a hard error in the oracle).
    corr_den = F.nullif(
        F.sqrt(F.greatest((n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0))),
        F.lit(0.0),
    )
    return sums.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        ((n * sxy - sx * sy) / corr_den).alias("qty_price_corr"),
        ((sxy - sx * sy / n) / n).alias("qty_price_covar_pop"),
        F.sqrt(F.greatest((sxx - sx * sx / n) / n, F.lit(0.0))).alias(
            "qty_stddev_pop"
        ),
    )


@register(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]{5,}', 0)) AS INT) AS n_long,
           CAST(len(list_distinct(regexp_extract_all(text, '[a-z]{5,}', 0))) AS INT)
               AS n_long_distinct,
           regexp_extract_all(text, '[a-z]{5,}', 0)[1] AS first_long
    FROM documents
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf: str) -> DataFrame:
    """regexp_extract_all — pull every >= 5-letter token from each
    document and report total / distinct counts plus the first match
    (NULL when none). List cells cannot be value-hashed by the driver, so
    the arrays flatten to summary columns. Pure map-side regex; the
    pattern is shared RE2/Java-regex syntax so both engines match the
    same spans."""
    docs = load_table(spark, sf, "documents")
    matches = F.regexp_extract_all("text", F.lit("[a-z]{5,}"), 0)
    return docs.select(
        "doc_id",
        F.size(matches).alias("n_long"),
        F.size(F.array_distinct(matches)).alias("n_long_distinct"),
        F.get(matches, 0).alias("first_long"),  # null-safe under ANSI mode
    )


@register(
    "fn_array_set_ops",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    ht AS (
        SELECT doc_id,
               list_distinct(list_slice(ts, 1, 10)) AS head,
               list_distinct(list_slice(ts, greatest(len(ts) - 9, 1), len(ts)))
                   AS tail
        FROM toks
    )
    SELECT doc_id,
           CAST(len(head) AS INT) AS n_head,
           CAST(len(tail) AS INT) AS n_tail,
           CAST(len(list_intersect(head, tail)) AS INT) AS n_common,
           CAST(len(list_distinct(list_concat(head, tail))) AS INT) AS n_union,
           CAST(len(list_intersect(head, tail)) AS DOUBLE)
             / NULLIF(len(list_distinct(list_concat(head, tail))), 0)
               AS head_tail_jaccard
    FROM ht
    """,
)
def fn_array_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Array set operations — intersect / union / distinct over the first
    and last 10 tokens of each document, plus their Jaccard similarity (a
    cheap self-repetition signal). Set results flatten to sizes because
    the driver compare cannot hash list cells, and element ORDER of
    array_intersect/union is engine-specific anyway — sizes are the
    well-defined contract. All map-side; no shuffle at all."""
    docs = load_table(spark, sf, "documents")
    toks = F.split("text", " ")
    head = F.array_distinct(F.slice(toks, 1, 10))
    tail = F.array_distinct(
        F.slice(toks, F.greatest(F.size(toks) - 9, F.lit(1)), F.lit(10))
    )
    n_common = F.size(F.array_intersect(head, tail))
    n_union = F.size(F.array_union(head, tail))
    return docs.select(
        "doc_id",
        F.size(head).alias("n_head"),
        F.size(tail).alias("n_tail"),
        n_common.alias("n_common"),
        n_union.alias("n_union"),
        (n_common.cast("double") / F.nullif(n_union, F.lit(0))).alias(
            "head_tail_jaccard"
        ),
    )
