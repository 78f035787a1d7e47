"""Time-series operators over the events table: as-of / range joins,
sessionization, tumbling & sliding windows.

Spark has no native AS-OF join; these are compositions of equi-join +
aggregation / window functions (preference order per the build rules:
built-in ops first). The batch window queries mirror exactly what the
streaming module does with ``readStream`` + ``F.window`` — same semantics,
so one oracle covers both.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "asof_join_prior_view",
    oracle="""
    SELECT p.event_id, p.user_id,
           MAX(v.ts) AS prior_view_ts,
           COUNT(v.event_id) AS n_prior_views
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def asof_join_prior_view(spark: SparkSession, sf: str) -> DataFrame:
    """AS-OF join: each purchase matched to the latest strictly-prior view
    by the same user (plus how many views preceded it).

    Composition: per-user equi-join + inequality + max/count aggregation.
    At 100 TB the equivalent single-shuffle plan is a union of both event
    streams + a per-user ordered window (`last(view_ts) ignoring nulls`);
    the join form is kept here because its semantics are exactly
    SQL-checkable. Skewed users are handled by AQE skew-join.
    """
    events = load_table(spark, sf, "events")
    p = events.where(F.col("event_type") == "purchase").alias("p")
    v = events.where(F.col("event_type") == "view").alias("v")
    return (
        p.join(
            v,
            (F.col("v.user_id") == F.col("p.user_id")) & (F.col("v.ts") < F.col("p.ts")),
            "left",
        )
        .groupBy(F.col("p.event_id").alias("event_id"), F.col("p.user_id").alias("user_id"))
        .agg(
            F.max("v.ts").alias("prior_view_ts"),
            F.count("v.event_id").alias("n_prior_views"),
        )
    )


@register(
    "asof_join_union_window",
    oracle="""
    SELECT p.event_id, p.user_id,
           MAX(v.ts) AS prior_view_ts,
           COUNT(v.event_id) AS n_prior_views
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def asof_join_union_window(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME as-of semantics as ``asof_join_prior_view`` (identical
    oracle), in the single-shuffle plan shape the join form's docstring
    promises for 100 TB: union both event roles, ONE shuffle on user_id,
    and a per-user ordered window that carries the latest prior view and
    the running view count to each purchase row.

    The join form expands per-user pairs (quadratic in per-user activity)
    before aggregating them away; this form's work is linear in events.
    Strictness (``v.ts < p.ts``) falls out of the sort order: ties on ts
    sort purchases (kind 0) before views (kind 1), so a same-timestamp
    view is never in a purchase's preceding frame.

    At-least-once contract (r11, this query's due slot; r10 duplication
    lens): under duplicated input the bare window form emitted one row
    PER PURCHASE ROW while the oracle GROUPs by (event_id, user_id)
    with the join count multiplied by the purchase-copy count. The
    twin's final aggregation now matches the oracle's:
    ``groupBy(event_id, user_id)`` with MAX(prior_view_ts) and
    SUM(n_prior_views) — per-copy counts are identical, so the sum
    equals copies x view rows, exactly the oracle's join count, and on
    unique fixtures the groups are singletons (result unchanged).
    Regression pin in ``tests/test_r11_window_fixes.py``; event_id is
    unique at every SF (fixture-identical).
    """
    events = load_table(spark, sf, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    tagged = events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("kind"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    view_ts = F.when(F.col("kind") == 1, F.col("ts"))
    return (
        tagged.withColumn("prior_view_ts", F.max(view_ts).over(w))
        .withColumn("n_prior_views", F.count(view_ts).over(w))
        .where(F.col("kind") == 0)
        .groupBy("event_id", "user_id")
        .agg(
            F.max("prior_view_ts").alias("prior_view_ts"),
            F.sum("n_prior_views").alias("n_prior_views"),
        )
    )


@register(
    "range_join_pairs",
    oracle="""
    SELECT e1.user_id, COUNT(*) AS n_pairs
    FROM events e1
    JOIN events e2
      ON e2.user_id = e1.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    GROUP BY e1.user_id
    """,
)
def range_join_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Range (interval) join: pairs of events by the same user within one
    hour. The user_id equi-key keeps this a partitioned hash join with a
    per-user interval filter — never a cartesian product; at 100 TB add
    time-bucketing on ts to bound the per-key fan-out."""
    events = load_table(spark, sf, "events")
    e1 = events.alias("e1")
    e2 = events.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e2.user_id") == F.col("e1.user_id"))
            & (F.col("e2.ts") > F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 12 HOUR
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (12 h inactivity): lag + flag + count.
    One shuffle on user_id; the streaming twin is ``session_window`` in
    streaming.py.

    r10 (landed in this query's due slot; pre-measured at r9;
    premeasure since retired, pins in tests/test_r10_window_fixes.py): the Spark window orders
    ``ts`` with ``asc_nulls_last`` so a NULL-ts straggler sorts LAST on
    both engines (DuckDB's ASC default is already NULLS LAST) and joins
    the user's final session via the three-valued CASE, instead of
    sorting FIRST (Spark's default) and handing the first real event a
    NULL lag that opened a phantom extra session. Fixture-invisible (no
    NULL ts at any SF); hostile parity pinned in
    tests/test_r10_window_fixes.py.
    """
    events = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    prev_ts = F.lag("ts").over(w)
    # Interval arithmetic works for both TIMESTAMP and TIMESTAMP_NTZ and is
    # timezone-free (an epoch cast would be neither).
    flagged = events.withColumn(
        "new_session",
        F.when(
            prev_ts.isNull()
            | (F.col("ts") - prev_ts > F.expr("INTERVAL 12 HOURS")),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "window_tumbling",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
    GROUP BY bucket_start, event_type
    """,
)
def window_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour windows — the batch twin of the streaming windowed
    aggregation (streaming.py uses the same expression over readStream).

    r10 (landed in this query's due slot; pre-measured at r9;
    premeasure since retired, pins in tests/test_r10_window_fixes.py): ``F.window`` silently DROPS
    NULL-ts rows (verified on Spark 4.1) while DATE_TRUNC groups them
    into a NULL bucket, so BOTH engines now drop them explicitly with
    ``WHERE ts IS NOT NULL`` — an un-timestamped event belongs to no
    window. Same fix on ``window_sliding`` below (its union-shape oracle
    emitted the NULL bucket TWICE). Fixture-invisible; hostile parity
    pinned in tests/test_r10_window_fixes.py.

    r13 (landed in this query's due slot; pre-measured at r11's
    nonfinite lens — true NaN/Inf storage; premeasure since promoted to
    tests/test_r13_window_fixes.py): a single NaN/Inf reading crashed
    the oracle's DECIMAL bucket sums while this side ran. Both engines
    now drop non-finite readings (``finite_or_null("value")`` / the
    oracle WHERE rider) — the bad-telemetry contract
    window_time_range_rolling landed at r11; same fix on
    window_sliding below. Fixture-invisible (every fixture value is
    finite).
    """
    from .registry import finite_or_null

    events = load_table(spark, sf, "events").where(
        F.col("ts").isNotNull() & finite_or_null("value")
    )
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(22,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "window_sliding",
    oracle="""
    WITH assigned AS (
        SELECT DATE_TRUNC('hour', ts) AS bucket_start, value
        FROM events
        WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
        UNION ALL
        SELECT DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR, value
        FROM events
        WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
    )
    SELECT bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
    FROM assigned
    GROUP BY bucket_start
    """,
)
def window_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding windows (2 h length, 1 h slide): every event lands in two
    buckets. Spark's F.window handles the replication; the oracle spells it
    out as a union of the two shifted tumbling assignments.

    r10 (due slot): NULL-ts rows dropped explicitly on BOTH engines —
    see ``window_tumbling`` above for the diagnosis.

    r13 (due slot): non-finite readings dropped on BOTH engines
    (``finite_or_null``) — see ``window_tumbling`` above."""
    from .registry import finite_or_null

    events = load_table(spark, sf, "events").where(
        F.col("ts").isNotNull() & finite_or_null("value")
    )
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(22,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "total_value")
    )


@register(
    "events_resample_gapfill",
    oracle="""
    WITH hourly AS (
        SELECT user_id, DATE_TRUNC('hour', ts) AS bucket,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS total_value
        FROM events WHERE user_id < 20 AND (value IS NULL OR isfinite(value))
        GROUP BY user_id, bucket
    ),
    spans AS (
        SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM hourly GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(CAST(lo AS TIMESTAMP),
                                      CAST(hi AS TIMESTAMP),
                                      INTERVAL 1 HOUR)) AS bucket
        FROM spans
    )
    SELECT g.user_id, g.bucket,
           COALESCE(h.n_events, 0) AS n_events,
           COALESCE(h.total_value, 0.0) AS total_value,
           h.n_events IS NULL AS gap_filled
    FROM grid g
    LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def events_resample_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user hourly resample with gap filling: every hour between a
    user's first and last event exists in the output, zero-filled and
    flagged where no events occurred — the densification pass feature
    pipelines and forecasting models need in front of sparse event data.

    Scale shape: the hourly aggregation is the only corpus-sized shuffle
    (map-side partial first); the per-user hour grid derives from a
    user-count-sized span table via sequence+explode (rows generated
    where they are consumed, no driver loop), and the fill join is
    user+bucket equi-keyed. The user_id predicate pushes to the scan.
    Decimal sums keep fill-vs-data rows exactly comparable to the oracle.

    Non-finite contract (r11, this query's due slot; nonfinite lens):
    a NaN/Inf reading crashed the oracle's DECIMAL hourly sums —
    bad-telemetry rows now drop identically on both engines
    (finite_or_null; the hour they fell in densifies as a gap if they
    were its only events, exactly like any other empty hour).
    Regression pin in tests/test_r11_window_fixes.py.
    """
    from .registry import finite_or_null

    events = load_table(spark, sf, "events").where(
        (F.col("user_id") < 20) & finite_or_null("value")
    )
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(22,6)")).cast("double").alias("total_value"),
    )
    return densify_hourly(hourly)


def densify_hourly(hourly: DataFrame) -> DataFrame:
    """Densify a per-(user_id, bucket) hourly frame onto each user's full
    hour grid, zero-filling and flagging missing hours. Shared by the batch
    operator above and the streaming parity path (a windowed-stream sink
    produces the same hourly shape; densification is a downstream batch
    pass over the materialized sink — state-free, so it does not belong in
    the stream itself)."""
    spans = hourly.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
    )
    # Both join sides descend from `hourly`; rename the fill side so the
    # self-join resolves even over sources Spark cannot re-alias itself
    # (memory-sink views lack the file-relation self-join dedup).
    fill = hourly.withColumnRenamed("user_id", "f_user_id").withColumnRenamed(
        "bucket", "f_bucket"
    )
    return (
        grid.join(
            fill,
            (grid["user_id"] == fill["f_user_id"]) & (grid["bucket"] == fill["f_bucket"]),
            "left",
        )
        .select(
            "user_id",
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
            F.col("n_events").isNull().alias("gap_filled"),
        )
    )


@register(
    "window_time_range_rolling",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(22,6))) OVER w AS DOUBLE)
               AS value_last_hour
    FROM events
    WHERE value IS NULL OR isfinite(value)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range_rolling(spark: SparkSession, sf: str) -> DataFrame:
    """Time-based window frames: per-user rolling count and sum over the
    trailing hour, bounded by EVENT TIME (RANGE + INTERVAL), not row
    position — the rolling-feature shape ROWS frames cannot express when
    events arrive irregularly. Rows sharing a timestamp share a frame
    (RANGE semantics), which also makes the result ordering-tie-proof.

    One shuffle on user_id; the frame scan is per-user and bounded by the
    hour horizon. DECIMAL sums keep the rolling values exact. Registered
    via Spark SQL — the DataFrame API's rangeBetween takes only numeric
    offsets, while SQL accepts interval literals on timestamp ordering;
    both engines implement identical RANGE semantics.

    Non-finite contract (r11, this query's due slot; nonfinite lens —
    true NaN/Inf storage): a single NaN/Inf reading crashed the
    oracle's DECIMAL frame sums — bad-telemetry rows now drop
    identically on both engines (registry.finite_or_null on the Spark
    frame — Spark SQL has no isfinite() builtin, so the SQL text
    cannot be shared verbatim; the RANGE window itself is identical
    text. NULL values keep flowing through the three-valued frame
    sums). Regression pin in tests/test_r11_window_fixes.py; every
    fixture value is finite.

    The filtered frame is passed to spark.sql as a DataFrame argument
    ({events_finite} substitution) rather than through a session-global
    temp view (ADVICE r11 #3): a shared view name is mutable session
    state — two interleaved invocations on one SparkSession at
    different sf dirs could race and read the wrong fixture (the
    --lens all single-session probe mode makes that shape real).
    """
    from ..sources import load_table
    from .registry import finite_or_null

    finite = load_table(spark, sf, "events").where(finite_or_null("value"))
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w AS n_last_hour,
               CAST(SUM(CAST(value AS DECIMAL(22,6))) OVER w AS DOUBLE)
                   AS value_last_hour
        FROM {events_finite}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """,
        events_finite=finite,
    )
