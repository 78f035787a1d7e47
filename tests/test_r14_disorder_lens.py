"""r14 'disorder' lens — event-time disorder for the streaming surface,
the one subsystem the file-based two-engine lenses cannot reach (VERDICT
r13 #4a). Three shapes:

1. Out-of-order + watermark-boundary micro-batches against the windowed
   aggregation. The probe established the ACTUAL Spark 4.1 drop
   discipline empirically (it is NOT the folklore "row older than the
   watermark is dropped"):
   - a late row arriving while its window's state is STILL LIVE merges,
     no matter how far behind the watermark its event time is;
   - window state is finalized (emitted + evicted) at the end of the
     batch whose start-of-batch watermark has passed the window end;
   - a late row arriving AFTER its window was finalized is dropped
     (``numRowsDroppedByWatermark``) and the window NEVER re-emits —
     the per-window-key exactly-once guarantee downstream exactly-once
     sinks rely on.
   Both sides of the boundary are pinned with deterministic
   one-file-per-trigger delivery.

2. Disorder WITHOUT finalization in between is lossless: scrambled
   micro-batch delivery equals single-batch delivery exactly, for the
   windowed agg and for streaming dedup.

3. Crash-mid-batch redelivery + schema-evolving redeploy against the
   r13 mergeSchema readers: a partial (uncommitted) batch directory
   written with an EVOLVED schema stays invisible; its redelivery
   commits and the committed view serves the deterministic schema union
   with NULL backfill in both directions; a genuine type conflict
   across committed batches fails LOUDLY instead of serving a footer
   lottery.
"""
from __future__ import annotations

import os
import sys
import time

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _write_batches(spark, root, batches):
    """One parquet dir per micro-batch, mtimes spaced so the file source
    (maxFilesPerTrigger=1, latestFirst=false) delivers them in order."""
    now = time.time()
    for i, (name, rows) in enumerate(batches):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "value", "ts"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        df = spark.createDataFrame(pdf).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        df.coalesce(1).write.parquet(f"{root}/{name}")
        for d, _, files in os.walk(f"{root}/{name}"):
            for f in files:
                ts = now - 600 + i * 60
                os.utime(os.path.join(d, f), (ts, ts))


def _one_file_per_trigger_stream(spark, root):
    schema = spark.read.parquet(f"{root}/b=1").schema
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(str(root))
    )


def _drain(df, name, output_mode="append"):
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return q


def test_late_row_merges_while_window_state_is_live(spark, tmp_path):
    """A late row whose event time is far behind the watermark still
    MERGES when its window has not been finalized yet — here the
    watermark is already 19:00 when the 10:15 straggler arrives, but
    the [10:00, 11:00) state is still live (finalization for that
    window happens at this same batch's END), so the window emits once
    with the straggler included. The 18:30 row lands exactly at the
    watermark boundary (window end == watermark) and is included the
    same way."""
    root = str(tmp_path / "live")
    _write_batches(
        spark,
        root,
        [
            ("b=1", [(1, 1, "view", 1.0, "2024-06-01 10:00:00"),
                     (2, 1, "view", 1.0, "2024-06-01 10:30:00")]),
            # advances max event time to 20:00 -> watermark 19:00
            ("b=2", [(3, 2, "view", 1.0, "2024-06-01 20:00:00")]),
            # disordered delivery: stragglers behind the 19:00 watermark
            ("b=3", [(4, 3, "view", 1.0, "2024-06-01 10:15:00"),
                     (5, 3, "view", 1.0, "2024-06-01 18:30:00"),
                     (6, 3, "view", 1.0, "2024-06-01 19:30:00")]),
            # sentinel pushes the watermark past every real window
            ("b=4", [(7, 4, "sentinel", 1.0, "2024-06-01 23:00:00")]),
        ],
    )
    from dbfs_spark_cache_spark.streaming import tumbling_counts

    stream = _one_file_per_trigger_stream(spark, root)
    _drain(
        tumbling_counts(stream, window="1 hour", watermark="1 hour"),
        "t_dis_live",
    )
    got = {
        (str(r.bucket_start), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM t_dis_live").collect()
    }
    assert got == {
        ("2024-06-01 10:00:00", "view"): 3,   # straggler merged
        ("2024-06-01 18:00:00", "view"): 1,   # boundary row merged
        ("2024-06-01 19:00:00", "view"): 1,
        ("2024-06-01 20:00:00", "view"): 1,
    }
    # exactly one emission per window key (append-mode contract)
    rows = spark.sql(
        "SELECT bucket_start, event_type, COUNT(*) AS n FROM t_dis_live "
        "GROUP BY 1, 2 HAVING COUNT(*) > 1"
    ).collect()
    assert rows == []


def test_late_row_after_finalization_drops_and_never_reemits(spark, tmp_path):
    """A late row arriving AFTER its window was finalized is DROPPED
    (visible in numRowsDroppedByWatermark) and the already-emitted
    window key never re-emits — the downstream exactly-once property.
    The spacer batch lets the [10:00, 11:00) window finalize (the batch
    runs with watermark 19:00) before the straggler arrives."""
    root = str(tmp_path / "evicted")
    _write_batches(
        spark,
        root,
        [
            ("b=1", [(1, 1, "view", 1.0, "2024-06-01 10:00:00"),
                     (2, 1, "view", 1.0, "2024-06-01 10:30:00")]),
            ("b=2", [(3, 2, "view", 1.0, "2024-06-01 20:00:00")]),
            # spacer: this batch runs with watermark 19:00 and finalizes
            # [10:00, 11:00) at its end
            ("b=3", [(4, 2, "view", 1.0, "2024-06-01 20:30:00")]),
            # straggler for the ALREADY-FINALIZED window
            ("b=4", [(5, 3, "view", 1.0, "2024-06-01 10:20:00")]),
            ("b=5", [(7, 4, "sentinel", 1.0, "2024-06-01 23:00:00")]),
        ],
    )
    from dbfs_spark_cache_spark.streaming import tumbling_counts

    stream = _one_file_per_trigger_stream(spark, root)
    q = (
        tumbling_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dis_evicted")
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in (p["stateOperators"] or [])
        )
    finally:
        q.stop()
    got = {
        (str(r.bucket_start), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM t_dis_evicted").collect()
    }
    assert got == {
        ("2024-06-01 10:00:00", "view"): 2,   # straggler EXCLUDED
        ("2024-06-01 20:00:00", "view"): 2,
    }
    assert dropped == 1  # the straggler was dropped loudly, not lost silently
    rows = spark.sql(
        "SELECT bucket_start, event_type, COUNT(*) AS n FROM t_dis_evicted "
        "GROUP BY 1, 2 HAVING COUNT(*) > 1"
    ).collect()
    assert rows == []  # the finalized window never re-emitted


def test_disorder_without_finalization_is_lossless(spark, tmp_path):
    """Scrambled micro-batch delivery (event times interleaved across
    batches, never past any window's finalization) must equal the
    single-batch delivery exactly — for the windowed agg AND for
    streaming dedup, which must also collapse an out-of-order duplicate
    delivered two batches after its original."""
    rows = [
        (1, 1, "view", 1.0, "2024-06-01 12:10:00"),
        (2, 1, "view", 1.0, "2024-06-01 10:05:00"),
        (3, 2, "click", 1.0, "2024-06-01 11:40:00"),
        (4, 2, "view", 1.0, "2024-06-01 10:55:00"),
        (5, 3, "click", 1.0, "2024-06-01 12:20:00"),
        (6, 3, "view", 1.0, "2024-06-01 11:05:00"),
    ]
    dup_of_2 = (2, 1, "view", 1.0, "2024-06-01 10:05:00")
    root = str(tmp_path / "scrambled")
    _write_batches(
        spark,
        root,
        [
            ("b=1", [rows[0], rows[1]]),
            ("b=2", [rows[2], rows[3]]),
            ("b=3", [rows[4], dup_of_2, rows[5]]),
        ],
    )
    from dbfs_spark_cache_spark.streaming import (
        dedup_events_stream,
        tumbling_counts,
    )

    stream = _one_file_per_trigger_stream(spark, root)
    _drain(
        tumbling_counts(stream, window="1 hour", watermark="1 day"),
        "t_dis_scrambled",
        output_mode="complete",  # nothing finalizes under a 1-day watermark
    )
    got = {
        (str(r.bucket_start), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM t_dis_scrambled").collect()
    }
    # single-batch ground truth (duplicate counted once by dedup below,
    # but tumbling_counts sees raw rows: the dup adds one to its bucket)
    assert got == {
        ("2024-06-01 10:00:00", "view"): 3,     # ids 2, 4, dup-of-2
        ("2024-06-01 11:00:00", "click"): 1,
        ("2024-06-01 11:00:00", "view"): 1,
        ("2024-06-01 12:00:00", "view"): 1,
        ("2024-06-01 12:00:00", "click"): 1,
    }

    deduped = _drain(
        dedup_events_stream(_one_file_per_trigger_stream(spark, root)),
        "t_dis_dedup",
    )
    ids = [r.event_id for r in spark.sql("SELECT * FROM t_dis_dedup").collect()]
    assert sorted(ids) == [1, 2, 3, 4, 5, 6]  # out-of-order dup collapsed
    assert deduped is not None


def test_stateful_sessions_under_scrambled_delivery(spark, tmp_path):
    """The custom sessionizer (applyInPandasWithState) under event-time
    disorder: the same events delivered scrambled across micro-batches —
    a user's later event arriving a batch BEFORE an earlier one — must
    flush the same sessions as ordered single-batch delivery, including
    the span-clamp contract (a within-watermark straggler extends the
    open session's span downward, never regresses session_end)."""
    from dbfs_spark_cache_spark.streaming import (
        run_to_memory_sink,
        stateful_session_flush,
    )

    rows = [
        # user 1: one session 09:00-10:30 (3 events), then 23:30 opens a
        # second (gap 12h) that the sentinel's watermark flushes
        (1, 1, "view", 1.0, "2024-06-01 10:30:00"),
        (2, 1, "view", 1.0, "2024-06-01 09:00:00"),
        (3, 1, "view", 1.0, "2024-06-01 10:00:00"),
        (4, 1, "view", 1.0, "2024-06-01 23:30:00"),
        # user 2: a single session whose straggler (09:40) arrives LAST
        (5, 2, "view", 1.0, "2024-06-01 10:10:00"),
        (6, 2, "view", 1.0, "2024-06-01 09:40:00"),
        # sentinel advances the watermark far enough to flush everything
        (7, 9, "view", 1.0, "2024-06-03 12:00:00"),
    ]
    root = str(tmp_path / "sess_scrambled")
    _write_batches(
        spark,
        root,
        [
            ("b=1", [rows[0], rows[4]]),   # 10:30 before 09:00/10:00
            ("b=2", [rows[1], rows[3]]),
            ("b=3", [rows[2], rows[5]]),   # stragglers
            ("b=4", [rows[6]]),
        ],
    )
    got_df = run_to_memory_sink(
        stateful_session_flush(
            _one_file_per_trigger_stream(spark, root), watermark="1 day"
        ),
        "t_dis_sessions",
        output_mode="append",
    )
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in got_df.collect()
    }
    # ordered single-batch ground truth (the sentinel's own session stays
    # open at termination — the documented finite-run boundary)
    assert got == {
        (1, "2024-06-01 09:00:00", "2024-06-01 10:30:00", 3),
        (1, "2024-06-01 23:30:00", "2024-06-01 23:30:00", 1),
        (2, "2024-06-01 09:40:00", "2024-06-01 10:10:00", 2),
    }


def test_sessionizer_state_survives_checkpoint_restart(spark, tmp_path):
    """Exactly-once across RESTART (not just in-run redelivery): the
    sessionizer's interval state — the array-typed schema introduced by
    the disorder fix — must round-trip through the checkpoint. Run 1
    drains two batches and stops with a session OPEN and a second
    session PENDING flush; run 2 (same checkpoint) delivers a straggler
    for the run-1 session plus a sentinel. The union of the two runs'
    emissions must equal single-run delivery: the cross-restart session
    carries the straggler, nothing re-emits, nothing is lost."""
    import glob as _glob

    from dbfs_spark_cache_spark.streaming import stateful_session_flush

    root = str(tmp_path / "restart_src")
    ckpt = str(tmp_path / "restart_ckpt")
    out = str(tmp_path / "restart_out")
    os.makedirs(out, exist_ok=True)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    def drain(run):
        schema = spark.read.parquet(f"{root}/b=1").schema
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .load(root)
        )
        q = (
            stateful_session_flush(
                stream.select("user_id", "ts"), watermark="1 day"
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: user 1 opens a session; user 2's session becomes flushable
    # only after the sentinel in run 2
    _write_batches(
        spark,
        root,
        [
            ("b=1", [(1, 1, "view", 1.0, "2024-06-01 10:00:00"),
                     (2, 2, "view", 1.0, "2024-06-01 08:00:00")]),
            ("b=2", [(3, 1, "view", 1.0, "2024-06-01 11:00:00")]),
        ],
    )
    drain(1)

    # run 2 (fresh file, same checkpoint): an in-watermark straggler for
    # user 1's OPEN session plus the flush sentinel
    _write_batches(
        spark,
        root,
        [
            ("b=3", [(4, 1, "view", 1.0, "2024-06-01 10:30:00"),
                     (5, 9, "view", 1.0, "2024-06-04 12:00:00")]),
        ],
    )
    drain(2)

    files = _glob.glob(f"{out}/*.parquet")
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.read.parquet(out).collect()
    } if files else set()
    assert got == {
        # the cross-restart session: opened in run 1, straggler from
        # run 2 absorbed, flushed once by the sentinel's watermark
        (1, "2024-06-01 10:00:00", "2024-06-01 11:00:00", 3),
        (2, "2024-06-01 08:00:00", "2024-06-01 08:00:00", 1),
    }


def test_sessionizer_drops_null_event_times(spark, tmp_path):
    """applyInPandasWithState delivers NULL-ts rows (Spark filters them
    only for built-in watermark operators), and an unguarded NaT turned
    into a huge-negative epoch — a bogus pre-epoch session emitted on the
    next flush. The sessionizer must drop NULL event times identically to
    what windowed aggregation does, leaving real sessions untouched."""
    import datetime as dt

    from dbfs_spark_cache_spark.streaming import (
        run_to_memory_sink,
        stateful_session_flush,
    )

    base = dt.datetime(2024, 6, 1, 10, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(hours=1)),
        (1, None),                          # NULL event time
        (9, base + dt.timedelta(days=3)),   # sentinel flush
    ]
    df_src = spark.createDataFrame(rows, "user_id long, ts timestamp")
    src = str(tmp_path / "natsrc")
    df_src.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema(df_src.schema)
        .load(src)
    )
    got_df = run_to_memory_sink(
        stateful_session_flush(stream, watermark="1 day"),
        "t_dis_nat",
        output_mode="append",
    )
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in got_df.collect()
    }
    assert got == {(1, "2024-06-01 10:00:00", "2024-06-01 11:00:00", 2)}


def test_sessionizer_beyond_horizon_boundary(spark, tmp_path):
    """Out-of-contract boundary, pinned so a Spark upgrade changing it is
    flagged: applyInPandasWithState does NOT drop late input rows (unlike
    windowed aggregation — numRowsDroppedByWatermark stays 0), so a
    straggler 20h behind a 2h watermark still reaches the sessionizer and
    merges into its session when that session is still in state. The
    merged session flushes with the straggler included; nothing is
    silently lost."""
    from dbfs_spark_cache_spark.streaming import stateful_session_flush

    rows = [
        (1, 1, "view", 1.0, "2024-06-01 10:00:00"),
        (2, 2, "view", 1.0, "2024-06-02 10:00:00"),  # wm -> June 2 08:00
        (3, 1, "view", 1.0, "2024-06-01 12:00:00"),  # 20h behind the wm
        (4, 9, "view", 1.0, "2024-06-04 10:00:00"),  # sentinel flush
    ]
    root = str(tmp_path / "horizon")
    _write_batches(spark, root, [(f"b={i+1}", [r]) for i, r in enumerate(rows)])
    q = (
        stateful_session_flush(
            _one_file_per_trigger_stream(spark, root).select("user_id", "ts"),
            watermark="2 hours",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dis_horizon")
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in (p["stateOperators"] or [])
        )
    finally:
        q.stop()
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM t_dis_horizon").collect()
    }
    assert dropped == 0  # the stateful operator sees every row
    assert (1, "2024-06-01 10:00:00", "2024-06-01 12:00:00", 2) in got
    assert (2, "2024-06-02 10:00:00", "2024-06-02 10:00:00", 1) in got


def test_redeploy_schema_evolution_with_crash_mid_batch(spark, tmp_path):
    """Crash-mid-batch redelivery + schema-evolving redeploy against the
    r13 mergeSchema committed readers: (a) a partial batch dir written
    with an EVOLVED schema (no commit marker) is invisible and does not
    perturb the committed schema; (b) its redelivery commits and the
    reader serves the deterministic union — NULL backfill for old rows;
    (c) a redeploy that DROPS a column keeps the column in the union
    with NULLs for the new batch (historic data is not truncated);
    (d) a genuine type conflict across committed batches fails loudly."""
    from dbfs_spark_cache_spark.streaming import (
        exactly_once_append_sink,
        read_exactly_once_output,
    )

    base = str(tmp_path / "redeploy")
    sink = exactly_once_append_sink(base)

    schema_a = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "event_id long, value double"
    )
    sink(schema_a, 0)
    assert read_exactly_once_output(spark, base).columns == ["event_id", "value"]

    # (a) crash mid-batch: the redeployed job wrote data with an EVOLVED
    # schema, crashed before the marker — invisible, schema unperturbed
    evolved = spark.createDataFrame(
        [(3, 30.0, "eu"), (4, 40.0, "us")],
        "event_id long, value double, region string",
    )
    evolved.write.mode("overwrite").parquet(f"{base}/batch_id=1")
    view = read_exactly_once_output(spark, base)
    assert view.columns == ["event_id", "value"]
    assert view.count() == 2

    # (b) redelivery commits the evolved batch: union + NULL backfill
    sink(evolved, 1)
    view = read_exactly_once_output(spark, base)
    assert set(view.columns) == {"event_id", "value", "region"}
    assert view.count() == 4
    backfilled = {r.event_id: r.region for r in view.collect()}
    assert backfilled[1] is None and backfilled[3] == "eu"

    # (c) a later redeploy DROPS value: historic batches keep it
    dropped_col = spark.createDataFrame(
        [(5, "ap")], "event_id long, region string"
    )
    sink(dropped_col, 2)
    view = read_exactly_once_output(spark, base)
    assert set(view.columns) == {"event_id", "value", "region"}
    vals = {r.event_id: r.value for r in view.collect()}
    assert vals[5] is None and vals[1] == 10.0
    assert view.count() == 5

    # (d) a type conflict across committed batches is LOUD, not a lottery
    conflict = spark.createDataFrame(
        [(6, "not-a-number", "eu")],
        "event_id long, value string, region string",
    )
    sink(conflict, 3)
    with pytest.raises(Exception, match="(?i)merge|incompatible|schema"):
        read_exactly_once_output(spark, base).collect()


# ---------------------------------------------------------------------------
# Property pin of the sessionizer state machine (no SparkSession): for ANY
# set of events and ANY batch split in which every event arrives while
# still inside the watermark, the flushed sessions equal the reference
# batch gap-sessionization of the same events, restricted to sessions
# whose deadline the final watermark passes. Generalizes the hand-built
# disorder cases above to hypothesis-generated shapes.
# ---------------------------------------------------------------------------

from hypothesis import assume, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_GAP_US = 12 * 3600 * 1_000_000
_DELAY_US = 24 * 3600 * 1_000_000  # 1-day watermark
_HOUR_US = 3600 * 1_000_000
_BASE_US = 1_700_000_000_000_000  # anchor epoch micros


class _SimState:
    """Minimal GroupState stand-in exposing exactly the surface
    _session_update uses."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False
        self._wm_ms = 0
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.timeout_ms = None

    def setTimeoutTimestamp(self, ms):
        assert ms > self._wm_ms, "timeout must exceed the watermark"
        self.timeout_ms = ms

    def getCurrentWatermarkMs(self):
        return self._wm_ms


def _reference_sessions(events_us):
    out = []
    for us in sorted(events_us):
        if out and us - out[-1][1] <= _GAP_US:
            out[-1][1] = max(out[-1][1], us)
            out[-1][2] += 1
        else:
            out.append([us, us, 1])
    return [tuple(s) for s in out]


@settings(max_examples=120, deadline=None)
@given(
    offsets=st.lists(
        st.integers(0, 90), min_size=1, max_size=14
    ),  # event hours within ~4 days
    splitter=st.lists(st.integers(0, 3), min_size=1, max_size=14),
    data=st.data(),
)
def test_sessionizer_order_independent_within_watermark(
    offsets, splitter, data
):
    import pandas as pd

    from dbfs_spark_cache_spark.streaming import _session_update

    events = [_BASE_US + h * _HOUR_US for h in offsets]
    # split events into ordered batches: splitter assigns each event a
    # batch index offsetting from the previous one
    n_batches = min(len(splitter), len(events)) or 1
    batches = [[] for _ in range(n_batches)]
    for i, us in enumerate(events):
        batches[data.draw(st.integers(0, n_batches - 1))].append(us)
    batches = [b for b in batches if b]

    # Simulate Spark: wm for batch N derives from data through batch N-1;
    # every event must still be inside the watermark when delivered, else
    # the documented beyond-horizon boundary applies and order-dependence
    # is legal — filter those splits out.
    wm = 0
    max_seen = 0
    for b in batches:
        for us in b:
            assume(us >= wm)
        max_seen = max(max_seen, *b)
        wm = max(wm, max_seen - _DELAY_US)

    update = _session_update(_GAP_US)
    state = _SimState()
    emitted = []

    def run(batch_rows, wm_ms, timed_out):
        state._wm_ms = wm_ms
        state.hasTimedOut = timed_out
        frames = (
            []
            if timed_out
            else [pd.DataFrame({"ts": pd.to_datetime(batch_rows, unit="us")})]
        )
        for out in update((1,), iter(frames), state):
            emitted.extend(
                (r.start_us, r.end_us, r.n_events)
                for r in out.itertuples(index=False)
            )

    wm = 0
    max_seen = 0
    for b in batches:
        run(b, wm // 1000, timed_out=False)
        max_seen = max(max_seen, *b)
        wm = max(wm, max_seen - _DELAY_US)
    # final no-data micro-batches: fire timeouts until none are due
    while state.exists and state.timeout_ms is not None and (
        state.timeout_ms <= wm // 1000
    ):
        run([], wm // 1000, timed_out=True)

    final_wm = wm
    expected = [
        s for s in _reference_sessions(events) if s[1] + _GAP_US <= final_wm
    ]
    assert sorted(emitted) == sorted(expected)
    # whatever stayed in state is exactly the not-yet-closeable remainder
    open_sessions = (
        sorted(zip(*state.get)) if state.exists else []
    )
    assert sorted(open_sessions) == sorted(
        s for s in _reference_sessions(events) if s[1] + _GAP_US > final_wm
    )
