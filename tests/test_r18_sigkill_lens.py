"""r18 SIGKILL lens: whole-JVM death mid-batch, real processes.

The r14 restart lens proved exactly-once across a REAL query failure —
but the crash was an injected Python exception inside the driver, so the
JVM survived and every in-flight OS write completed or failed atomically
at the Python layer. A production cluster dies harder: OOM-killer, spot
eviction, `kill -9` — the executor/driver JVM vanishes MID-WRITE,
leaving whatever the filesystem happened to have: partial parquet part
files without `_SUCCESS`, temp-sibling marker files, a Spark offsets WAL
ahead of its commit log. This lens kills an actual child process running
a real file-source stream into `exactly_once_append_sink` and asserts
the exactly-once view heals on restart, for two kill placements:

* ``mid``  — SIGKILL lands ~0.4 s after the batch-1 sink function
  starts: death anywhere inside the data write / ledger protocol.
* ``late`` — the sink function commits batch 1 fully, THEN stalls
  before returning: death lands between the sink's own commit and
  Spark's checkpoint commit log for the batch (the at-least-once
  boundary) — the restart REDELIVERS batch 1 and the marker
  short-circuit must keep the committed bytes untouched.

The assertion is invariant-style (any interleaving must heal): the
committed view after the finishing run equals the input rows exactly
once, and quarantined/partial directories never leak into it. Three
JVMs per placement (killed run, finishing run, plus the pytest session
for verification) — the expensive shape is why this lens pins two
placements, not a schedule sweep; the r16 fold-race lens covers
in-process schedule rolls.
"""
from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CPUS"] = "2"
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from dbfs_spark_cache_spark import streaming as st

mode = {mode!r}              # "kill-mid" | "kill-late" | "finish"
input_dir = {input_dir!r}
base = {base!r}
ckpt = {ckpt!r}
sentinel = {sentinel!r}

spark = (
    SparkSession.builder.master("local[2]")
    .appName("sigkill-child")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
st.claim_sink_checkpoint(base, ckpt)
sink = st.exactly_once_append_sink(base)

def wrapped(df, bid):
    if mode != "finish" and bid == 1:
        with open(sentinel, "w") as fh:
            fh.write(str(bid))
        if mode == "kill-late":
            sink(df, bid)       # full sink commit...
            time.sleep(30)      # ...then stall before Spark's commit log
            return
        time.sleep(30)          # parent kills us ~0.4s in: death mid-protocol
    sink(df, bid)

stream = (
    spark.readStream.schema("id long, grp string, value double")
    .option("maxFilesPerTrigger", "1")
    .parquet(input_dir)
)
q = (
    stream.writeStream.foreachBatch(wrapped)
    .option("checkpointLocation", ckpt)
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination()
print("CHILD-DONE")
"""


def _write_arrival(spark, path: str, rows) -> None:
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(rows, columns=["id", "grp", "value"])
    spark.createDataFrame(pdf).select(
        F.col("id").cast("long"),
        F.col("grp").cast("string"),
        F.col("value").cast("double"),
    ).coalesce(1).write.parquet(path)


def _run_child(mode, input_dir, base, ckpt, sentinel, *, kill_delay=None):
    code = _CHILD.format(
        repo=_REPO, mode=mode, input_dir=input_dir, base=base,
        ckpt=ckpt, sentinel=sentinel,
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    if mode == "finish":
        out, _ = proc.communicate(timeout=240)
        assert "CHILD-DONE" in out, f"finishing run failed:\n{out[-3000:]}"
        return
    # wait for the batch-1 sentinel, then SIGKILL the whole JVM tree
    deadline = time.time() + 180
    while not os.path.exists(sentinel):
        if proc.poll() is not None:
            out = proc.stdout.read() if proc.stdout else ""
            raise AssertionError(
                f"child exited before reaching batch 1:\n{out[-3000:]}"
            )
        if time.time() > deadline:
            proc.kill()
            raise AssertionError("child never reached batch 1")
        time.sleep(0.05)
    if kill_delay:
        time.sleep(kill_delay)
    # SIGKILL: no atexit, no JVM shutdown hooks, no finally blocks
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)


@pytest.mark.parametrize("placement", ["mid", "late"])
def test_sigkill_mid_batch_heals_exactly_once(spark, tmp_path, placement):
    input_dir = str(tmp_path / "in")
    base = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    sentinel = str(tmp_path / f"sentinel_{placement}")
    os.makedirs(input_dir)

    rows = {
        0: [(i, "a", float(i)) for i in range(10)],
        1: [(i, "b", float(i)) for i in range(10, 20)],
        2: [(i, "c", float(i)) for i in range(20, 30)],
    }
    # partition-style dir names (b=N): the file source only recurses into
    # key=value directories — a plain subdir is invisible to discovery
    for arrival, rs in rows.items():
        _write_arrival(spark, f"{input_dir}/b={arrival}", rs)

    mode = "kill-mid" if placement == "mid" else "kill-late"
    delay = 0.4 if placement == "mid" else 0.2
    _run_child(mode, input_dir, base, ckpt, sentinel, kill_delay=delay)

    # the killed JVM must not have published batch 1 into the committed
    # view unless its ledger marker landed — read with the session spark
    from dbfs_spark_cache_spark import streaming as st

    partial = st.read_exactly_once_output(spark, base)
    if partial is not None:
        got_ids = {r.id for r in partial.collect()}
        full = set(range(30))
        assert got_ids <= full
        # committed batches are whole arrivals, never a torn subset
        for arrival_rows in rows.values():
            ids = {r[0] for r in arrival_rows}
            assert ids <= got_ids or not (ids & got_ids), (
                f"torn batch visible after SIGKILL: {sorted(ids & got_ids)}"
            )

    # restart from the same checkpoint in a fresh JVM and drain
    _run_child("finish", input_dir, base, ckpt, sentinel)

    healed = st.read_exactly_once_output(spark, base)
    assert healed is not None
    out = [(r.id, r.grp) for r in healed.collect()]
    assert sorted(r[0] for r in out) == list(range(30)), (
        f"exactly-once violated after SIGKILL+restart: {sorted(out)}"
    )
    assert len(out) == 30  # no duplicates from redelivery
