"""Property-based tests (hypothesis) for the engine's pure-Python kernels:
content hashing, the cost model, metadata documents, and the MinHash
permutation family. The reference has no property tests (SURVEY.md §5) —
these pin the invariants its unit tests only spot-check."""
from __future__ import annotations

import hashlib
from datetime import datetime

import pandas as pd
from hypothesis import given, settings, strategies as st

from dbfs_spark_cache_spark.complexity import (
    MULTIPLIER_BASE,
    complexity_from_plan,
    plan_cost_multiplier,
)
from dbfs_spark_cache_spark.hashing import hash_input_data
from dbfs_spark_cache_spark.plans.fingerprint import (
    cache_metadata_document,
    compute_cache_key,
)

simple_frames = st.lists(
    st.tuples(st.integers(-1000, 1000), st.text(min_size=0, max_size=8)),
    min_size=1,
    max_size=20,
).map(lambda rows: pd.DataFrame(rows, columns=["a", "b"]))


@settings(max_examples=30, deadline=None)
@given(simple_frames)
def test_hash_deterministic_and_copy_stable(frame):
    assert hash_input_data(frame) == hash_input_data(frame.copy(deep=True))


@settings(max_examples=30, deadline=None)
@given(simple_frames, st.integers(0, 19), st.integers(-2000, 2000))
def test_hash_changes_on_any_value_change(frame, row_idx, new_value):
    mutated = frame.copy(deep=True)
    i = row_idx % len(mutated)
    if mutated.iloc[i, 0] == new_value:
        new_value += 1
    mutated.iloc[i, 0] = new_value
    assert hash_input_data(frame) != hash_input_data(mutated)


@settings(max_examples=30, deadline=None)
@given(simple_frames)
def test_hash_changes_on_rename(frame):
    renamed = frame.rename(columns={"a": "z"})
    assert hash_input_data(frame) != hash_input_data(renamed)


op_words = st.lists(
    st.sampled_from(["join", "window", "sort", "distinct", "udf", "project"]),
    min_size=0,
    max_size=6,
)


@settings(max_examples=50, deadline=None)
@given(op_words)
def test_multiplier_bounds_and_monotonicity(ops):
    plan = " ".join(ops)
    m = plan_cost_multiplier(plan)
    assert m >= MULTIPLIER_BASE - 1e-12
    # appending a join never lowers the estimate (factors are all >= 1
    # relative to the running multiplier)
    assert plan_cost_multiplier(plan + " join") >= m


@settings(max_examples=30, deadline=None)
@given(op_words, st.floats(0.001, 1000.0))
def test_complexity_linear_in_size(ops, size_gb):
    plan = " ".join(ops)
    c1, m1 = complexity_from_plan(plan, size_gb)
    c2, m2 = complexity_from_plan(plan, 2 * size_gb)
    assert m1 == m2
    assert abs(c2 - 2 * c1) < 1e-9 * max(1.0, abs(c2))


path_mtimes = st.dictionaries(
    st.text(
        alphabet=st.characters(whitelist_categories=["Ll", "Nd"], whitelist_characters="/_-"),
        min_size=1,
        max_size=30,
    ).map(lambda s: "/" + s),
    st.datetimes(min_value=datetime(2000, 1, 1), max_value=datetime(2030, 1, 1)),
    min_size=0,
    max_size=5,
)


@settings(max_examples=50, deadline=None)
@given(path_mtimes, st.text(max_size=200))
def test_metadata_key_deterministic_and_input_sensitive(info, plan):
    doc = cache_metadata_document(info, plan)
    assert compute_cache_key(doc) == compute_cache_key(doc)
    # mtimes render at second precision — any whole-second shift must change
    # the key when there is at least one source
    if info:
        path = next(iter(info))
        from datetime import timedelta

        shifted = dict(info)
        shifted[path] = shifted[path] + timedelta(seconds=1)
        assert compute_cache_key(
            cache_metadata_document(shifted, plan)
        ) != compute_cache_key(doc)


def test_hash_family_resolution_and_portable_pin(monkeypatch):
    """The portable expression must stay byte-identical to the round-3
    oracle-green literal (every md5-derived driver row depends on it), the
    production default must be the JVM xxhash64 family, and the env knob
    must switch between them. An unknown family is a hard error."""
    import pytest

    from dbfs_spark_cache_spark.operators import dedup

    monkeypatch.delenv(dedup.HASH_FAMILY_ENV, raising=False)
    assert dedup.hash_family() == "xxhash64"
    assert dedup.h62_sql("x") == "shiftrightunsigned(xxhash64(x), 4)"
    portable = "cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)"
    assert dedup.h62_sql("x", family="portable") == portable
    monkeypatch.setenv(dedup.HASH_FAMILY_ENV, "portable")
    assert dedup.h62_sql("x") == portable
    assert dedup.hash_family("xxhash64") == "xxhash64"  # arg beats env
    with pytest.raises(ValueError):
        dedup.hash_family("md4")


def test_entry_pins_portable_family_for_oracle_replay():
    """__spark_entry__ must pin the md5-portable family (setdefault) before
    the driver builds any query: the DuckDB oracles replay md5, never
    xxhash64."""
    import importlib
    import os as _os
    import sys as _sys

    from dbfs_spark_cache_spark.operators.dedup import HASH_FAMILY_ENV

    saved = _os.environ.pop(HASH_FAMILY_ENV, None)
    try:
        if "/root/repo" not in _sys.path:
            _sys.path.insert(0, "/root/repo")
        entry_mod = _sys.modules.get("__spark_entry__")
        if entry_mod is not None:
            importlib.reload(entry_mod)
        else:
            import __spark_entry__  # noqa: F401
        assert _os.environ[HASH_FAMILY_ENV] == "portable"
    finally:
        if saved is None:
            _os.environ.pop(HASH_FAMILY_ENV, None)
        else:
            _os.environ[HASH_FAMILY_ENV] = saved


def _h62_py(s: str) -> int:
    """Pure-python mirror of the portable hash: first 15 hex chars of md5,
    exactly what Spark's conv(substr(md5,1,15),16,10) and DuckDB's
    CAST('0x'||substr(md5,1,15) AS BIGINT) compute."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _minhash_py(shingles, n=32):
    """Pure-python mirror of the Spark MinHash permutation family."""
    from dbfs_spark_cache_spark.operators.dedup import (
        _P31,
        _PERM_MULTIPLIERS,
        _PERM_OFFSETS,
    )

    hashes = [_h62_py(s) & _P31 for s in shingles]
    return [
        min((a * h + b) % _P31 for h in hashes)
        for a, b in zip(_PERM_MULTIPLIERS[:n], _PERM_OFFSETS[:n])
    ]


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_portable_hash_parity_python_duckdb(s):
    """The portable md5-62bit hash must agree between the pure-python
    mirror and DuckDB on arbitrary unicode (Spark agreement is pinned by
    every oracle-green hash-derived query in selfcheck). Surrogates are
    excluded: they cannot be UTF-8 encoded by any engine."""
    try:
        s.encode("utf-8")
    except UnicodeEncodeError:
        return
    import duckdb

    from dbfs_spark_cache_spark.operators.dedup import duck_h62

    got = duckdb.connect().execute(
        f"SELECT {duck_h62('?')}", [s]
    ).fetchone()[0]
    assert got == _h62_py(s)


@settings(max_examples=20, deadline=None)
@given(
    st.sets(st.text(min_size=1, max_size=6), min_size=8, max_size=60),
    st.floats(0.2, 0.9),
)
def test_minhash_family_estimates_jaccard(base, keep_fraction):
    """The (a*x+b) mod p permutation family must estimate Jaccard within a
    loose statistical tolerance — a broken family (e.g. monotone map)
    collapses to all-agree or all-disagree and fails this immediately."""
    base = sorted(base)
    k = max(1, int(len(base) * keep_fraction))
    other = set(base[:k]) | {s + "_x" for s in base[k:]}
    sa, sb = set(base), other
    true_j = len(sa & sb) / len(sa | sb)
    ma, mb = _minhash_py(sa), _minhash_py(sb)
    est = sum(1 for x, y in zip(ma, mb) if x == y) / len(ma)
    # 32 permutations: std ~ sqrt(j(1-j)/32) <= 0.09; allow 4 sigma.
    assert abs(est - true_j) <= 0.36


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("commit"), st.integers(0, 30)),
            st.tuples(st.just("compact"), st.just(0)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_commit_ledger_never_loses_or_duplicates_ids(ops):
    """The exactly-once sink's ledger under arbitrary commit/compact
    interleavings: the committed-id view (manifest union markers) always
    equals the set of ids ever committed — compaction neither drops ids
    nor resurrects them, and re-committing an id is absorbed by the set
    semantics."""
    import tempfile

    from dbfs_spark_cache_spark import fs
    from dbfs_spark_cache_spark.streaming import (
        _LEDGER_MANIFEST,
        _ledger_state,
        compact_commit_ledger,
    )

    with tempfile.TemporaryDirectory() as base:
        committed: set = set()
        for op, arg in ops:
            if op == "commit":
                # Mirror the sink's redelivery short-circuit: marker or
                # manifest hit -> no-op (a folded id must not re-mark).
                manifest_ids, marker_ids = _ledger_state(fs, base)
                if arg not in manifest_ids and arg not in marker_ids:
                    fs.write_text(
                        f"{base}/_committed/{arg}.txt", f"batch {arg} committed"
                    )
                committed.add(arg)
            else:
                folded = compact_commit_ledger(base)
                manifest_ids, marker_ids = _ledger_state(fs, base)
                if folded:
                    assert marker_ids == set()  # every marker folded
            manifest_ids, marker_ids = _ledger_state(fs, base)
            assert manifest_ids | marker_ids == committed
            assert manifest_ids & marker_ids == set()  # no id in both tiers


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-5, 5)),
            st.one_of(st.none(), st.floats(-100, 200, allow_nan=False)),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_expectations_report_matches_python_ground_truth(spark, rows):
    """Property: the one-pass Spark report equals rule-by-rule python
    counts for arbitrary null-riddled frames, INCLUDING the empty frame
    (an empty ingest batch must report zero violations and pass — SUM
    over zero rows is NULL and used to crash the int() conversion).
    (The session-scoped spark fixture is reused across examples — no
    per-example state.)"""
    from dbfs_spark_cache_spark.quality import expectations_report

    df = spark.createDataFrame(rows, "k int, v double")
    report = expectations_report(
        df, not_null=["k"], unique=["k"], ranges={"v": (0.0, 100.0)}
    )

    ks = [k for k, _ in rows]
    vs = [v for _, v in rows]
    non_null_ks = [k for k in ks if k is not None]
    assert report["n_rows"] == len(rows)
    assert report["null_k"] == sum(k is None for k in ks)
    assert report["dup_k"] == len(non_null_ks) - len(set(non_null_ks))
    assert report["range_v"] == sum(
        v is not None and not (0.0 <= v <= 100.0) for v in vs
    )
    assert report["passed"] == (
        report["null_k"] == report["dup_k"] == report["range_v"] == 0
    )


# --- r8 pure-helper properties --------------------------------------------

_fn_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            _fn_name,
            st.lists(_fn_name, min_size=0, max_size=3),  # nested arg fns
        ),
        min_size=1,
        max_size=4,
    )
)
def test_top_level_fn_names_extracts_exactly_the_outer_names(calls):
    """For any synthesized eval-node argument list of the plan's
    ``outer(inner1(x), inner2(y))#id`` shape, _top_level_fn_names must
    return exactly the outer names, in order, and never a nested one."""
    from dbfs_spark_cache_spark.plans.fingerprint import _top_level_fn_names

    rendered = ", ".join(
        f"{outer}(" + ", ".join(f"{inner}(col)" for inner in inners) + f")#{i}"
        for i, (outer, inners) in enumerate(calls)
    )
    assert _top_level_fn_names(rendered) == [outer for outer, _ in calls]


@settings(max_examples=60, deadline=None)
@given(st.text(min_size=0, max_size=30))
def test_sanitized_name_never_retains_forbidden_chars(name):
    """Any column name run through the rewrite regex must come out free of
    every character the detection regex flags — the two are built from
    one shared class, and this pins that they can never drift apart."""
    from dbfs_spark_cache_spark.functions import (
        _INVALID_NAME_CHARS,
        _INVALID_NAME_RUN,
    )

    clean = _INVALID_NAME_RUN.sub("_", name).strip("_")
    assert not _INVALID_NAME_CHARS.search(clean), (name, clean)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**33))
def test_utc_naive_is_tz_env_independent_and_exact(epoch):
    """_utc_naive must be a pure function of the epoch (no environment
    dependence) and round-trip exactly at second granularity."""
    from datetime import timezone

    from dbfs_spark_cache_spark.fs import _utc_naive

    dt = _utc_naive(float(epoch))
    assert dt.tzinfo is None
    assert dt.replace(tzinfo=timezone.utc).timestamp() == epoch


@settings(max_examples=40, deadline=None)
@given(
    st.sets(st.text(min_size=0, max_size=6), min_size=1, max_size=6),
    st.integers(0, 5),
)
def test_udf_tag_frozenset_const_order_free(elems, rotation):
    """A membership test against a set LITERAL compiles to one frozenset
    constant; the tag must depend only on the elements, never on the
    order they were written in source (repr order of the folded
    frozenset additionally varies per process — the r8 hash-seed fix).
    Plain BUILD_SET assignments are out of scope: their elements live as
    ordered co_consts, so source reorder legitimately retags."""
    from pyspark.sql.types import DoubleType

    from dbfs_spark_cache_spark.functions import content_addressed_udf

    items = sorted(elems)
    k = rotation % len(items)
    rotated = items[k:] + items[:k]

    def build(order):
        literal = "{" + ", ".join(repr(x) for x in order) + "}"
        ns = {}
        exec(
            "def fn(s):\n"
            f"    return s.map(lambda t: 1.0 if t in {literal} else 0.0)\n",
            ns,
        )
        return content_addressed_udf(ns["fn"], DoubleType())

    tag = lambda u: u.func.__name__.rsplit("__", 1)[1]
    assert tag(build(items)) == tag(build(rotated))


@settings(max_examples=15, deadline=None)
@given(
    n_cols=st.integers(min_value=26, max_value=60),
    mutate_at=st.integers(min_value=0, max_value=59),
    delta=st.integers(min_value=1, max_value=7),
)
def test_wide_plan_fingerprints_injective_under_truncation(
    spark, n_cols, mutate_at, delta
):
    """Generalizes the r12 truncation pin: for ANY projection wider than
    spark.sql.debug.maxToStringFields (default 25), mutating any single
    column expression must change the canonical plan — before the r12
    fix every mutation beyond the field limit collapsed onto one cache
    key (a wrong-data hit)."""
    from pyspark.sql import functions as F

    from dbfs_spark_cache_spark.plans.fingerprint import canonical_plan

    mutate_at = mutate_at % n_cols
    base = spark.range(5)

    def projection(mutated: bool):
        cols = []
        for i in range(n_cols):
            expr = F.col("id") + i
            if mutated and i == mutate_at:
                expr = F.col("id") * (1000 + delta)
            cols.append(expr.alias(f"c{i}"))
        return base.select(*cols)

    pa_ = canonical_plan(projection(False))
    pb_ = canonical_plan(projection(True))
    assert pa_ != pb_, (
        f"mutating column {mutate_at} of {n_cols} left the fingerprint "
        "unchanged — the truncation collision is back"
    )
    assert "more fields" not in pa_ and "more fields" not in pb_


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=-10_000, max_value=10_000),
    w2=st.integers(min_value=-10_000, max_value=10_000),
    unrelated=st.integers(min_value=-10_000, max_value=10_000),
)
def test_udf_tag_tracks_exactly_the_referenced_globals(w, w2, unrelated):
    """Generalizes the r12 global-chase pins: the tag changes iff a
    REFERENCED global's value changes — an unreferenced module global
    never participates (so unrelated module churn cannot spuriously
    invalidate persistent caches)."""
    from pyspark.sql.types import DoubleType

    from dbfs_spark_cache_spark.functions import content_addressed_udf

    def tag(w_val, unrelated_val):
        ns: dict = {}
        exec(
            "def fn(s):\n    return s * W\n",
            ns,
        )
        ns["W"] = w_val
        ns["UNRELATED"] = unrelated_val
        # rebuild fn so __globals__ is the populated namespace
        exec("def fn(s):\n    return s * W\n", ns)
        u = content_addressed_udf(ns["fn"], DoubleType())
        return u.func.__name__.rsplit("__", 1)[1]

    assert tag(w, unrelated) == tag(w, unrelated - 1) == tag(w, 0)
    if w != w2:
        assert tag(w, unrelated) != tag(w2, unrelated)


# ---------------------------------------------------------------------------
# r16: inventory render/parse round-trips (the corrupt-committed-data
# guard's wire format — a parse that drifts from the render silently
# disables the guard or, worse, flags every healthy entry)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10**12), st.integers(0, 10**15))
def test_inventory_render_parse_roundtrip(files, nbytes):
    from dbfs_spark_cache_spark import fs

    assert fs.parse_inventory(fs.render_inventory(files, nbytes)) == (
        files,
        nbytes,
    )


@settings(max_examples=50, deadline=None)
@given(
    st.integers(0, 10**9),
    st.integers(0, 10**12),
    st.text(
        alphabet=st.characters(blacklist_characters="\r"),
        min_size=0,
        max_size=60,
    ),
)
def test_inventory_parse_survives_surrounding_marker_lines(files, nbytes, noise):
    """Markers embed the inventory among other lines (batch id line,
    quarantine count, fold ids=) — parsing must pick the files=/bytes=
    pair out of ANY surrounding non-inventory lines and must not crash
    on arbitrary noise."""
    from dbfs_spark_cache_spark import fs

    noise_line = noise.replace("\n", " ")
    if noise_line.strip().startswith(("files=", "bytes=")):
        noise_line = "x" + noise_line
    text = (
        f"batch 7 committed\n{noise_line}\n"
        + fs.render_inventory(files, nbytes)
        + "\nids=0,1,2"
    )
    assert fs.parse_inventory(text) == (files, nbytes)
    # no inventory lines at all -> None, never a crash
    assert fs.parse_inventory(f"batch 7 committed\n{noise_line}") is None
    assert fs.parse_inventory(None) is None
    assert fs.parse_inventory("") is None
    # a torn/garbled value -> None (skip the check), never a wrong pair
    assert fs.parse_inventory("files=12\nbytes=1e5") is None
