"""Harness honesty for scripts/hostile_probe.py lens builders.

A lens that silently drops the poison (or breaks the physical schema so
both engines read different files than intended) makes its "clean sweep"
vacuous — the probe would attest nothing. Each test builds the lens
fixture from sf0.001 and asserts (a) every table keeps its source
parquet schema byte-for-byte and (b) the poison is actually present.
Pure pyarrow/pandas — no SparkSession, fast.
"""
from __future__ import annotations

import glob
import os
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)
from hostile_probe import LENSES  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


def _schemas(sf: str) -> dict:
    out = {}
    for f in sorted(glob.glob(f"{sf}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        if os.path.isdir(f):  # the split lens emits part-file dirs
            f = sorted(glob.glob(f"{f}/*.parquet"))[0]
        out[name] = pq.read_schema(f)
    return out


SRC_SCHEMAS = None


@pytest.fixture(scope="module")
def src_schemas():
    return _schemas(SF_SMOKE)


@pytest.mark.parametrize("lens", sorted(LENSES))
def test_lens_preserves_physical_schema(lens, tmp_path, src_schemas):
    dst = str(tmp_path / lens)
    os.makedirs(dst, exist_ok=True)
    LENSES[lens](SF_SMOKE, dst)
    built = _schemas(dst)
    assert set(built) == set(src_schemas), f"{lens}: table set changed"
    for name, schema in built.items():
        if lens == "colperm":
            # this lens PERMUTES physical column order on purpose — the
            # honesty contract is field-set + per-field equality with
            # the order genuinely reversed (non-vacuity pinned below)
            assert set(schema.names) == set(src_schemas[name].names)
            for field in src_schemas[name]:
                assert schema.field(field.name).equals(field), (
                    f"colperm/{name}: column {field.name} drifted"
                )
            continue
        if lens == "evolve" and name in ("events", "documents"):
            # the evolve lens CHANGES schemas on purpose — its honesty
            # contract is below (test_evolve_lens_disagreeing_footers);
            # here only the original columns must survive intact
            for field in src_schemas[name]:
                assert schema.field(field.name).equals(field), (
                    f"evolve/{name}: original column {field.name} drifted"
                )
            continue
        assert schema.equals(src_schemas[name]), (
            f"{lens}/{name}: physical schema drifted — both engines would "
            "read a different shape than the registered queries expect"
        )


def _build(lens, tmp_path):
    dst = str(tmp_path / lens)
    os.makedirs(dst, exist_ok=True)
    LENSES[lens](SF_SMOKE, dst)
    return dst


def test_dup_lens_doubles_every_table(tmp_path):
    dst = _build("dup", tmp_path)
    for f in glob.glob(f"{SF_SMOKE}/*.parquet"):
        name = os.path.basename(f)
        assert (
            pq.read_table(f"{dst}/{name}").num_rows
            == 2 * pq.read_table(f).num_rows
        )


def test_empty_lens_zeroes_every_table(tmp_path):
    dst = _build("empty", tmp_path)
    for f in glob.glob(f"{dst}/*.parquet"):
        assert pq.read_table(f).num_rows == 0


def test_skew_lens_concentrates_keys(tmp_path):
    dst = _build("skew", tmp_path)
    ev = pd.read_parquet(f"{dst}/events.parquet")
    top = ev["user_id"].value_counts(normalize=True).iloc[0]
    assert top >= 0.5, f"hot user owns only {top:.0%} of events"
    li = pd.read_parquet(f"{dst}/lineitem.parquet")
    top_o = li["l_orderkey"].value_counts(normalize=True).iloc[0]
    assert top_o >= 0.5, f"hot order owns only {top_o:.0%} of lineitem"
    # the resequenced composite key stays unique
    assert not li.duplicated(["l_orderkey", "l_linenumber"]).any()


def test_width_lens_plants_degenerate_docs(tmp_path):
    dst = _build("width", tmp_path)
    docs = pd.read_parquet(f"{dst}/documents.parquet")
    texts = docs["text"].iloc[:9].tolist()
    assert texts[:3] == ["x"] * 3
    assert all(t == "a" * 4000 for t in texts[3:6])
    assert texts[6:9] == [""] * 3
    # n_chars stays consistent with the rewritten text
    assert (docs["n_chars"].iloc[:9] == docs["text"].iloc[:9].str.len()).all()


def test_dates_lens_plants_extreme_timestamps(tmp_path):
    dst = _build("dates", tmp_path)
    ev = pd.read_parquet(f"{dst}/events.parquet")
    assert ev["ts"].min() == pd.Timestamp("1900-01-01")
    assert ev["ts"].max() == pd.Timestamp("2200-06-15 23:59:59.999999")
    orders = pd.read_parquet(f"{dst}/orders.parquet")
    assert orders["o_orderdate"].min() == pd.Timestamp("1900-01-01")


def test_neg_lens_negates_ids(tmp_path):
    dst = _build("neg", tmp_path)
    docs = pd.read_parquet(f"{dst}/documents.parquet")
    assert (docs["doc_id"] <= 0).all()


def test_nulls_lens_nulls_payload_keeps_keys(tmp_path):
    dst = _build("nulls", tmp_path)
    docs = pd.read_parquet(f"{dst}/documents.parquet")
    assert docs["text"].iloc[:3].isna().all()
    assert docs["doc_id"].iloc[:3].notna().all()


def test_split_lens_reverses_and_splits(tmp_path):
    dst = _build("split", tmp_path)
    d = f"{dst}/documents.parquet"
    assert os.path.isdir(d) and len(glob.glob(f"{d}/*.parquet")) >= 4
    src_ids = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")["doc_id"]
    got_ids = pd.concat(
        [pd.read_parquet(p)["doc_id"] for p in sorted(glob.glob(f"{d}/*.parquet"))]
    )
    assert sorted(got_ids) == sorted(src_ids)


def test_lens_builders_survive_tiny_fixtures(tmp_path):
    """ADVICE r11 #4: build_nonfinite indexed base[0..2] unconditionally
    (IndexError on a <3-row embeddings table) where the other lenses
    guard with len >= 3. Every lens builder must pass a 2-row and a
    0-row copy of every table through WITHOUT crashing — tiny
    partitions and empty tables are both normal at 100 TB."""
    import pyarrow as pa

    for n_rows, tag in ((2, "tiny"), (0, "empty")):
        src = str(tmp_path / f"src_{tag}")
        os.makedirs(src, exist_ok=True)
        for f in sorted(glob.glob(f"{SF_SMOKE}/*.parquet")):
            t = pq.read_table(f)
            pq.write_table(
                t.slice(0, n_rows), os.path.join(src, os.path.basename(f))
            )
        for lens, build in LENSES.items():
            dst = str(tmp_path / f"{tag}_{lens}")
            os.makedirs(dst, exist_ok=True)
            build(src, dst)  # must not raise
            # and the output keeps the source schema (pass-through or
            # poisoned alike)
            for f in sorted(glob.glob(f"{dst}/*.parquet")):
                name = os.path.basename(f).replace(".parquet", "")
                if os.path.isdir(f):
                    f = sorted(glob.glob(f"{f}/*.parquet"))[0]
                got = pq.read_schema(f)
                want = pq.read_schema(os.path.join(src, f"{name}.parquet"))
                if lens == "colperm":  # permutes field order on purpose
                    assert sorted(got.names) == sorted(want.names)
                    assert all(
                        got.field(n).equals(want.field(n)) for n in got.names
                    ), f"colperm/{tag}: {name} field drifted"
                else:
                    assert got.equals(want), (
                        f"{lens}/{tag}: {name} schema drifted"
                    )


def test_evolve_lens_disagreeing_footers(tmp_path):
    """Evolve-lens honesty: events/documents become directories whose
    part files genuinely DISAGREE — even parts carry the added
    ingest_source column, odd parts keep the original schema, original
    columns present everywhere, all rows preserved."""
    dst = _build("evolve", tmp_path)
    for name in ("events", "documents"):
        parts = sorted(glob.glob(f"{dst}/{name}.parquet/part-*.parquet"))
        assert len(parts) >= 3, f"{name}: want >=3 part files"
        n_src = pq.read_table(f"{SF_SMOKE}/{name}.parquet").num_rows
        n_dst = 0
        for i, p in enumerate(parts):
            s = pq.read_schema(p)
            has_extra = "ingest_source" in s.names
            assert has_extra == (i % 2 == 0), f"{name} part {i}"
            n_dst += pq.read_table(p).num_rows
        assert n_dst == n_src, f"{name}: rows lost in the split"


def test_unicode_lens_plants_both_forms(tmp_path):
    """Unicode-lens honesty: the NFC and NFD twins are byte-distinct in
    the built fixture (a normalizing writer would silently collapse
    them and make the probe vacuous)."""
    import unicodedata

    dst = _build("unicode", tmp_path)
    docs = pd.read_parquet(f"{dst}/documents.parquet")
    t0, t3 = docs.loc[0, "text"], docs.loc[3, "text"]
    assert t0 != t3
    assert unicodedata.normalize("NFC", t3) == t0
    # the embedded NFD token survived inside a real document
    assert unicodedata.normalize("NFD", "café résumé naïve") in docs.loc[6, "text"]
    cust = pd.read_parquet(f"{dst}/customer.parquet")
    assert cust.loc[0, "c_mktsegment"] != cust.loc[1, "c_mktsegment"]
    assert unicodedata.normalize("NFC", cust.loc[1, "c_mktsegment"]) == cust.loc[
        0, "c_mktsegment"
    ]


def test_colperm_lens_reverses_column_order(tmp_path):
    """Colperm-lens honesty: the physical field order is genuinely
    reversed (a writer that normalizes order would make the by-name
    binding sweep vacuous) and values ride along unchanged."""
    dst = _build("colperm", tmp_path)
    for f in sorted(glob.glob(f"{SF_SMOKE}/*.parquet")):
        name = os.path.basename(f)
        src_names = pq.read_schema(f).names
        got_names = pq.read_schema(f"{dst}/{name}").names
        assert got_names == list(reversed(src_names)), name
    src = pd.read_parquet(f"{SF_SMOKE}/documents.parquet").sort_values("doc_id")
    got = pd.read_parquet(f"{dst}/documents.parquet").sort_values("doc_id")
    assert (src["text"].values == got["text"].values).all()


def test_conflict_lens_plants_conflicting_keys(tmp_path):
    """Conflict-lens honesty: the duplicated keys carry genuinely
    DIFFERENT payloads (identical payloads would degrade this into the
    existing 'dup' lens and attest nothing new)."""
    dst = _build("conflict", tmp_path)
    docs = pd.read_parquet(f"{dst}/documents.parquet")
    src = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    assert len(docs) == len(src) + 3
    for i in range(3):
        twin = docs[docs["doc_id"] == src.loc[i, "doc_id"]]
        assert len(twin) == 2 and twin["text"].nunique() == 2, i
    ev = pd.read_parquet(f"{dst}/events.parquet")
    src_ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    twin = ev[ev["event_id"] == src_ev.loc[0, "event_id"]]
    assert len(twin) == 2 and twin["value"].nunique() == 2


def test_ws_lens_plants_degenerate_whitespace(tmp_path):
    """Whitespace-lens honesty: the single-space doc and the doubled
    inner spaces survive the round-trip byte-exactly, and n_chars stays
    consistent with the rewritten text."""
    dst = _build("ws", tmp_path)
    docs = pd.read_parquet(f"{dst}/documents.parquet")
    assert docs.loc[4, "text"] == " "
    assert docs.loc[2, "text"] == "double  inner  spaces"
    assert docs.loc[3, "text"] == "tab\tseparated\ttokens"
    head = docs.iloc[:6]
    assert (head["n_chars"] == head["text"].str.len()).all()


def test_tz_lens_plants_dst_window_instants(tmp_path):
    from hostile_probe import build_tz

    dst = str(tmp_path / "tz")
    os.makedirs(dst, exist_ok=True)
    build_tz(SF_SMOKE, dst)
    ev = pd.read_parquet(f"{dst}/events.parquet")
    ts = set(ev["ts"].head(4))
    assert pd.Timestamp("2026-03-08 02:30:00") in ts  # US nonexistent
    assert pd.Timestamp("2026-11-01 01:30:00") in ts  # US ambiguous
    orders = pd.read_parquet(f"{dst}/orders.parquet")
    assert pd.Timestamp("2026-03-08") in set(orders["o_orderdate"].head(3))


def test_giant_lens_plants_giant_and_wrong_dim(tmp_path):
    from hostile_probe import build_giant

    dst = str(tmp_path / "giant")
    os.makedirs(dst, exist_ok=True)
    build_giant(SF_SMOKE, dst)
    docs = pd.read_parquet(f"{dst}/documents.parquet").set_index("doc_id")
    assert len(docs.loc[980001, "text"]) > 80_000
    assert " " not in docs.loc[980002, "text"]  # single token
    emb = pd.read_parquet(f"{dst}/embeddings.parquet").set_index("vec_id")
    dims = {i: len(emb.loc[i, "embedding"]) for i in (980001, 980002, 980003)}
    assert dims == {980001: 66, 980002: 6, 980003: 0}
    # every hostile component is FINITE — the shape nonfinite cannot see
    assert all(
        x == x and abs(x) != float("inf")
        for i in (980001, 980002)
        for x in emb.loc[i, "embedding"]
    )


def test_negzero_lens_plants_signed_zeros(tmp_path):
    """The -0.0 poison must SURVIVE the writer with its sign bit (the
    same nan_as_null class of silent laundering the nonfinite lens
    documents — numpy.signbit is the only honest check, since
    -0.0 == 0.0 compares true)."""
    import numpy as np

    from hostile_probe import build_negzero

    dst = str(tmp_path / "negzero")
    os.makedirs(dst, exist_ok=True)
    build_negzero(SF_SMOKE, dst)

    ev = pd.read_parquet(f"{dst}/events.parquet")
    tail = ev["value"].to_numpy()[-3:]
    assert list(np.signbit(tail)) == [True, False, True]
    assert list(tail) == [0.0, 0.0, 0.0]  # zeros, differing only in sign

    cust = pd.read_parquet(f"{dst}/customer.parquet")
    assert list(np.signbit(cust["c_acctbal"].to_numpy()[-3:])) == [
        True, False, True,
    ]

    emb = pd.read_parquet(f"{dst}/embeddings.parquet").set_index("vec_id")
    v1 = np.asarray(emb.loc[930001, "embedding"], dtype=float)
    assert np.signbit(v1[0]) and v1[0] == 0.0
    v2 = np.asarray(emb.loc[930002, "embedding"], dtype=float)
    assert (v2 == 0.0).all()
    assert list(np.signbit(v2[:4])) == [False, True, False, True]


def test_nulbyte_lens_plants_embedded_nuls(tmp_path):
    """The NUL poison must survive the writer byte-for-byte (a string
    path that truncates at NUL would silently shorten the payload and
    make the clean sweep vacuous)."""
    from hostile_probe import build_nulbyte

    dst = str(tmp_path / "nulbyte")
    os.makedirs(dst, exist_ok=True)
    build_nulbyte(SF_SMOKE, dst)

    docs = pd.read_parquet(f"{dst}/documents.parquet")
    tail = list(docs["text"].iloc[-3:])
    assert tail[0] == "alpha\x00bravo charlie delta echo"
    assert tail[1] == "\x00"
    assert tail[2] == "foxtrot \x00golf hotel"
    part = pd.read_parquet(f"{dst}/part.parquet")
    assert list(part["p_name"].iloc[-3:]) == [
        "widget\x00chrome", "gad\x00get", "\x00plain",
    ]


def test_ctrl_lens_plants_control_codepoints(tmp_path):
    """The r15 ctrl lens's poison must survive the writer byte-for-byte:
    VT/FF/CR/CRLF, NEL, LINE/PARAGRAPH SEPARATOR, NBSP, zero-width
    space, and an interior BOM — each a single codepoint the clean
    sweep certifies both engines treat identically (explicit character
    classes, codepoint-unit replacement, ASCII-space-only trim)."""
    from hostile_probe import build_ctrl

    dst = str(tmp_path / "ctrl")
    os.makedirs(dst, exist_ok=True)
    build_ctrl(SF_SMOKE, dst)

    docs = pd.read_parquet(f"{dst}/documents.parquet")
    tail = list(docs["text"].iloc[-4:])
    assert tail[0] == "alpha\x0bbravo charlie\fdelta echo"
    assert tail[1] == "line one\r\nline two\rline three"
    assert tail[2] == "nel\x85next   sep   end"
    assert tail[3] == "nb sp zw​split bom﻿mid"
    # n_chars honesty (the width lens' established rule)
    n_chars = list(docs["n_chars"].iloc[-4:])
    assert n_chars == [len(s) for s in tail]
    part = pd.read_parquet(f"{dst}/part.parquet")
    assert list(part["p_name"].iloc[-4:]) == [
        "widget\x0bchrome",
        "gad get",
        "zw​plain",
        "cr\rname",
    ]
    # fixture-invisibility: the REAL fixture carries none of these
    real = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    hostile = "\x0b\f\r\x85   ​﻿"
    assert not real["text"].str.contains(f"[{hostile}]", regex=True).any()


def test_intmax_lens_plants_bigint_extremes(tmp_path):
    """The int64-extreme keys must survive the writer exactly (a lossy
    double round-trip would render 9223372036854775808 and the sweep
    would certify the wrong value), and the real fixture must carry no
    such extremes (fixture-invisibility)."""
    from hostile_probe import build_intmax

    IMAX = (1 << 63) - 1
    dst = str(tmp_path / "intmax")
    os.makedirs(dst, exist_ok=True)
    build_intmax(SF_SMOKE, dst)

    docs = pd.read_parquet(f"{dst}/documents.parquet")
    assert list(docs["doc_id"].iloc[-2:]) == [IMAX, -IMAX]
    ev = pd.read_parquet(f"{dst}/events.parquet")
    assert list(ev["event_id"].iloc[-2:]) == [IMAX, -IMAX]
    assert int(ev["user_id"].iloc[-2]) == IMAX
    emb = pd.read_parquet(f"{dst}/embeddings.parquet")
    assert list(emb["vec_id"].iloc[-2:]) == [IMAX, -IMAX]

    real = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    assert real["doc_id"].abs().max() < 1 << 40


def test_astral_lens_plants_supplementary_codepoints(tmp_path):
    """The r17 astral lens's poison must be genuinely supplementary-plane
    (max codepoint > 0xFFFF — 4-byte UTF-8, surrogate PAIRS on the JVM)
    and survive the writer byte-for-byte; the real fixture must carry no
    astral codepoints at all (fixture-invisibility, so the clean sweep's
    attestations stay honest)."""
    from hostile_probe import build_astral

    dst = str(tmp_path / "astral")
    os.makedirs(dst, exist_ok=True)
    build_astral(SF_SMOKE, dst)

    docs = pd.read_parquet(f"{dst}/documents.parquet")
    planted = list(docs["text"].iloc[:6])
    assert all(max(map(ord, s)) > 0xFFFF for s in planted)
    # the Deseret case PAIR is present (astral case mapping probe)
    assert "\U00010437" in planted[1] and "\U0001040F" in planted[1]
    # spliced rows keep their original head (mid-document walk)
    assert planted[3].endswith(" tail")
    part = pd.read_parquet(f"{dst}/part.parquet")
    assert max(map(ord, part["p_name"].iloc[0])) > 0xFFFF
    cust = pd.read_parquet(f"{dst}/customer.parquet")
    assert cust["c_mktsegment"].iloc[0] == cust["c_mktsegment"].iloc[1]
    assert max(map(ord, cust["c_mktsegment"].iloc[0])) > 0xFFFF

    for name, col in (
        ("documents", "text"), ("part", "p_name"),
        ("customer", "c_mktsegment"), ("supplier", "s_name"),
        ("nation", "n_name"),
    ):
        real = pd.read_parquet(f"{SF_SMOKE}/{name}.parquet")
        assert not real[col].map(
            lambda s: isinstance(s, str) and bool(s) and max(map(ord, s)) > 0xFFFF
        ).any(), f"real fixture {name}.{col} already carries astral codepoints"


def test_orphan_lens_plants_referential_orphans(tmp_path):
    """The r17 orphan lens's ghost keys must be present, genuinely
    reference NO dimension row, and stay exactly-double-safe; the real
    fixture must be referentially INTACT (fixture-invisibility: a real
    orphan would make the clean sweep's attestations reflect poisoned
    semantics already present in real data)."""
    from hostile_probe import build_orphan

    dst = str(tmp_path / "orphan")
    os.makedirs(dst, exist_ok=True)
    build_orphan(SF_SMOKE, dst)

    GHOST = 10_000_019
    li = pd.read_parquet(f"{dst}/lineitem.parquet")
    od = pd.read_parquet(f"{dst}/orders.parquet")
    ev = pd.read_parquet(f"{dst}/events.parquet")
    cu = pd.read_parquet(f"{dst}/customer.parquet")
    pt = pd.read_parquet(f"{dst}/part.parquet")
    sp = pd.read_parquet(f"{dst}/supplier.parquet")

    assert GHOST in set(li["l_orderkey"]) and GHOST not in set(od["o_orderkey"])
    assert GHOST + 2 in set(li["l_partkey"]) and GHOST + 2 not in set(pt["p_partkey"])
    assert GHOST + 4 in set(li["l_suppkey"]) and GHOST + 4 not in set(sp["s_suppkey"])
    assert GHOST + 6 in set(od["o_custkey"]) and GHOST + 6 not in set(cu["c_custkey"])
    # the no-lineitem orphan order
    assert GHOST + 8 in set(od["o_orderkey"]) and GHOST + 8 not in set(li["l_orderkey"])
    assert GHOST + 12 in set(ev["user_id"])
    assert float(GHOST + 14) == GHOST + 14  # exact double rendering

    # real fixture referential integrity (the lens's honesty premise)
    rli = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    rod = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    rcu = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    rpt = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    rsp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    assert set(rli["l_orderkey"]) <= set(rod["o_orderkey"])
    assert set(rli["l_partkey"]) <= set(rpt["p_partkey"])
    assert set(rli["l_suppkey"]) <= set(rsp["s_suppkey"])
    assert set(rod["o_custkey"]) <= set(rcu["c_custkey"])


def test_rowgroup_lens_rewrites_layout_not_data(tmp_path):
    """The r18 rowgroup lens must change ONLY the physical parquet layout:
    logical data byte-identical to the source (so the exact value compare
    stays the right check), row groups genuinely tiny (a per-micro-batch
    streaming writer's shape), dictionary encoding off, and column
    statistics absent (no min/max for either engine to prune on)."""
    import pyarrow.parquet as pq

    from hostile_probe import build_rowgroup

    dst = str(tmp_path / "rowgroup")
    os.makedirs(dst, exist_ok=True)
    build_rowgroup(SF_SMOKE, dst)

    for name in ("lineitem", "documents", "nation"):
        src_t = pq.read_table(f"{SF_SMOKE}/{name}.parquet")
        dst_t = pq.read_table(f"{dst}/{name}.parquet")
        assert dst_t.equals(src_t), f"{name}: lens altered logical data"

        meta = pq.ParquetFile(f"{dst}/{name}.parquet").metadata
        expect_groups = -(-meta.num_rows // 7)  # ceil(rows / 7)
        assert meta.num_row_groups == max(expect_groups, 1), (
            f"{name}: row groups not tiny ({meta.num_row_groups})"
        )
        col0 = meta.row_group(0).column(0)
        assert "PLAIN_DICTIONARY" not in str(col0.encodings)
        assert not col0.is_stats_set, f"{name}: statistics still written"
