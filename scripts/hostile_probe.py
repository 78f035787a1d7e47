#!/usr/bin/env python
"""Two-engine hostile-input probe: rebuild the sf0.001 fixture under a
named LENS (a production failure shape), run every registered query on
Spark AND its DuckDB oracle over the SAME poisoned files, and report
divergences/crashes. The r9/r10 rounds ran these as ad-hoc scripts; this
is the checked-in harness so each round's new lens is one function.

Lenses:
  dup    — at-least-once duplication: every row of every table exactly
           duplicated (log replay / retried ingestion). Full-row
           duplicates keep output multisets well-defined, so the value
           compare stays valid while distinct/dedup/rank/keeper
           semantics get stressed. (r10: found 5 — 145/150 held.)
  ties   — maximal ties: every orderable measure constant (values,
           timestamps, prices, dates; all embeddings identical). Any
           window/rank/top-k whose sort order is not TOTAL may diverge;
           a clean sweep proves the tiebreak discipline is corpus-wide.
           (r10: 150/150 held.)

Usage: python scripts/hostile_probe.py --lens dup [--only a,b] [--sf DIR]
Exit 1 if any probed query diverges or crashes.

Findings are fixture-invisible by construction (the real fixtures carry
none of these shapes — verified per-lens in the premeasure tests), so a
finding is QUEUED for the target query's next due rotation slot, never
fixed off-slot: see the capacity policy in __spark_entry__.py.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
# oracle replay needs the md5-portable hash family
os.environ.setdefault("SPARK_GRAFT_HASH_FAMILY", "portable")


def build_dup(src: str, dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        t = pq.read_table(f)
        pq.write_table(
            pa.concat_tables([t, t]), f"{dst}/{os.path.basename(f)}"
        )


def build_rowgroup(src: str, dst: str) -> None:
    """Hostile PHYSICAL layout, identical logical data (r18 — 25th lens):
    every table rewritten with tiny row groups (7 rows — a streaming
    writer that flushes per-micro-batch produces exactly this shape),
    dictionary encoding disabled, tiny data pages, and no column
    statistics. Results must be invariant under parquet layout — this
    stresses the row-group boundary handling, non-dictionary decode
    paths, and the stats-absent planning path (Spark can't prune or
    short-circuit on min/max; DuckDB can't use zone maps) on BOTH
    engines. Any divergence is a reader bug, not a data property; the
    value compare stays exact because the bytes decoded are the same."""
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        t = pq.read_table(f)
        pq.write_table(
            t,
            f"{dst}/{os.path.basename(f)}",
            row_group_size=7,
            use_dictionary=False,
            data_page_size=256,
            write_statistics=False,
        )


def build_ties(src: str, dst: str) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    const = {
        "events": {"value": 7.0, "ts": pd.Timestamp("2024-06-01 12:00:00")},
        "customer": {"c_acctbal": 1234.56},
        "orders": {
            "o_totalprice": 100000.0,
            "o_orderdate": pd.Timestamp("1995-06-01"),
        },
        "lineitem": {"l_extendedprice": 1000.0, "l_quantity": 25.0},
        "part": {"p_retailprice": 900.0},
    }
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        for col, v in const.get(name, {}).items():
            if col in pdf.columns and len(pdf):
                pdf[col] = (
                    v
                    if pd.api.types.is_datetime64_any_dtype(pdf[col])
                    else type(pdf[col].iloc[0])(v)
                )
        if name == "embeddings" and len(pdf):
            one = np.array(pdf["embedding"].iloc[0], dtype="float32")
            pdf["embedding"] = [one] * len(pdf)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_one(src: str, dst: str) -> None:
    """Single-row tables: every table truncated to its FIRST row — the
    degenerate-population shape (one customer, one document, one event).
    Stresses N=1 window math (percent_rank's (rank-1)/(N-1) is 0/0),
    single-vector ANN, one-doc LSH, groups of one."""
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.slice(0, 1), f"{dst}/{os.path.basename(f)}")


def build_neg(src: str, dst: str) -> None:
    """Negated identifiers (doc_id/vec_id/user_id/event_id) plus negated
    events.value on even rows: key semantics are sign-free (joins,
    groups, MIN-keeper elections all transpose consistently), so any
    divergence is sign-SENSITIVE arithmetic — a pmod-vs-% mismatch, a
    FLOOR division, a hash of a negative rendering."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    neg_cols = {"doc_id", "vec_id", "user_id", "event_id"}
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        for col in pdf.columns:
            if col in neg_cols:
                pdf[col] = -pdf[col]
        if name == "events" and len(pdf):
            even = pdf["event_id"] % 2 == 0
            pdf.loc[even, "value"] = -pdf.loc[even, "value"]
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_split(src: str, dst: str) -> None:
    """Reversed row order, split into 4 part files per table: storage
    layout is not a semantic input, so any divergence is a hidden
    dependence on file/row order (implicit 'first row' keepers, ranks
    without total orders, positional assumptions)."""
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f)
        t = pq.read_table(f)
        # take([]) infers a null-typed index array and raises; an empty
        # table is already "reversed"
        rev = t if t.num_rows == 0 else t.take(list(range(t.num_rows - 1, -1, -1)))
        outdir = f"{dst}/{name}"
        os.makedirs(outdir, exist_ok=True)
        n = max(1, t.num_rows // 4)
        part = 0
        for off in range(0, max(t.num_rows, 1), n):
            pq.write_table(
                rev.slice(off, n), f"{outdir}/part-{part:02d}.parquet"
            )
            part += 1


_KEY_COLS = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey"},
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey"},
    "lineitem": {"l_orderkey", "l_linenumber"},
    "events": {"event_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def build_nulls(src: str, dst: str) -> None:
    """Every NON-KEY column NULL in the first 3 rows of every table —
    the broad at-least-once-ingestion / schema-evolution shape (a
    malformed record keeps its key, loses its payload). Wider than the
    r9 targeted NULL lens (which poisoned keys/text): NULL dates, FKs,
    categorical grouping columns and measures all at once. Types are
    preserved via pyarrow (pandas would float-ify NULLed int columns,
    changing the physical schema both engines read)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        keep = _KEY_COLS.get(name, set())
        n = t.num_rows
        mask = pa.array([i < 3 for i in range(n)], type=pa.bool_())
        cols = []
        for field in t.schema:
            col = t.column(field.name).combine_chunks()
            if field.name not in keep and n:
                col = pc.if_else(mask, pa.nulls(n, type=field.type), col)
            cols.append(col)
        pq.write_table(
            pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet"
        )


def build_skew(src: str, dst: str) -> None:
    """Extreme key skew (r11 lens): ONE user owns 50% of events, ONE
    order carries 50% of lineitem rows (line numbers resequenced to keep
    the (l_orderkey, l_linenumber) key unique), ONE token dominates half
    of every even document's text. Joins/windows keyed on user_id or
    o_orderkey now have a genuinely hot key — the shape salting, AQE
    skew-join and the banded-window claims exist for. Results must stay
    engine-equal: skew is a PHYSICAL hazard, not a semantic one."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        half = len(pdf) // 2
        if name == "events" and len(pdf):
            hot = pdf["user_id"].iloc[0]
            pdf.loc[: half - 1, "user_id"] = hot
        elif name == "lineitem" and len(pdf):
            hot = pdf["l_orderkey"].iloc[0]
            pdf.loc[: half - 1, "l_orderkey"] = hot
            # resequence so the composite key stays unique
            pdf["l_linenumber"] = (
                pdf.groupby("l_orderkey").cumcount() + 1
            ).astype(pdf["l_linenumber"].dtype)
        elif name == "documents" and len(pdf):
            even = pdf.index % 2 == 0
            pdf.loc[even, "text"] = pdf.loc[even, "text"].map(
                lambda s: "hotword " * 10 + str(s) if isinstance(s, str) else s
            )
            pdf["n_chars"] = pdf["text"].str.len().astype(pdf["n_chars"].dtype)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_width(src: str, dst: str) -> None:
    """Degenerate text widths (r11 lens): among the first nine documents
    — three 1-CHAR documents (shingle window shorter than k: a 3-token
    shingler sees one token, a 5-gram window outruns the text), three
    SINGLE-TOKEN 4000-char documents (token sets of size 1, maximal
    per-token width through every split/explode), three EMPTY-STRING
    documents (split('') is [''], n_tokens 1 with an empty token — the
    trim/strip edge). MinHash signatures become constant vectors (one
    shingle), so LSH bands collide maximally among the degenerates —
    candidate handling must stay exact, never crash or diverge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        if name != "documents":
            pq.write_table(t, f"{dst}/{name}.parquet")
            continue
        pdf = t.to_pandas()
        if len(pdf) >= 9:
            for i in range(3):
                pdf.loc[i, "text"] = "x"
            for i in range(3, 6):
                pdf.loc[i, "text"] = "a" * 4000
            for i in range(6, 9):
                pdf.loc[i, "text"] = ""
            pdf["n_chars"] = pdf["text"].str.len().astype(pdf["n_chars"].dtype)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_empty(src: str, dst: str) -> None:
    """Zero-row twin of EVERY table (r11 lens): the 'no data arrived for
    this partition/day' production shape, registry-wide. The r9 zero-row
    probe targeted the grouping trio; this sweeps all 150. Global
    aggregates emit their one empty-input row on both engines; grouped
    shapes emit nothing; the grouping-set grand-total alignment (r11
    HAVING fix) is exactly the class this lens pins corpus-wide."""
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        pq.write_table(
            pq.read_schema(f).empty_table(), f"{dst}/{os.path.basename(f)}"
        )


def build_dates(src: str, dst: str) -> None:
    """Extreme timestamps (r11 lens): the corrupt-telemetry shape — a
    device clock reset to 1900, a pre-epoch straggler with maximal
    microseconds, a far-future (2200) event, plus matching extreme order
    dates. All values are inside BOTH engines' timestamp ranges, so any
    divergence is semantic (week-of-year / truncation / interval /
    window-bucket math on negative epochs), not overflow noise."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    extreme_ts = [
        pd.Timestamp("1900-01-01 00:00:00"),
        pd.Timestamp("1969-07-20 20:17:40.999999"),
        pd.Timestamp("2200-06-15 23:59:59.999999"),
    ]
    extreme_dates = [
        pd.Timestamp("1900-01-01"),
        pd.Timestamp("1969-12-31"),
        pd.Timestamp("2199-12-31"),
    ]
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        if name == "events" and len(pdf) >= 3:
            for i, ts in enumerate(extreme_ts):
                pdf.loc[i, "ts"] = ts
        elif name == "orders" and len(pdf) >= 3:
            for i, d in enumerate(extreme_dates):
                pdf.loc[i, "o_orderdate"] = d
        elif name == "lineitem" and len(pdf) >= 3:
            for i, d in enumerate(extreme_dates):
                pdf.loc[i, "l_shipdate"] = d
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_nonfinite(src: str, dst: str) -> None:
    """TRUE NaN / ±Infinity telemetry (r11 lens): three hostile rows in
    events.value and customer.c_acctbal, plus one NaN-element, one
    Inf-element and one NULL-element embedding vector. Columns are built
    with DIRECT pyarrow arrays — the pandas round-trip the r9 lens used
    silently converts float NaN to parquet NULL (nan_as_null), so that
    lens never actually tested NaN; a non-pandas writer (Spark itself,
    Arrow-native producers) emits real NaN storage. Scope matches the
    bad-telemetry story: sensor values, account balances, model-output
    embeddings — NOT the TPC-H ledger prices (a NaN price is upstream
    corruption no engine should paper over)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    poison = {
        ("events", "value", "event_id"): [math.nan, math.inf, -math.inf],
        ("customer", "c_acctbal", "c_custkey"): [math.nan, math.inf, -math.inf],
    }
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        hit = [k for k in poison if k[0] == name]
        # guard like the other lenses' len(pdf) >= 3 checks: the poison
        # rows clone base[0..2] / take max(key), so a tiny or empty
        # fixture passes through unpoisoned instead of IndexError-ing
        if name == "embeddings" and t.num_rows >= 3:
            cols = []
            for field in t.schema:
                base = t.column(field.name).combine_chunks().to_pylist()
                if field.name == "vec_id":
                    base = base + [920001, 920002, 920003]
                elif field.name == "embedding":
                    nan_vec = [float(x) for x in base[0]]; nan_vec[0] = math.nan
                    inf_vec = [float(x) for x in base[1]]; inf_vec[0] = math.inf
                    null_vec = [float(x) for x in base[2]]; null_vec[0] = None
                    base = base + [nan_vec, inf_vec, null_vec]
                else:
                    base = base + base[:3]
                cols.append(pa.array(base, type=field.type))
            pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet")
        elif hit and t.num_rows >= 3:
            (_, vcol, kcol) = hit[0]
            vals = poison[hit[0]]
            cols = []
            for field in t.schema:
                base = t.column(field.name).combine_chunks().to_pylist()
                if field.name == vcol:
                    base = base + vals
                elif field.name == kcol:
                    mx = max(base)
                    base = base + [mx + 1, mx + 2, mx + 3]
                else:
                    base = base + base[:3]
                cols.append(pa.array(base, type=field.type))
            pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet")
        else:
            pq.write_table(t, f"{dst}/{name}.parquet")


def build_nulbyte(src: str, dst: str) -> None:
    """Embedded NUL bytes (U+0000) in string payloads (r14 lens #20):
    parquet strings legally carry NUL, and C-heritage string paths
    truncate at it while length-prefixed paths don't — the classic
    silent-divergence shape between a JVM engine and a C++ engine.
    Plants: a token with an interior NUL, a document that is ONLY a
    NUL, a NUL directly adjacent to the tokenizer's space delimiter,
    and a part name with an interior NUL (the fn_string surface).
    Keys are fresh; all other columns clone base rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    doc_texts = [
        "alpha\x00bravo charlie delta echo",   # NUL inside a token
        "\x00",                                 # the document IS a NUL
        "foxtrot \x00golf hotel",               # NUL at a token boundary
    ]
    poison = {
        ("documents", "text", "doc_id"): doc_texts,
        ("part", "p_name", "p_partkey"): [
            "widget\x00chrome", "gad\x00get", "\x00plain",
        ],
    }
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        hit = [k for k in poison if k[0] == name]
        if hit and t.num_rows >= 3:
            (_, vcol, kcol) = hit[0]
            vals = poison[hit[0]]
            cols = []
            for field in t.schema:
                base = t.column(field.name).combine_chunks().to_pylist()
                if field.name == vcol:
                    base = base + vals
                elif field.name == kcol:
                    mx = max(base)
                    base = base + [mx + 1, mx + 2, mx + 3]
                else:
                    base = base + base[:3]
                cols.append(pa.array(base, type=field.type))
            pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet")
        else:
            pq.write_table(t, f"{dst}/{name}.parquet")


def build_ctrl(src: str, dst: str) -> None:
    """Control / zero-width / exotic-space characters (r15 lens #21):
    the whitespace-adjacent codepoints the ws lens (ASCII space/tab
    only) never planted — vertical tab \\x0B, form feed, CRLF, NEL
    U+0085, LINE/PARAGRAPH SEPARATOR U+2028/U+2029, NBSP U+00A0,
    zero-width space U+200B, and an interior BOM U+FEFF. The hazard
    classes: regex whitespace shorthands differ per engine (Java \\s
    includes \\x0B, RE2's does not — the repo's explicit
    ``[ \\t\\n\\x0B\\f\\r]`` discipline exists precisely for this),
    character-class replacement must treat a multi-byte codepoint as
    ONE unit (UTF-16 Java vs UTF-8 RE2), trim must strip ASCII space
    only on both engines, and tokenizers split on ' ' alone so every
    one of these must stay INSIDE its token identically. Planted as
    appended fresh-key rows in documents.text and part.p_name (the
    fn_string surface); other columns clone base rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    doc_texts = [
        "alpha\x0bbravo charlie\fdelta echo",  # VT + FF inside tokens
        "line one\r\nline two\rline three",  # CRLF / bare CR
        "nel\x85next \u2028 sep \u2029 end",  # NEL + LS/PS
        "nb\u00a0sp zw\u200bsplit bom\ufeffmid",  # NBSP + ZWSP + BOM
    ]
    poison = {
        ("documents", "text", "doc_id"): doc_texts,
        ("part", "p_name", "p_partkey"): [
            "widget\x0bchrome",
            "gad\u00a0get",
            "zw\u200bplain",
            "cr\rname",
        ],
    }
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        hit = [k for k in poison if k[0] == name]
        if hit and t.num_rows >= len(poison[hit[0]]):
            (_, vcol, kcol) = hit[0]
            vals = poison[hit[0]]
            k = len(vals)
            cols = []
            for field in t.schema:
                base = t.column(field.name).combine_chunks().to_pylist()
                if field.name == vcol:
                    base = base + vals
                elif field.name == kcol:
                    mx = max(base)
                    base = base + [mx + 1 + i for i in range(k)]
                elif field.name == "n_chars" and name == "documents":
                    base = base + [len(s) for s in vals]
                else:
                    base = base + base[:k]
                cols.append(pa.array(base, type=field.type))
            pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet")
        else:
            pq.write_table(t, f"{dst}/{name}.parquet")


def build_intmax(src: str, dst: str) -> None:
    """int64-extreme identifiers (r15 lens #22): fresh rows whose keys sit
    at the edges of BIGINT — ``2^63-1`` and ``-(2^63-1)`` — in
    documents.doc_id, events.event_id/user_id and embeddings.vec_id.
    Key semantics are magnitude-free (joins, groups, MIN-keeper
    elections, string-hash shard assignment all transpose), so any
    divergence is magnitude-SENSITIVE arithmetic: an ANSI overflow on a
    derived id (``id + 1``, ``abs(id)``, ``id * k``) that a hugeint
    engine silently absorbs, a C-vs-floored modulo on the negative
    extreme (the neg lens's class at the boundary where ``abs`` itself
    overflows), an int64 id round-tripped through DOUBLE (2^63-1 is not
    representable — a lossy cast renders 9223372036854775808), or a
    text render disagreeing at the extremes. The repo's id discipline is
    string-hash (md5 of the DECIMAL-exact rendering) + pmod, so the
    expected result is a clean certification sweep; any red is a new
    defect class. Payload columns clone base rows; n_chars stays
    honest by cloning with its text."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    IMAX = (1 << 63) - 1
    IMIN1 = -IMAX  # LONG_MIN+1: negation stays in range on both engines
    poison_keys = {
        "documents": "doc_id",
        "events": "event_id",
        "embeddings": "vec_id",
    }
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        kcol = poison_keys.get(name)
        if kcol and t.num_rows >= 2:
            cols = []
            for field in t.schema:
                base = t.column(field.name).combine_chunks().to_pylist()
                if field.name == kcol:
                    base = base + [IMAX, IMIN1]
                elif name == "events" and field.name == "user_id":
                    # one extreme grouping key rides along on the IMAX row
                    base = base + [IMAX, base[1]]
                else:
                    base = base + base[:2]
                cols.append(pa.array(base, type=field.type))
            pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet")
        else:
            pq.write_table(t, f"{dst}/{name}.parquet")


def build_negzero(src: str, dst: str) -> None:
    """IEEE negative zero (r14 lens): plant BOTH -0.0 and +0.0 in
    events.value and customer.c_acctbal (fresh keys), plus an embedding
    whose first element is -0.0 and one that is all signed zeros. The
    shapes this hunts: MIN/MAX over a column containing both zeros can
    legally return either bit pattern (IEEE says they compare equal, so
    the survivor is implementation order — a cross-engine coin flip the
    render layer DOES distinguish: canonical_cell prints '-0.0' vs
    '0.0'); double group keys would split/merge groups if an engine
    fails to normalize; sign-bit LSH uses >= 0 comparisons, where -0.0
    must count positive identically on both engines. Like nonfinite,
    the columns are written with DIRECT pyarrow arrays so the sign bit
    survives the writer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    poison = {
        ("events", "value", "event_id"): [-0.0, 0.0, -0.0],
        ("customer", "c_acctbal", "c_custkey"): [-0.0, 0.0, -0.0],
    }
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        hit = [k for k in poison if k[0] == name]
        if name == "embeddings" and t.num_rows >= 3:
            cols = []
            for field in t.schema:
                base = t.column(field.name).combine_chunks().to_pylist()
                if field.name == "vec_id":
                    base = base + [930001, 930002]
                elif field.name == "embedding":
                    nz_vec = [float(x) for x in base[0]]
                    nz_vec[0] = -0.0
                    zeros = [-0.0 if i % 2 else 0.0 for i in range(len(base[1]))]
                    base = base + [nz_vec, zeros]
                else:
                    base = base + base[:2]
                cols.append(pa.array(base, type=field.type))
            pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet")
        elif hit and t.num_rows >= 3:
            (_, vcol, kcol) = hit[0]
            vals = poison[hit[0]]
            cols = []
            for field in t.schema:
                base = t.column(field.name).combine_chunks().to_pylist()
                if field.name == vcol:
                    base = base + vals
                elif field.name == kcol:
                    mx = max(base)
                    base = base + [mx + 1, mx + 2, mx + 3]
                else:
                    base = base + base[:3]
                cols.append(pa.array(base, type=field.type))
            pq.write_table(pa.table(cols, schema=t.schema), f"{dst}/{name}.parquet")
        else:
            pq.write_table(t, f"{dst}/{name}.parquet")


def build_unicode(src: str, dst: str) -> None:
    """Unicode normalization forms (r12 lens): the same text planted
    composed (NFC) and decomposed (NFD, e.g. e + U+0301) — equal to a
    human, unequal to a byte-hash. Neither engine normalizes, so parity
    requires every string operation along the way (case folding, regex
    classes, substr windows, md5/h62 keys, shingles, group-by hashing)
    to treat the two forms CONSISTENTLY on both engines; any hidden
    normalization or form-sensitive fold on one side diverges. Poisons
    the text-bearing columns: documents.text (standalone NFC/NFD twins
    AND an NFD token embedded mid-document to stress shingling),
    part.p_name, customer.c_mktsegment (a grouping key),
    supplier.s_name (rides the JSON/CSV connector round-trip), and
    nation.n_name (collected/sorted aggregates)."""
    import unicodedata

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = [
        "café résumé naïve",
        "Ångström señor Über",
        "Zürich crème brûlée",
    ]
    nfc = [unicodedata.normalize("NFC", s) for s in base]
    nfd = [unicodedata.normalize("NFD", s) for s in base]
    assert all(c != d for c, d in zip(nfc, nfd))  # genuinely distinct bytes

    def poison(pdf, col, rows_vals):
        for i, v in rows_vals:
            if i < len(pdf):
                pdf.loc[i, col] = v

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        if name == "documents" and len(pdf) >= 9:
            poison(pdf, "text", list(enumerate(nfc)))
            poison(pdf, "text", [(3 + i, s) for i, s in enumerate(nfd)])
            # NFD token spliced into real text: shingle windows now
            # cross combining marks
            for k in range(3):
                poison(
                    pdf,
                    "text",
                    [(6 + k, f"{pdf.loc[6 + k, 'text']} {nfd[k]}")],
                )
        elif name == "part":
            poison(pdf, "p_name", [(0, nfc[0]), (1, nfd[0])])
        elif name == "customer":
            poison(
                pdf,
                "c_mktsegment",
                [(0, "CAFÉ"), (1, "CAFÉ")],  # NFC vs NFD group keys
            )
        elif name == "supplier":
            poison(pdf, "s_name", [(0, nfc[1]), (1, nfd[1])])
        elif name == "nation":
            poison(pdf, "n_name", [(0, nfc[2]), (1, nfd[2])])
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_evolve(src: str, dst: str) -> None:
    """Schema-evolution layout (r12 lens): events and documents become
    DIRECTORIES of part files whose schemas DISAGREE — parts 00 and 02
    carry an added trailing ``ingest_source`` string column, part 01
    keeps the original schema. This is the 100 TB reality every
    long-lived corpus directory converges to (a column added mid-year);
    the queried ORIGINAL columns are present in every file, so a
    correct reader pair must agree on every registered query. The
    evolved schema leads the listing (part-00) so footer-based
    inference sees the union deterministically; readers that union by
    name backfill NULL for part 01's missing column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    evolve = {"events", "documents"}
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f)
        t = pq.read_table(f)
        if name.replace(".parquet", "") not in evolve or t.num_rows < 3:
            pq.write_table(t, f"{dst}/{name}")
            continue
        outdir = f"{dst}/{name}"
        os.makedirs(outdir, exist_ok=True)
        n = max(1, t.num_rows // 3)
        for part, off in enumerate(range(0, t.num_rows, n)):
            chunk = t.slice(off, n)
            if part % 2 == 0:  # parts 00, 02, ... evolved; 01 original
                chunk = chunk.append_column(
                    "ingest_source",
                    pa.array(["backfill-2026"] * chunk.num_rows, pa.string()),
                )
            pq.write_table(chunk, f"{outdir}/part-{part:02d}.parquet")


def build_conflict(src: str, dst: str) -> None:
    """Conflicting-duplicate-key lens (r12): the first three documents
    and events reappear with the SAME primary key but a DIFFERENT
    payload — the upstream-corruption twin of the r10 'dup' lens (which
    models at-least-once redelivery with identical payloads). Overlapping
    id ranges from two shards are a real 100 TB failure; a clean sweep
    proves no operator resolves such a conflict by file/row position
    (every keeper/rank/first decision carries a content- or key-complete
    total order on BOTH engines)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    numeric_twist = {
        "events": ("value", 1000.0),
        "customer": ("c_acctbal", 1000.0),
        "orders": ("o_totalprice", 1000.0),
        "part": ("p_retailprice", 50.0),
        "supplier": ("s_acctbal", 1000.0),
    }
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        if name == "documents" and len(pdf) >= 3:
            extra = pdf.iloc[:3].copy()
            extra["text"] = [
                "conflicting payload one",
                "conflicting payload two",
                "conflicting payload three",
            ]
            pdf = pd.concat([pdf, extra], ignore_index=True)
        elif name in numeric_twist and len(pdf) >= 3:
            col, delta = numeric_twist[name]
            extra = pdf.iloc[:3].copy()
            extra[col] = extra[col] + delta
            pdf = pd.concat([pdf, extra], ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_whitespace(src: str, dst: str) -> None:
    """Degenerate whitespace (r12 lens): leading / trailing / doubled
    spaces, tab-separated tokens, and a single-space document. The
    single-space split(' ') yields TWO empty-string tokens on both
    engines; every tokenizer, shingler, quality metric, and md5-keyed
    dedup path must treat empty tokens and whitespace runs identically
    on both engines — the classic tokenizer edge at web-corpus scale.
    n_chars is kept consistent with the rewritten text (the width lens'
    established honesty rule)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ws = [
        "  leading double space",
        "trailing space ",
        "double  inner  spaces",
        "tab\tseparated\ttokens",
        " ",
        "a  ",
    ]
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        if name == "documents" and len(pdf) >= len(ws):
            for i, s in enumerate(ws):
                pdf.loc[i, "text"] = s
                if "n_chars" in pdf.columns:
                    pdf.loc[i, "n_chars"] = len(s)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_colperm(src: str, dst: str) -> None:
    """Physical column-order permutation (r12 lens): every table is
    rewritten with its columns REVERSED — values untouched. Different
    writers (and different pipeline versions) emit different physical
    column orders into the same directory at 100 TB; any operator or
    oracle that binds columns POSITIONALLY instead of by name silently
    reads the wrong field. A clean sweep proves corpus-wide by-name
    binding on both engines."""
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        t = pq.read_table(f)
        rev = t.select(list(reversed(t.schema.names)))
        pq.write_table(rev, f"{dst}/{os.path.basename(f)}")


def build_tz(src: str, dst: str) -> None:
    """DST-hostile wall-clock instants (r13 lens): event timestamps and
    order/ship dates planted exactly inside daylight-saving transition
    windows — 2026-03-08 02:30 (nonexistent local time in US zones:
    clocks jump 02:00->03:00), 2026-11-01 01:30 (ambiguous: occurs
    twice), 2026-03-29 02:30 (EU spring-forward), plus the transition
    midnights as dates. The fixtures store NAIVE timestamps and both
    engines run session-pinned UTC, so every one of these instants is a
    perfectly ordinary microsecond value — ANY divergence means a
    local-time conversion (to_unix/from_unix via host zone, a
    zone-aware bucket) crept into a query or the normalize path. The
    session-timezone-change half of the probe (same data, non-UTC
    session) is pinned in tests/test_r13_tz_giant_lenses.py — a lens
    build can only poison FILES, not the session."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    hostile_ts = [
        pd.Timestamp("2026-03-08 02:30:00"),        # US nonexistent
        pd.Timestamp("2026-11-01 01:30:00"),        # US ambiguous
        pd.Timestamp("2026-03-29 02:30:00.500000"), # EU nonexistent
        pd.Timestamp("2026-10-25 02:59:59.999999"), # EU ambiguous edge
    ]
    hostile_dates = [
        pd.Timestamp("2026-03-08"),
        pd.Timestamp("2026-11-01"),
        pd.Timestamp("2026-03-29"),
    ]
    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        if name == "events" and len(pdf) >= len(hostile_ts):
            for i, ts in enumerate(hostile_ts):
                pdf.loc[i, "ts"] = ts
        elif name == "orders" and len(pdf) >= len(hostile_dates):
            for i, d in enumerate(hostile_dates):
                pdf.loc[i, "o_orderdate"] = d
        elif name == "lineitem" and len(pdf) >= len(hostile_dates):
            for i, d in enumerate(hostile_dates):
                pdf.loc[i, "l_shipdate"] = d
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_giant(src: str, dst: str) -> None:
    """Giant rows + corrupt vector dimensions (r13 lens — the two shapes
    a 100 TB corpus ships daily that sf-fixtures never do):

    documents — one ~90 kB document (a sentence repeated 2k times with
    a unique tail, the concatenated-crawl-page shape; ~160x the largest
    fixture doc) and one ~50 kB SINGLE-TOKEN document (minified JS /
    base64 blob: no whitespace at all), stressing shingle/chunk/token
    shapes and the empty/degenerate-token discipline at sizes the
    fixtures never reach. Sizes are calibrated to what the DuckDB
    oracle replay can grind through 150 times (the first cut used a
    2 MB doc: ~400k tokens x 32 minhash permutations = ~13M md5 calls
    PER shingle-replaying oracle — a >1 h sweep that proves nothing
    90 kB doesn't); the true multi-MB memory probe is Spark-side only,
    in tests/test_r13_tz_giant_lenses.py.

    embeddings — three FINITE but wrong-dimension vectors: one LONGER
    than the corpus dim (66), one truncated (6), one empty ([]). The
    nonfinite lens cannot see these: every component is a perfectly
    healthy float. They stress (a) Spark's ANSI ``element_at`` OOB
    crash vs DuckDB's NULL on ``embedding[7]``, and (b) ``zip_with``
    NULL-padding on length mismatch (Spark's fold NULL-propagates,
    DuckDB's list_sum skips) — one corrupt vector either kills a whole
    corpus pass or conjures pairs on exactly one engine.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        if name == "documents":
            pdf = t.to_pandas()
            giant = ("the quick brown fox jumps over the lazy dog " * 2000
                     + "UNIQUE_GIANT_TAIL_980001")
            blob = "x" * 50_000  # one token, zero whitespace
            extra = pd.DataFrame(
                [
                    {"doc_id": 980001, "text": giant, "lang": "en",
                     "source": "giant", "n_chars": len(giant)},
                    {"doc_id": 980002, "text": blob, "lang": "en",
                     "source": "giant", "n_chars": len(blob)},
                ]
            )
            t = pa.concat_tables(
                [t, pa.Table.from_pandas(extra, schema=t.schema,
                                         preserve_index=False)]
            )
        elif name == "embeddings":
            emb_type = t.schema.field("embedding").type
            lab_type = t.schema.field("label").type
            extra = pa.table(
                {
                    "vec_id": pa.array([980001, 980002, 980003],
                                       type=pa.int64()),
                    "embedding": pa.array(
                        [[0.25 * ((i % 7) - 3) for i in range(66)],
                         [0.5, -0.25, 0.75, -0.5, 0.25, -0.75],
                         []],
                        type=emb_type,
                    ),
                    "label": pa.array([0, 0, 0], type=lab_type),
                },
                schema=t.schema,
            )
            t = pa.concat_tables([t, extra])
        pq.write_table(t, f"{dst}/{name}.parquet")


def build_astral(src: str, dst: str) -> None:
    """Astral-plane Unicode (r17 lens): supplementary codepoints (4-byte
    UTF-8, UTF-16 surrogate PAIRS on the JVM) planted in every
    text-bearing column. The divergence class this targets is
    code-unit-vs-code-point arithmetic: Java strings are UTF-16, so any
    length/substr/regex/case operation that counts code UNITS sees two
    where DuckDB's utf8proc sees one. Probes: grapheme-cluster emoji
    with ZWJ joiners (one visible glyph, many codepoints — stresses
    tokenizers and shingle windows), Deseret letters with ASTRAL case
    mappings (U+10437 lowercase <-> U+10407 uppercase — simple-vs-full
    case folding diverges only off the BMP), astral CJK (ideographs a
    byte-hash must treat identically on both engines), and mathematical
    alphanumerics embedded mid-document so split/shingles/md5 walk
    across them. Poisons documents.text (standalone + spliced),
    part.p_name (substr/LIKE/translate paths), customer.c_mktsegment
    (grouping key), supplier.s_name (JSON/CSV connector round-trip —
    JSON must escape these as surrogate pairs), nation.n_name
    (collected/sorted aggregates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Each entry is genuinely astral: max codepoint > 0xFFFF.
    fam = "\U0001F469‍\U0001F469‍\U0001F467"  # ZWJ family
    deseret_lo = "\U00010437\U00010432\U0001043A"  # lowercase Deseret
    deseret_up = "\U0001040F\U0001040A\U00010412"  # uppercase Deseret
    cjk_b = "\U0002070E\U00020731\U00020779"  # CJK ext B ideographs
    math_bold = "\U0001D400\U0001D41B\U0001D41C"  # mathematical bold
    docs_vals = [
        f"the {fam} reunion drew {fam} crowds this year",
        f"deseret sample {deseret_lo} versus {deseret_up} case pair",
        f"ideographs {cjk_b} inside an otherwise plain sentence",
    ]

    def poison(pdf, col, rows_vals):
        for i, v in rows_vals:
            if i < len(pdf):
                pdf.loc[i, col] = v

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        if name == "documents" and len(pdf) >= 9:
            poison(pdf, "text", list(enumerate(docs_vals)))
            # astral token spliced into real text: shingles and token
            # splits now walk across 4-byte sequences mid-document
            for k, tok in enumerate((fam, deseret_lo, math_bold)):
                poison(
                    pdf,
                    "text",
                    [(3 + k, f"{pdf.loc[3 + k, 'text']} {tok} tail")],
                )
        elif name == "part":
            poison(pdf, "p_name", [(0, f"{math_bold} widget"),
                                   (1, f"spring {cjk_b}")])
        elif name == "customer":
            # same astral key twice: group-by hashing must agree
            poison(pdf, "c_mktsegment", [(0, fam), (1, fam)])
        elif name == "supplier":
            poison(pdf, "s_name", [(0, f"Supplier#{fam}"),
                                   (1, f"Supplier#{deseret_up}")])
        elif name == "nation":
            poison(pdf, "n_name", [(0, cjk_b), (1, deseret_lo)])
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


def build_orphan(src: str, dst: str) -> None:
    """Referential orphans (r17 lens): fact rows whose foreign keys
    reference NO dimension row — the standard dirty-data shape of a
    100 TB lake (late-arriving dims, partial restores, cross-source
    ingest). Inner joins must DROP orphans, outer joins must NULL-pad
    them, EXISTS/IN/anti-join subqueries must classify them — all
    IDENTICALLY on both engines, across broadcast and shuffle plans.
    Planted: lineitem rows with unknown l_orderkey / l_partkey /
    l_suppkey (also poisons the derived-partsupp q2/q9/q11/q20 family,
    which both engines must derive identically from the same orphaned
    pairs), orders with an unknown o_custkey (q13's outer-join count
    distribution, q22's anti-join), events with an unknown user_id
    (sessionization / retention / funnel user joins), and an embedding
    with an unknown vec_id. Keys are far outside every real id range
    but small enough for exact DOUBLE rendering (no intmax overlap)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    GHOST = 10_000_019  # prime, >> any fixture id, exactly double-safe

    for f in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        t = pq.read_table(f)
        pdf = t.to_pandas()
        n = len(pdf)
        if n >= 3 and name == "lineitem":
            extra = pdf.iloc[:3].copy()
            extra.iloc[0, extra.columns.get_loc("l_orderkey")] = GHOST
            extra.iloc[1, extra.columns.get_loc("l_partkey")] = GHOST + 2
            extra.iloc[2, extra.columns.get_loc("l_suppkey")] = GHOST + 4
            pdf = __import__("pandas").concat([pdf, extra], ignore_index=True)
        elif n >= 2 and name == "orders":
            extra = pdf.iloc[:2].copy()
            extra.iloc[0, extra.columns.get_loc("o_custkey")] = GHOST + 6
            # an orphan order that ALSO has no lineitem rows: exercises
            # q13's zero-count bucket and q22's no-orders EXISTS branch
            extra.iloc[1, extra.columns.get_loc("o_orderkey")] = GHOST + 8
            extra.iloc[1, extra.columns.get_loc("o_custkey")] = GHOST + 10
            pdf = __import__("pandas").concat([pdf, extra], ignore_index=True)
        elif n >= 1 and name == "events":
            extra = pdf.iloc[:1].copy()
            extra.iloc[0, extra.columns.get_loc("user_id")] = GHOST + 12
            pdf = __import__("pandas").concat([pdf, extra], ignore_index=True)
        elif n >= 1 and name == "embeddings":
            extra = pdf.iloc[:1].copy()
            extra.iloc[0, extra.columns.get_loc("vec_id")] = GHOST + 14
            pdf = __import__("pandas").concat([pdf, extra], ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False),
            f"{dst}/{name}.parquet",
        )


LENSES = {
    "astral": build_astral,
    "orphan": build_orphan,
    "intmax": build_intmax,
    "ctrl": build_ctrl,
    "nulbyte": build_nulbyte,
    "negzero": build_negzero,
    "tz": build_tz,
    "giant": build_giant,
    "unicode": build_unicode,
    "evolve": build_evolve,
    "colperm": build_colperm,
    "conflict": build_conflict,
    "ws": build_whitespace,
    "nonfinite": build_nonfinite,
    "dates": build_dates,
    "empty": build_empty,
    "dup": build_dup,
    "rowgroup": build_rowgroup,
    "ties": build_ties,
    "one": build_one,
    "neg": build_neg,
    "split": build_split,
    "nulls": build_nulls,
    "skew": build_skew,
    "width": build_width,
}


def _probe_lens(spark, lens: str, sf: str, only: str) -> list:
    """Build one lens fixture and probe it two-engine on the given
    (reused) SparkSession; returns [(name, reason)] for failures."""
    import duckdb

    from selfcheck import compare

    from dbfs_spark_cache_spark.operators import ORACLES, QUERIES

    dst = tempfile.mkdtemp(prefix=f"probe_{lens}_")
    LENSES[lens](sf, dst)
    print(f"lens={lens} fixture at {dst}")

    con = duckdb.connect()
    for f in sorted(glob.glob(f"{dst}/*.parquet")):
        tbl = os.path.basename(f).replace(".parquet", "")
        if os.path.isdir(f):
            # a lens may emit each table as a DIRECTORY of part files;
            # union_by_name is the definitionally-correct read when
            # footers disagree (evolve lens) and a no-op when they
            # don't (split lens)
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{f}/*.parquet', union_by_name=true)"
            )
        else:
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{f}'")

    names = only.split(",") if only else list(QUERIES)
    bad = []
    for name in names:
        try:
            got = QUERIES[name](spark, dst).toPandas()
        except Exception as exc:
            bad.append((name, f"SPARK-ERROR {type(exc).__name__}: {str(exc)[:160]}"))
            continue
        if name not in ORACLES:
            continue  # rows-only queries: ran without crashing is the check
        try:
            want = con.execute(ORACLES[name]).fetchdf()
        except Exception as exc:
            bad.append((name, f"DUCK-ERROR {type(exc).__name__}: {str(exc)[:160]}"))
            continue
        problems = compare(name, got, want)
        if problems:
            bad.append((name, f"DIVERGE: {problems[:2]}"))

    print(f"\n=== lens={lens}: {len(names)} probed, {len(bad)} divergent/crashed ===")
    for n, r in bad:
        print(f"  {n}: {r}")
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--lens",
        required=True,
        choices=sorted(LENSES) + ["all"],
        help="'all' runs the full matrix on ONE SparkSession (saves a JVM "
        "start per lens; ~10 min per full-matrix sweep)",
    )
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from dbfs_spark_cache_spark.session import get_spark

    spark = get_spark(app_name=f"hostile_probe_{args.lens}")
    lenses = sorted(LENSES) if args.lens == "all" else [args.lens]
    any_bad = False
    for lens in lenses:
        if _probe_lens(spark, lens, args.sf, args.only):
            any_bad = True
    return 1 if any_bad else 0


if __name__ == "__main__":
    sys.exit(main())
