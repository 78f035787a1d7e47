"""Multimodal column plumbing ([NS] north-star).

Design for 100 TB: media rides as opaque ``binary`` columns (or, better,
object-store URIs + typed metadata structs — never inline blobs for large
assets); decode / feature-extraction runs as Arrow-batched pandas functions
over ``mapInPandas``. The actual image/audio codecs are NOT in this
container, so the decode step is a clearly-marked deterministic stub behind
the same schema/partitioning/batch plumbing the real thing would use.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           SHA256(text) AS content_sha256,
           source AS asset_source,
           lang AS asset_lang
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column metadata pass: treat document text as an opaque blob,
    compute size + content digest + carry typed metadata. This is the
    map-only manifest pass a media pipeline runs before any decode."""
    docs = load_table(spark, sf, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("content_sha256"),
        F.col("source").alias("asset_source"),
        F.col("lang").alias("asset_lang"),
    )


def decode_image(payload: bytes) -> bytes:
    """Real decoder entry point — media codecs are not installed in this
    environment. STUB: deterministic fake below stands in for tests."""
    raise NotImplementedError(
        "image codecs unavailable in this container; use fake_decode_features"
    )


def fake_decode_features(payload: bytes, n_features: int = 8) -> list:
    """Deterministic stand-in for decode + feature extraction: derives
    n_features floats from the content digest. Same signature and batch
    shape as a real embedding/feature extractor."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(n_features)]


def _hex_byte_sql(hex_col: str, i: int) -> str:
    """DuckDB expression for byte ``i`` of a hex digest string — lets the
    oracle recompute the sha256-derived stub features exactly."""
    hi = f"strpos('0123456789abcdef', substr({hex_col}, {2 * i + 1}, 1)) - 1"
    lo = f"strpos('0123456789abcdef', substr({hex_col}, {2 * i + 2}, 1)) - 1"
    return f"(({hi}) * 16 + ({lo}))"


_N_FEATURES = 8

_DECODE_ORACLE = (
    "WITH h AS (\n"
    "  SELECT doc_id, source AS asset_source,\n"
    "         OCTET_LENGTH(ENCODE(text)) AS n_bytes,\n"
    "         sha256(text) AS hx\n"
    "  FROM documents\n"
    "), b AS (\n"
    "  SELECT doc_id, asset_source, n_bytes,\n"
    + ",\n".join(
        f"         {_hex_byte_sql('hx', i)} / 255.0 AS f{i}"
        for i in range(_N_FEATURES)
    )
    + "\n  FROM h\n)\n"
    "SELECT doc_id, asset_source, n_bytes, "
    + ", ".join(f"f{i}" for i in range(_N_FEATURES))
    + ",\n       ("
    + " + ".join(f"f{i}" for i in range(_N_FEATURES))
    + f") / {_N_FEATURES} AS feature_mean\nFROM b"
)


@register("multimodal_decode_features", oracle=_DECODE_ORACLE)
def multimodal_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over mapInPandas.

    The plumbing is real (schema, batch iteration, partition preservation);
    only the codec inside is the deterministic stub. Features come out as
    flat ``f0..f7`` double columns — the driver's pandas canonicalizer
    cannot hash list-valued cells (r2 finding), and the flat shape is what a
    feature store would want anyway. The stub derives bytes of sha256(text),
    which the DuckDB oracle recomputes bit-exactly from the hex digest, so
    this query is fully value-checked despite the stubbed codec.
    """
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "source")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["text"].str.encode("utf-8")
            feats = payloads.map(fake_decode_features)
            cols = {
                "doc_id": pdf["doc_id"],
                "asset_source": pdf["source"],
                "n_bytes": payloads.str.len().astype("int64"),
            }
            for i in range(_N_FEATURES):
                cols[f"f{i}"] = feats.map(lambda xs, i=i: xs[i])
            cols["feature_mean"] = feats.map(lambda xs: sum(xs) / len(xs))
            yield pd.DataFrame(cols)

    feature_fields = ", ".join(f"f{i} double" for i in range(_N_FEATURES))
    return docs.mapInPandas(
        extract,
        schema=(
            "doc_id long, asset_source string, n_bytes long, "
            f"{feature_fields}, feature_mean double"
        ),
    )


_FRAME_SAMPLE_ORACLE = """
    WITH f AS (
        SELECT doc_id, text,
               unnest(generate_series(0, greatest(len(text) - 1, 0), 256)) AS off
        FROM documents
        WHERE len(text) > 0
    )
    SELECT doc_id,
           CAST(off / 256 AS INT) AS frame_idx,
           off AS frame_offset,
           substr(sha256(substr(text, off + 1, 64)), 1, 16) AS frame_sha
    FROM f"""


@register("multimodal_frame_sample", oracle=_FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sampling plumbing for video-like assets: each asset yields
    every k-th 'frame' (here: 64-char slices of the payload every 256
    chars) with frame index + offset metadata. Shows the one-to-many
    mapInPandas shape a real frame sampler uses — a real codec slices byte
    ranges; the stand-in slices characters so the frame digests are
    reproducible by the DuckDB oracle (sha256 over the slice's UTF-8
    bytes on both engines), making the plumbing fully value-checked."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_sha": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for idx, off in enumerate(range(0, len(text), 256)):
                    frame = text[off : off + 64]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_offset"].append(off)
                    out["frame_sha"].append(
                        hashlib.sha256(frame.encode("utf-8")).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        sample,
        schema="doc_id long, frame_idx int, frame_offset long, frame_sha string",
    )
