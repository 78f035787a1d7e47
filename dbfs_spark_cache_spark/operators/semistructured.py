"""Semi-structured column operators: map construction/access, from_json
struct extraction, explode with ordinality. Completes the scalar-function
families of SURVEY.md §2 (map: map_keys/element_at; json: from_json;
array: explode)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "fn_map_ops",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price_from_map,
           CAST(o_custkey AS DOUBLE) AS cust_from_map,
           2 AS n_keys,
           'cust,price' AS sorted_keys
    FROM orders
    """,
)
def fn_map_ops(spark: SparkSession, sf: str) -> DataFrame:
    """MapType construction + access (map_from_arrays, element_at,
    map_keys). The oracle validates the extracted values directly — the map
    round-trip must be lossless."""
    orders = load_table(spark, sf, "orders")
    m = F.map_from_arrays(
        F.array(F.lit("price"), F.lit("cust")),
        F.array(F.col("o_totalprice"), F.col("o_custkey").cast("double")),
    )
    return orders.select(
        "o_orderkey",
        F.element_at(m, "price").alias("price_from_map"),
        F.element_at(m, "cust").alias("cust_from_map"),
        F.size(m).alias("n_keys"),  # size() already returns IntegerType
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("sorted_keys"),
    )


@register(
    "fn_from_json_struct",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN json_valid(props)
                         AND json_type(props::JSON, '$.k')
                             IN ('BIGINT', 'UBIGINT')
                         THEN json_extract_string(props, '$.k') END AS BIGINT)
               AS k_value,
           TRY_CAST(CASE WHEN json_valid(props)
                         AND json_type(props::JSON, '$.missing')
                             IN ('BIGINT', 'UBIGINT')
                         THEN json_extract_string(props, '$.missing') END
                    AS BIGINT)
               AS missing_value,
           COALESCE(json_valid(props), FALSE) AS is_valid
    FROM events
    """,
)
def fn_from_json_struct(spark: SparkSession, sf: str) -> DataFrame:
    """Typed JSON parsing: from_json into a struct, field access, null for
    absent fields, validity flag.

    Parsed ONCE into a struct column, fields projected from it in a second
    select: inlining the from_json expression into each output column makes
    Catalyst evaluate the parse per-column (3 from_json calls per row in the
    physical plan; measured 3x slower at sf0.1). The two-step projection is
    the pattern for every expensive shared expression."""
    events = load_table(spark, sf, "events")
    parsed = F.from_json("props", "k BIGINT, missing BIGINT")
    # Validity must actually test validity: PERMISSIVE from_json returns a
    # struct of NULL fields for malformed input, so struct-isNotNull is
    # True for garbage. get_json_object returns NULL exactly when the
    # document does not parse (and for NULL input), matching the oracle's
    # COALESCE(json_valid(..), FALSE). Type strictness: from_json with a
    # BIGINT field yields NULL for ANY non-integer JSON value — "7"
    # (string), 1.5, even 7.0 (verified on Spark 4.1) — so the oracle
    # gates on json_type IN (BIGINT, UBIGINT) rather than TRY_CASTing
    # the extracted string, which would coerce "7"->7 and 1.5->2.
    # TRY_CAST stays for the one case the type gate admits but int64
    # can't hold (UBIGINT above 2^63-1 -> NULL on both engines).
    return events.select(
        "event_id",
        parsed.alias("p"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    ).select(
        "event_id",
        F.col("p.k").alias("k_value"),
        F.col("p.missing").alias("missing_value"),
        "is_valid",
    )


@register(
    "fn_array_explode",
    oracle="""
    SELECT vec_id,
           CAST(gs - 1 AS INT) AS dim_idx,
           embedding[gs] AS dim_value
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(gs)
    WHERE vec_id < 20
    """,
)
def fn_array_explode(spark: SparkSession, sf: str) -> DataFrame:
    """posexplode: one row per array element with its position — the
    row-generator workhorse (lateral view). Restricted to 20 vectors so the
    output stays review-sized."""
    emb = load_table(spark, sf, "embeddings").where(F.col("vec_id") < 20)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("dim_idx", "dim_value")
    )


@register(
    "fn_array_explode_outer",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t LIKE 'w%') AS ws
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           unnest(CASE WHEN ws IS NULL OR len(ws) = 0 THEN [NULL] ELSE ws
                  END) AS w_token
    FROM f
    """,
)
def fn_array_explode_outer(spark: SparkSession, sf: str) -> DataFrame:
    """explode_outer: null-preserving row generation — documents whose
    filtered token array is EMPTY still produce one row (token NULL),
    where plain explode would drop them. The distinction matters whenever
    the exploded side is optional (a document with no matching entities,
    an order with no promo lines) and downstream counts must keep the
    parent row. The oracle emulates outer-unnest by substituting [NULL]
    for empty lists.
    """
    docs = load_table(spark, sf, "documents").where(F.col("doc_id") < 100)
    ws = F.filter(F.split("text", " "), lambda t: t.startswith("w"))
    return docs.select(
        "doc_id", F.explode_outer(ws).alias("w_token")
    )
