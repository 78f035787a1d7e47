"""Single-pass data-quality expectations.

A training-data pipeline gates every ingest on basic invariants (keys
present, values in range, ids unique) before spending compute downstream.
The naive formulation runs one action per rule — N full scans; at 100 TB
that is N × the ingest cost. ``expectations_report`` folds EVERY rule into
one aggregation over one scan: each rule is a conditional count, all
partial-aggregated map-side, so the whole report costs one pass and ships
|rules| numbers per partition.

Violation semantics follow the usual expectations contract: a row violates
a rule when the rule's condition is **not TRUE** for it (FALSE *or* NULL),
so a NULL in a range-checked column counts against the range rule only if
it is also listed in ``not_null`` — range and presence stay independently
attributable.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violations(cond: Column) -> Column:
    # not-TRUE = FALSE or NULL: coalesce the tri-state down before negating.
    # The outer coalesce makes an EMPTY input report 0 violations (SUM over
    # zero rows is NULL, and an empty ingest batch must pass, not crash).
    return F.coalesce(
        F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)),
        F.lit(0),
    )


def expectations_frame(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    ranges: Optional[Mapping[str, Tuple[float, float]]] = None,
    custom: Optional[Mapping[str, Column]] = None,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """The aggregation :func:`expectations_report` collects — exposed so
    callers can compose it (union reports across partitions/days) and
    tests can pin that the plan scans the input exactly once.

    ``group_by`` produces one report row per key combination (per-source
    corpus QA, per-day ingest audits) — still one pass, still map-side
    partial-aggregated; ``unique`` then means unique WITHIN each group.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    names = ["n_rows"]
    for col in not_null:
        aggs.append(_violations(F.col(col).isNotNull()).alias(f"null_{col}"))
        names.append(f"null_{col}")
    for col in unique:
        surplus = F.count(col) - F.count_distinct(F.col(col))
        aggs.append(surplus.alias(f"dup_{col}"))
        names.append(f"dup_{col}")
    for col, (lo, hi) in (ranges or {}).items():
        # an inverted or NaN bound makes EVERY non-null row a violation —
        # a typo'd gate should fail at construction, not flood the report
        # (r18 fresh-eyes; `not lo <= hi` also catches NaN bounds, which
        # compare false against everything)
        if not lo <= hi:
            raise ValueError(
                f"range rule for {col!r} has empty bounds ({lo!r}, {hi!r}): "
                "lo must be <= hi and neither may be NaN"
            )
        in_range = F.col(col).isNull() | F.col(col).between(lo, hi)
        aggs.append(_violations(in_range).alias(f"range_{col}"))
        names.append(f"range_{col}")
    for name, cond in (custom or {}).items():
        aggs.append(_violations(cond).alias(name))
        names.append(name)
    # A duplicate rule name — a custom rule named like a generated one
    # ('null_<col>'), a repeated list entry, or the reserved n_rows /
    # passed keys — would plan fine but collapse to ONE dict key in the
    # report, silently un-checking a rule the caller believes is gated.
    # A quality gate must fail loudly, not narrow quietly (r11 review).
    dupes = sorted({n for n in names if names.count(n) > 1})
    reserved = {"passed"} & set(names)
    if dupes or reserved:
        raise ValueError(
            f"expectation rule names collide: duplicates={dupes}, "
            f"reserved={sorted(reserved)} — rename the custom rule(s) or "
            "deduplicate the column lists"
        )
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def expectations_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    ranges: Optional[Mapping[str, Tuple[float, float]]] = None,
    custom: Optional[Mapping[str, Column]] = None,
) -> Dict[str, int]:
    """Violation counts for every rule, computed in ONE aggregation.

    * ``not_null``: columns that must be present; counts NULL rows.
    * ``unique``: columns whose non-null values must not repeat; counts
      surplus rows (``n_non_null - n_distinct``); NULLs are not compared
      to each other (SQL DISTINCT semantics) — pair with ``not_null`` for
      a primary key.
    * ``ranges``: ``{col: (lo, hi)}`` inclusive bounds over non-null
      values (NULL is a presence problem, not a range problem).
    * ``custom``: ``{rule_name: boolean Column}``; a row violates when
      the condition is not TRUE.

    Returns ``{"n_rows": ..., "<rule>": violations, ...}`` with rule keys
    ``null_<col>``, ``dup_<col>``, ``range_<col>``, and custom names
    verbatim. ``passed`` is True when every count is zero.
    """
    row = (
        expectations_frame(df, not_null, unique, ranges, custom).first().asDict()
    )
    report = {k: int(v) if v is not None else 0 for k, v in row.items()}
    report["passed"] = all(
        v == 0 for k, v in report.items() if k not in ("n_rows", "passed")
    )
    return report
