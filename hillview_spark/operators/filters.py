"""Filter builders — Hillview's filter descriptions as Column
predicates.

Reference semantics (platform/src/main/java/org/hillview/table/filters/):
- RangeFilterDescription.java:30 — numeric/string/date range, with
  complement flag.
- StringFilterDescription.java:27 — substring / regex / exact /
  prefix matching, case sensitivity, negation.
- ComparisonFilterDescription.java — column <op> constant.
- RowComparisonFilterDescription.java — tuple comparison (used by
  next_k paging).
- AndFilter/OrFilter/NotFilter/FilterListDescription — combinators.

These return pyspark Columns, so they compose with &, |, ~ and stay
inside Catalyst — every one of them is pushdown-eligible at the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def range_filter(
    col: str, lo=None, hi=None, include_lo: bool = True, include_hi: bool = True,
    complement: bool = False,
) -> Column:
    c = F.col(col)
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (c >= F.lit(lo) if include_lo else c > F.lit(lo))
    if hi is not None:
        cond = cond & (c <= F.lit(hi) if include_hi else c < F.lit(hi))
    return ~cond if complement else cond


def range_filter_array(ranges: list[dict], complement: bool = False) -> Column:
    """Conjunction of per-column range filters — the N-D brush
    selection behind every heatmap / trellis chart interaction
    (table/filters/RangeFilterArrayDescription.java:29: an array of
    RangeFilterDescription ANDed together, with a complement flag).

    Each entry is a kwargs dict for range_filter, e.g.
    ``{"col": "l_quantity", "lo": 10, "hi": 30}``. Every member stays
    a plain Catalyst predicate, so all ranges reach the parquet scan
    as PushedFilters."""
    cond = all_of(*[range_filter(**r) for r in ranges])
    return ~cond if complement else cond


def string_filter(
    col: str,
    pattern: str,
    mode: str = "substring",
    case_sensitive: bool = False,
    negate: bool = False,
) -> Column:
    c = F.col(col)
    pat = pattern
    if not case_sensitive and mode != "regex":
        c = F.lower(c)
        pat = pattern.lower()
    if mode == "substring":
        cond = c.contains(pat)
    elif mode == "exact":
        cond = c == F.lit(pat)
    elif mode == "prefix":
        cond = c.startswith(pat)
    elif mode == "regex":
        flags = "" if case_sensitive else "(?i)"
        cond = c.rlike(flags + pattern)
    else:
        raise ValueError(f"unknown string filter mode: {mode}")
    return ~cond if negate else cond


def comparison_filter(col: str, op: str, value) -> Column:
    c = F.col(col)
    ops = {
        "==": c == F.lit(value),
        "!=": c != F.lit(value),
        "<": c < F.lit(value),
        "<=": c <= F.lit(value),
        ">": c > F.lit(value),
        ">=": c >= F.lit(value),
    }
    if op not in ops:
        raise ValueError(f"unknown comparison op: {op}")
    return ops[op]


def all_of(*conds: Column) -> Column:
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def any_of(*conds: Column) -> Column:
    out = F.lit(False)
    for c in conds:
        out = out | c
    return out


def negate(cond: Column) -> Column:
    return ~cond
