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


def _complement(cond: Column) -> Column:
    """NOT under missing-is-non-matching semantics: a NULL evaluation
    means the row did NOT match, so the complement must KEEP it
    (~NULL is NULL and would drop the row from BOTH sides, breaking
    the filter + complement partition invariant — Hillview's
    RangeFilterDescription treats missing as non-matching)."""
    return ~F.coalesce(cond, F.lit(False))


def _is_numeric_bound(v) -> bool:
    """True for int/float bounds (bool excluded): the signal that the
    filter is the reference's DoubleRangeFilter, whose missing rule
    covers NaN/±Inf — string/date bounds have no non-finite values."""
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _needs_finite_guard(dtype: str | None) -> bool:
    """Dtype dispatch for the non-finite guard (r10 advice): the
    guard is DROPPED only for dtypes that provably cannot produce a
    non-finite double under the comparison's implicit cast —
    integral and decimal columns — where the `-inf < c < inf`
    conjunct is a semantic no-op that still forces a per-row double
    cast and can block predicate pushdown. Every other dtype keeps
    it: float/double hold NaN/±Inf directly, and a STRING column
    compared against a numeric bound casts 'Infinity' to +Inf (the
    r11 review caught the first cut skipping all non-float dtypes,
    which silently re-admitted such rows against the r10 rule).
    Unknown dtype (None) keeps the guard — conservative, values
    identical either way."""
    if dtype is None:
        return True
    return not (
        dtype in ("tinyint", "smallint", "int", "bigint")
        or dtype.startswith("decimal")
    )


def range_filter(
    col: str, lo=None, hi=None, include_lo: bool = True, include_hi: bool = True,
    complement: bool = False, dtype: str | None = None,
) -> Column:
    """Range selection (RangeFilterDescription.DoubleRangeFilter:61:
    missing → includeMissing=false, else min <= v <= max with Java
    comparisons, which are FALSE for NaN). Non-finite values are
    MISSING under the engine-wide rule, so for numeric bounds the
    predicate carries the canonical finite guard explicitly — Spark
    and DuckDB both rank NaN ABOVE every value, so a lo-only filter
    would otherwise KEEP NaN rows (and complement=True would drop
    them from both sides of the partition, r10 review). Two-sided
    ranges already excluded non-finite in both engines (NaN/+Inf fail
    the hi bound, -Inf the lo bound); the guard makes one-sided
    ranges agree with the reference too.

    dtype: the filtered column's Spark dtype string when the caller
    has it (TableView passes it) — lets the guard skip entirely on
    int/decimal columns where it is a pushdown-blocking no-op."""
    c = F.col(col)
    cond = F.lit(True)
    if (_is_numeric_bound(lo) or _is_numeric_bound(hi)) and _needs_finite_guard(
        dtype
    ):
        cond = (c > F.lit(float("-inf"))) & (c < F.lit(float("inf")))
    if lo is not None:
        cond = cond & (c >= F.lit(lo) if include_lo else c > F.lit(lo))
    if hi is not None:
        cond = cond & (c <= F.lit(hi) if include_hi else c < F.lit(hi))
    return _complement(cond) if complement else cond


def range_filter_array(
    ranges: list[dict], complement: bool = False, df=None
) -> Column:
    """Conjunction of per-column range filters — the N-D brush
    selection behind every heatmap / trellis chart interaction
    (table/filters/RangeFilterArrayDescription.java:29: an array of
    RangeFilterDescription ANDed together, with a complement flag).

    Each entry is a kwargs dict for range_filter, e.g.
    ``{"col": "l_quantity", "lo": 10, "hi": 30}``. Every member stays
    a plain Catalyst predicate, so all ranges reach the parquet scan
    as PushedFilters. Pass `df` (the frame being filtered) to enable
    the per-column dtype dispatch on the non-finite guard; an
    explicit "dtype" in an entry wins."""
    dtypes = dict(df.dtypes) if df is not None else {}
    cond = all_of(
        *[
            range_filter(**{"dtype": dtypes.get(r.get("col")), **r})
            for r in ranges
        ]
    )
    return _complement(cond) if complement else cond


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
    return _complement(cond) if negate else cond


def comparison_filter(col: str, op: str, value, dtype: str | None = None) -> Column:
    c = F.col(col)
    # ==/!= are null-safe, matching maps.compare_columns: a missing
    # value is distinct from every value, so it satisfies '!='
    ops = {
        "==": c.eqNullSafe(F.lit(value)),
        "!=": ~c.eqNullSafe(F.lit(value)),
        "<": c < F.lit(value),
        "<=": c <= F.lit(value),
        ">": c > F.lit(value),
        ">=": c >= F.lit(value),
    }
    if op not in ops:
        raise ValueError(f"unknown comparison op: {op}")
    cond = ops[op]
    # ordered ops vs a numeric constant: non-finite is MISSING (same
    # rule and reasoning as range_filter — Spark/DuckDB rank NaN above
    # everything, so `> v` would keep NaN against the reference's
    # Java-comparison semantics). ==/!= stay NaN-literal-exact: the
    # only way to SELECT the quarantined rows themselves.
    if (
        op in ("<", "<=", ">", ">=")
        and _is_numeric_bound(value)
        and _needs_finite_guard(dtype)
    ):
        cond = (c > F.lit(float("-inf"))) & (c < F.lit(float("inf"))) & cond
    return cond


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


def string_columns_filter(
    cols: list[str],
    pattern: str,
    mode: str = "substring",
    case_sensitive: bool = False,
    negate: bool = False,
) -> Column:
    """One string filter applied across MANY columns, keeping rows
    that match in ANY of them (table/filters/
    StringColumnsFilterDescription.java:25 — the global search box).
    Stays a flat OR of per-column predicates, so Catalyst can still
    push each disjunct to the scan."""
    cond = any_of(
        *[string_filter(c, pattern, mode, case_sensitive) for c in cols]
    )
    return _complement(cond) if negate else cond


def predicate_filter(expr_or_fn) -> Column:
    """Arbitrary row predicate — the declared analogue of Hillview's
    JSFilterDescription (table/filters/JSFilterDescription.java:1,
    which ships a JavaScript function to every worker and keeps rows
    it returns true for).

    Two tiers, mirroring the engine's general UDF policy:
    - a SQL-expression STRING stays inside Catalyst (codegen,
      pushdown-eligible) — the fast path and the right one for
      anything expressible: ``predicate_filter("l_quantity * 2 >
      l_extendedprice / 1000 AND l_returnflag <> 'A'")``;
    - a Python CALLABLE (pandas Series dict -> boolean Series) is the
      escape hatch for genuinely non-SQL logic, run Arrow-batched via
      a pandas UDF — the row-at-a-time JS-engine round trip the
      reference pays is exactly what this avoids.

    Returns a Column for ``df.where(...)`` like every other builder.
    """
    if isinstance(expr_or_fn, str):
        return F.expr(expr_or_fn)
    if callable(expr_or_fn):
        raise TypeError(
            "callable predicates need the columns they read — use "
            "predicate_filter_pandas(fn, cols) instead"
        )
    raise TypeError("predicate_filter takes a SQL string or a callable")


def predicate_filter_pandas(fn, cols: list[str]) -> Column:
    """Escape-hatch tier of predicate_filter: fn receives one pandas
    Series per listed column (Arrow-batched) and returns a boolean
    Series. Keep it off hot paths — Catalyst can't see inside."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _pred(*series):
        return fn(dict(zip(cols, series)))

    return _pred(*[F.col(c) for c in cols])


def row_comparison_filter(
    sort_cols: list[str], row: tuple, op: str = ">", ascending: list[bool] | None = None
) -> Column:
    """Tuple comparison against a fixed row under a lexicographic
    record order (table/filters/RowComparisonFilterDescription.java:31
    — the filter behind spreadsheet paging: 'rows after X'). Builds
    the standard expansion (c0 > v0) OR (c0 = v0 AND c1 > v1) OR ...
    so every leaf stays a pushdown-eligible comparison.

    NULL-aware with REFERENCE semantics: Hillview compares a missing
    value as GREATER than every present one (IDoubleColumn.java:70-78
    `iMissing → return 1`; Converters.compareStrings,
    utils/Converters.java:140-150), so NULL sorts LAST under ASC and
    FIRST under DESC. A None in the start row addresses the NULL
    group — without explicit branches, any comparison touching NULL
    evaluates to NULL and paging silently dead-ends on columns with
    missing values."""
    if ascending is None:
        ascending = [True] * len(sort_cols)
    if op in ("==", "!="):
        eq = all_of(*[F.col(c).eqNullSafe(F.lit(v)) for c, v in zip(sort_cols, row)])
        return eq if op == "==" else ~eq
    if op not in ("<", "<=", ">", ">="):
        raise ValueError(f"unknown row comparison op: {op}")

    def after(cc: Column, v, asc: bool) -> Column:
        """col sorts strictly after v in the record order (missing is
        greatest: NULLS LAST under ASC, NULLS FIRST under DESC)."""
        if v is None:
            # ASC: NULL is the maximum — nothing follows it;
            # DESC: NULL is first — every present value follows it
            return F.lit(False) if asc else cc.isNotNull()
        if asc:
            return (cc > F.lit(v)) | cc.isNull()  # NULL (last) follows
        return cc < F.lit(v)  # DESC: NULL (first) never follows a value

    def before(cc: Column, v, asc: bool) -> Column:
        if v is None:
            return cc.isNotNull() if asc else F.lit(False)
        if asc:
            return cc < F.lit(v)
        return (cc > F.lit(v)) | cc.isNull()

    strict = op.rstrip("=")
    cmp = after if strict == ">" else before
    out = F.lit(False)
    prefix_eq = F.lit(True)
    for c, v, asc in zip(sort_cols, row, ascending):
        cc = F.col(c)
        out = out | (prefix_eq & cmp(cc, v, asc))
        prefix_eq = prefix_eq & cc.eqNullSafe(F.lit(v))
    if op.endswith("="):
        out = out | prefix_eq
    return out
