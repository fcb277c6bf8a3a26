"""The engine-wide scalar missing rule, in ONE place.

A non-finite double (NaN/±Inf) is MISSING everywhere in this engine —
the same contract SQL NULL carries — because the DuckDB oracle's
DECIMAL casts are job-fatal on non-finite input and because Hillview's
sketches treat unrepresentable cells as missing (BasicColStatSketch
skips them). The canonical predicate shape is

    (c > lit(-inf)) & (c < lit(inf))

which is FALSE for NaN (Spark orders NaN greater than +Inf, so the
upper strict comparison fails), FALSE for ±Inf, NULL for NULL — i.e.
truthy exactly on finite values — and renders identically in any SQL
engine (the oracle twin is `isfinite(x)`). Before r9 this expression
was copy-pasted at ~10 sites (events, temporal, histogram, privacy,
stats, spreadsheet, correlation, the entry closures); a per-site tweak
had to be replicated by hand. The vector-element twin (decimal-domain
bound) lives in functions/similarity.all_finite.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def finite_pred(c: Column) -> Column:
    """TRUE iff `c` is a finite (non-NULL, non-NaN, non-±Inf) double;
    NULL stays NULL (use inside when()/filters, where NULL is falsy).
    On non-float inputs the comparisons coerce and are simply
    non-NULL checks — callers that must skip the bound entirely for
    non-float dtypes dispatch on the dtype first (histogram._finite).
    """
    return (c > F.lit(float("-inf"))) & (c < F.lit(float("inf")))


def finite_or_null(c: Column) -> Column:
    """`c` where finite, else NULL — the value-level form of the rule
    (the shape every oracle writes as CASE WHEN isfinite(x) THEN x
    END)."""
    return F.when(finite_pred(c), c)


def finite_value(df, col: str, dtypes: dict[str, str] | None = None) -> Column:
    """The dtype-dispatched form every aggregate site uses: for
    float/double columns, the value where finite else NULL; for every
    other dtype the raw column (dates/strings/ints have no NaN — the
    bound would be a no-op comparison). Matches the expression shape
    the pre-r9 per-site copies built, so plans are unchanged.

    `dtypes`: optional precomputed {col: dtype} mapping so wide
    callers (corr_matrix, basic_col_stats, next_k_aggregate) build
    the schema dict once per frame instead of once per column —
    plan-build overhead only, but it grows linearly with width.
    `finite_values` below is the one-call form."""
    c = F.col(col)
    if (dtypes if dtypes is not None else dict(df.dtypes)).get(col) in (
        "double",
        "float",
    ):
        return finite_or_null(c)
    return c


def finite_values(df, cols: list[str]) -> dict[str, Column]:
    """finite_value for many columns with ONE schema-dict build:
    {col: finite-or-raw Column} for each requested column."""
    dtypes = dict(df.dtypes)
    return {c: finite_value(df, c, dtypes) for c in cols}
