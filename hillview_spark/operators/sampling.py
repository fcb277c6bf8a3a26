"""Row sampling sketches.

Reference semantics:
- sketches/RandomSamplingSketch.java — Bernoulli row sample.
- sketches/NumericSamplesSketch.java — numeric value sample for
  client-side rendering.
- table/membership (sampled membership sets) — Hillview often runs
  sketches over a sampled row set.

random_sample is Spark's native Bernoulli sample (per-partition,
seeded, no shuffle). systematic_sample is the deterministic variant
(key mod n) that is reproducible across engines — used for the
duckdb oracle.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window, functions as F


def random_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=fraction, seed=seed)


def systematic_sample(df: DataFrame, key_col: str, modulus: int, residue: int = 0) -> DataFrame:
    """Deterministic 1/modulus sample by key residue. Pushdown-
    eligible; identical results in any engine."""
    return df.where(F.pmod(F.col(key_col), F.lit(modulus)) == F.lit(residue))


def reservoir_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Fixed-size uniform sample without replacement. Implemented as
    the classic distributed reservoir: assign a random tag, take the
    n smallest (TakeOrderedAndProject — per-partition heap + driver
    merge, no global sort)."""
    return (
        df.withColumn("__tag", F.rand(seed))
        .orderBy("__tag")
        .limit(n)
        .drop("__tag")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (train/eval split construction:
    e.g. downsample the dominant language, keep all of the rare
    ones). Spark's sampleBy is a single scan — each row draws against
    its stratum's fraction; no shuffle. Strata absent from the dict
    are dropped (fraction 0)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def salted_hex(col, salt: str, width: int = 7):
    """THE engine-portable salted hash: the first `width` hex chars
    of md5(value '_' salt). Every deterministic-keep or
    deterministic-order decision in the engine (train/eval split,
    mixture sampling, per-group caps, pack groups, corpus shuffle)
    derives from this one recipe — a one-character drift in any copy
    would silently migrate examples between splits across
    re-ingests, so there are no copies.

    NULL keys raise at execution: concat_ws SKIPS nulls, so a NULL
    key would hash to the constant md5(salt) and every NULL-key row
    would silently land in the SAME split/keep bucket (20% NULL keys
    -> all of them in one split). A key with no identity has no
    deterministic assignment — fail loudly; callers with legitimately
    nullable keys must coalesce to an explicit sentinel first."""
    return F.substring(
        F.md5(F.concat_ws("_", salted_guard(col), F.lit(salt))), 1, width
    )


def salted_hash(col, salt: str):
    """salted_hex as a bigint in [0, 16^7) — the keep-fraction form."""
    return F.conv(salted_hex(col, salt), 16, 10).cast("bigint")


def portable_bernoulli(key_cols: list[str], fraction: float, seed: int = 42):
    """Engine-portable Bernoulli keep-coin on a (possibly composite)
    row key: keep iff salted_hash('_'-joined key fields, 'bern<seed>')
    < fraction * 16^7. Unlike Spark's .sample() (engine-native RNG,
    partition-order dependent across engines) the drawn subset is a
    pure function of the key — the same rows survive in any engine,
    which is what lets SAMPLED sketches (heavy_hitters_sampled,
    corr_matrix sample path) hash-check against a DuckDB oracle.
    One codegen md5 per row, no shuffle; inherits salted_hex's loud
    NULL-key failure (a NULL field would silently collapse into its
    neighbor under concat_ws).

    Each field is LENGTH-PREFIXED ('<len>:<value>') before the '_'
    join, so distinct composite keys always map to distinct coin
    inputs — without the prefix, string fields containing '_' could
    alias (('a_b','c') vs ('a','b_c')) and two distinct rows would
    share one coin, correlating draws that callers assume are
    independent (the same forged-key failure _prf_field escapes for
    the DP PRF). The prefix is unambiguous to parse (the length is
    digits, ':' terminates it), engine-portable (character counts
    match across engines for the stringified values used here), and
    cheap (two extra concats per field, still one md5 per row)."""
    key = F.concat_ws("_", *[_len_prefixed(c) for c in key_cols])
    cut = int(fraction * (16**7))
    return salted_hash(key, f"bern{seed}") < F.lit(cut)


def _len_prefixed(c: str):
    """'<len>:<value>' coin field — see portable_bernoulli."""
    s = salted_guard(F.col(c).cast("string"))
    return F.concat(F.length(s).cast("string"), F.lit(":"), s)


def salted_guard(col):
    """The NULL-key loud-failure guard shared by salted_hex and
    portable_bernoulli's per-field keys.

    Deliberately LOUD, unlike the engine-wide quarantine of malformed
    VALUES (NaN readings, ragged vectors, corrupt payloads): a broken
    value costs one cell of one row, but a NULL KEY makes the row's
    identity ambiguous — every NULL-keyed row would share one coin
    (correlated draws callers assume independent) or one shuffle-rank
    hash (nondeterministic order among them, unstable across runs and
    engines). There is no correct silent answer, so the caller must
    decide: coalesce to a sentinel (NULL-keyed rows become ONE
    deterministic identity) or filter. The error message says exactly
    that."""
    return F.when(
        col.isNull(),
        F.raise_error(
            F.lit(
                "salted key: NULL key field has no deterministic hash "
                "— coalesce nullable keys to a sentinel first"
            )
        ),
    ).otherwise(col)


def split_train_eval(
    df: DataFrame, eval_fraction: float, key_col: str, salt: str = "v1"
) -> DataFrame:
    """Deterministic, engine-portable train/eval assignment: hash the
    key with a salt and compare against the fraction — stable across
    runs, engines, and data reshuffles (the property a training
    pipeline needs so examples never migrate between splits when the
    corpus is re-ingested). Adds a `split` column."""
    h = salted_hash(F.col(key_col), salt)
    cut = int(eval_fraction * (16**7))
    return df.withColumn(
        "split", F.when(h < cut, F.lit("eval")).otherwise(F.lit("train"))
    )


def stratified_split(
    df: DataFrame,
    eval_fraction: float,
    key_col: str,
    strata_col: str,
    salt: str = "v1",
) -> DataFrame:
    """EXACT-quota stratified split: each stratum contributes exactly
    ceil(eval_fraction x n_stratum) rows to eval, chosen by the same
    salted-hash order as split_train_eval — the eval set preserves
    the source/language mix EXACTLY instead of in expectation (at
    small strata the hash-threshold split's binomial noise can leave
    a language with zero eval docs; the quota cannot). Deterministic
    and re-ingest-stable: membership is a pure function of
    (key, salt) ranks within the stratum. NULL strata form their own
    stratum (groupBy semantics); NULL keys fail loudly (salted_hex's
    contract).

    Scale note: the exact quota needs a per-stratum total order
    (window sort over each stratum — one shuffle; a hot stratum
    sorts on one partition, and the quota is O(stratum), so the
    two-phase top-N shortcut does not apply). That is the price of
    exactness: at extreme per-stratum cardinality use
    split_train_eval, whose per-row threshold needs no shuffle and
    is exact in expectation.

    Quota rule (r14, exact at every stratum size): the fraction is
    interpreted as its 9-decimal rounding p/q (reduced integers,
    q | 10^9 — the caller's 0.07 MEANS 7/100; a float can't say so
    itself), and the quota is ceil(n*p/q) computed in EXACT integer
    arithmetic: (n*p + q - 1) div q over a DECIMAL(38,0) product, so
    no IEEE rounding exists to overshoot at ANY stratum size. The
    r13 form ceil(round(n*f, 9)) snapped the double product back to
    the true decimal, but only while the product's ABSOLUTE error
    stayed under 5e-10 — beyond n*f ~ 5e6 (where double spacing
    passes 1e-9) the off-by-one could return (r13 ADVICE); at 100-TB
    strata (1e12 rows) the integer form is the only exact one.
    DECIMAL(38,0) holds n*p for any n up to ~1e28/q — unreachable."""
    if not 0.0 <= eval_fraction <= 1.0:
        raise ValueError(
            f"eval_fraction must be in [0, 1], got {eval_fraction!r}"
        )
    frac = Fraction(str(round(float(eval_fraction), 9)))
    p, q = frac.numerator, frac.denominator
    h = salted_hash(F.col(key_col), salt)
    w = Window.partitionBy(strata_col).orderBy("__h", key_col)
    wn = Window.partitionBy(strata_col)
    quota = F.expr(f"(CAST(__n AS DECIMAL(38,0)) * {p} + {q - 1}) div {q}")
    return (
        df.withColumn("__h", h)
        .withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "split",
            F.when(F.col("__rk") <= quota, F.lit("eval")).otherwise(
                F.lit("train")
            ),
        )
        .drop("__h", "__rk", "__n")
    )
