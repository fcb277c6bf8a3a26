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

from pyspark.sql import DataFrame, functions as F


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
