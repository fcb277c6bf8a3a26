"""Heavy hitters (frequent elements).

Reference semantics:
- sketches/MGFreqKSketch.java:49 — Misra-Gries per partition, merged;
  returns values whose frequency may exceed epsilon*N.
- sketches/ExactFreqSketch.java:42 — exact counts for a candidate set
  (the second pass Hillview runs to de-noise MG output).
- sketches/SampleHeavyHittersSketch.java — sampling-based variant.

Spark-first: groupBy(col).count().having(count >= eps*N) IS the
exact two-pass answer in one job — Spark's map-side partial
aggregation plays the role of the per-partition Misra-Gries summary,
and the final filter replaces the de-noising pass. For cardinalities
too large to group exactly, heavy_hitters_sampled mirrors the
sampling sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def heavy_hitters(df: DataFrame, cols: list[str], epsilon: float = 0.01) -> DataFrame:
    """Values (tuples) occurring in at least epsilon fraction of rows,
    with exact counts, most frequent first.

    One-pass shape: the total row count is the sum of the group
    counts, derived from the SAME grouped relation and joined back as
    a broadcast scalar — Catalyst's ReuseExchange dedupes the shared
    scan+shuffle subtree, so the input is scanned once (vs the naive
    separate count() job, a 2x scan at 100 TB)."""
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.join(F.broadcast(total))
        .where(F.col("cnt") >= F.lit(epsilon) * F.col("__total"))
        .drop("__total")
        .orderBy(F.desc("cnt"), *cols)
    )


def exact_freq(df: DataFrame, col: str, candidates: list) -> DataFrame:
    """ExactFreqSketch: exact counts for an explicit candidate list.
    The IN-filter pushes to the scan; counts come back tiny."""
    return (
        df.where(F.col(col).isin(candidates))
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "value")
    )


def heavy_hitters_sampled(
    df: DataFrame, cols: list[str], epsilon: float = 0.01, factor: float = 100.0,
    seed: int = 42,
) -> DataFrame:
    """SampleHeavyHittersSketch: estimate on a row sample sized so
    that epsilon-frequent items appear w.h.p. (factor/epsilon rows),
    then one exact confirmation pass over candidates. Two scans but
    the groupBy state is bounded by the sample size — the 100-TB path
    for ultra-high-cardinality keys."""
    total = df.count()
    if total == 0:
        return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
    frac = min(1.0, (factor / epsilon) / total)
    sampled = df.sample(fraction=frac, seed=seed)
    cand = (
        sampled.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("scnt"))
        .where(F.col("scnt") >= F.lit(0.5 * epsilon * frac * total))
        .select(*cols)
    )
    return (
        df.join(F.broadcast(cand), cols)
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(epsilon * total))
        .orderBy(F.desc("cnt"), *cols)
    )
