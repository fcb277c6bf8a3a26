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

from hillview_spark.operators.filters import all_of


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
    """ExactFreqSketch: exact counts for an explicit candidate list —
    ONE ROW PER CANDIDATE, zeros included (ExactFreqSketch.zero()/
    add():62-77 seed and carry the full candidate list, so a
    candidate absent from the data reports count 0; the r10 review
    found the WHERE-then-groupBy shape silently dropped it, which
    misaligns any candidates⋈counts readout). The IN-filter pushes
    to the scan; counts come back tiny; the candidate list (≤ ~1/ε
    rows by construction) broadcasts. A None candidate matches NULL
    rows (isin() alone never matches NULL — a mostly-missing
    column's top 'value' would silently vanish, the same trap
    heavy_hitters_sampled guards with eqNullSafe)."""
    non_null = [v for v in candidates if v is not None]
    cond = F.col(col).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in candidates):
        cond = cond | F.col(col).isNull()
    counts = (
        df.where(cond)
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # nullable=True explicitly (r10 advice): copying the source
    # field's nullability verbatim would make a None candidate fail
    # createDataFrame verification when the column is a required
    # (non-nullable) Parquet field — candidate lists are caller
    # input, not data, so they may always carry None.
    from pyspark.sql.types import StructField, StructType

    src_type = df.select(F.col(col).alias("value")).schema[0].dataType
    from hillview_spark.localrel import local_df

    cand = local_df(
        df.sparkSession,
        [(v,) for v in dict.fromkeys(candidates)],
        StructType([StructField("value", src_type, True)]),
    )
    return (
        cand.join(counts, cand["value"].eqNullSafe(counts["value"]), "left")
        .select(cand["value"], F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .orderBy(F.desc("cnt"), "value")
    )


def progressive_heavy_hitters(
    df: DataFrame,
    cols: list[str],
    epsilon: float = 0.01,
    stages: tuple[float, ...] = (0.01, 0.1, 1.0),
    seed: int = 42,
):
    """Progressive partial results for heavy hitters — the second
    flagship interactive sketch gets the same PartialResult.java
    analogue as progressive_histogram: one DataFrame per stage, each
    a seeded Bernoulli sample's epsilon-frequent values (thresholded
    against the SAMPLE's row count, so every stage answers the same
    relative-frequency question), the last stage exact == heavy_hitters.

    Columns per stage: stage, fraction, cols..., cnt (sample count),
    est_cnt (cnt/fraction). Lazy generator — consumers stop early
    once the candidate set stabilizes."""
    from hillview_spark.operators.histogram import _validate_stages

    _validate_stages(stages)

    def _gen():
        for i, frac in enumerate(stages):
            yield _stage(i, frac)

    def _stage(i, frac):
        sampled = df if frac >= 1.0 else df.sample(fraction=frac, seed=seed)
        counts = sampled.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
        total = counts.agg(F.sum("cnt").alias("__total"))
        return (
            counts.join(F.broadcast(total))
            .where(F.col("cnt") >= F.lit(epsilon) * F.col("__total"))
            .select(
                F.lit(i).alias("stage"),
                F.lit(float(frac)).alias("fraction"),
                *cols,
                "cnt",
                (F.col("cnt") / F.lit(float(frac))).alias("est_cnt"),
            )
            .orderBy(F.desc("cnt"), *cols)
        )

    return _gen()


def heavy_hitters_sampled(
    df: DataFrame, cols: list[str], epsilon: float = 0.01,
    seed: int = 42, fraction: float = 0.01,
    sample_key: list[str] | None = None,
) -> DataFrame:
    """SampleHeavyHittersSketch: candidate mining on a Bernoulli
    sample, then one exact confirmation pass — the 100-TB path for
    keys whose exact groupBy state would not fit.

    Exactly two scans of df:
    1. The sampling scan. The exact total row count is observed as a
       free side-output of the same job (Observation below the sample
       operator — no separate count() job), and the candidate
       threshold is *sample-internal*: scnt >= 0.5*epsilon*(sampled
       rows), with the sampled-row total derived from the grouped
       relation itself (persisted — two consumers, and the observed
       N must not depend on ReuseExchange deduping the scan). An
       epsilon-frequent value is expected to appear fraction*eps*N
       times in the sample, so it survives w.h.p. whenever that
       expectation clears ~100 — i.e. fraction >= 100/(epsilon*N);
       the default 1% rate covers N >= 10^4/epsilon, and a SMALLER
       fraction suffices at larger N.
       Surviving candidates number at most ~2/epsilon (their sample
       shares sum to 1), so collecting them is driver-trivial.
    2. The exact confirmation scan, restricted to the broadcast
       candidate set, thresholded at epsilon*N with the observed N.

    Hillview sizes its sample from table metadata it holds up front
    (SampleHeavyHittersSketch.java); Spark has no free row count, so
    the rate is a parameter and N arrives via the observation.

    sample_key switches the sampling coin from Spark's engine-native
    Bernoulli to the portable md5 coin on the named key columns
    (operators/sampling.portable_bernoulli) — the candidate-mining
    subset becomes a pure function of the data, so the whole sketch
    (candidates AND confirmed counts) is deterministic cross-engine
    and hash-oracle-checkable. Same plan shape either way."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    if sample_key is not None:
        from hillview_spark.operators.sampling import portable_bernoulli

        sampled = observed.where(portable_bernoulli(sample_key, fraction, seed))
    else:
        sampled = observed.sample(fraction=fraction, seed=seed)
    from hillview_spark import cache

    # persisted: scounts feeds TWO consumers (its own total and the
    # candidate filter) inside one action. Before r10 the single
    # execution of the observed scan below relied on ReuseExchange
    # deduping the twin subtrees — with spark.sql.exchange.reuse off
    # (or a future plan change making the subtrees non-identical) the
    # CollectMetrics node ran twice and obs reported 2N, silently
    # doubling the confirmation threshold. The cache materializes the
    # sampled aggregate exactly once BY CONSTRUCTION; correctness no
    # longer rides on an optimizer flag.
    scounts = (
        sampled.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("scnt"))
        .transform(cache.persist)
    )
    stotal = scounts.agg(F.sum("scnt").alias("__st"))
    cand_rows = (
        scounts.join(F.broadcast(stotal))
        .where(F.col("scnt") >= F.lit(0.5 * epsilon) * F.col("__st"))
        .select(*cols)
        .collect()
    )
    total = obs.get["n"]
    cache.release(scounts)
    spark = df.sparkSession
    from hillview_spark.localrel import local_df

    cand = local_df(spark, cand_rows, df.select(*cols).schema)
    # null-safe semi-join: a plain equi-join drops NULL keys, and the
    # exact heavy_hitters (groupBy) counts the NULL group — a mostly
    # missing column would silently lose its top "value"
    d, c = df.alias("__d"), cand.alias("__c")
    cond = all_of(
        *[F.col(f"__d.{k}").eqNullSafe(F.col(f"__c.{k}")) for k in cols]
    )
    return (
        d.join(F.broadcast(c), cond, "left_semi")
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.lit(float(epsilon * total)))
        .orderBy(F.desc("cnt"), *cols)
    )
