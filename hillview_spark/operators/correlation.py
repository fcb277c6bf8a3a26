"""Correlation / projection sketches.

Reference semantics:
- sketches/PCACorrelationSketch.java:37 + results/CorrMatrix.java:34
  — full correlation matrix in one pass; eigenvectors computed
  centrally, data projected onto top components.
- sketches/SampleCorrelationSketch.java — sampled variant.
- sketches/JLSketch.java — Johnson-Lindenstrauss random projection.
- sketches/CategoryCentroidsSketch.java — per-category centroid of
  numeric columns.
- maps/LinearProjectionMap.java — project rows onto given vectors.

Spark-first: the correlation matrix is one wide aggregate (all
pairwise F.corr in a single scan, map-side combine). The d x d
matrix is tiny, so the eigen-decomposition runs driver-side in
numpy; the projection itself is a codegen'd linear expression —
no MLlib, no UDF in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from hillview_spark import numeric


def _safe_corr(a, b) -> Column:
    """Pearson correlation that yields NULL on zero variance instead
    of killing the job: Spark 4's builtin `corr` divides by the
    co-moment product under ANSI and throws DIVIDE_BY_ZERO when
    either column is constant (found by the r9 constant-column
    probe — one degenerate column must never kill a 100-TB scan).

    r10 shape: the SQL-standard regression moments — regr_sxy /
    sqrt(regr_sxx * regr_syy) with a `den > 0` guard. The regr_*
    aggregates do pairwise deletion NATIVELY (rows where either side
    is NULL are skipped, per the standard), so the r9 per-pair
    `when(both, …)` input masks disappear, and they accumulate
    CENTRAL moments (Welford-style), so the finalization is stable at
    100-TB row counts where a raw Σx²−(Σx)²/n decomposition would
    cancel catastrophically. Measured on the 4-column lineitem matrix
    at sf0.1, interleaved same-session medians: r9 masked
    covar/stddev 0.58 s → regr_* 0.52 s → builtin F.corr 0.38 s; a
    raw-sums rewrite (6 plain sums per pair) measured 0.91 s and was
    rejected (more aggregate buffers, not fewer). The residual
    ~30-35% over the builtin is inherent to safety from the SQL
    surface: Corr fuses its 6 moment fields into ONE buffer per pair,
    while the guarded form needs three separate aggregates
    (sxy/sxx/syy) — fusing them back needs a custom
    DeclarativeAggregate, which PySpark cannot express. DuckDB's
    native corr returns NULL on the same degenerate inputs
    (constant / single-row / all-NULL / empty — probed), so the
    oracles agree without change.

    Reference: sketches/PCACorrelationSketch.java:37 likewise
    accumulates the shared moment matrix once and finalizes
    centrally."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    den = F.sqrt(F.regr_sxx(b, a) * F.regr_syy(b, a))
    return F.when(den > 0, F.regr_sxy(b, a) / den)


def corr_matrix(
    df: DataFrame,
    cols: list[str],
    ndigits: int = 4,
    sample_fraction: float | None = None,
    seed: int = 42,
    sample_key: list[str] | None = None,
) -> DataFrame:
    """Pearson correlation for every pair, one scan. Output: one row
    per (col_x, col_y) ordered pair with x <= y.

    sample_fraction enables the sampled variant
    (sketches/SampleCorrelationSketch.java:33): the wide aggregate
    runs over a seeded Bernoulli row sample — the scan still reads
    every row-group but the aggregation state and CPU drop by the
    sampling rate, which is the point at 100 TB (correlation is
    O(1)-state but the per-row multiply-accumulate across d^2/2
    pairs dominates). Deterministic for a fixed seed.

    sample_key (with sample_fraction) switches the row draw from
    Spark's engine-native Bernoulli to a PORTABLE md5-hash coin on
    the named key columns — same row subset on any engine/run, so
    the sampled matrix is oracle-checkable cross-engine (the
    round(ndigits) already absorbs aggregation-order float drift,
    exactly as in the unsampled oracle). Same single-scan plan; the
    coin is one codegen md5 per row."""
    if sample_fraction is not None and sample_key is not None:
        from hillview_spark.operators.sampling import portable_bernoulli

        df = df.where(portable_bernoulli(sample_key, sample_fraction, seed))
    elif sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)

    # engine-wide finite rule; one schema fetch for the whole width
    _fin = numeric.finite_values(df, cols)

    def _finv(c):
        return _fin[c].alias(c)

    # pairwise-finite deletion (the engine-wide numeric rule): one
    # NaN/±Inf row would otherwise turn EVERY pair touching its column
    # into NaN. NULL-ing non-finite values ONCE in a pre-projection is
    # all it takes — corr natively skips a row when EITHER side is
    # NULL, which IS pairwise deletion — and costs one conditional per
    # column per row instead of two per PAIR (measured 0.59s -> 0.39s
    # same-process for 4 lineitem columns at sf0.1, identical results)
    proj = df.select(*[_finv(c) for c in cols])
    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.round(_safe_corr(a, b), ndigits).alias(f"{a}|{b}"))
            names.append((a, b))
    wide = proj.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col(f"{a}|{b}").alias("corr"),
            )
            for a, b in names
        ]
    )
    return wide.select(F.explode(structs).alias("s")).select("s.*")


def linear_project(
    df: DataFrame, cols: list[str], vectors: list[list[float]], prefix: str = "proj"
) -> DataFrame:
    """LinearProjectionMap: append one column per projection vector —
    a pure arithmetic expression, whole-stage codegen."""
    out = df
    for j, vec in enumerate(vectors):
        expr: Column = F.lit(0.0)
        for c, w in zip(cols, vec):
            expr = expr + F.col(c).cast("double") * F.lit(float(w))
        out = out.withColumn(f"{prefix}{j}", expr)
    return out


def pca_project(df: DataFrame, cols: list[str], k: int = 2) -> DataFrame:
    """PCACorrelationSketch: correlation matrix in one distributed
    pass -> numpy eigh on the tiny d x d matrix -> project
    standardized columns onto the top-k eigenvectors with a codegen
    expression. Deterministic sign convention: largest-|w| component
    positive (ties -> first index), and components snapped to 8
    decimals so the projection weights are engine-portable constants
    (the SQL oracle reproduces them analytically for d=2)."""
    import numpy as np

    # engine-wide finite rule; one schema fetch for the whole width
    _fin = numeric.finite_values(df, cols)

    def _finv(c):
        return _fin[c]

    # one fused aggregate job: moments and pairwise correlations are
    # independent expressions over the same rows — two .agg() calls
    # would scan the table twice for no semantic difference. The
    # MOMENTS run over finite values only (engine-wide numeric rule):
    # one NaN row would otherwise poison mu/sd/corr and hence every
    # projection weight. Per-ROW projections below keep the raw
    # column — a non-finite row projects to NaN, in any engine.
    stats = pairs = df.agg(
        *(
            [F.avg(_finv(c)).alias(f"{c}__mu") for c in cols]
            + [F.stddev_samp(_finv(c)).alias(f"{c}__sd") for c in cols]
            + [
                _safe_corr(
                    F.when(
                        _finv(a).isNotNull() & _finv(b).isNotNull(), F.col(a)
                    ),
                    F.when(
                        _finv(a).isNotNull() & _finv(b).isNotNull(), F.col(b)
                    ),
                ).alias(f"{i}|{j}")
                for i, a in enumerate(cols)
                for j, b in enumerate(cols)
                # strictly off-diagonal: corr(a, a) = 1 by definition,
                # and np.eye already holds the exact 1.0 — the computed
                # diagonal came back 1±ulp under the r10 regr_* form,
                # which perturbed eigh enough to flip the tie-break in
                # the sign convention below (pc0 negated vs the
                # analytic oracle). d fewer aggregates, too.
                if i < j
            ]
        )
    ).first()
    d = len(cols)
    m = np.eye(d)
    for i in range(d):
        for j in range(i + 1, d):
            v = pairs[f"{i}|{j}"] or 0.0
            m[i, j] = m[j, i] = v
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        # tie-break on 8-decimal-snapped magnitudes (the same snap the
        # output weights get): raw argmax(|v|) is ulp-unstable when
        # components are analytically equal (d=2 eigenvectors are
        # exactly (1,±1)/sqrt(2)), and an ulp flip negates a whole
        # output column vs the analytic oracle
        if v[int(np.argmax(np.round(np.abs(v), 8)))] < 0:
            v = -v
        comps.append(np.round(v, 8))
    out = df
    for j, v in enumerate(comps):
        expr: Column = F.lit(0.0)
        for ci, c in enumerate(cols):
            mu, sd = stats[f"{c}__mu"], stats[f"{c}__sd"]
            # Degenerate standardization is UNDEFINED, not zero (r9
            # single-row/constant-column probes): sd is NULL at n<=1
            # and 0.0 on a constant column — the old `or 1.0`
            # fallback fabricated 0.0 coordinates (and Python's
            # `0.0 or 1.0` took the fallback too) while the analytic
            # oracle NULLs; a literal-0 divisor is also job-fatal
            # under ANSI. One undefined column NULLs the projection.
            if sd is None or not sd > 0:
                expr = expr + F.lit(None).cast("double")
            else:
                expr = expr + (
                    (F.col(c) - F.lit(mu)) / F.lit(sd)
                ) * F.lit(float(v[ci]))
        out = out.withColumn(f"pc{j}", F.round(expr, 6))
    return out


def jl_project(
    df: DataFrame, cols: list[str], k: int = 4, prefix: str = "jl"
) -> DataFrame:
    """JLSketch: Johnson-Lindenstrauss projection with deterministic
    +-1 signs derived from sin(seed) — reproducible in any engine
    (used by the SQL oracle), scale 1/sqrt(k)."""
    scale = 1.0 / math.sqrt(k)
    vectors = []
    for j in range(k):
        vec = []
        for i in range(len(cols)):
            s = math.sin(1.0 + j * 97 + i * 13)
            vec.append(scale if s >= 0 else -scale)
        vectors.append(vec)
    out = linear_project(df, cols, vectors, prefix=prefix)
    for j in range(k):
        out = out.withColumn(f"{prefix}{j}", F.round(F.col(f"{prefix}{j}"), 6))
    return out


def _finite_rows(df: DataFrame, cols: list[str]) -> Column:
    """Row predicate for the driver-side layout samplers: every
    layout column present AND finite. Spark's dropna covers NULL and
    NaN but NOT ±Inf, and one Inf row poisons the WHOLE layout —
    metric_mds' distance normalization turns into inf*0=NaN and numpy
    SVD dies with LinAlgError (r11 correlation review, class-1 probe:
    one bad row must never kill the sketch). finite_values dispatches
    on dtype with ONE schema fetch, so int/date columns only get the
    NULL check."""
    fv = numeric.finite_values(df, cols)
    pred = F.lit(True)
    for c in cols:
        pred = pred & fv[c].isNotNull()
    return pred


def _mds_descent(Dh, Y, max_iterations=1000, learning_rate=1.0, decay=0.999,
                 tolerance=1e-5):
    """Squared-stress gradient descent on normalized distances —
    shared by metric_mds and lamp_project(control_layout='mds');
    Dh and Y must already be in the max-distance-1 normalized space
    (MetricMDS.computeEmbedding, MetricMDS.java:165-200)."""
    import numpy as np

    eps, lr, n = 1e-9, learning_rate, len(Y)
    for _ in range(max_iterations):
        d = Y[:, None, :] - Y[None, :, :]
        Dl = np.sqrt((d**2).sum(-1))
        np.fill_diagonal(Dl, 1.0)  # self-pairs contribute zero below
        coef = 2.0 * (Dl - Dh) / np.maximum(Dl, eps)
        np.fill_diagonal(coef, 0.0)
        grad = (coef[:, :, None] * d).sum(axis=1)
        Y -= grad * (lr / n)
        lr *= decay
        if np.linalg.norm(grad) / n < tolerance:
            break
    return Y


def metric_mds(
    df: DataFrame,
    cols: list[str],
    n_points: int = 100,
    low_dims: int = 2,
    key_col: str | None = None,
    seed: int = 42,
    max_iterations: int = 1000,
    learning_rate: float = 1.0,
    decay: float = 0.999,
    tolerance: float = 1e-5,
) -> DataFrame:
    """Metric MDS — squared-stress gradient descent mirroring
    utils/MetricMDS.java:37-200: pairwise high-dim distances
    normalized so the largest is 1, per-epoch low-dim Euclidean
    distances, gradient steps scaled learning_rate/N with 0.999
    decay, stopping when the gradient magnitude per point drops
    under tolerance; the embedding is rescaled back by the
    normalization factor so output distances reflect the originals.

    Runs driver-side on a bounded sample of n_points rows — exactly
    where the reference runs it (the root node lays out a sampled
    control set; LAMPMap then places everything else distributed).
    Deviation: deterministic PCA initialization instead of the
    reference's random init — same optimum basin, reproducible.
    O(n_points^2) distances; keep n_points in the hundreds."""
    import numpy as np

    if n_points <= 0:
        # configs fail loud, data quarantines (the similarity.py
        # convention): a zero/negative sample size would silently
        # return the empty layout for a perfectly good input
        raise ValueError(f"n_points must be positive, got {n_points}")
    out_cols = ([key_col] if key_col else []) + cols
    # deterministic bounded sample: order by a portable hash of the
    # row's values (sample(fraction=1.0) would be a no-op, leaving
    # limit() to take whatever rows the scan yields first — a
    # partition-layout-dependent set); TakeOrderedAndProject keeps
    # this bounded on any cluster
    pick = F.md5(
        F.concat_ws(
            "_", F.lit(str(seed)), *[F.col(c).cast("string") for c in out_cols]
        )
    )
    rows = (
        df.select(*out_cols)
        # present AND finite (r11): dropna missed ±Inf, and one Inf
        # row made the normalized distance matrix NaN — job-fatal in
        # the SVD init. Excluded exactly like NULL/NaN rows.
        .where(_finite_rows(df, cols))
        # value-tuple tiebreak: duplicate rows hash to the same pick,
        # and orderBy(pick) alone would then take a partition-layout-
        # dependent subset of the ties
        .orderBy(pick, *out_cols)
        .limit(n_points)
        .collect()
    )
    if low_dims > len(cols):
        raise ValueError(
            f"low_dims={low_dims} exceeds the {len(cols)} input columns"
        )
    if len(rows) < 2:
        # 0 or 1 surviving rows: nothing to lay out (and the numpy
        # pairwise-distance indexing below needs a 2-D array)
        axes0 = ["x", "y", "z", "w"][:low_dims] + [
            str(i) for i in range(4, low_dims)
        ]
        sch0 = (
            f"{key_col} {df.schema[key_col].dataType.simpleString()}, "
            if key_col
            else ""
        ) + ", ".join(f"mds_{ax} double" for ax in axes0)
        single = [
            tuple(([r[key_col]] if key_col else []) + [0.0] * low_dims)
            for r in rows
        ]
        return df.sparkSession.createDataFrame(single, sch0)
    X = np.array([[float(r[c]) for c in cols] for r in rows])
    diff_h = X[:, None, :] - X[None, :, :]
    Dh = np.sqrt((diff_h**2).sum(-1))
    scaling = 1.0 / max(Dh.max(), 1e-12)
    Dh = Dh * scaling

    Xc = X - X.mean(axis=0)
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    Y = (Xc @ vt[:low_dims].T) * scaling
    if Y.shape[1] < low_dims:
        # fewer points than output dims: svd yields < low_dims
        # singular vectors — pad the layout with zero coordinates
        Y = np.hstack([Y, np.zeros((len(rows), low_dims - Y.shape[1]))])
    Y = _mds_descent(Dh, Y, max_iterations, learning_rate, decay, tolerance)
    Y = Y / scaling

    spark = df.sparkSession
    out = []
    for i, r in enumerate(rows):
        rec = ([r[key_col]] if key_col else []) + [
            float(round(Y[i, j], 6)) for j in range(low_dims)
        ]
        out.append(tuple(rec))
    axes = ["x", "y", "z", "w"][:low_dims] + [
        str(i) for i in range(4, low_dims)
    ]
    if key_col:
        key_type = df.schema[key_col].dataType.simpleString()
        schema = f"{key_col} {key_type}, "
    else:
        schema = ""
    schema += ", ".join(f"mds_{ax} double" for ax in axes)
    return spark.createDataFrame(out, schema)


def lamp_project(
    df: DataFrame,
    cols: list[str],
    n_controls: int = 100,
    key_col: str | None = None,
    seed: int = 42,
    control_layout: str = "pca",
) -> DataFrame:
    """LAMP (Local Affine Multidimensional Projection) to 2-D —
    mirrors maps/LAMPMap.java. Control points are a small sample
    whose 2-D positions come from PCA (driver-side numpy on the tiny
    control set) or, with control_layout='mds', from metric MDS —
    the layout the reference's LAMP workflow actually uses
    (utils/MetricMDS.java lays out the sampled control set before
    LAMPMap places the rest); every other row is placed by its own
    weighted orthogonal affine map (per-point SVD, Joia et al. 2011).

    Scale shape: the control set (n_controls x d and n_controls x 2)
    broadcasts to every executor; the per-row solve runs in
    Arrow-batched mapInPandas — no shuffle at all, one scan."""
    import numpy as np

    if n_controls <= 0:
        # configs fail loud (r11 review): the empty-control early
        # return below is the DATA outcome (no finite rows) — a
        # zero/negative control count reaching it would silently
        # drop every input row on a config error instead
        raise ValueError(f"n_controls must be positive, got {n_controls}")
    # deterministic bounded control set: portable-hash order, same
    # rule as metric_mds (sample(fraction=1.0) is a no-op and limit()
    # alone takes a partition-layout-dependent set — the embedding
    # would change across clusters/re-ingests)
    pick = F.md5(
        F.concat_ws(
            "_", F.lit(str(seed)), *[F.col(c).cast("string") for c in cols]
        )
    )
    ctrl = (
        df.select(cols)
        # present AND finite (r11): same rule as metric_mds — an Inf
        # control candidate poisons mu/sd and every distance
        .where(_finite_rows(df, cols))
        # same value-tuple tiebreak as metric_mds: equal rows share a
        # pick hash and must not be broken by partition layout
        .orderBy(pick, *cols)
        .limit(n_controls)
        .collect()
    )
    out_schema = (
        f"{key_col} {df.schema[key_col].dataType.simpleString()}, "
        if key_col
        else ""
    ) + "lamp_x double, lamp_y double"
    if not ctrl:
        # no placeable control points means no placeable rows either
        # (the data path below applies the same finiteness filter) —
        # return the empty result instead of crashing numpy on a
        # zero-length stack (r11 class-1 probe: empty/all-NULL input)
        return df.sparkSession.createDataFrame([], out_schema)
    X = np.array([[float(r[c]) for c in cols] for r in ctrl])
    mu, sd = X.mean(axis=0), X.std(axis=0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    # control-point 2-D positions: PCA, or stress-minimizing MDS
    _, _, vt = np.linalg.svd(Xs, full_matrices=False)
    Y = Xs @ vt[:2].T
    if Y.shape[1] < 2:
        # one input column (or a single control row): svd yields < 2
        # components — pad with a zero coordinate, same rule as
        # metric_mds. Before r11 numpy broadcasting silently
        # DUPLICATED the 1-D layout into both output coordinates
        # (a fabricated y == x), and the 1-control case only worked
        # by shape-(1,) broadcast accident.
        Y = np.hstack([Y, np.zeros((len(ctrl), 2 - Y.shape[1]))])
    if control_layout == "mds":
        Dh = np.sqrt(((Xs[:, None, :] - Xs[None, :, :]) ** 2).sum(-1))
        sc = 1.0 / max(Dh.max(), 1e-12)
        Y = _mds_descent(Dh * sc, Y * sc) / sc
    elif control_layout != "pca":
        raise ValueError("control_layout must be 'pca' or 'mds'")

    out_cols = ([key_col] if key_col else []) + cols

    def _solve_block(P: "np.ndarray") -> "np.ndarray":
        """Vectorized LAMP for a block of rows: every step is a stacked
        einsum / batched-SVD over the whole block (np.linalg.svd on an
        (N, d, 2) stack runs one LAPACK call per matrix but stays out
        of the Python interpreter loop — ~20x the per-row version)."""
        d2 = ((P[:, None, :] - Xs[None, :, :]) ** 2).sum(-1)  # N x c
        res = np.empty((len(P), 2))
        hit = d2.min(axis=1) < 1e-12  # coincides with a control point
        if hit.any():
            res[hit] = Y[d2[hit].argmin(axis=1)]
        todo = ~hit
        if todo.any():
            Pt, D = P[todo], d2[todo]
            a = 1.0 / D                                  # N x c weights
            asum = a.sum(1)[:, None]
            xt = (a @ Xs) / asum                         # N x d
            yt = (a @ Y) / asum                          # N x 2
            ra = np.sqrt(a)
            Ah = ra[:, :, None] * (Xs[None, :, :] - xt[:, None, :])  # N x c x d
            Bh = ra[:, :, None] * (Y[None, :, :] - yt[:, None, :])   # N x c x 2
            AtB = np.einsum("ncd,nce->nde", Ah, Bh)      # N x d x 2
            u, _, vvt = np.linalg.svd(AtB, full_matrices=False)
            M = u @ vvt                                  # N x d x 2
            res[todo] = np.einsum("nd,nde->ne", Pt - xt, M) + yt
        return res

    def project(batches):
        import pandas as pd

        for pdf in batches:
            P = ((pdf[cols].to_numpy(dtype=np.float64) - mu) / sd)
            # sub-chunk so the N x c x d intermediates stay bounded
            blocks = [
                _solve_block(P[i : i + 4096]) for i in range(0, len(P), 4096)
            ] or [np.empty((0, 2))]
            res = np.concatenate(blocks)
            out = {}
            if key_col:
                out[key_col] = pdf[key_col]
            out["lamp_x"] = np.round(res[:, 0], 6)
            out["lamp_y"] = np.round(res[:, 1], 6)
            yield pd.DataFrame(out)

    # present AND finite (r11): dropna dropped NULL/NaN rows from the
    # output but let ±Inf through to the solver, which emitted
    # Inf/NaN coordinates — excluded uniformly now (out_schema keeps
    # the key column's input type; hardcoding 'long' would crash the
    # Arrow conversion for string/other id types)
    in_df = df.select(*out_cols).where(_finite_rows(df, cols))
    return in_df.mapInPandas(project, out_schema)


def category_centroids(
    df: DataFrame, category_col: str, numeric_cols: list[str], ndigits: int = 4
) -> DataFrame:
    """CategoryCentroidsSketch: mean of each numeric column per
    category value — a plain groupBy aggregate. Means run over FINITE
    values only (the engine-wide numeric rule): one NaN reading would
    otherwise turn its whole category's centroid into NaN."""

    # engine-wide finite rule; one schema fetch for the whole width
    _fin = numeric.finite_values(df, numeric_cols)

    def fin(c):
        return _fin[c]

    return df.groupBy(F.col(category_col).alias("category")).agg(
        *[
            F.round(F.avg(fin(c)), ndigits).alias(f"{c}_mean")
            for c in numeric_cols
        ]
    )
