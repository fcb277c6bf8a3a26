"""Embedding similarity search — brute-force cosine top-k as the
baseline, random-hyperplane LSH bucketing as the 100-TB scale path,
and cosine near-duplicate pair mining.

(Extension beyond the Hillview reference, SURVEY.md §2.4.)

Scale design: the query vector is a broadcast 1-row relation, so
brute-force top-k is one scan + TakeOrderedAndProject (per-partition
heap, no global sort). The LSH variant buckets vectors by the sign
pattern of dot products with fixed hyperplanes — candidate sets
shrink by ~2^planes and the bucket key is shuffle-friendly. Pair
mining joins on the bucket key (inverted-index join), never a full
cartesian.

Determinism: elements are cast double→DECIMAL(10,8) and accumulated
in DECIMAL(30,16) — exact, order-independent sums that reproduce
bit-identically in any engine (the DuckDB oracle mirrors the same
arithmetic). Hyperplane weights are Python-generated decimal
literals, not engine-evaluated trig, for the same reason.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from hillview_spark import cache

# Decimal shapes for exact, order-independent vector arithmetic.
# (13,8): five integer digits of headroom, so unnormalized embeddings
# (raw logits) don't hit ANSI NUMERIC_VALUE_OUT_OF_RANGE the way a
# (10,8) element cast would at |x| >= 100 — while keeping products at
# decimal(27,16), still under Spark's 38-digit cap with the full
# 16-decimal scale intact (a wider element type would force Spark to
# shave the product scale and break bit-parity with the oracle).
_ELEM = "decimal(13,8)"
_ACC = "decimal(30,16)"


# The exact-decimal ELEMENT DOMAIN: |x| <= 99999.99999999, the exact
# decimal(13,8) maximum. A finite component outside it is as
# malformed as a NaN — under ANSI (Spark 4 default) a plain cast
# would be JOB-FATAL (NUMERIC_VALUE_OUT_OF_RANGE), so every element
# cast is a try_cast (overflow -> NULL -> the whole fold NULLs -> row
# quarantined) and the hard-cut predicate below bounds magnitude
# explicitly. The bound is the DECIMAL MAX, not 1e5 (r9 review fix):
# with a `< 1e5` cut, a double in (99999.999999995, 1e5) passed the
# guard but half-up-rounded into overflow, so Spark's try_cast NULLed
# the fold while DuckDB — whose DECIMAL(13,8) cast accepts the
# rounded 100000.00000000 — did not: the one value band where the
# engines' casts disagree. No passing value can overflow: rounding is
# monotone, and every double <= the bound rounds to <= the bound.
_ELEM_BOUND = 99999.99999999


def _dec(c: Column) -> Column:
    return c.cast("double").try_cast(_ELEM)


def all_finite(vec_col: str) -> Column:
    """TRUE iff every component is present, finite, AND inside the
    exact-decimal element domain (|x| <= _ELEM_BOUND, the
    decimal(13,8) max) — the malformed-vector quarantine predicate
    (r9): one bad element makes the decimal fold NULL anyway, so
    paths that need a hard row cut (PQ codes, LSH buckets) use this
    up front instead of letting a NULL score mint a garbage
    code/bucket. The comparisons reject NaN/±Inf for free (both
    compare false), and every passing value is PROVABLY in-range for
    _dec's try_cast (see the _ELEM_BOUND note — a `< 1e5` cut left a
    rounding sliver where the engines' casts disagreed). Codegen
    forall, no extra pass."""
    return F.forall(
        F.col(vec_col),
        lambda x: F.coalesce(
            (x.cast("double") >= F.lit(-_ELEM_BOUND))
            & (x.cast("double") <= F.lit(_ELEM_BOUND)),
            F.lit(False),
        ),
    )


def dot_product(a, b, exact: bool = True) -> Column:
    """Dot product of two array<float|double> columns. exact=True
    routes through DECIMAL (order-independent, engine-portable — the
    oracle-checked path); exact=False is plain double arithmetic
    (the throughput path — same top-k on non-adversarial data)."""
    if not exact:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    # try_cast on the ACCUMULATOR too (r10 review): the element-level
    # try_cast quarantines bad components, but a >10k-component vector
    # of near-bound values can overflow the decimal(30,16) SUM, and a
    # plain cast there is ANSI-job-fatal — overflow NULLs the fold
    # (row quarantined) instead. Inside the pinned element domain at
    # realistic widths (64-dim, max ~6.4e11 << 1e14) the two casts are
    # identical, so oracle parity is unchanged.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _dec(x) * _dec(y)),
        F.lit(0).cast(_ACC),
        lambda acc, v: (acc + v).try_cast(_ACC),
    )


def squared_norm(a, exact: bool = True) -> Column:
    if not exact:
        return F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    # accumulator try_cast: see dot_product
    return F.aggregate(
        F.transform(a, lambda x: _dec(x) * _dec(x)),
        F.lit(0).cast(_ACC),
        lambda acc, v: (acc + v).try_cast(_ACC),
    )


def cosine(dot: Column, na: Column, nb: Column) -> Column:
    """cosine from dot/norms; double arithmetic in a fixed shape so
    engines agree bit-for-bit on the exact path. A zero-norm vector
    (padding row) yields NULL, matching the NaN the numpy twins emit
    by dropping out of top-k/thresholds — without the guard the
    division raises DIVIDE_BY_ZERO under ANSI mode (Spark 4
    default)."""
    denom = F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    return F.when(denom > 0, dot.cast("double") / denom)


def _stack_batch(pdf, vec_col: str, width: int):
    """Stack one Arrow batch's vectors into an (n, width) float64
    matrix under the malformed-vector quarantine (NULL / off-width
    rows drop). Clean-data fast path: ONE np.stack attempt — the
    per-row len() scan runs only when the batch actually contains a
    malformed row (ragged/NULL stack raises) or is uniformly the
    wrong width. The r7 guards paid the per-row scan on every batch;
    at 100 TB the clean case is ~all batches, so the guard must be
    free there (see BENCH ab_pairs 'quarantine_guard')."""
    import numpy as np

    vals = pdf[vec_col].to_numpy()
    try:
        m = np.stack(vals).astype(np.float64)
        if m.ndim == 2 and m.shape[1] == width:
            return pdf, m
    except (ValueError, TypeError):
        pass
    pdf = pdf[pdf[vec_col].map(len, na_action="ignore") == width]
    if len(pdf) == 0:
        return pdf, np.empty((0, width))
    return pdf, np.stack(pdf[vec_col].to_numpy()).astype(np.float64)


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Brute-force cosine top-k against the vector with id=query_id.
    One scan over the (broadcast-augmented) table; ORDER BY+LIMIT is
    a per-partition heap."""
    # HOISTED quarantine (r9, VERDICT r8 #4): the r7 guard post-
    # filtered NULL cosines, which references the aliased score in a
    # Filter above the Project — the big fold expressions are
    # higher-order (not whole-stage codegen), and the collapsed
    # filter re-evaluated them (20-40% measured, ab_pair
    # 'ann_cosine_topk_guard'). Instead cut the rows that WOULD score
    # NULL before any dot/norm math, with cheap array predicates:
    # same-width as the query, all components finite, at least one
    # nonzero component (norm > 0). After the cut the cosine
    # denominator is provably positive, so no post-filter is needed
    # and the plan is Project -> TakeOrderedAndProject. The query
    # side gets the same predicate (a bad query vector yields an
    # empty result, exactly as the NULL-cosine cut did). Values are
    # bit-identical: the predicate drops precisely the rows whose
    # cosine was NULL (corr_matrix's pre-projection recipe,
    # README performance notes).
    # `nonzero` must match the ARITHMETIC the score uses (r9 review
    # fix): on the exact path a vector of sub-quantum components
    # (e.g. [1e-9]*64 — nonzero doubles, all 0E-8 in decimal) has
    # zero DECIMAL norms, so its cosine is NULL and the oracle's
    # cosine-IS-NOT-NULL cut drops it — the guard has to drop it too,
    # judged in decimal. The double test stays on the double path,
    # where a norm is zero only if every component is exactly 0.0.
    if exact:
        nonzero = F.exists(F.col(vec_col), lambda x: _dec(x) != 0)
    else:
        nonzero = F.exists(F.col(vec_col), lambda x: x.cast("double") != 0)
    clean = all_finite(vec_col) & nonzero
    # the query's O(d) decimal norm fold is loop-invariant: hoist it
    # into the broadcast 1-row projection instead of re-evaluating it
    # per scanned row (r10 review — ivf_topk_exact already did this
    # with its __qn; same values, same plan shape otherwise)
    q = (
        embeddings.where(F.col(id_col) == query_id)
        .where(clean)
        .select(
            F.col(vec_col).alias("__q"),
            squared_norm(F.col(vec_col), exact).alias("__qn"),
        )
    )
    return (
        embeddings.where(F.col(id_col) != query_id)
        .where(clean)
        .crossJoin(F.broadcast(q))
        .where(F.size(F.col(vec_col)) == F.size(F.col("__q")))
        .select(
            F.col(id_col),
            F.round(
                cosine(
                    dot_product(F.col(vec_col), F.col("__q"), exact),
                    squared_norm(F.col(vec_col), exact),
                    F.col("__qn"),
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def cosine_topk_numpy(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The 100-TB throughput path: Arrow-batched mapInPandas with a
    BLAS matrix-vector product per batch, emitting each partition's
    local top-k; the tiny union is then globally top-k'd. ~50x the
    expression-tree path on wide vectors."""
    import numpy as np

    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))

    def score(batches):
        import pandas as pd

        for pdf in batches:
            # dim-mismatched vectors can't score (and would make the
            # batch np.stack ragged-raise): quarantine them, like the
            # expression twin's NULL-cosine drop — free on clean
            # batches (_stack_batch's one-stack fast path)
            pdf, m = _stack_batch(pdf, vec_col, len(qv))
            if len(pdf) == 0:
                continue
            dots = m @ qv
            norms = np.linalg.norm(m, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (norms * qn)
            ids = pdf[id_col].to_numpy()
            # the local cut must rank exactly like the global
            # orderBy(desc(rounded cosine), id): lexsort on the
            # ROUNDED score with id tiebreak — cutting on raw values
            # can discard a row the rounded-tie global order prefers.
            # NaN (zero-norm vector or query) DROPS here: Spark's
            # desc sort ranks NaN ABOVE every real score, so a leaked
            # NaN row would top the global top-k — the expression
            # twin scores these NULL, which sorts last
            r = np.round(cos, 6)
            ok = np.isfinite(r)
            ids, r = ids[ok], r[ok]
            top = np.lexsort((ids, -r))[:k]
            yield pd.DataFrame({id_col: ids[top], "cosine": r[top]})

    # mapInPandas is a pruning barrier: without the select, extra
    # table columns (label, ...) would ship through Python per row
    local = embeddings.select(id_col, vec_col).mapInPandas(
        score, f"{id_col} long, cosine double"
    )
    return local.orderBy(F.desc("cosine"), id_col).limit(k)


def hyperplanes(dims: int, planes: int, ndigits: int = 10) -> list[list[str]]:
    """Deterministic pseudo-random hyperplanes as decimal-literal
    strings (engine-agnostic; no engine trig)."""
    out = []
    for p in range(planes):
        row = []
        for j in range(dims):
            w = math.sin(0.5 + p * 131 + j * 7)
            row.append(f"{w:.{ndigits}f}")
        out.append(row)
    return out


def lsh_bucket_expr(
    vec_col: str, planes: list[list[str]], exact: bool = True
) -> Column:
    """Sign-pattern bucket key: one char per hyperplane. exact=True
    computes dot products in decimal so the sign (hence bucket) is
    deterministic cross-engine; exact=False is the double-math
    throughput path (signs only flip for dots within float epsilon
    of zero — harmless for blocking)."""
    bits = []
    for row in planes:
        if exact:
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.expr(f"CAST({w} AS DECIMAL(12,10))") for w in row]),
                    lambda x, y: (_dec(x) * y).cast("decimal(24,18)"),
                ),
                F.lit(0).cast("decimal(32,18)"),
                # accumulator try_cast: see dot_product (overflow
                # NULLs the dot -> NULL bucket -> row quarantined,
                # never ANSI-job-fatal)
                lambda acc, v: (acc + v).try_cast("decimal(32,18)"),
            )
        else:
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(w)) for w in row]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    # Length guard: zip_with pads the SHORTER side with NULL, so a
    # dims mismatch would make every dot NULL -> every bit '0' -> ONE
    # bucket holding all mismatched rows, silently turning the blocked
    # join quadratic. Mismatched vectors get a NULL bucket instead:
    # they drop out of the bucket equi-join (a NULL key never matches)
    # the same way their cosine would be NULL anyway — malformed rows
    # are quarantined, not job-fatal, per the engine-wide
    # missing-on-parse-failure convention. A caller who passes the
    # wrong dims= for a uniformly-wider table sees an all-NULL bucket
    # column (empty results), not a crashed 100-TB job — run
    # check_vector_width() on a debug path to distinguish "ragged
    # data" from "misconfigured dims=" loudly.
    # Finiteness guard (r9): a NULL dot (any NaN/±Inf/NULL component
    # poisons the decimal fold) would otherwise take the `otherwise`
    # branch and silently file the malformed vector under a real '0'
    # bit — same quarantine as the width guard: NULL bucket, row
    # drops out of the candidate equi-join instead of polluting one
    # bucket. The predicate is codegen (forall over the array), no
    # extra pass.
    dims = len(planes[0])
    return F.when(
        (F.size(F.col(vec_col)) == dims) & all_finite(vec_col),
        F.concat(*bits),
    )


def check_vector_width(
    embeddings: DataFrame, dims: int, vec_col: str = "embedding"
) -> dict:
    """Debug-path companion to the silent per-row quarantine: ONE
    aggregate pass reporting how many rows are scoreable at `dims`.
    The quarantine is right for ragged data (a few bad rows must not
    kill a 100-TB job), but it makes a uniformly-misconfigured dims=
    look like an empty corpus — callers on interactive/debug paths
    assert matching > 0 (or mismatched == 0) to get a loud signal
    instead. Returns {'matching', 'mismatched', 'null'} counts."""
    row = embeddings.agg(
        F.count(F.when(F.size(F.col(vec_col)) == dims, 1)).alias("matching"),
        F.count(
            F.when(
                F.col(vec_col).isNotNull()
                & (F.size(F.col(vec_col)) != dims),
                1,
            )
        ).alias("mismatched"),
        F.count(F.when(F.col(vec_col).isNull(), 1)).alias("null"),
    ).first()
    return {"matching": row.matching, "mismatched": row.mismatched,
            "null": row["null"]}


def ann_lsh(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Approximate NN: restrict the cosine top-k to the query's LSH
    bucket. At scale the bucket join replaces the full scan with a
    ~2^-planes slice."""
    hp = hyperplanes(dims, planes)
    bucketed = embeddings.withColumn("__bucket", lsh_bucket_expr(vec_col, hp))
    # query norm hoisted into the broadcast row (see cosine_topk)
    q = bucketed.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__q"),
        F.col("__bucket").alias("__qb"),
        squared_norm(F.col(vec_col)).alias("__qn"),
    )
    scored = (
        bucketed.crossJoin(F.broadcast(q))
        .where((F.col("__bucket") == F.col("__qb")) & (F.col(id_col) != query_id))
        .select(
            F.col(id_col),
            F.round(
                cosine(
                    dot_product(F.col(vec_col), F.col("__q")),
                    squared_norm(F.col(vec_col)),
                    F.col("__qn"),
                ),
                6,
            ).alias("cosine"),
        )
    )
    # same NULL-cosine cut as cosine_topk (zero-norm bucketmates)
    return (
        scored.where(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def ivf_index(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2000,
    iters: int = 10,
    seed: int = 42,
):
    """IVF coarse quantizer: k-means centroids trained driver-side on
    a bounded sample (numpy Lloyd, seeded → deterministic), then every
    vector is assigned to its nearest centroid in one Arrow-batched
    pass. Returns (assigned_df with a `cell` column, centroids array).

    Scale shape: training data is O(sample_n x d) on the driver;
    assignment is a single scan with a BLAS argmin per batch; the
    resulting `cell` column is the partition/bucket key for search.
    """
    import numpy as np

    # deterministic training sample: plain limit() takes whichever
    # partitions answer first; ordering by id makes the centroids (and
    # hence the index) reproducible across runs and cluster layouts
    sample = embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    # train on the first sampled row's width; rows of any other width
    # (malformed) are quarantined here and in assignment below
    dim0 = next(
        (len(r[vec_col]) for r in sample if r[vec_col] is not None), None
    )
    if dim0 is None:
        raise ValueError(
            "ivf_index: no non-NULL vectors in the training sample — "
            f"the first {sample_n} rows of {vec_col!r} are all NULL"
        )
    X = np.stack(
        [
            np.asarray(r[vec_col], dtype=np.float64)
            for r in sample
            if r[vec_col] is not None and len(r[vec_col]) == dim0
        ]
    )
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for c in range(len(C)):
            pts = X[assign == c]
            if len(pts):
                C[c] = pts.mean(0)

    def assign_cells(batches):
        import pandas as pd

        for pdf in batches:
            # quarantine rows that don't match the trained width
            # (clean batches stack once, no per-row scan)
            pdf, M = _stack_batch(pdf, vec_col, C.shape[1])
            if len(pdf) == 0:
                continue
            d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            out = pdf[[id_col, vec_col]].copy()
            out["cell"] = d2.argmin(1).astype("int32")
            yield out

    # carry the INPUT element type through: hardcoding array<float>
    # would silently truncate double embeddings to float32
    elem = embeddings.schema[vec_col].dataType.elementType.simpleString()
    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign_cells, f"{id_col} long, {vec_col} array<{elem}>, cell int"
    )
    return assigned, C


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe only the n_probe cells whose centroids are
    nearest the query — a 100-TB scan becomes n_probe/n_cells of
    itself (and the `cell` column prunes partitions if the index is
    written partitioned by it). Scoring reuses the numpy batch path.
    """
    import numpy as np

    assigned, C = ivf_index(embeddings, n_cells, id_col, vec_col)
    qv = np.asarray(query_vec, dtype=np.float64)
    _check_query_dims(qv, C)
    probe = np.argsort(((C - qv) ** 2).sum(1))[:n_probe].tolist()
    candidates = assigned.where(F.col("cell").isin(probe)).select(id_col, vec_col)
    return cosine_topk_numpy(candidates, query_vec, k, id_col, vec_col)


def _check_query_dims(qv, C) -> None:
    """Driver-side loud guard: a query vector whose width differs
    from the trained/stored centroids can never match — the raw
    numpy broadcast error said 'shapes (8,) (16,)' with no hint it
    was the CALLER's query. Same loud-identity class as the LSH
    index's params sidecar (data quarantines; configs fail loud)."""
    if qv.ndim != 1 or qv.shape[0] != C.shape[1]:
        raise ValueError(
            f"query vector has {qv.shape[0] if qv.ndim == 1 else qv.shape} "
            f"dims but the index/centroids were built at {C.shape[1]} — "
            "re-embed the query or point at the matching index"
        )


# Per-process memo of centroid sidecars by index path: the sidecar is
# a handful of rows but reading + collecting it is a Spark job, and an
# interactive session probes the same index many times. Invalidated
# when ivf_write_index rewrites the path.
_IVF_CENTROID_CACHE: dict[str, "object"] = {}


def ivf_write_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2000,
    seed: int = 42,
) -> None:
    """Persist an IVF index as a CELL-PARTITIONED parquet layout:
    ``<path>/data`` partitioned by the coarse-quantizer cell,
    ``<path>/centroids`` as a tiny sidecar table. This is the piece
    that turns n_probe pruning from a row filter into PARTITION
    pruning — at 100 TB a query touches only n_probe/n_cells of the
    files, verified by assert_partition_pruning on the read plan."""
    assigned, C = ivf_index(embeddings, n_cells, id_col, vec_col, sample_n,
                            seed=seed)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/data"
    )
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(C)]
    embeddings.sparkSession.createDataFrame(
        cent_rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    _IVF_CENTROID_CACHE.pop(path, None)


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF index: pick the n_probe nearest cells
    from the centroid sidecar (driver-side, tiny — read once per
    index path per session, then served from _IVF_CENTROID_CACHE),
    then scan ONLY those partitions of the data layout (cell IN (...)
    reaches the scan as a PartitionFilter) and score with the BLAS
    batch path."""
    import numpy as np

    C = _IVF_CENTROID_CACHE.get(path)
    if C is None:
        cents = sorted(
            spark.read.parquet(f"{path}/centroids").collect(),
            key=lambda r: r.cell,
        )
        C = np.stack([np.asarray(r.centroid, dtype=np.float64) for r in cents])
        _IVF_CENTROID_CACHE[path] = C
    qv = np.asarray(query_vec, dtype=np.float64)
    _check_query_dims(qv, C)
    probe = [int(c) for c in np.argsort(((C - qv) ** 2).sum(1))[:n_probe]]
    data = spark.read.parquet(f"{path}/data").where(F.col("cell").isin(probe))
    return cosine_topk_numpy(
        data.select(id_col, vec_col), query_vec, k, id_col, vec_col
    )


def ivf_write_index_exact(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 8,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the ORACLE-EXACT IVF layout: the same cell-partitioned
    parquet shape as ivf_write_index, but cells come from the
    deterministic stride quantizer of ivf_topk_exact (data-point
    centroids by the id rule, exact-decimal argmin assignment) — so a
    search over the STORED index is bit-identical to the live exact
    twin and the same SQL oracle hash-checks it. The centroid sidecar
    stores the raw centroid vectors; assignment happens once at write
    time and n_probe becomes PARTITION pruning at query time."""
    cents, score_array = _stride_quantizer(
        embeddings, n_cells, stride, id_col, vec_col
    )
    scores = score_array(F.col(vec_col))
    (
        embeddings.select(
            F.col(id_col),
            F.col(vec_col),
            (F.array_position(scores, F.array_min(scores)) - 1)
            .cast("int")
            .alias("cell"),
        )
        # unassignable (dim-mismatched) vectors would otherwise land
        # in a NULL-cell partition no probe ever reads — exclude them
        # at write time, matching the live twin's cell join
        .where(F.col("cell").isNotNull())
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/data")
    )
    rows = [
        (i, [float(x) for x in crow[vec_col]]) for i, crow in enumerate(cents)
    ]
    embeddings.sparkSession.createDataFrame(
        rows, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    # this writer overwrites <path>/centroids too: without the pop a
    # later ivf_topk_indexed on the same path served the PREVIOUS
    # index's cached centroids against the new partitions (r10 review)
    _IVF_CENTROID_CACHE.pop(path, None)


def ivf_topk_indexed_exact(
    spark,
    path: str,
    query_vec,
    query_id: int | None = None,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search the exact-twin persisted index. The probe scores are
    re-derived from the centroid sidecar with the IDENTICAL decimal
    expression the live twin uses (||c||^2 - 2 q.c, ties to lowest
    cell), the n_probe winning cells collect driver-side (n_probe
    ints), and the data read scans ONLY those partitions — cell IN
    (...) reaches the scan as a PartitionFilter, so a 100-TB index
    touches n_probe/n_cells of its files. Final scoring repeats the
    live twin's decimal cosine op-for-op; every cast routes through
    double first, so the float→double literal round-trip through the
    sidecar preserves bit-identical values. query_id (when given)
    excludes the query's own stored row, matching ivf_topk_exact."""
    cents_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(), key=lambda r: r.cell
    )
    # Loud config guard (r9 review): a query whose width matches NO
    # stored centroid would NULL every probe score and silently probe
    # cells 0..n_probe-1. It can't reuse _check_query_dims verbatim:
    # this exact twin TOLERATES a mixed-width (malformed) centroid in
    # the sidecar — data quarantines (that cell scores NULL, sorts
    # last), configs fail loud — so the check is against the SET of
    # stored widths, not one rectangular matrix.
    widths = {len(r.centroid) for r in cents_rows}
    if len(query_vec) not in widths:
        raise ValueError(
            f"query vector has {len(query_vec)} dims but the index at "
            f"{path!r} stores centroid widths {sorted(widths)} — "
            "re-embed the query or point at the matching index"
        )

    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    # probe scoring over a centroid DATAFRAME, one row per cell (r11
    # scale probe): the old shape built one decimal expression per
    # (cell x dim) LITERAL on a spark.range(1) row — an
    # O(n_cells*dims)-term codegen tree whose plan build dominated
    # the whole search once cells scaled with the corpus (80 cells:
    # ~43 s/query at the 10x replica; 1000 cells would take minutes).
    # The HOF fold applies the identical _dec casts in the identical
    # element order over the same double values, so every score — and
    # therefore the probe set and the released top-k — is
    # bit-unchanged (ann_ivf_topk_indexed re-verified hash-green).
    cent_df = spark.createDataFrame(
        [(int(r.cell), [float(x) for x in r.centroid]) for r in cents_rows],
        "cell int, centroid array<double>",
    )
    scored = cent_df.select(
        "cell",
        (
            squared_norm(F.col("centroid"))
            - F.lit(2) * dot_product(qlit, F.col("centroid"))
        )
        .cast(_ACC)
        .alias("score"),
    ).collect()
    # NULLS LAST: a centroid whose stored width differs from the
    # query scores None — it must probe after every scorable cell
    # (the live twin's asc_nulls_last), and Python's tuple compare
    # would otherwise raise on None < Decimal
    scored.sort(key=lambda r: (r.score is None, r.score, r.cell))
    probe = [int(r.cell) for r in scored[:n_probe]]

    data = spark.read.parquet(f"{path}/data").where(F.col("cell").isin(probe))
    if query_id is not None:
        data = data.where(F.col(id_col) != query_id)
    qv = spark.range(1).select(
        qlit.alias("__q"), squared_norm(qlit).alias("__qn")
    )
    return (
        data.select(
            F.col(id_col),
            F.col(vec_col),
            squared_norm(F.col(vec_col)).alias("__n"),
        )
        .crossJoin(F.broadcast(qv))
        .select(
            F.col(id_col),
            F.round(
                cosine(
                    dot_product(F.col(vec_col), F.col("__q")),
                    F.col("__n"),
                    F.col("__qn"),
                ),
                6,
            ).alias("cosine"),
        )
        # same NULL-cosine cut as the live twin (mixed-width cells)
        .where(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def ivf_topk_exact(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 3,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search with a deterministic data-point quantizer — the
    oracle-checkable exact twin of ivf_topk.

    Centroids are actual data vectors chosen by a pure id rule
    (id % stride == 1, first n_cells by id — FAISS-style data-point
    seeding without Lloyd refinement), so a SQL oracle can re-derive
    them from the table. Assignment and probe selection run inside
    the plan in exact decimal arithmetic: cell(x) = argmin_c
    ||x-c||² = argmin_c (||c||² - 2·x·c) (the ||x||² term is common),
    ties to the lowest cell index — bit-reproducible in any engine.

    Scale shape: the quantizer collect is n_cells rows; per-row work
    is n_cells decimal dot products folded into one codegen'd
    projection; the probe semi-join broadcasts n_probe cell ids, so
    a 100-TB scan keeps ~n_probe/n_cells of its rows ahead of the
    top-k heap (and the cell column prunes partitions when the index
    is stored partitioned by it). ivf_topk (k-means + Arrow/BLAS
    assignment) is the throughput sibling; this twin is the
    correctness anchor the gate hashes.
    """
    search = embeddings.where(F.col(id_col) != query_id)
    # the quantizer is a property of the CORPUS (built over the full
    # table, query row included) — building it over `search` would
    # make the centroid set depend on which row queries, so a
    # persisted index (ivf_write_index_exact, necessarily
    # query-independent) could never be bit-identical to this live
    # twin for centroid-eligible query ids
    cents, score_array = _stride_quantizer(
        embeddings, n_cells, stride, id_col, vec_col
    )
    q_row = embeddings.where(F.col(id_col) == query_id)
    probe = (
        q_row.select(
            F.posexplode(score_array(F.col(vec_col))).alias("cell", "__score")
        )
        # NULLS LAST: a centroid the query can't score against (dim
        # mismatch) probes after every scorable cell — and matches the
        # oracle engine's null ordering (Spark's bare asc is NULLS
        # FIRST, which would probe unscorable cells first)
        .orderBy(F.asc_nulls_last("__score"), "cell")
        .limit(n_probe)
        .select(F.col("cell").cast("int").alias("cell"))
    )

    scores = score_array(F.col(vec_col))
    assigned = search.select(
        F.col(id_col),
        F.col(vec_col),
        squared_norm(F.col(vec_col)).alias("__n"),
        (F.array_position(scores, F.array_min(scores)) - 1)
        .cast("int")
        .alias("cell"),
    )
    qv = q_row.select(
        F.col(vec_col).alias("__q"), squared_norm(F.col(vec_col)).alias("__qn")
    )
    return (
        assigned.join(F.broadcast(probe), "cell")
        .crossJoin(F.broadcast(qv))
        .select(
            F.col(id_col),
            F.round(
                cosine(
                    dot_product(F.col(vec_col), F.col("__q")),
                    F.col("__n"),
                    F.col("__qn"),
                ),
                6,
            ).alias("cosine"),
        )
        # a probed cell can still hold vectors of a different width
        # than the query (mixed-width corpus): their cosine is NULL —
        # same cut as cosine_topk
        .where(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _pq_sub(dims: int, m: int) -> int:
    """Subspace width, loud on misconfiguration (r10 review): with
    dims % m != 0 the exact twins silently ignored the trailing
    components while the BLAS reshape crashed — one loud guard for
    one bad config (configs fail loud; data quarantines)."""
    if dims % m != 0:
        raise ValueError(
            f"PQ needs dims divisible by m: dims={dims}, m={m} leaves "
            f"{dims % m} trailing components no subspace covers"
        )
    return dims // m


def _pq_centroids(
    embeddings: DataFrame, k: int, stride: int, id_col: str, vec_col: str
):
    """Stride-selected data-point codebook source rows (same
    deterministic id rule as ivf_topk_exact, so a SQL oracle can
    re-derive them). Loud on an EMPTY codebook (r10 review): no
    id % stride == 1 row would otherwise NULL every score array and
    silently encode all-NULL codes / return empty searches — the
    config (stride vs the corpus's id space) is wrong, not the
    data."""
    cents = (
        embeddings.where(F.col(id_col) % stride == 1)
        .orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if not cents:
        raise ValueError(
            f"PQ/IVF codebook is empty: no scoreable row has "
            f"{id_col} % {stride} == 1 — pick a stride that hits the "
            "corpus's id space"
        )
    return cents


def _dec_arr(vals) -> Column:
    return F.array(*[_dec(F.lit(float(x))) for x in vals])


def pq_encode_exact(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    stride: int = 50,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization encode (Jégou et al. 2011): split each
    vector into m subspaces, assign each sub-vector to its nearest of
    k per-subspace centroids, emit (id, subspace, code) — the 8x-64x
    compressed representation ANN systems keep in memory at scale.

    Codebooks are sub-vectors of stride-selected data points (the
    deterministic id rule shared with ivf_topk_exact) and assignment
    runs in exact decimal (argmin_c ||x_j - c_j||^2 via
    ||c_j||^2 - 2 x_j·c_j, ties to the lowest code), so the encoding
    is bit-reproducible in any engine — the oracle-checkable exact
    twin; a k-means/BLAS sibling would follow ivf_topk/knn_join_
    blocked's pattern for throughput.

    Scale shape: one projection over the scan (m·k decimal dots per
    row, no shuffle); the codebook collect is k rows."""
    sub = _pq_sub(dims, m)
    # PQ declares its dims: a vector of any other width has no valid
    # sub-vectors (slices would NULL-pad), and a non-finite component
    # would NULL one subspace's whole score array, minting a NULL code
    # next to valid ones — exclude both up front, quarantined like
    # every other malformed-vector path here (also keeps a malformed
    # stride row out of the codebook)
    embeddings = embeddings.where(
        (F.size(F.col(vec_col)) == dims) & all_finite(vec_col)
    )
    cents = _pq_centroids(embeddings, k, stride, id_col, vec_col)

    def sub_scores(j: int) -> Column:
        xs = F.slice(F.col(vec_col), j * sub + 1, sub)
        scores = []
        for crow in cents:
            c = _dec_arr(crow[vec_col][j * sub : (j + 1) * sub])
            scores.append(
                (squared_norm(c) - F.lit(2) * dot_product(xs, c)).cast(_ACC)
            )
        return F.array(*scores)

    # materialize each score array ONCE: argmin references it twice
    # (array_min + array_position), and a multiply-referenced
    # non-cheap alias blocks CollapseProject from re-inlining the
    # m*k-dot expression (3x measured)
    df2 = embeddings.select(F.col(id_col), F.col(vec_col))
    for j in range(m):
        df2 = df2.withColumn(f"__s{j}", sub_scores(j))
    codes = F.array(
        *[
            (
                F.array_position(F.col(f"__s{j}"), F.array_min(F.col(f"__s{j}")))
                - 1
            ).cast("int")
            for j in range(m)
        ]
    )
    return df2.select(
        F.col(id_col), F.posexplode(codes).alias("subspace", "code")
    )


def pq_topk_exact(
    embeddings: DataFrame,
    query_id: int,
    n_results: int = 10,
    m: int = 4,
    k: int = 8,
    stride: int = 50,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: score every encoded vector
    against the query using only its codes and the per-subspace
    query→centroid table — the memory-resident search PQ exists for.

    The score is sum_j (||c_{code_j}||² - 2 q_j·c_{code_j}), the
    code-dependent part of the true squared distance (the common
    ||q_j||² terms cannot change the ordering); all decimal-exact, so
    ordering and output reproduce bit-identically cross-engine.

    Scale shape: codes are computed in the same projection (no join
    between encode and score); the per-row work after encoding is m
    array lookups; output is a top-k heap. At 100 TB the codes column
    would be precomputed once and stored."""
    sub = _pq_sub(dims, m)
    # same quarantine as pq_encode_exact (width + all-finite) —
    # applied before the search/codebook/query splits so a malformed
    # vector can't become a codebook entry or a garbage all-NULL
    # query table
    embeddings = embeddings.where(
        (F.size(F.col(vec_col)) == dims) & all_finite(vec_col)
    )
    search = embeddings.where(F.col(id_col) != query_id)
    # codebook from the FULL corpus, query row included (r10 review):
    # a search-side codebook is query-dependent — for a
    # stride-eligible query_id the codes recomputed here would
    # disagree with pq_encode_exact's stored codes, which is exactly
    # the corpus-invariance rule ivf_topk_exact documents. The oracle
    # mirrors (its cent CTE no longer excludes the query id).
    cents = _pq_centroids(embeddings, k, stride, id_col, vec_col)
    q_row = embeddings.where(F.col(id_col) == query_id)

    def sub_scores(j: int, vec: Column) -> Column:
        xs = F.slice(vec, j * sub + 1, sub)
        scores = []
        for crow in cents:
            c = _dec_arr(crow[vec_col][j * sub : (j + 1) * sub])
            scores.append(
                (squared_norm(c) - F.lit(2) * dot_product(xs, c)).cast(_ACC)
            )
        return F.array(*scores)

    # query-side ADC table: m arrays of k exact decimal scores,
    # broadcast as one row
    qcols = [
        sub_scores(j, F.col(vec_col)).alias(f"__q{j}") for j in range(m)
    ]
    qtab = q_row.select(*qcols)
    scored = search.crossJoin(F.broadcast(qtab))
    # materialize score arrays once (see pq_encode_exact)
    for j in range(m):
        scored = scored.withColumn(f"__s{j}", sub_scores(j, F.col(vec_col)))
    adc = None
    for j in range(m):
        s = F.col(f"__s{j}")
        term = F.element_at(
            F.col(f"__q{j}"),
            F.array_position(s, F.array_min(s)).cast("int"),
        )
        adc = term if adc is None else adc + term
    return (
        scored.select(
            F.col(id_col),
            F.round(adc.cast("double"), 6).alias("adc_score"),
        )
        .orderBy("adc_score", id_col)
        .limit(n_results)
    )


def _pq_codebook_np(cents, m: int, sub: int, vec_col: str):
    import numpy as np

    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in cents])
    return C.reshape(len(cents), m, sub).transpose(1, 0, 2)  # m x k x sub


def pq_encode_blas(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    stride: int = 50,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput sibling of pq_encode_exact: identical stride
    codebook and argmin semantics, assignment as one BLAS gram matrix
    per subspace in Arrow-batched mapInPandas (pytest-verified equal
    to the exact twin; the decimal twin remains the oracle anchor)."""
    import numpy as np

    sub = _pq_sub(dims, m)
    # same malformed-vector quarantine as the exact twin — INCLUDING
    # all_finite (r10 review: width alone let a NaN/Inf vector mint
    # garbage codes via np.argmin over a NaN score row, diverging
    # from the exact twin the docstring claims pytest-equality with)
    embeddings = embeddings.where(
        (F.size(F.col(vec_col)) == dims) & all_finite(vec_col)
    )
    cents = _pq_centroids(embeddings, k, stride, id_col, vec_col)
    CB = _pq_codebook_np(cents, m, sub, vec_col)
    cn = [(CB[j] ** 2).sum(1) for j in range(m)]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = (
                np.stack(pdf[vec_col].to_numpy())
                .astype(np.float64)
                .reshape(n, m, sub)
            )
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                codes[:, j] = (cn[j][None, :] - 2 * (X[:, j, :] @ CB[j].T)).argmin(1)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), m),
                    "subspace": np.tile(np.arange(m, dtype=np.int32), n),
                    "code": codes.reshape(-1),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, subspace int, code int"
    )


def pq_topk_blas(
    embeddings: DataFrame,
    query_id: int,
    n_results: int = 10,
    m: int = 4,
    k: int = 8,
    stride: int = 50,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput sibling of pq_topk_exact: codes and the query ADC
    table computed in numpy, each partition emits its local top-n,
    the tiny union is re-topped globally (the cosine_topk_numpy
    shape). Same ordering as the exact twin on non-adversarial data
    (pytest-verified)."""
    import numpy as np

    sub = _pq_sub(dims, m)
    # same malformed-vector quarantine as the exact twin (also makes
    # an off-width or non-finite query row degrade to the empty
    # result below); all_finite added r10 — see pq_encode_blas
    embeddings = embeddings.where(
        (F.size(F.col(vec_col)) == dims) & all_finite(vec_col)
    )
    search = embeddings.where(F.col(id_col) != query_id)
    # full-corpus codebook (r10): see pq_topk_exact
    cents = _pq_centroids(embeddings, k, stride, id_col, vec_col)
    CB = _pq_codebook_np(cents, m, sub, vec_col)
    cn = [(CB[j] ** 2).sum(1) for j in range(m)]
    qrow = embeddings.where(F.col(id_col) == query_id).first()
    if qrow is None:
        # degrade like the exact twin: an absent query id yields an
        # empty result, not a driver TypeError on None[vec_col]
        return embeddings.sparkSession.createDataFrame(
            [], f"{id_col} long, adc_score double"
        )
    qv = np.asarray(qrow[vec_col], dtype=np.float64).reshape(m, sub)
    qtab = np.stack([cn[j] - 2 * (CB[j] @ qv[j]) for j in range(m)])  # m x k

    def run(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = (
                np.stack(pdf[vec_col].to_numpy())
                .astype(np.float64)
                .reshape(n, m, sub)
            )
            adc = np.zeros(n)
            for j in range(m):
                codes = (cn[j][None, :] - 2 * (X[:, j, :] @ CB[j].T)).argmin(1)
                adc += qtab[j][codes]
            # (rounded adc, id) lexsort: the local cut must break
            # score ties by id exactly like the global orderBy below,
            # which ranks the ROUNDED adc_score — lexsorting the raw
            # values would cut rounding-induced ties by raw score
            # instead of by id and diverge from the exact twin
            r = np.round(adc, 6)
            top = np.lexsort((pdf[id_col].to_numpy(), r))[:n_results]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[top],
                    "adc_score": r[top],
                }
            )

    local = search.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, adc_score double"
    )
    return local.orderBy("adc_score", id_col).limit(n_results)


def _bucketed_relation(
    embeddings: DataFrame, id_col: str, vec_col: str, planes: int,
    dims: int, exact: bool,
) -> DataFrame:
    """(__id, __v, __n, __bucket) projection, persisted: both sides of
    the self-join reference it, and without the persist each side
    re-evaluates the 2^planes-way projection over the full scan
    (measured 2x end-to-end on the bench)."""
    hp = hyperplanes(dims, planes)
    return embeddings.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        squared_norm(F.col(vec_col), exact).alias("__n"),
        lsh_bucket_expr(vec_col, hp, exact).alias("__bucket"),
    ).transform(cache.persist)


def _bucket_self_join(e: DataFrame, max_bucket: int | None) -> DataFrame:
    """Self-join of the bucketed relation on __bucket, with bounded
    per-task skew. Result columns: id_a/va/na, id_b/vb/nb.

    A hot bucket makes the plain equi-join quadratic *inside one
    task*. With max_bucket set, buckets of size s are split into
    g = ceil(s / max_bucket) salt groups: side A takes a deterministic
    hash salt, side B is replicated to every salt, so each (a, b) pair
    still meets exactly ONCE (same semantics, g x smaller tasks; the
    replication factor only applies within the oversized bucket).
    Bucket count is <= 2^planes, so the size table broadcasts."""
    a = e.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("va"),
        F.col("__n").alias("na"), "__bucket",
    )
    b = e.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("vb"),
        F.col("__n").alias("nb"), "__bucket",
    )
    if max_bucket is None:
        return a.join(b, ["__bucket"])
    sizes = e.groupBy("__bucket").agg(
        F.greatest(
            F.lit(1),
            F.ceil(F.count(F.lit(1)) / F.lit(max_bucket)).cast("int"),
        ).alias("__g")
    )
    a2 = a.join(F.broadcast(sizes), "__bucket").withColumn(
        "__salt", F.pmod(F.xxhash64("id_a"), F.col("__g")).cast("int")
    ).drop("__g")
    b2 = b.join(F.broadcast(sizes), "__bucket").withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.col("__g") - 1))
    ).drop("__g")
    return a2.join(b2, ["__bucket", "__salt"]).drop("__salt")


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    dims: int = 64,
    exact: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine. With planes=None this is the
    exact quadratic baseline (fine for correctness scale); passing
    planes enables LSH blocking — candidates must share a bucket —
    which is the 100-TB path (the equi-join on bucket key replaces
    the cartesian). max_bucket bounds within-bucket skew by salting
    oversized buckets (see _bucket_self_join) without changing the
    result."""
    if planes is not None:
        e = _bucketed_relation(embeddings, id_col, vec_col, planes, dims, exact)
        joined = _bucket_self_join(e, max_bucket).where(
            F.col("id_a") < F.col("id_b")
        )
    else:
        # the same malformed-vector quarantine the LSH branch applies
        # via lsh_bucket_expr's all_finite (r10 review): on the
        # exact=False path a NaN/Inf component made cosine NaN, which
        # Spark's NaN semantics pass through denom>0 AND >= threshold
        # — the malformed row minted pairs. On the exact path the cut
        # is value-identical (those rows scored NULL and failed the
        # threshold anyway); either way the pinned element domain
        # applies to every similarity path (cosine_topk's clean cut).
        clean = embeddings.where(all_finite(vec_col))
        a = clean.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            squared_norm(F.col(vec_col), exact).alias("na"),
        )
        b = clean.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            squared_norm(F.col(vec_col), exact).alias("nb"),
        )
        joined = a.join(b, F.col("id_a") < F.col("id_b"))
    out = joined.select(
        "id_a",
        "id_b",
        F.round(
            cosine(dot_product("va", "vb", exact), F.col("na"), F.col("nb")), 6
        ).alias("cosine"),
    )
    return out.where(F.col("cosine") >= threshold)


def knn_join(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | None = None,
    dims: int = 64,
    exact: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """Batch k-NN join: for EVERY vector, its k most-cosine-similar
    neighbors — the shape that builds retrieval training pairs. With
    planes=None the candidate set is all pairs (exact, correctness
    scale); with planes set, candidates must share an LSH bucket, so
    the self-join is an equi-join on the bucket key and the rank
    window shuffles by vector id — both well-distributed at 100 TB.
    max_bucket bounds within-bucket skew by salting oversized buckets
    (see _bucket_self_join) without changing the result. Ranking uses
    the ROUNDED cosine (ties broken by neighbor id) so the result is
    engine-portable."""
    if planes is not None:
        e = _bucketed_relation(embeddings, id_col, vec_col, planes, dims, exact)
        cand = _bucket_self_join(e, max_bucket).where(
            F.col("id_a") != F.col("id_b")
        )
    else:
        # same quarantine as cosine_dup_pairs' all-pairs branch (r10):
        # without it a NaN cosine ranks ABOVE every real score in the
        # desc window on the exact=False path and becomes everyone's
        # rank-1 neighbor (NaN passes isNotNull)
        e = embeddings.where(all_finite(vec_col)).select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__v"),
            squared_norm(F.col(vec_col), exact).alias("__n"),
        ).transform(cache.persist)
        a = e.select(
            F.col("__id").alias("id_a"), F.col("__v").alias("va"),
            F.col("__n").alias("na"),
        )
        b = e.select(
            F.col("__id").alias("id_b"), F.col("__v").alias("vb"),
            F.col("__n").alias("nb"),
        )
        cand = a.join(b, F.col("id_a") != F.col("id_b"))
    scored = cand.select(
        F.col("id_a").alias(id_col),
        F.col("id_b").alias("neighbor_id"),
        F.round(
            cosine(dot_product("va", "vb", exact), F.col("na"), F.col("nb")), 6
        ).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), "neighbor_id")
    return (
        # NULL cosine (zero-norm or dim-mismatched neighbor) is not a
        # neighbor: filter before ranking so such rows can't take one
        # of the k slots when a vector has few scorable candidates
        scored.where(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _numpy_bucketed(
    embeddings: DataFrame, id_col: str, vec_col: str, planes: int, dims: int
) -> DataFrame:
    """LSH bucket id per vector via one BLAS matrix multiply per Arrow
    batch (double math — the throughput twin of lsh_bucket_expr)."""
    import numpy as np

    W = np.array(
        [[float(w) for w in row] for row in hyperplanes(dims, planes)]
    )

    def tag(batches):
        import pandas as pd

        for pdf in batches:
            # quarantine dim-mismatched vectors (they'd ragged-raise
            # the stack); lsh_bucket_expr NULL-buckets the same rows.
            # Clean batches stack once — no per-row len() scan
            pdf, M = _stack_batch(pdf, vec_col, W.shape[1])
            if len(pdf) == 0:
                continue
            # finite + element-domain mask, mirroring lsh_bucket_expr's
            # all_finite (r10 review): an Inf-component vector got a
            # REAL bucket here while the expression twin NULL-bucketed
            # it, so block_topk emitted NaN-cosine neighbor rows the
            # expression path excludes
            ok = np.isfinite(M).all(axis=1) & (
                np.abs(M) <= _ELEM_BOUND
            ).all(axis=1)
            if not ok.all():
                pdf, M = pdf[ok], M[ok]
                if len(pdf) == 0:
                    continue
            bits = (M @ W.T) >= 0
            bucket = (bits * (1 << np.arange(planes))).sum(1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "bucket": bucket.astype("int64"),
                }
            )

    elem = embeddings.schema[vec_col].dataType.elementType.simpleString()
    return embeddings.select(id_col, vec_col).mapInPandas(
        tag, f"{id_col} long, {vec_col} array<{elem}>, bucket long"
    )


def knn_join_blocked(
    embeddings: DataFrame,
    k: int = 3,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Throughput path for the LSH k-NN join: same candidate semantics
    as knn_join(planes=..., exact=False) — neighbors must share the
    sign-pattern bucket — but the within-bucket scoring is one BLAS
    gram matrix per bucket in applyInPandas instead of a pair-level
    join + interpreted array-fold dot products (higher-order
    F.aggregate exprs stay outside whole-stage codegen). Ranking uses
    the ROUNDED cosine with neighbor-id tiebreak, identical to
    knn_join. Shuffle: one exchange on the bucket id; within-bucket
    work is O(n_b^2) — size buckets via planes (or pre-cap with
    knn_join(max_bucket=...) when the corpus is skewed)."""
    import numpy as np

    bucketed = _numpy_bucketed(embeddings, id_col, vec_col, planes, dims)

    def block_topk(pdf):
        import pandas as pd

        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        ids = pdf[id_col].to_numpy()
        # zero-norm (padding) vectors have no cosine direction: the
        # expression twin scores them NULL (never ranked into top-k);
        # here they drop entirely — without the mask their rows/cols
        # are NaN, and Spark's desc sort ranks NaN above every real
        # cosine
        nz = np.linalg.norm(M, axis=1) > 0
        M, ids = M[nz], ids[nz]
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {id_col: [], "neighbor_id": [], "cosine": [], "rank": []}
            ).astype({id_col: "int64", "neighbor_id": "int64",
                      "cosine": "float64", "rank": "int32"})
        norms = np.linalg.norm(M, axis=1)
        C = np.round((M @ M.T) / np.outer(norms, norms), 6)
        out_id, out_nb, out_cos, out_rank = [], [], [], []
        kk = min(k, n - 1)
        # sort each row by (-cosine, neighbor_id): lexsort on rounded
        # cosines reproduces the window-rank tiebreak exactly
        for i in range(n):
            row = C[i]
            order = np.lexsort((ids, -row))
            order = order[ids[order] != ids[i]][:kk]
            out_id.extend([ids[i]] * len(order))
            out_nb.extend(ids[order])
            out_cos.extend(row[order])
            out_rank.extend(range(1, len(order) + 1))
        return pd.DataFrame(
            {id_col: out_id, "neighbor_id": out_nb,
             "cosine": out_cos, "rank": np.array(out_rank, dtype="int32")}
        )

    return bucketed.groupBy("bucket").applyInPandas(
        block_topk, f"{id_col} long, neighbor_id long, cosine double, rank int"
    )


def cosine_dup_pairs_blocked(
    embeddings: DataFrame,
    threshold: float = 0.4,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """Throughput path for LSH near-dup pair mining: per-bucket BLAS
    gram matrix + threshold, same candidate semantics as
    cosine_dup_pairs(planes=..., exact=False)."""
    import numpy as np

    bucketed = _numpy_bucketed(embeddings, id_col, vec_col, planes, dims)

    def block_pairs(pdf):
        import pandas as pd

        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        ids = pdf[id_col].to_numpy()
        nz = np.linalg.norm(M, axis=1) > 0  # see block_topk
        M, ids = M[nz], ids[nz]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        norms = np.linalg.norm(M, axis=1)
        C = np.round((M @ M.T) / np.outer(norms, norms), 6)
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = C[ii, jj] >= threshold
        ia, ib = ids[ii[keep]], ids[jj[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": C[ii, jj][keep]})

    return bucketed.groupBy("bucket").applyInPandas(
        block_pairs, "id_a long, id_b long, cosine double"
    )


def group_centroids(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroids, flattened to (group, dim_idx,
    centroid, n_vectors) rows — the cluster-statistics step of a
    corpus-curation pipeline (per-source drift, per-label summary,
    IVF coarse-centroid refresh).

    Scale shape: posexplode multiplies rows by dim, but the
    groupBy(group, dim) partial-aggregates map-side, so the shuffle
    carries |groups| × dim rows — independent of corpus size. The
    per-element sum is DECIMAL (order-independent, engine-portable);
    the mean is one double division."""
    x = emb.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("dim_idx", "v")
    )
    # present = FINITE elements (r9): a NaN/±Inf/NULL component is
    # missing from BOTH the sum and the divisor — dividing the
    # null-skipping sum by the raw row count biased contaminated
    # centroids toward zero (the next_k_aggregate avg bug class).
    # n_vectors stays the count of vectors having this dim.
    return (
        x.groupBy(group_col, "dim_idx")
        .agg(
            F.sum(_dec(F.col("v"))).alias("s"),
            F.count(_dec(F.col("v"))).alias("__np"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select(
            F.col(group_col),
            F.col("dim_idx"),
            (F.col("s").cast("double") / F.col("__np")).alias("centroid"),
            "n_vectors",
        )
    )


def _stride_quantizer(
    df: DataFrame, n_cells: int, stride: int, id_col: str, vec_col: str
):
    """Deterministic coarse quantizer shared by the exact IVF twin and
    semantic_dedup: centroids are the first n_cells data vectors with
    id % stride == 1 (FAISS-style data-point seeding, re-derivable in
    SQL), and the returned score_array expression computes
    ||c||^2 - 2*x.c per cell in exact decimal — cell(x) =
    argmin(score), ties to the lowest index.

    PLAN-SIZE BOUND (r11 scale probe): score_array embeds
    O(n_cells * dims) decimal LITERALS in the plan — fine at the
    exact twins' gate-scale cell counts (n_cells <= ~100), but the
    plan/codegen cost grows with the product, so do NOT scale
    n_cells with the corpus here. The corpus-scaled path is the
    throughput sibling (ivf_index/ivf_write_index: kmeans centroids,
    Arrow-batched numpy assignment — plan size O(1)); these exact
    twins exist to anchor correctness, and ivf_topk_indexed_exact's
    QUERY-side probe scoring already runs data-side for the same
    reason."""
    cents = (
        df.where(F.col(id_col) % stride == 1)
        .orderBy(id_col)
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    if not cents:
        # configs fail loud (r10 review; ivf_index raises for its
        # all-NULL sample the same way): an empty codebook would NULL
        # every score -> every cell NULL -> semantic_dedup silently
        # excludes the ENTIRE corpus from the release
        raise ValueError(
            f"stride quantizer codebook is empty: no row has "
            f"{id_col} % {stride} == 1 — pick a stride that hits the "
            "corpus's id space"
        )

    def cent_lit(vec) -> Column:
        return F.array(*[_dec(F.lit(float(x))) for x in vec])

    def score_array(vec: Column) -> Column:
        return F.array(
            *[
                (
                    squared_norm(cent_lit(crow[vec_col]))
                    - F.lit(2) * dot_product(vec, cent_lit(crow[vec_col]))
                ).cast(_ACC)
                for crow in cents
            ]
        )

    return cents, score_array


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.5,
    n_cells: int = 8,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. '23, arXiv:2303.09540): cluster the
    embedding space coarsely, then WITHIN each cluster drop every
    vector that has an earlier (lower-id) clustermate with cosine >=
    threshold — one representative survives per near-duplicate
    neighborhood without any cross-cluster pair ever being scored.
    Returns (id, cell, keep); downstream joins `keep` back to the
    corpus.

    This twin uses the deterministic stride quantizer (same rule as
    ivf_topk_exact) and exact decimal cosine, so a SQL oracle
    re-derives the full result. The k-means IVF path
    (ivf_index/ivf_assign) is the throughput sibling for real runs.

    Scale shape: cell assignment is a per-row codegen expression
    (broadcast centroid literals, no shuffle); the candidate join is
    an equi-join on cell, so cost is sum of per-cell squares — at
    100 TB you size n_cells so clusters stay small (SemDeDup's own
    regime: tens of thousands of clusters), which also keeps the
    cell equi-join skew-free; the dup set is a groupBy on the
    already-thresholded pairs."""
    cents, score_array = _stride_quantizer(
        embeddings, n_cells, stride, id_col, vec_col
    )
    scores = score_array(F.col(vec_col))
    assigned = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        squared_norm(F.col(vec_col)).alias("__n"),
        (F.array_position(scores, F.array_min(scores)) - 1)
        .cast("int")
        .alias("cell"),
    ).transform(cache.persist)
    # a vector whose distance to every centroid is NULL (dim mismatch
    # with the whole codebook) has no cell: it is excluded from the
    # release — dedup does not judge rows it cannot score; callers
    # keep unjudged rows by anti-joining the release. Same quarantine
    # rule as ivf_topk_exact's cell join.
    assigned = assigned.where(F.col("cell").isNotNull())
    a = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("__n").alias("na"),
    )
    b = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("__n").alias("nb"),
    )
    dups = (
        a.join(b, ["cell"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.round(
                cosine(dot_product("va", "vb"), F.col("na"), F.col("nb")), 6
            )
            >= F.lit(threshold)
        )
        .groupBy("id_b")
        .agg(F.count(F.lit(1)).alias("__nd"))
    )
    return (
        assigned.join(dups, assigned[id_col] == dups["id_b"], "left")
        .select(
            F.col(id_col),
            F.col("cell"),
            F.col("id_b").isNull().alias("keep"),
        )
    )


def semantic_dedup_blas(
    embeddings: DataFrame,
    threshold: float = 0.5,
    n_cells: int = 8,
    stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput sibling of semantic_dedup: identical cells (stride
    quantizer) and identical keep rule, but within-cell cosines come
    from one per-cell gram matrix in numpy (applyInPandas) instead of
    the interpreted decimal expression — the same exact/BLAS twin
    split as knn_join vs knn_join_blocked. Cosines are rounded to 6
    decimals before the threshold, so the two paths agree everywhere
    off the 1e-6 rounding boundary (pytest-equal on the test data).

    Scale note: a cell is processed by ONE task — size n_cells so
    cells fit a worker (SemDeDup's regime has tens of thousands of
    small clusters, which also spreads this evenly)."""
    import numpy as np
    import pandas as pd

    cents, _ = _stride_quantizer(embeddings, n_cells, stride, id_col, vec_col)
    cmat = np.stack(
        [np.asarray(c[vec_col], dtype=np.float64) for c in cents]
    )
    cnorm = (cmat * cmat).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            # quarantine dim-mismatched vectors (no cell — excluded
            # from the release, same rule as the exact twin); clean
            # batches stack once, no per-row scan
            pdf, v = _stack_batch(pdf, vec_col, cmat.shape[1])
            if len(pdf) == 0:
                continue
            # finite + element-domain mask (r10 review): the exact
            # twin's decimal scores are all NULL for such a row ->
            # cell NULL -> excluded from the release; without the mask
            # np.argmin assigned it an arbitrary cell and released it
            # keep=true — the twins returned different row sets
            ok = np.isfinite(v).all(axis=1) & (
                np.abs(v) <= _ELEM_BOUND
            ).all(axis=1)
            if not ok.all():
                pdf, v = pdf[ok], v[ok]
                if len(pdf) == 0:
                    continue
            # argmin(||c||^2 - 2 x.c), ties to lowest index (argmin
            # picks the first minimum — same rule as the exact twin)
            score = cnorm[None, :] - 2.0 * (v @ cmat.T)
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["cell"] = score.argmin(axis=1).astype(np.int32)
            yield pdf

    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<double>, cell int"
    )

    def per_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col].to_numpy()[order]])
        nrm = np.sqrt((v * v).sum(axis=1))
        nrm[nrm == 0] = np.nan  # zero vectors match nothing (NULL cosine)
        cos = np.round((v @ v.T) / np.outer(nrm, nrm), 6)
        dup = np.zeros(len(ids), dtype=bool)
        iu, ju = np.triu_indices(len(ids), 1)  # i < j in id order
        dup[np.unique(ju[cos[iu, ju] >= threshold])] = True
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": np.full(len(ids), pdf["cell"].iloc[0], dtype=np.int32),
                "keep": ~dup,
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        per_cell, schema=f"{id_col} long, cell int, keep boolean"
    )
