"""Document deduplication — exact, MinHash+LSH, SimHash, and n-gram
Jaccard. (Extension beyond the Hillview reference, SURVEY.md §2.4.)

Scale design: every variant is built on inverted-index joins
(explode a per-doc key set, equi-join on the key) — never a
cartesian product. Band/chunk keys are high-cardinality, so the
shuffles distribute well; frequent-shingle skew can be capped with
max_df. All hashing is md5-derived so results are engine-portable
(the DuckDB oracle reproduces them bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hillview_spark import cache

TOKEN_RE = r"\s+"


def tokens(text: Column) -> Column:
    r"""Whitespace tokens with empties dropped. F.trim strips only
    ASCII spaces, so a leading/trailing tab or newline used to leave
    '' tokens in the split output (Spark keeps leading/trailing empty
    fields), silently corrupting shingle sets and MinHash/SimHash
    fingerprints — a byte-near-identical doc with a leading newline
    scored Jaccard 0.5 against its twin (r9 review). Internal
    whitespace runs never produce empties (the \s+ regex eats the
    run), so the filter only repairs the edges. The DuckDB oracle
    twins apply the same list_filter."""
    return F.filter(F.split(F.trim(text), TOKEN_RE), lambda x: x != "")


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams over an already-materialized token-array
    COLUMN. Pass a named column, not an inline split(...) expression:
    higher-order lambdas re-evaluate their free-variable expressions
    per element, so an inline split re-parses the text O(shingles)
    times per row (measured 17x slower at sf0.1). Docs with fewer
    than n tokens yield no shingles (Spark's sequence(1,0) would
    count down, so guard explicitly)."""
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column. Convenience wrapper —
    inside explodes/joins prefer ``df.withColumn("__toks",
    tokens(...))`` + :func:`shingles_of` so the token array
    materializes once (see shingles_of)."""
    return shingles_of(tokens(text), n)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by content hash: one row per distinct
    text with the keeper (min id) and the duplicate count. Map-side
    combine makes this a single cheap shuffle on the 128-bit key."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # withColumn materializes the token array once per row — the
    # projection is a barrier CollapseProject won't inline through
    # (shingles_of references it many times).
    return (
        df.withColumn("__toks", tokens(F.col(text_col)))
        .select(
            F.col(id_col).alias("doc"),
            F.explode(shingles_of(F.col("__toks"), n)).alias("s"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word-n-gram sets via inverted-index join:
    docs sharing >=1 shingle become candidates, the join count IS the
    intersection size, union = |A|+|B|-inter. max_df drops shingles
    appearing in more than max_df docs (stop-shingle skew guard for
    the 100-TB path; changes semantics only for ubiquitous grams)."""
    inter = _pair_intersections(df, n, id_col, text_col, max_df)
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return inter.where(jac >= F.lit(threshold)).select(
        F.col("d1").alias("doc_id_1"),
        F.col("d2").alias("doc_id_2"),
        F.round(jac, 4).alias("jaccard"),
    )


def _pair_intersections(
    df: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    max_df: int | None,
) -> DataFrame:
    """Shared candidates-then-verify core of the set-similarity
    pair operators (ngram_jaccard_pairs, ngram_containment_pairs):
    one row per unordered candidate pair (d1 < d2) with the exact
    shingle-set intersection size `c` and both set sizes (na, nb).
    Docs sharing zero shingles never pair (inverted index, never
    all-pairs)."""
    # Join on a 60-bit hash of the shingle, not the string — the
    # shuffle carries 8-byte keys. Unlike the exact-substring family
    # (where a collision could DELETE text and the key is the full
    # md5), a collision here only perturbs one similarity score by
    # one gram (~n^2/2^60 odds, nil) — the score-vs-edit distinction
    # that sets the two families' key widths.
    sh = _shingle_table(df, id_col, text_col, n).select(
        "doc", _token_hash(F.col("s")).alias("s")
    )
    if max_df is not None:
        rare = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_df)
            .select("s")
        )
        sh = sh.join(rare, "s")
    # the (possibly filtered) shingle table feeds sizes + both join
    # sides — persist AFTER the max_df filter so none of the three
    # consumers recomputes the df-count subtree (MEMORY_AND_DISK;
    # spills rather than recomputing at scale)
    sh = cache.persist(sh)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc").alias("d1"), "s")
    b = sh.select(F.col("doc").alias("d2"), "s")
    inter = (
        a.join(b, "s")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc").alias("d1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc").alias("d2"), F.col("n").alias("nb"))
    return inter.join(sa, "d1").join(sb, "d2")


def ngram_containment_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric set CONTAINMENT over word-n-gram sets (r15):
    containment of A in B = |A∩B| / |A| — the duplication measure
    Jaccard structurally misses. A short document fully quoted
    inside a much larger one (a pasted article inside a forum
    thread, a README embedded in a paper, boilerplate wrapped in
    new text) has containment 1.0 but Jaccard |A|/|B| → 0 as the
    host grows, so a resemblance threshold never fires; Broder's
    original resemblance/containment pair (SEQUENCES '97) and the
    Lee et al. dedup discussion both treat containment as the
    quote-detection direction.

    Output: one row per unordered candidate pair (doc_id_1 <
    doc_id_2) with BOTH directions — containment_1_in_2 = c/|A|,
    containment_2_in_1 = c/|B| — kept when the LARGER direction
    clears the threshold (the asymmetric "one of them is mostly
    inside the other" question); both scores are released so the
    caller can tell which document is the quote and which the host.
    Docs with no shingles (NULL/short text) have no set and never
    pair — same rule as ngram_jaccard_pairs.

    100-TB shape: identical to ngram_jaccard_pairs —
    _pair_intersections' inverted-index join (never all-pairs),
    max_df as the stop-shingle skew guard; the direction scores are
    a codegen'd select on the pair aggregate."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(
            f"threshold must be in (0, 1], got {threshold!r}"
        )
    inter = _pair_intersections(df, n, id_col, text_col, max_df)
    c12 = F.col("c").cast("double") / F.col("na")
    c21 = F.col("c").cast("double") / F.col("nb")
    return inter.where(
        F.greatest(c12, c21) >= F.lit(threshold)
    ).select(
        F.col("d1").alias("doc_id_1"),
        F.col("d2").alias("doc_id_2"),
        F.round(c12, 4).alias("containment_1_in_2"),
        F.round(c21, 4).alias("containment_2_in_1"),
    )


# MinHash affine-permutation constants: h_i = (A_i*h + B_i) mod P over
# a 28-bit base hash. P is prime > 2^28; A_i*h + B_i stays < 2^63.
MINHASH_P = 268_435_459


def _affine(i: int) -> tuple[int, int]:
    return (2 * i + 3, 7 * i + 11)


def verify_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.3,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard for an explicit candidate-pair set (the verify
    stage after LSH candidate generation). Shingle tables are
    semi-joined down to candidate docs first, so cost scales with
    |candidates|, not |corpus|^2 — the canonical near-dup pipeline
    shape at 100 TB: minhash_lsh_pairs() >> verify_jaccard()."""
    # pairs feeds two joins and the candidate-doc set; without a
    # persist Spark would recompute the whole LSH DAG per reference.
    pairs = pairs.transform(cache.persist)
    cand_docs = (
        pairs.select(F.col("doc_id_1").alias("doc"))
        .union(pairs.select(F.col("doc_id_2").alias("doc")))
        .distinct()
    )
    # Semi-join the DOCUMENTS down to candidates BEFORE the shingle
    # explode (r15 opt): Catalyst cannot push a join below a
    # Generate, so filtering after _shingle_table tokenized and
    # exploded the whole corpus only to discard non-candidate rows.
    # At 100 TB candidates << corpus, so this bounds the tokenize +
    # explode cost by the candidate set too, not just the join.
    cand_ids = cand_docs.select(F.col("doc").alias(id_col))
    sh = (
        _shingle_table(
            df.join(F.broadcast(cand_ids), id_col, "left_semi"),
            id_col, text_col, n,
        )
        .select("doc", _token_hash(F.col("s")).alias("s"))
        .transform(cache.persist)
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc").alias("doc_id_1"), "s")
    b = sh.select(F.col("doc").alias("doc_id_2"), "s")
    inter = (
        pairs.join(a, "doc_id_1")
        .join(b, ["doc_id_2", "s"])
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc").alias("doc_id_1"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_id_2"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(F.broadcast(sa), "doc_id_1")
        .join(F.broadcast(sb), "doc_id_2")
        .where(jac >= F.lit(threshold))
        .select("doc_id_1", "doc_id_2", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc: one md5 per shingle yields a 28-bit
    base hash; the num_hashes permutations are affine maps of it
    (classic (a*h+b) mod p family) — arithmetic, not re-hashing.
    The min-aggregates are mergeable — pure map-side combine, exactly
    a Hillview-style sketch."""
    sh = _shingle_table(df, id_col, text_col, n).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("s")), 1, 7), 16, 10).cast("bigint")
    )
    aggs = [
        F.min((F.col("h") * a + b) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in ((i, _affine(i)) for i in range(num_hashes))
    ]
    return sh.groupBy("doc").agg(*aggs).withColumnRenamed("doc", id_col)


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-duplicate pairs: split the signature into
    `bands` bands of num_hashes/bands rows; docs sharing any band key
    are candidates. Join is on the (band, key) pair — high
    cardinality, well-distributed shuffle; no cartesian."""
    # both sides of the self-join read this — persist or the whole
    # signature DAG (shingle explode + hashing) runs twice.
    banded = _banded(df, num_hashes, bands, n, id_col, text_col).transform(
        cache.persist
    )
    a = banded.select(F.col("doc").alias("doc_id_1"), "band", "key")
    b = banded.select(F.col("doc").alias("doc_id_2"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2")
        .distinct()
    )


def _banded(
    df: DataFrame,
    num_hashes: int,
    bands: int,
    n: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(doc, band, key) bucket rows for a corpus — the exploded LSH
    band table minhash_lsh_pairs self-joins on, factored out so an
    index can persist it."""
    if bands < 1 or num_hashes % bands:
        raise ValueError(
            f"bands must divide num_hashes ({num_hashes}); got {bands}"
            " — bands > num_hashes would make every band key empty"
            " (a quadratic self-join), a non-divisor drops trailing"
            " hash columns"
        )
    rows = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, n, id_col, text_col)
    band_structs = []
    for b in range(bands):
        key = F.concat_ws("_", *[F.col(f"h{b * rows + r}") for r in range(rows)])
        band_structs.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return sig.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select("doc", "bk.band", "bk.key")


def lsh_write_index(
    df: DataFrame,
    path: str,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's LSH band-bucket table so INCOMING batches
    dedupe against it incrementally — the 100-TB crawl-ingest shape:
    corpus signatures are computed once at ingest, never again at
    query time. A params sidecar pins (num_hashes, bands, n) so a
    query with mismatched hashing fails loudly instead of silently
    finding nothing. mode='append' adds a new batch's bands to the
    index after it has been deduped (incremental maintenance).

    Torn-write protection: every bands row carries an index_version
    that must match the sidecar's. A rebuild that dies between the
    bands overwrite and the params write leaves old params with
    new-version bands; without the check a query would band with the
    STALE params, never match, and silently report zero duplicates -
    the version mismatch turns that into a loud RuntimeError at
    query time."""
    import uuid

    if mode == "append":
        # appending under different hashing would silently mix
        # incompatible band keys — validate against the pinned params
        # instead of overwriting them
        p = df.sparkSession.read.parquet(f"{path}/params").collect()[0]
        if (p.num_hashes, p.bands, p.n) != (num_hashes, bands, n):
            raise ValueError(
                f"index at {path} was built with (num_hashes={p.num_hashes}, "
                f"bands={p.bands}, n={p.n}); refusing to append "
                f"({num_hashes}, {bands}, {n})"
            )
        version = p.index_version
    else:
        version = uuid.uuid4().hex
    _banded(df, num_hashes, bands, n, id_col, text_col).withColumn(
        "index_version", F.lit(version)
    ).write.mode(mode).parquet(f"{path}/bands")
    if mode != "append":
        params = [(int(num_hashes), int(bands), int(n), version)]
        df.sparkSession.createDataFrame(
            params, "num_hashes int, bands int, n int, index_version string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def lsh_query_index(
    spark,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-duplicate pairs between a persisted corpus index
    and an incoming batch: band the batch with the INDEX's pinned
    params, then equi-join on (band, key). The batch side broadcasts
    (it is the small side by construction), so the corpus index scans
    in place — zero shuffle of the big side, no signature recompute.
    Returns (corpus_doc_id, new_doc_id) distinct candidates; verify
    with verify_jaccard against the corpus text if exact Jaccard
    gating is needed.

    Staleness contract: RE-READ AND INVALIDATE. Every call re-lists
    the index path (spark.read.parquet builds a fresh file index), so
    appended/rebuilt bands are visible to the next query; and a write
    to the path also invalidates any OLDER persisted scan of it
    (InsertIntoHadoopFsRelation refreshes the target path's caches),
    so a resident service's held handle cannot serve a stale
    snapshot either. Pinned by
    tests/test_functions.py::test_lsh_index_mutated_upstream_not_stale."""
    p = spark.read.parquet(f"{path}/params").collect()[0]
    banded_new = _banded(
        new_docs, p.num_hashes, p.bands, p.n, id_col, text_col
    ).select(F.col("doc").alias("new_doc"), "band", "key")
    index = spark.read.parquet(f"{path}/bands")
    # torn-write check (see lsh_write_index): any bands row from a
    # different build than the sidecar means a rebuild died midway -
    # querying would silently return zero candidates
    stale = index.where(F.col("index_version") != F.lit(p.index_version))
    if stale.limit(1).count() > 0:
        raise RuntimeError(
            f"index at {path} is torn: bands carry a different "
            f"index_version than the params sidecar - rebuild with "
            f"lsh_write_index(mode='overwrite')"
        )
    return (
        index.join(F.broadcast(banded_new), ["band", "key"])
        .select(
            F.col("doc").alias("corpus_doc_id"),
            F.col("new_doc").alias("new_doc_id"),
        )
        .where(F.col("corpus_doc_id") != F.col("new_doc_id"))
        .distinct()
    )


# ------------------------------------------------------------- simhash

SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a positive int64


def _token_hash(col: Column) -> Column:
    """60-bit integer hash of a token via md5 prefix (engine-portable:
    DuckDB computes CAST('0x'||substr(md5(t),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash per document. Flat-map shape: (doc, token) ×
    bit-position rows, then two mergeable aggregations — scales as a
    pure shuffle on doc id, no UDF, no driver loop.

    Measured r15: collapsing to DISTINCT tokens weighted by count
    via a per-row sort + run-length pass (the top_terms_per_doc
    idiom) was 31% SLOWER interleaved (2.59 s vs 1.98 s at sf0.1,
    fingerprints identical) despite saving the ~2.3x duplicate-token
    md5+bit work — the filter/transform lambdas evaluate per element
    outside whole-stage codegen, while the explode feeds Tungsten's
    vectorized hash aggregate (the same verdict repetition_stats
    recorded for its HOF rewrite). The TWO-LEVEL collapse
    (groupBy(doc, h).count() then count-weighted bit sums — pure
    Tungsten both levels, no HOF) was also ~20% slower on a clean
    box (interleaved medians 2.457 vs 2.056 s, fingerprints
    identical, tools/ab_simhash_r15.py variant d): the extra
    shuffle of distinct (doc, h, c) rows outweighs the saved
    60-buffer updates at this corpus's 2.3x dup factor. A corpus
    with a far higher dup factor would flip that trade; at 2-3x the
    per-occurrence shape stays.

    Measured r16 (VERDICT-r15 #2, the md5 boundary): the per-token
    md5+conv hash is ~0.26 s of the 1.16 s fingerprint job at sf0.1
    (stage decomposition: explode-only 0.153 s, +md5conv 0.417 s,
    +xxhash64&mask 0.167 s), and swapping it for xxhash64 & (2^60-1)
    runs the full aggregate at 0.748 s vs 0.901 s interleaved — a
    ~17% win that CANNOT ship: the fingerprints change, the oracle
    pins the md5-derived 60-bit hash (DuckDB has no xxhash64), and
    a changed declared result is a regression regardless of speed.
    Recorded in tools/ab_r16.py simhash_hash as the documented delta
    for a deployment free to re-declare its hash function."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).withColumn("h", _token_hash(F.col("t")))
    # One wide aggregate: per bit j, sum of +-1 over tokens. Avoids a
    # tokens x 60 row blow-up — the shuffle carries 60 ints per doc.
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = toks.groupBy("doc").agg(*bit_aggs)
    fp_expr = None
    for j in range(SIMHASH_BITS):
        term = F.when(
            F.col(f"s{j}") > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fp_expr = term if fp_expr is None else fp_expr + term
    fp = sums.select("doc", fp_expr.alias("fingerprint"))
    return fp.withColumnRenamed("doc", id_col)


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming, found via
    (max_hamming+1)-chunk blocking (pigeonhole: <= h differing bits
    over h+1 chunks guarantees one identical chunk) + exact popcount
    filter. Equi-join on (chunk index, chunk value) — no cartesian.
    The chunk count ADAPTS to max_hamming — a fixed 4-chunk split
    would silently miss pairs at distance > 3."""
    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 6 or SIMHASH_BITS % n_chunks:
        raise ValueError(
            f"max_hamming must be in [0, 5] (chunks must divide "
            f"{SIMHASH_BITS} bits), got {max_hamming}"
        )
    width = SIMHASH_BITS // n_chunks
    fp = simhash(df, id_col, text_col)
    chunk_structs = [
        F.struct(
            F.lit(c).alias("ci"),
            F.shiftright("fingerprint", c * width).bitwiseAND((1 << width) - 1).alias("cv"),
        )
        for c in range(n_chunks)
    ]
    chunked = fp.select(
        F.col(id_col).alias("doc"),
        F.col("fingerprint"),
        F.explode(F.array(*chunk_structs)).alias("ck"),
    ).select("doc", "fingerprint", "ck.ci", "ck.cv").transform(cache.persist)
    a = chunked.select(
        F.col("doc").alias("doc_id_1"), F.col("fingerprint").alias("f1"), "ci", "cv"
    )
    b = chunked.select(
        F.col("doc").alias("doc_id_2"), F.col("fingerprint").alias("f2"), "ci", "cv"
    )
    ham = F.bit_count(F.col("f1").bitwiseXOR(F.col("f2")))
    return (
        a.join(b, ["ci", "cv"])
        .where(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    left_col: str = "doc_id_1",
    right_col: str = "doc_id_2",
    max_iter: int = 20,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Dedup groups from pairwise near-dup candidates: the connected
    components of the pair graph, labeled with the component's
    minimum id (the keeper a pipeline retains). This is the step
    after LSH in every production dedup pipeline — pairs alone
    over-count when A~B and B~C.

    Min-label propagation with POINTER JUMPING: each iteration every
    node takes the min label among itself and its neighbors, then
    replaces its label with its label's label (path halving). The
    jump makes convergence O(log diameter) joins instead of
    O(diameter) — on a 100-TB pair graph with long chains that is
    the difference between ~6 rounds and hundreds. Each step is an
    equi-join + groupBy; the driver only checks a scalar convergence
    count, so the data never leaves the cluster. Deterministic: the
    fixpoint is exactly min(component ids).

    Raises RuntimeError if max_iter rounds don't converge — silently
    returning partially-merged labels would make downstream dedup
    keep multiple 'keepers' for one true group with no signal.

    Hybrid execution: near-dup pair graphs are SPARSE relative to the
    corpus (only the duplicates appear), so below driver_threshold
    edges the component labeling runs as a driver-side union-find on
    the collected two-column edge list — one job instead of ~4 per
    iteration, identical (min-id) labels. Above the threshold the
    distributed propagation loop runs. At 100 TB the pair list after
    verify is typically millions of rows while the corpus is
    billions, so the fast path is also the common path.

    Driver-memory ceiling: driver_threshold is counted in EDGES; the
    collected edge list plus the union-find dict cost roughly
    100-150 bytes per edge of Python heap, so the 2M default budgets
    ~300 MB — comfortable under the usual multi-GB spark.driver.memory
    but tune it DOWN for a small driver (or up with a large one); the
    distributed path is always the safe fallback."""
    edges_raw = pairs.select(
        F.col(left_col).alias("src"), F.col(right_col).alias("dst")
    )
    # ONE upstream execution for both the size probe and the edge
    # list: collecting limit(threshold+1) answers "small enough?"
    # AND, when yes, already IS the full edge list — a separate
    # limit().count() probe would run the whole pairs DAG (LSH
    # self-join + verify) twice, since limits don't push through its
    # aggregations.
    probe = edges_raw.limit(driver_threshold + 1).collect()
    if len(probe) <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in probe:
            ra, rb = find(r.src), find(r.dst)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict = {}
        for node in parent:
            root = find(node)
            cur = comp_min.get(root)
            comp_min[root] = node if cur is None else min(cur, node)
        rows = [(node, comp_min[find(node)]) for node in parent]
        # schema follows the input id type (string doc ids work the
        # same as longs — min() is lexicographic there), matching the
        # distributed path below
        from pyspark.sql.types import StructField, StructType

        id_type = pairs.schema[left_col].dataType
        from hillview_spark.localrel import local_df

        return local_df(
            pairs.sparkSession,
            rows,
            StructType([
                StructField("doc_id", id_type),
                StructField("component", id_type),
            ]),
        )
    edges = edges_raw
    edges = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .transform(cache.persist)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .transform(cache.persist)
    )
    changed = -1
    first_round = True
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jump: label <- label(label). Labels are node ids and
        # label(x) <= x by invariant, so the jump only shrinks labels
        # and halves remaining path lengths each round.
        ptr = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        # localCheckpoint (eager) BOTH materializes this round's labels
        # for the two downstream references AND truncates lineage —
        # each round references the previous labels 4x (neighbor join,
        # self-least, pointer jump x2), so without truncation the
        # logical plan grows 4^rounds and plan analysis itself blows
        # up long before the data does.
        new_labels = (
            stepped.join(ptr, stepped.label == ptr.pnode, "left")
            .select(
                "node",
                F.coalesce("plabel", "label").alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where("n.label <> o.label")
            .count()
        )
        # free the PREVIOUS round's blocks eagerly: new_labels is
        # already materialized (localCheckpoint is eager), so the old
        # labels can't be referenced again. Round 1's labels is the
        # registry-persisted frame (cache.release); later rounds are
        # checkpointed — plain unpersist() is a NO-OP on checkpoint
        # RDD blocks (r9 review), so the shared handle frees the
        # underlying RDD storage directly.
        if first_round:
            cache.release(labels)
            first_round = False
        else:
            cache.LocalCheckpointHandle(labels).unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # free the final round's blocks BEFORE raising: the handle is
        # tracked only on the success path, so without this the last
        # labels' localCheckpoint RDD blocks (or, at max_iter<=0, the
        # registry-persisted seed frame) stay resident until session
        # end (r10 advice)
        if first_round:
            cache.release(labels)
        else:
            cache.LocalCheckpointHandle(labels).unpersist()
        cache.release(edges)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    # the returned labels' checkpoint blocks outlive this call —
    # register them so release_all() can free them (cache.py contract)
    cache.track(cache.LocalCheckpointHandle(labels))
    cache.release(edges)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def dedup_corpus(
    df: DataFrame,
    threshold: float = 0.3,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full production near-dup removal chain, composed from the
    pieces above: exact dedup (content hash, keep min id) -> MinHash
    LSH candidates -> exact-Jaccard verify -> connected components ->
    keep each component's min-id keeper. Returns the surviving rows
    of df. Every stage is the bucketed/inverted-index shape — cost
    scales with corpus + candidate count, never |corpus|^2 — and the
    result is deterministic (min-id keepers), so the whole chain is
    oracle-checkable."""
    keepers = exact_dedup(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    # persist: `kept` feeds three consumers (the LSH signature build,
    # verify_jaccard's shingle table, and the final anti-join) — the
    # full-corpus md5 groupBy + semi-join would otherwise run ~3x
    # (r9 review; same pattern as `banded`/`sh`/`pairs` below)
    kept = cache.persist(df.join(keepers, id_col, "semi"))
    pairs = verify_jaccard(
        kept,
        minhash_lsh_pairs(kept, num_hashes, bands, n, id_col, text_col),
        threshold,
        n,
        id_col,
        text_col,
    )
    comps = connected_components(pairs)
    losers = comps.where(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias(id_col)
    )
    return kept.join(losers, id_col, "left_anti")


def select_representatives(
    comps: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Pick each dup-group's surviving document by QUALITY rather
    than min-id — production pipelines keep the longest / highest-
    scoring member of a near-dup cluster, not an arbitrary one.

    comps is connected_components output (doc_id, component); docs
    supplies the quality column. One equi-join (the component table
    is sparse — only docs that appear in dup pairs), then a
    row_number window per component: the window partitions are dup
    groups, typically tiny, so the sort is per-group local. The
    (quality DESC, id) ordering makes the winner deterministic.

    Reference analogue: Hillview has no dedup; this extends
    SURVEY §2.4's pipeline the way C4/RefinedWeb describe."""
    from pyspark.sql import Window

    # connected_components always names its id column 'doc_id';
    # realign it to the caller's id_col so non-default ids join
    joined = comps.withColumnRenamed("doc_id", id_col).join(
        docs.select(F.col(id_col), F.col(quality_col)), id_col
    )
    w = Window.partitionBy("component").orderBy(
        F.desc(quality_col), F.col(id_col)
    )
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("component")),
        )
        .where(F.col("__rk") == 1)
        .select(
            F.col("component"),
            F.col(id_col).alias("rep_doc_id"),
            F.col(quality_col).alias("rep_quality"),
            F.col("n_members"),
        )
    )


def repeated_spans(
    df: DataFrame,
    n: int = 10,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring repeated-span detection at token granularity —
    the suffix-array dedup pass of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better", the ExactSubstr
    variant), re-expressed distributed: a token position lies inside
    a repeated substring of length >= n IFF some n-gram window
    covering it occurs at >= min_sites (doc, pos) sites corpus-wide
    (within-doc repeats count — a suffix array sees those too), so
    the maximal repeated spans are exactly the maximal contiguous
    runs of positions covered by duplicated n-grams. No suffix array
    needed: duplicated n-grams are the seeds, and interval-merging
    them IS the extension step ("seed-and-extend" — the n-gram
    anchors localize candidates; the merge extends a seed to the
    full arbitrary-length span). Hash premise (r14, VERDICT-r13
    What's-wrong #1): gram identity is the FULL 128-bit md5 (seed
    groups and the coverage join key on the full md5 — _dup_coverage),
    so the IFF holds modulo full-md5 collisions only, the premise
    exact_dedup's content hash already rests on; the r13 form keyed
    on the 60-bit prefix alone, whose birthday collisions at >= 2^30
    distinct grams could mint false seeds.

    Output: one row per maximal span — (id_col, span_start,
    span_end, span_tokens, n_dup_grams, span_text), positions
    1-based inclusive token indexes. Deterministic: spans are a pure
    function of the corpus. Docs with no repeated span (including
    NULL text and < n-token docs) simply have no rows — this is a
    span report, not a per-doc score (that is ngram_novelty).

    Two adjacent duplicated windows at starts p and q merge iff
    q - p <= n (overlap when < n, touching runs when = n): the
    covered-position union is contiguous exactly then.

    100-TB shape: the dedup-family inverted-index discipline —
    positioned grams carry the 8-byte prefix plus the 32-hex full
    md5 (gram identity), ONE groupBy(gram) finds duplicated seeds
    (shuffle ∝ total grams, never pairs), a semi-join marks covered
    positions, and the island merge is a per-doc window (lag +
    running sum — partition-local, ∝ covered positions). Reporting
    joins the narrow span table back to the token arrays once for
    span_text. Reference: Hillview has no dedup (SURVEY §2.4
    extension)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n!r}")
    if min_sites < 2:
        raise ValueError(f"min_sites must be >= 2, got {min_sites!r}")
    toked = _tokenized(df, id_col, text_col)
    g = cache.persist(_positioned_grams(toked, n))
    cov = _dup_coverage(g, min_sites)
    return _report_spans(_merge_islands(cov, n), toked, id_col)


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__toks")
    )


def _positioned_grams(toked: DataFrame, n: int) -> DataFrame:
    """(doc, pos, gm): EVERY n-gram occurrence with its 1-based
    start position and the FULL 32-hex md5 gm as the ONLY gram key —
    positioned, NOT distinct (within-doc repeats are sites too).
    Docs with < n tokens (and NULL texts) contribute no rows.

    Key design (r14, VERDICT-r13 What's-wrong #1): the r13 form
    keyed grams on the 60-bit md5 prefix (_token_hash), whose
    birthday collisions at ~2^30 distinct grams (~10^5 colliding
    pairs at 10^12 grams) could mint FALSE duplicated seeds — and a
    false seed deletes real text in remove_repeated_spans. Keying on
    the full 128-bit md5 closes that class by construction (the same
    premise exact_dedup's content hash already rests on). The first
    r14 cut carried BOTH columns, (gh, gm); an interleaved A/B at
    sf0.1 measured the pair at 2.24s vs 1.96s for gm alone vs 1.77s
    for the unsafe gh-only baseline — the prefix column was pure
    shuffle weight, so gm-only it is (~+11% over gh-only, half the
    pair's cost, zero collision premise)."""
    grams_arr = F.when(
        F.size("__toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
            lambda i: F.array_join(F.slice(F.col("__toks"), i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(
        "doc", F.posexplode(grams_arr).alias("__p0", "__g")
    ).select(
        "doc",
        (F.col("__p0") + 1).alias("pos"),
        F.md5(F.col("__g")).alias("gm"),
    )


def _dup_coverage(
    g: DataFrame, min_sites: int, keep: str = "all"
) -> DataFrame:
    """Covered (doc, pos) window starts: grams at >= min_sites
    (doc, pos) sites corpus-wide, identified by FULL md5 (the gm
    column is the only gram key — a hash-prefix collision between
    unique grams structurally cannot seed). keep='all' covers every
    site of a duplicated gram; keep='first' exempts the first site
    in (doc, pos) order — the Lee et al. keep-one policy (the kept
    site's content still trains once).

    keep='first' shape (r15, VERDICT-r14 What's-wrong #1): the r14
    form ranked sites with row_number() over a per-gm window, which
    put EVERY site of one gram into a single window partition — a
    boilerplate gram duplicated 10^8 times corpus-wide (a license
    header, a templated sentence) became one single-task sort AQE
    cannot split. The exempt site is now min(struct(doc, pos))
    folded INTO the existing sites aggregate: partial aggregation
    (map-side combine) absorbs a hot gram across all its input
    partitions, the min rides the one groupBy the detection already
    pays, and the exemption is a struct inequality on the coverage
    join's output — same semantics (the brute-force keep-one
    property pin is unchanged), same shuffle count, no per-GRAM
    sort anywhere. Honest cost note: a struct aggregation buffer is
    not hash-aggregate-eligible, so the partial aggregate runs as
    SortAggregate (a per-input-partition sort of the gram frame) —
    measured at parity with both the r14 window and keep='all' on a
    10^6-site hot-gram replica (tools/scale_probe_r15.py: 5.59s vs
    window 6.23s vs keep_all 5.85s, hot/uniform flatness 0.88), and
    unlike the window its parallelism is the input partition count,
    never one task per hot key. A pure-HashAggregate two-pass
    alternative (min(doc), then min(pos) among the first doc's
    sites, via a second tiny join) measured strictly worse (8.76s
    hot / 9.60s uniform) — the extra coverage-frame pass costs more
    than the local sorts."""
    if keep not in ("all", "first"):
        # fail loudly here, not only in remove_repeated_spans: a
        # typo'd policy from a future internal caller must not
        # silently degrade to all-sites coverage (ADVICE r14).
        raise ValueError(f"keep must be 'all' or 'first', got {keep!r}")
    agg_cols = [F.count(F.lit(1)).alias("sites")]
    if keep == "first":
        agg_cols.append(F.min(F.struct("doc", "pos")).alias("__first"))
    dup = (
        g.groupBy("gm")
        .agg(*agg_cols)
        .where(F.col("sites") >= min_sites)
        .drop("sites")
    )
    cov = g.join(dup, ["gm"])
    if keep == "first":
        # struct comparison is lexicographic (doc, pos) — exactly the
        # (doc, pos) order the r14 rank used, so rank-1 == min-struct.
        cov = cov.where(F.struct("doc", "pos") != F.col("__first"))
    return cov.select("doc", "pos")


def _merge_islands(cov: DataFrame, n: int) -> DataFrame:
    """Merge covered window starts (doc, pos) into maximal spans:
    the lag/running-sum island rule — a new island starts when the
    gap between consecutive starts exceeds n (window length), i.e.
    when the covered-position union stops being contiguous. Returns
    (doc, span_start, span_end, n_dup_grams)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy("pos")
    isl = cov.withColumn(
        "__brk",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > n),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__island",
        F.sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        isl.groupBy("doc", "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .drop("__island")
    )


def _report_spans(
    spans: DataFrame, toked: DataFrame, id_col: str
) -> DataFrame:
    """Join the narrow span table back to the token arrays once and
    slice out span_text; shared by repeated_spans (corpus-internal)
    and contamination_spans (cross-corpus)."""
    return spans.join(toked, "doc").select(
        F.col("doc").alias(id_col),
        F.col("span_start").cast("long"),
        F.col("span_end").cast("long"),
        (F.col("span_end") - F.col("span_start") + 1)
        .cast("long")
        .alias("span_tokens"),
        F.col("n_dup_grams").cast("long"),
        F.array_join(
            F.slice(
                "__toks",
                F.col("span_start").cast("int"),
                (F.col("span_end") - F.col("span_start") + 1).cast("int"),
            ),
            " ",
        ).alias("span_text"),
    )


def contamination_spans(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Cross-corpus exact-substring contamination report — the
    span-level companion of `decontaminate` (which drops a whole
    train doc on one shared n-gram): for each TRAIN document, the
    maximal token spans every position of which lies inside some
    n-gram shared verbatim with the EVAL corpus. A benchmark-leak
    audit gets the actual overlapping text with positions, so a
    pipeline can cut the spans (surgical, keeps the doc) or rank
    documents by contaminated mass instead of binary-dropping them.

    Honest semantics note: a reported span is the union of
    OVERLAPPING shared windows — every position is inside a shared
    substring of length >= n, but the maximal span need not occur
    contiguously in any single eval document (two overlapping
    windows may match different eval docs). That is the standard
    n-gram-cover construction (same as repeated_spans), and the
    conservative direction for an audit: it over-marks, never
    under-marks. Gram identity is the full 128-bit md5 (r14 — the
    membership probe joins on the full md5, so a hash-prefix collision
    cannot mark a clean position; see repeated_spans' hash premise).

    Output: repeated_spans' schema — (id_col, span_start, span_end,
    span_tokens, n_dup_grams, span_text), 1-based inclusive token
    positions in the TRAIN doc; n_dup_grams counts shared windows.
    Train docs with no shared window have no rows.

    100-TB shape: eval n-grams collapse to a DISTINCT key set (no
    positions needed on that side) — typically millions of rows for
    a benchmark suite against billions for the corpus, so the
    membership probe rides a broadcast hash join (broadcast_eval,
    the `decontaminate` discipline); set it False to let AQE pick a
    shuffle join when the eval side is itself corpus-sized. The
    train side stays the repeated_spans pipeline: positioned grams,
    semi-join, per-doc island merge."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n!r}")
    toked = _tokenized(df, id_col, text_col)
    g = _positioned_grams(toked, n)
    eval_toked = _tokenized(
        eval_df, eval_id_col or id_col, eval_text_col or text_col
    )
    eval_grams = (
        _positioned_grams(eval_toked, n).select("gm").distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    cov = g.join(eval_grams, ["gm"], "leftsemi").select("doc", "pos")
    return _report_spans(_merge_islands(cov, n), toked, id_col)


def remove_repeated_spans(
    df: DataFrame,
    n: int = 10,
    min_sites: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "all",
) -> DataFrame:
    """Exact-substring dedup, the EDIT half: cut every token that
    lies inside a repeated span and reassemble the survivors. Two
    policies (r14, VERDICT-r13 What's-missing #4a):

    - keep='all' (default): remove the repeated content from ALL
      sites — the content vanishes from the corpus entirely. This
      is STRICTER than Lee et al. 2022 ExactSubstr, which keeps one
      occurrence so the model still trains on the content once; the
      r13 docstring's "same training-dup outcome" claim overstated
      the equivalence, corrected here.
    - keep='first': the literature-faithful keep-one policy — for
      each duplicated n-gram, the first site in (doc_id, pos) order
      is exempt from coverage, so the earliest occurrence of
      repeated content survives and only later sites are cut.
      Honest caveat: when overlapping windows have differently-
      located first sites, a kept site can still lose a flank to a
      neighboring window's coverage — inherent to any n-gram-cover
      approximation of keep-one (a suffix-array implementation
      makes the same per-duplicate choice, just at byte
      granularity).

    Complements remove_repeated_segments (line/segment granularity,
    fixed blocks) with arbitrary-length span removal.

    Output: one row per INPUT document — (id_col, text_col rebuilt
    from surviving tokens, n_tokens_kept, n_tokens_removed). A doc
    with no spans keeps all its tokens; NULL/empty text rebuilds as
    '' with 0/0 counts (the chunk_documents anchoring rule: an
    edit pass must not drop documents).

    Scale: repeated_spans' shuffles plus one collect_list of the
    per-doc span list (rows ∝ spans, tiny next to tokens) and one
    equi-join back to the token arrays; the cut itself is a
    per-row higher-order filter — no extra shuffle. keep='first'
    adds only a min(struct(doc, pos)) on the detection's existing
    gram aggregate — map-side combine absorbs even a pathological
    hot gram (no per-gram sort; see _dup_coverage)."""
    if keep not in ("all", "first"):
        raise ValueError(f"keep must be 'all' or 'first', got {keep!r}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n!r}")
    if min_sites < 2:
        raise ValueError(f"min_sites must be >= 2, got {min_sites!r}")
    toked = _tokenized(df, id_col, text_col)
    g = cache.persist(_positioned_grams(toked, n))
    spans = _merge_islands(_dup_coverage(g, min_sites, keep), n)
    return _cut_spans(df, spans, id_col, text_col)


def _cut_spans(
    df: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Cut every token of df whose 1-based position lies inside a
    (doc, span_start, span_end) row of `spans` and reassemble the
    survivors — the edit engine shared by remove_repeated_spans and
    remove_contaminated_spans. One collect_list to the per-doc span
    list, one left equi-join back to the token arrays, then a
    per-row higher-order filter (no extra shuffle); every input doc
    survives (the anchoring rule — NULL text rebuilds as '')."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    per_doc = spans.groupBy("doc").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("span_start").cast("long").alias("span_start"),
                    F.col("span_end").cast("long").alias("span_end"),
                )
            )
        ).alias("__spans")
    )
    spans_type = ArrayType(
        StructType(
            [
                StructField("span_start", LongType()),
                StructField("span_end", LongType()),
            ]
        )
    )
    toked = df.select(
        F.col(id_col), tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks")
    )
    joined = toked.join(
        per_doc, toked[id_col] == per_doc["doc"], "left"
    ).select(
        # dataframe-qualified: with id_col='doc' a bare F.col("doc")
        # would be ambiguous against per_doc's join key (ADVICE r14)
        toked[id_col],
        "__toks",
        F.coalesce("__spans", F.array().cast(spans_type)).alias("__spans"),
    )
    kept = F.filter(
        F.col("__toks"),
        lambda x, i: ~F.exists(
            F.col("__spans"),
            lambda sp: (i + 1 >= sp["span_start"])
            & (i + 1 <= sp["span_end"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias(text_col),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        (F.size("__toks") - F.size(kept))
        .cast("long")
        .alias("n_tokens_removed"),
    )


def remove_contaminated_spans(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Surgical span-level decontamination, the EDIT half of
    contamination_spans (r14, VERDICT-r13 directive #4): cut from
    each TRAIN document exactly the token spans every position of
    which lies inside an n-gram shared verbatim with the EVAL
    corpus, and keep the rest of the document — the alternative a
    real pipeline runs after the audit, instead of `decontaminate`'s
    whole-doc drop (which discards clean text because one benchmark
    sentence leaked into it).

    Conservative direction inherited from contamination_spans: the
    cut is the OVERLAPPING-window cover, so it can over-cut a flank
    token adjacent to genuinely shared text, never under-cut — the
    right bias for leak removal. Gram identity is the full 128-bit
    md5 (the gm probe).

    Output: _cut_spans' schema — one row per INPUT train document,
    (id_col, text_col rebuilt, n_tokens_kept, n_tokens_removed);
    clean docs keep all tokens, NULL text rebuilds as '' with 0/0.

    100-TB shape: contamination_spans' plan (positioned train grams,
    DISTINCT eval gram set on a broadcast semi-join — shuffle ∝
    train grams) plus the one spans-join + per-row HOF cut of
    _cut_spans; nothing pair-shaped anywhere."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n!r}")
    toked = _tokenized(df, id_col, text_col)
    g = _positioned_grams(toked, n)
    eval_toked = _tokenized(
        eval_df, eval_id_col or id_col, eval_text_col or text_col
    )
    eval_grams = (
        _positioned_grams(eval_toked, n).select("gm").distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    cov = g.join(eval_grams, ["gm"], "leftsemi").select("doc", "pos")
    return _cut_spans(df, _merge_islands(cov, n), id_col, text_col)
