"""Corpus curation for training-data pipelines: PII scrubbing,
repetition-based quality signals, train/eval decontamination,
source-mixture sampling, and document chunking.
(Extension beyond the Hillview reference, SURVEY.md §2.4 — the
curation steps an LLM pre-training pipeline runs between raw ingest
and tokenization.)

Everything is built from JVM-side expressions (regexp / split /
slice / hash) so the hot path whole-stage-codegens; the only
shuffles are the groupBys/joins inherent to the semantics, and all
arithmetic is rational so results reproduce bit-identically in the
DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

# Ordered redaction rules (applied in sequence — URLs first so an
# address inside a URL is not double-counted as an email). Patterns
# are deliberately restricted to the regex subset Java and RE2
# interpret identically: no lookaround, no backreferences.
PII_RULES: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("long_number", r"\b\d{7,}\b", "<NUM>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact URLs / emails / IPv4 addresses / long digit runs
    (phone-, card-, SSN-shaped) with typed placeholder tokens, and
    count each redaction kind. Counts are taken on the text state
    *before* that rule's replacement (after the earlier rules'), so
    count == number of placeholders inserted by that rule.

    One codegen'd scan, no shuffle — embarrassingly parallel.

    NULL-doc contract (r9 review triage): a NULL text yields NULL
    counts and a NULL text_scrubbed — missing in, missing out, the
    engine-wide rule — identically on both engines (edge-pinned).
    Aggregators over the counts should COALESCE if they want
    NULL docs counted as zero.
    """
    t = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(
            # count matches without materializing them (see
            # text._count_re) — the pattern still runs once more in
            # the replace below, which is inherent to count+redact
            F.regexp_count(t, F.lit(pat))
            .cast("long")
            .alias(f"n_{name}")
        )
        t = F.regexp_replace(t, pat, repl)
    return df.select(F.col(id_col), t.alias("text_scrubbed"), *counts)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document (word-level):
    duplicate-token fraction, most-common-token fraction, and
    most-common-bigram fraction — the standard signals for filtering
    degenerate/boilerplate text (Rae et al. 2021, Gopher §A1.1).

    Shape (r16): every signal is a PER-ROW array computation — a
    document's tokens already live in one row, so the token and
    bigram multiplicities come from array_sort + run-length starts
    (the same filter(sequence)/element_at idiom top_terms_per_doc
    ships): ZERO shuffle, zero join, one codegen'd scan. The r15
    union + (doc, tag, key) aggregate + ids-join shape measured
    1.388 s vs 1.150 s for this one (interleaved medians of 9 at
    sf0.1, identity asserted over all 5000 docs) — and at 100 TB the
    removed cost is the entire corpus-scale string-keyed exchange.
    Two measured traps recorded from the attempts: (a) the sorted
    arrays MUST be materialized columns (projection barriers) before
    the run-length filter references them — an inline array_sort
    re-evaluates per element_at and ran 14x slower (r16 probe); (b)
    an aggregate()-fold over the array for the max multiplicity (no
    explicit sort/RLE) ran 3x slower (r15 probe).

    Precondition (same as top_terms_per_doc): doc ids are unique —
    rows sharing an id are scored per row, where the aggregate shape
    merged them. The expected corpus keys documents by id.

    Empties are filtered in the token array (r9 review: a leading
    tab minted a phantom ' a' bigram, scoring a clean one-word doc
    maximally repetitive). NULL/whitespace-only docs score all-zeros
    (nothing to repeat) — degenerate docs are exactly what
    repetition filtering targets, so they must not vanish from the
    result."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )

    def _starts(srt_name):
        # 1-based run-start positions in a SORTED array column
        # (ANSI-safe: indexes stay in [1, n]; sequence is guarded
        # because sequence(1, 0) would DESCEND, not be empty; the
        # greatest() arm must be safe to evaluate even when the OR's
        # left arm decides i == 1)
        srt = F.col(srt_name)
        n = F.size(srt)
        return F.when(
            n >= 1,
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: (i == 1)
                | (F.element_at(srt, i)
                   != F.element_at(srt, F.greatest(i - 1, F.lit(1)))),
            ),
        ).otherwise(F.array().cast("array<int>"))

    def _max_run(starts_name, n_col):
        # max multiplicity == max gap between consecutive run starts
        starts = F.col(starts_name)
        m = F.size(starts)
        lens = F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.coalesce(
                F.try_element_at(starts, j + 1), n_col + 1
            ) - F.element_at(starts, j),
        )
        # NULL when there are no runs (the guard also keeps the
        # sequence/element_at branch unevaluated for empty docs)
        return F.when(m >= 1, F.array_max(lens))

    staged = (
        df.withColumn("__t", toks)
        .withColumn("__b", _bigrams_of(F.col("__t")))
        .withColumn("__st", F.array_sort(F.col("__t")))
        .withColumn("__sb", F.array_sort(F.col("__b")))
        .withColumn("__ts", _starts("__st"))
        .withColumn("__bs", _starts("__sb"))
    )
    # size() is NULL for a NULL array (NULL text); those docs score
    # zero tokens like the old ids-left-join anchor did
    nt = F.coalesce(F.size(F.col("__st")), F.lit(0))
    n = nt.cast("double")
    distinct = F.size(F.col("__ts")).cast("long")
    max_tok = _max_run("__ts", F.size(F.col("__st")))
    max_gram = _max_run("__bs", F.size(F.col("__sb")))
    return staged.select(
        F.col(id_col),
        nt.cast("long").alias("n_tokens"),
        distinct.alias("distinct_tokens"),
        F.coalesce(
            F.when(nt >= 1, F.round(F.lit(1.0) - distinct / n, 4)),
            F.lit(0.0),
        ).alias("dup_token_frac"),
        F.coalesce(
            F.when(nt >= 1, F.round(max_tok / n, 4)), F.lit(0.0)
        ).alias("top_token_frac"),
        # 2 tokens per occurrence, clamped: overlapping repeats
        # ('a a a') would otherwise count shared tokens twice and
        # push the "fraction" past 1.0. Guard on nt, not a trailing
        # coalesce: least() SKIPS nulls, so least(NULL/n, 1.0) would
        # collapse to 1.0 for zero-token docs
        F.when(nt == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.least(
                    F.coalesce(max_gram, F.lit(0)) * 2 / n,
                    F.lit(1.0),
                ),
                4,
            )
        )
        .alias("top_bigram_frac"),
    )


def _bigrams_of(toks):
    """Non-distinct word bigrams over a materialized token-array
    column (dedup.shingles_of() is distinct — here the duplicate
    counts ARE the signal; see shingles_of for why the array must be
    a named column, not an inline split)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: drop every training document that
    shares ANY word n-gram with the eval set (the n-gram-overlap rule
    used for pre-training corpora; n=13 in GPT-3/PaLM practice, small
    here to suit the fixtures).

    Shape at 100 TB: eval suites are small (thousands of documents),
    so their distinct n-gram set broadcasts; the scan over train then
    needs no shuffle at all — explode, broadcast-hash semi-join,
    anti-join back on doc_id within the same stage. Set
    broadcast_eval=False if the eval side is genuinely large."""
    from hillview_spark.functions.dedup import shingles_of, tokens

    ev = (
        eval_df.withColumn("__toks", tokens(F.col(text_col)))
        .select(F.explode(shingles_of(F.col("__toks"), n)).alias("s"))
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.withColumn("__toks", tokens(F.col(text_col))).select(
        F.col(id_col), F.explode(shingles_of(F.col("__toks"), n)).alias("s")
    )
    contaminated = tr.join(ev, "s", "left_semi").select(id_col).distinct()
    return train.join(contaminated, id_col, "left_anti")


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
) -> DataFrame:
    """Bloom-filter decontamination — the scale path when the eval
    n-gram set is too large to broadcast exactly (cross-benchmark
    suites, eval sets in the millions of documents). The filter is
    built distributed: each eval n-gram sets num_hashes bit positions
    (xxhash64(s, i) mod num_bits — all codegen), positions dedupe in
    one bounded shuffle (<= num_bits rows regardless of eval size),
    pack into an array<long> bitmap of num_bits/64 words on the
    driver (bounded by construction: 4M bits = 64K longs = 512 KB),
    and broadcast as a one-row relation. The train scan probes with
    pure bitwise expressions — no join against the n-gram set, no
    train-side shuffle beyond the contaminated-id distinct.

    One-sided error: a false positive drops a CLEAN training document
    (never leaks a contaminated one) with probability
    ~(1-exp(-kN/m))^k — the safe direction for decontamination. Size
    num_bits >= ~10x the distinct eval n-gram count for <1% FPR at
    num_hashes=5."""
    from hillview_spark.functions.dedup import shingles_of, tokens

    # loud config guard, not assert (r11 review): asserts vanish
    # under python -O and a non-multiple silently corrupts the
    # word-packing arithmetic below
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    probes = [
        f"pmod(xxhash64(s, {i}), cast({num_bits} as bigint))"
        for i in range(num_hashes)
    ]
    ev = (
        eval_df.withColumn("__toks", tokens(F.col(text_col)))
        .select(F.explode(shingles_of(F.col("__toks"), n)).alias("s"))
        .select(F.explode(F.array(*[F.expr(p) for p in probes])).alias("p"))
        .distinct()
    )
    words = ev.groupBy((F.col("p") / 64).cast("long").alias("w")).agg(
        F.expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 64 as int)))").alias("bits")
    )
    bitmap = [0] * (num_bits // 64)
    for r in words.collect():  # bounded by num_bits/64, not eval size
        bitmap[int(r.w)] = r.bits
    bdf = train.sparkSession.createDataFrame([(bitmap,)], "bf array<bigint>")

    hit = " AND ".join(
        f"(element_at(bf, cast(({p}) div 64 as int) + 1)"
        f" & shiftleft(cast(1 as bigint), cast(({p}) % 64 as int))) != 0"
        for p in probes
    )
    tr = train.withColumn("__toks", tokens(F.col(text_col))).select(
        F.col(id_col), F.explode(shingles_of(F.col("__toks"), n)).alias("s")
    )
    contaminated = (
        tr.crossJoin(F.broadcast(bdf)).where(F.expr(hit)).select(id_col).distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


def shuffle_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle1",
) -> DataFrame:
    """Deterministic global shuffle for training: every row gets a
    pseudo-random rank from md5(id || salt) — stable across runs,
    engines, and re-ingests (same portable-hash trick as
    sample_to_mixture), so a resumed job sees the identical order and
    a different salt gives an independent epoch permutation.

    Scale shape: rank assignment delegates to stats.global_rank —
    range-partition on the hash, rank each partition locally in
    parallel, add tiny per-partition offsets (never a
    single-partition window; the rank VALUES are independent of the
    partitioning, so determinism survives any cluster layout). At
    100 TB you'd usually skip the rank materialization and just
    write sortBy(hash) so each output file is a contiguous shuffled
    shard. Ties (hash collisions) break on the id."""
    from hillview_spark.operators.sampling import salted_hex
    from hillview_spark.operators.stats import global_rank

    h = salted_hex(F.col(id_col).cast("string"), salt, width=16)
    payload = [c for c in df.columns if c != id_col]
    ranked = global_rank(df.withColumn("__h", h), ["__h", id_col], keep_cols=payload)
    return ranked.select(
        *df.columns, (F.col("rnk") + 1).cast("long").alias("shuffle_rank")
    )


def sample_to_mixture(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix1",
) -> DataFrame:
    """Down-sample each source to its target mixture weight (keep
    fraction), deterministically: the keep/drop decision hashes
    (key, salt) — stable across runs, engines, and re-ingests, like
    split_train_eval. Sources absent from `weights` are kept whole.

    Pure per-row filter — one codegen'd scan, no shuffle, and the
    filter sits below any downstream agg so pushdown applies."""
    for src, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(
                f"mixture weight for {src!r} must be in [0, 1], got {w}"
                " (weights are keep fractions, not relative shares)"
            )
    from hillview_spark.operators.sampling import salted_hash

    h = salted_hash(F.col(key_col), salt)
    cut = None
    for src, w in sorted(weights.items()):
        branch = (F.col(source_col) == src, F.lit(int(w * (16**7))))
        cut = F.when(*branch) if cut is None else cut.when(*branch)
    cut = cut.otherwise(F.lit(16**7)) if cut is not None else F.lit(16**7)
    return df.where(h < cut)


def quality_cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    max_per_group: int = 100,
    quality_col: str = "n_chars",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep the TOP-QUALITY max_per_group rows per group — cap_per_
    group's merit-ranked sibling ("keep the best 100 docs per
    domain", the curation counterpart of quota sampling when a
    quality signal exists). Selection = the max_per_group largest
    (quality, key) tuples per group, quality descending with NULLs
    LAST (a missing score never beats a real one; the key tie-break
    makes the cut deterministic and engine-portable).

    100-TB shape: the same two-phase top-N as cap_per_group — each
    Spark partition's local top-N per group first (window over
    (group, partition-id), parallel even when one domain owns half
    the corpus), then the global rank over the bounded remainder.
    Partitioning-independent because phase 1 keeps a superset of the
    global top-N and phase 2 applies the total order."""
    w_local = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(
        F.col(quality_col).desc_nulls_last(), key_col
    )
    local = (
        df.withColumn("__lrk", F.row_number().over(w_local))
        .where(F.col("__lrk") <= max_per_group)
        .drop("__lrk")
    )
    w_global = Window.partitionBy(group_col).orderBy(
        F.col(quality_col).desc_nulls_last(), key_col
    )
    return (
        local.withColumn("__rk", F.row_number().over(w_global))
        .where(F.col("__rk") <= max_per_group)
        .drop("__rk")
    )


def select_within_budget(
    df: DataFrame,
    budget: float,
    quality_col: str = "n_chars",
    cost_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Budget-constrained corpus selection: order documents by merit
    (quality DESC, NULLs last, id tie-break — a total order) and keep
    the PREFIX whose cumulative cost stays within the budget — "fill
    a 10B-token training budget with the best documents". The cost
    column is whatever the budget is denominated in (tokens, chars,
    bytes — an INTEGER denomination: a fractional budget raises, r13,
    instead of the silent int() truncation the r12 form applied); a
    NULL cost counts as 0 (a doc with no measured cost cannot burn
    budget it cannot be charged for) and a NEGATIVE cost clamps to 0
    (r13 — same charges-nothing rule; a raw negative after an
    overflowing row could pull the running total back under budget
    and re-admit rows, breaking the prefix guarantee below). The cut
    is a strict prefix: the first document that would overflow the
    budget stops the selection (deterministic; no best-fit backfill,
    which would be order-dependent knapsack). Adds `cum_cost`, the
    inclusive running total.

    Scale note: the running sum needs ONE global total order — run it
    over the narrow (id, quality, cost) metadata projection, not the
    payload (join the kept ids back for text); at extreme corpus
    sizes replace the sort with a quality-threshold binary search
    (each probe is one aggregate) and use this exact form on the
    boundary stratum."""
    # finiteness first (r14 ADVICE): int(nan) raises a confusing
    # "cannot convert float NaN to integer" and int(inf) an uncaught
    # OverflowError — neither names the actual contract violation
    if not math.isfinite(budget):
        raise ValueError(f"budget must be finite, got {budget!r}")
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget!r}")
    if budget != int(budget):
        raise ValueError(
            "budget is integer-denominated (tokens/chars/bytes); got "
            f"{budget!r} — round it yourself to make the cut explicit"
        )
    w = (
        Window.orderBy(F.col(quality_col).desc_nulls_last(), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(
        F.greatest(
            F.coalesce(F.col(cost_col), F.lit(0)), F.lit(0)
        ).cast("decimal(20,0)")
    ).over(w)
    return (
        df.withColumn("cum_cost", cum.cast("long"))
        .where(F.col("cum_cost") <= F.lit(int(budget)))
    )


def mixture_temperature_weights(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    ndigits: int = 6,
) -> DataFrame:
    """Temperature-scaled mixture shares — the multilingual/
    multi-source balancing rule (sample source i with probability
    proportional to n_i^alpha; alpha=1 keeps natural proportions,
    alpha->0 flattens to uniform): per source, the document count,
    the target share n^alpha / sum(n^alpha), and the keep fraction
    that realizes those shares by down-sampling only (share/n scaled
    so the most over-asked source keeps 1.0 — feed the result
    straight into sample_to_mixture's weights).

    Cross-engine float rule: POWER and division run in the same op
    order both engines, then one round(ndigits) pins the released
    values. The n^alpha TOTAL is an explicit SORTED sequential fold
    (r13): a bare SUM of doubles adds in shuffle-merge order, which
    neither Spark nor DuckDB pins run-to-run — sorting the
    |sources|-element list ascending and left-folding makes the
    addition sequence identical on both engines (equal values are
    adjacent under the sort, and swapping adjacent equal addends
    cannot change a sequential sum). Scale: one groupBy(source)
    collapses the scan to |sources| rows; the fold runs over that
    bounded list in one 1-row aggregate, the share total rides a
    1-row broadcast cross and the max-rate normalizer a
    single-partition window over |sources| rows — nothing downstream
    of the aggregate is data-sized."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha!r}")
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    p = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    tot = counts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__tot")
    )
    rate = p / F.col("__tot") / F.col("n_docs").cast("double")
    w = Window.partitionBy()
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("__rate", rate)
        .select(
            "source",
            "n_docs",
            F.round(p / F.col("__tot"), ndigits).alias("share"),
            F.round(
                F.col("__rate") / F.max("__rate").over(w), ndigits
            ).alias("keep_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 50,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows
    — the packing step before tokenization. Chunk starts advance by
    (chunk_tokens - overlap); every document yields at least one
    chunk; the final chunk may be short.

    No UDF: split → sequence → slice → posexplode, all codegen'd;
    output rows ∝ input tokens (× a small overlap factor)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    # coalesce: a NULL text must still yield its one (empty) chunk —
    # posexplode of a NULL sequence emits zero rows and the document
    # would silently vanish from the output
    # empties filtered (r9 review): trim strips only spaces, so a
    # leading tab/newline minted a phantom edge token that inflated
    # n_chunk_tokens and prepended a separator to chunk_text; the
    # empty-doc contract is unchanged (t=[] still yields the one
    # ('', 0) chunk via the greatest(...,1) floor below)
    t = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(t) - F.lit(overlap), F.lit(1)), F.lit(step)
    )
    return (
        df.select(
            F.col(id_col),
            t.alias("__t"),
            F.posexplode(starts).alias("chunk_id", "__start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__t"), F.col("__start"), chunk_tokens), " "
            ).alias("chunk_text"),
            # split('') yields [''] — a phantom token; the empty
            # chunk must report 0 tokens (consistent with
            # text._ws_tokens), or pack_sequences budgets a phantom
            # token per empty doc
            F.when(F.array_join(F.col("__t"), "") == "", F.lit(0))
            .otherwise(
                F.least(
                    F.size(F.col("__t")) - F.col("__start") + 1,
                    F.lit(chunk_tokens),
                )
            )
            .cast("long")
            .alias("n_chunk_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 2048,
    n_groups: int = 64,
    count_col: str = "n_chunk_tokens",
    id_cols: tuple[str, str] = ("doc_id", "chunk_id"),
) -> DataFrame:
    """Assign chunks to fixed token-budget training sequences
    (the packing step between chunking and tokenization). Chunks are
    first salted into n_groups independent packing groups (hash of
    doc id — deterministic), then packed *within* each group in
    (doc_id, chunk_id) order by running token count: sequence k of a
    group holds the chunks whose exclusive running total lands in
    [k*budget, (k+1)*budget).

    A chunk may straddle a boundary (it lands in the bin its FIRST
    token falls in), so a bin's total can overshoot by at most one
    chunk — the deterministic, shuffle-once approximation of greedy
    packing. True first-fit is a sequential recurrence; at 100 TB the
    per-group independence is what matters: each group packs in
    parallel after ONE hash-partition shuffle, no global order, and
    group count scales with the cluster, not the data."""
    d, c = id_cols
    from hillview_spark.operators.sampling import salted_hash

    group = F.pmod(salted_hash(F.col(d), "pack"), F.lit(n_groups))
    w = (
        Window.partitionBy("pack_group")
        .orderBy(d, c)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("pack_group", group).withColumn(
        "seq_id",
        (F.coalesce(F.sum(count_col).over(w), F.lit(0))
         / F.lit(budget_tokens)).cast("long"),
    )
    return out


def remove_repeated_segments(
    df: DataFrame,
    segment_tokens: int = 10,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level repeated-passage removal (the C4/RefinedWeb
    "drop lines shared across documents" step, adapted to
    fixed-width token segments since the synthetic corpus has no
    sentence boundaries): split each document into consecutive
    segment_tokens-word blocks, hash each block, count how many
    DISTINCT documents contain each hash corpus-wide, drop blocks
    appearing in >= min_df documents, and reassemble the survivors
    in order. Documents whose every segment was dropped vanish.

    Scale shape: explode → groupBy(hash) with map-side combine →
    shuffle join back on hash → per-doc ordered reassembly. Rows
    shuffled ∝ total segments (tokens / segment_tokens), never
    pairs; the hash join spreads hot segments across partitions, so
    no key is quadratic. All expressions are JVM codegen (split /
    slice / md5 / array_sort) — no Python in the path.

    NULL text coalesces to '' (one empty segment) — without the
    coalesce a NULL doc silently vanishes under ANSI (sequence over
    NULL size emits nothing) and crashes under legacy sizeOfNull=-1.
    Note empty segments obey the same doc-frequency rule as any
    other: when >= min_df docs are empty, their shared '' segment is
    itself a repeated segment and those docs drop to zero kept
    segments."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    segs = (
        df.select(F.col(id_col), toks.alias("__t"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.sequence(F.lit(1), F.size("__t"), F.lit(segment_tokens))
            ).alias("seg_idx", "__start"),
            F.col("__t"),
        )
        .select(
            F.col(id_col),
            F.col("seg_idx"),
            F.array_join(
                F.slice(F.col("__t"), F.col("__start"), segment_tokens), " "
            ).alias("segment"),
        )
        .withColumn("seg_hash", F.md5(F.col("segment")))
    )
    # segs feeds the document-frequency aggregate AND the join back —
    # persist so the split/explode/md5 DAG runs once (the same
    # feeds-two-consumers shape dedup persists its shingle table for)
    from hillview_spark import cache

    segs = cache.persist(segs)
    seg_df = segs.groupBy("seg_hash").agg(
        F.countDistinct(id_col).alias("seg_docs")
    )
    kept = segs.join(seg_df, "seg_hash").where(F.col("seg_docs") < min_df)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("seg_idx"), F.col("segment")))
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(ordered, lambda x: x["segment"]), " "
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept_segments"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate-n-gram fraction — the corpus-level
    memorization/duplication quality signal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better":
    documents whose n-grams are mostly corpus-repeated are the
    memorization risk): for each document, the fraction of its
    DISTINCT word n-grams that appear in >= min_df documents
    corpus-wide. Complements remove_repeated_segments (which EDITS
    text) — this one only SCORES, so a pipeline can gate on
    dup_frac without touching surviving documents.

    Output: (id_col, n_ngrams, dup_ngrams, dup_frac), one row per
    INPUT document (repetition_stats' anchoring rule: degenerate
    docs — NULL text, < n tokens — are exactly what a gate must
    see; they score 0/0/0.0, nothing measured means nothing
    duplicated).

    Scale shape: the inverted-index discipline of the dedup family —
    explode distinct shingles (8-byte md5-prefix keys, the
    ngram_jaccard trick), ONE groupBy(s) for corpus document
    frequencies (rows per shingle are already distinct per doc, so
    count(*) IS the document frequency — no countDistinct state),
    join back, one groupBy(doc). Rows shuffled ∝ total distinct
    shingles, never pairs; the shingle table persists because the
    frequency aggregate AND the join-back both read it."""
    from hillview_spark.functions.dedup import _shingle_table, _token_hash

    sh = _shingle_table(df, id_col, text_col, n).select(
        "doc", _token_hash(F.col("s")).alias("s")
    )
    from hillview_spark import cache

    sh = cache.persist(sh)
    dfc = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    per = (
        sh.join(dfc, "s")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("df") >= min_df, 1).otherwise(0)
            ).alias("dup_ngrams"),
        )
    )
    ids = df.select(F.col(id_col).alias("doc"))
    return ids.join(per, "doc", "left").select(
        F.col("doc").alias(id_col),
        F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
        F.coalesce("dup_ngrams", F.lit(0)).cast("long").alias("dup_ngrams"),
        # the non-NULL branch divides by n_ngrams >= 1 (per only
        # holds docs with at least one shingle) — never ANSI-fatal
        F.when(F.col("n_ngrams").isNull(), F.lit(0.0))
        .otherwise(
            F.round(
                F.col("dup_ngrams") / F.col("n_ngrams").cast("double"), 4
            )
        )
        .alias("dup_frac"),
    )


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    drop_patterns: tuple[str, ...] = (),
    min_lines: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): split a
    document into lines, keep only lines that (a) hold at least
    min_words whitespace words, (b) end in terminal punctuation
    (. ! ? \"), and (c) contain none of drop_patterns
    (case-insensitive boilerplate markers — 'javascript', 'cookie
    policy', 'lorem ipsum'); reassemble survivors and drop documents
    left with fewer than min_lines lines.

    100-TB shape: strictly per-row — split, a single F.filter over
    the materialized line array, re-join. NO shuffle, no UDF; the
    whole operator is one projection over the scan. (Cross-document
    repeated-span removal is remove_repeated_segments; doc-level
    quality gates are text.quality_filter.)

    Output: (id_col, text_col cleaned, n_lines_kept, n_lines_total).

    NULL-doc contract (r9 review triage): a NULL text has no lines
    and drops from the output entirely (unlike chunk_documents,
    whose contract emits one empty chunk per doc) — identically on
    both engines (edge-pinned).
    """
    import re as _re

    df2 = df.withColumn("__lines", F.split(F.col(text_col), _re.escape(sep)))

    def keep(line):
        # non-empty words only (r9 review): a tab-edged line counted
        # a phantom '' word, letting a (min_words-1)-word line pass
        cond = (
            F.size(
                F.filter(
                    F.split(F.trim(line), r"\s+"), lambda x: x != ""
                )
            )
            >= F.lit(min_words)
        )
        if require_terminal_punct:
            cond = cond & line.rlike(r'[.!?"]\s*$')
        for p in drop_patterns:
            cond = cond & ~F.lower(line).contains(p.lower())
        return cond

    df3 = df2.withColumn("__kept", F.filter("__lines", keep))
    return (
        df3.select(
            F.col(id_col),
            F.array_join("__kept", sep).alias(text_col),
            F.size("__kept").alias("n_lines_kept"),
            F.size("__lines").alias("n_lines_total"),
        )
        .where(F.col("n_lines_kept") >= min_lines)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    max_per_group: int = 100,
    key_col: str = "doc_id",
    salt: str = "cap1",
) -> DataFrame:
    """Per-domain quota sampling: keep at most max_per_group rows per
    group, chosen by a deterministic salted-hash rank — the standard
    cap on over-represented domains (C4/Gopher both bound per-domain
    share) that stays stable across runs, engines, and re-ingests.

    Selection = the max_per_group smallest (md5(key, salt), key)
    tuples per group: a uniform pseudo-random subset, reproducible
    anywhere (the same engine-portable hash as split_train_eval).

    100-TB shape: two-phase top-N. Phase 1 takes each *Spark
    partition's* local top-N per group (window over (group,
    partition-id) — parallel even when one domain owns half the
    corpus), shrinking a hot group to at most N x num_partitions
    rows; phase 2 ranks that bounded remainder. The final set is
    partitioning-independent because phase 1 keeps a superset of the
    global top-N and phase 2 applies the total (hash, key) order.
    """
    from hillview_spark.operators.sampling import salted_hash

    h = salted_hash(F.col(key_col), salt)
    tagged = df.withColumn("__h", h)
    w_local = Window.partitionBy(group_col, F.spark_partition_id()).orderBy(
        "__h", key_col
    )
    local = (
        tagged.withColumn("__lrk", F.row_number().over(w_local))
        .where(F.col("__lrk") <= max_per_group)
        .drop("__lrk")
    )
    w_global = Window.partitionBy(group_col).orderBy("__h", key_col)
    return (
        local.withColumn("__rk", F.row_number().over(w_global))
        .where(F.col("__rk") <= max_per_group)
        .drop("__rk", "__h")
    )


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot reconciliation: classify every document id across two
    corpus snapshots as added / removed / changed / unchanged by
    content fingerprint — the ingest-ops diff behind "what did this
    crawl refresh actually change". Content equality is md5 over the
    text (exact_dedup's fingerprint), compared NULL-SAFE so a NULL
    text on both sides reads unchanged, and NULL on one side reads
    changed. NULL document ids never equi-join: each NULL-id row
    classifies from its own side alone (added/removed) — identical in
    Spark and SQL by construction, documented rather than filtered.

    Scale shape: each side collapses to (id, fingerprint) at the scan
    (column pruning: only id and text are read), then ONE full-outer
    equi-join on the id — both sides hash-partition by the same key,
    and at 100 TB a bucketed-by-id layout makes the join
    exchange-free (sources/bucketing discipline). The status column
    is a pure codegen CASE; no second pass, no driver state."""
    fp = lambda c: F.md5(F.col(c))  # noqa: E731
    o = old_df.select(
        F.col(id_col).alias("__id"), fp(text_col).alias("__old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new_df.select(
        F.col(id_col).alias("__id"), fp(text_col).alias("__new_fp"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            F.col("__old_fp").eqNullSafe(F.col("__new_fp")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("__id").alias(id_col), status.alias("status")
    )
