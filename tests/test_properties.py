"""Property-based tests (hypothesis): operator invariants must hold
for arbitrary data, not just the synthetic corpus. Spark jobs are
expensive per example, so examples are few but adversarial (hypothesis
shrinks failures to minimal cases)."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hillview_spark.operators import histogram, spreadsheet
from hillview_spark.functions import text

finite_doubles = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(finite_doubles, min_size=1, max_size=50),
    st.integers(min_value=1, max_value=20),
)
def test_histogram_conserves_rows_and_is_dense(spark, xs, buckets):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    rows = histogram.histogram1d(df, "x", buckets).collect()
    assert len(rows) == buckets
    assert sorted(r.bucket for r in rows) == list(range(buckets))
    assert sum(r.cnt for r in rows) == len(xs)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=1, max_size=40
    ),
    st.integers(min_value=1, max_value=4),
)
def test_next_k_pagination_enumerates_exactly(spark, pairs, k):
    # strictly-after paging (inclusive=False): each page starts past
    # the previous page's last key, so the walk enumerates every
    # distinct key exactly once, in order
    df = spark.createDataFrame(pairs, "a int, b int")
    expected = sorted(set(pairs))
    seen, start = [], None
    for _ in range(100):
        page = spreadsheet.next_k(
            df, ["a", "b"], k=k, start=start, inclusive=False
        ).collect()
        if not page:
            break
        seen.extend((r.a, r.b) for r in page)
        start = (page[-1].a, page[-1].b)
    assert seen == expected  # in order, complete, no duplicates


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=1, max_size=40
    ),
    st.integers(min_value=1, max_value=4),
)
def test_next_k_default_anchor_inclusive(spark, pairs, k):
    # the reference default (NextKSketch.java:100-103, compareTo <= 0):
    # paging from the last row of a page re-yields that row as the
    # anchor — the UI scroll contract. Walk with the inclusive default
    # and k+1, dropping the repeated anchor each step.
    df = spark.createDataFrame(pairs, "a int, b int")
    expected = sorted(set(pairs))
    first = spreadsheet.next_k(df, ["a", "b"], k=k).collect()
    seen = [(r.a, r.b) for r in first]
    start = seen[-1] if seen else None
    for _ in range(100):
        if start is None:
            break
        page = spreadsheet.next_k(df, ["a", "b"], k=k + 1, start=start).collect()
        keys = [(r.a, r.b) for r in page]
        assert keys and keys[0] == start  # anchor row reappears first
        if len(keys) == 1:
            break
        seen.extend(keys[1:])
        start = keys[-1]
    assert seen == expected


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=60), min_size=1, max_size=20))
def test_quality_score_bounded(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in text.quality_score(df).collect():
        assert r.quality is None or 0.0 <= r.quality <= 1.0001


@settings(max_examples=6, deadline=None)
@given(
    st.lists(finite_doubles, min_size=1, max_size=60),
    st.integers(min_value=2, max_value=12),
)
def test_quantize_idempotent_and_grid_bound(spark, xs, buckets):
    from hillview_spark.operators import maps

    lo, hi = -100.0, 100.0
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    q1 = maps.quantize_column(df, "x", lo, hi, buckets)
    q2 = maps.quantize_column(q1, "x", lo, hi, buckets)
    key = lambda v: (v is None, v)
    a = sorted((r.x for r in q1.collect()), key=key)
    b = sorted((r.x for r in q2.collect()), key=key)
    assert a == b  # idempotent: grid values (and missing) map to themselves
    width = (hi - lo) / buckets
    grid = {lo + i * width for i in range(buckets)}
    # out-of-range values quantize to MISSING (r8 reference rule),
    # in-range values land on the grid
    assert {v for v in a if v is not None} <= grid
    assert sum(v is None for v in a) == sum(x < lo or x > hi for x in xs)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=40))
def test_global_rank_matches_sorted_position(spark, values):
    from hillview_spark.operators import stats

    distinct = sorted(set(values))
    df = spark.createDataFrame([(v,) for v in values], "value string").distinct()
    got = {r.value: r.rnk for r in stats.global_rank(df, ["value"]).collect()}
    assert got == {v: i for i, v in enumerate(distinct)}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3)), min_size=1,
             max_size=30),
    st.tuples(st.integers(0, 3), st.integers(0, 3)),
)
def test_row_comparison_trichotomy(spark, pairs, pivot):
    from hillview_spark.operators import filters

    df = spark.createDataFrame(pairs, "a int, b int")
    lt = df.where(filters.row_comparison_filter(["a", "b"], pivot, "<")).count()
    eq = df.where(filters.row_comparison_filter(["a", "b"], pivot, "==")).count()
    gt = df.where(filters.row_comparison_filter(["a", "b"], pivot, ">")).count()
    assert lt + eq + gt == len(pairs)
    assert eq == sum(1 for p in pairs if p == pivot)
    assert lt == sum(1 for p in pairs if p < pivot)


@settings(max_examples=6, deadline=None)
@given(st.lists(
    st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            min_size=0, max_size=60),
    min_size=1, max_size=12))
def test_pii_scrub_idempotent(spark, texts):
    """Scrubbing twice equals scrubbing once: placeholders contain no
    redactable substrings."""
    from hillview_spark.functions import curation

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = curation.pii_scrub(df).withColumnRenamed("text_scrubbed", "text")
    twice = curation.pii_scrub(once.select("doc_id", "text"))
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text_scrubbed for r in twice.collect()}
    assert a == b


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(1, 60), min_size=1, max_size=8),
    st.integers(3, 12),
    st.integers(0, 2),
)
def test_chunk_documents_reconstructs_tokens(spark, doc_lens, chunk, overlap):
    """Dropping each chunk's overlap prefix (except the first) and
    concatenating reconstructs the original token sequence exactly."""
    from hillview_spark.functions import curation

    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate(doc_lens)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = curation.chunk_documents(df, chunk, overlap)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, n in enumerate(doc_lens):
        parts = [t.split() for _, t in sorted(by_doc[i])]
        rebuilt = parts[0] + [tok for p in parts[1:] for tok in p[overlap:]]
        assert rebuilt == [f"w{i}_{j}" for j in range(n)]


# --- differential privacy invariants (pure Python, cheap examples) --


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=100_000),
    st.integers(min_value=0, max_value=5_000),
    st.integers(min_value=2, max_value=30),
)
def test_kadic_decomposition_tiles_any_interval(left, span, k):
    from hillview_spark.operators import privacy as P

    right = left + span
    nodes = P.kadic_decomposition(left, right, k)
    pos = left
    for start, size in nodes:
        assert start == pos
        p = 0
        while k**p < size:
            p += 1
        assert k**p == size  # size is an exact power of k
        pos += size
    assert pos == right
    # node count is O(k log_k span): the binary-mechanism cost bound
    if span > 0:
        bound = 2 * k * (P._ceil_log(max(right, 2), k) + 1)
        assert len(nodes) <= bound


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=1 << 20), st.integers(min_value=0, max_value=1 << 16))
def test_dyadic_decomposition_tiles_and_aligns(left, span):
    from hillview_spark.operators import privacy as P

    right = left + span
    pos = left
    for start, size in P.dyadic_decomposition(left, right):
        assert start == pos and start % size == 0 and size & (size - 1) == 0
        pos += size
    assert pos == right


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=100_000), st.integers(min_value=1, max_value=512))
def test_bucket_leaf_ranges_partition_and_invert(leaves, buckets):
    from hillview_spark.operators import privacy as P

    buckets = min(buckets, leaves)
    ranges = P._bucket_leaf_ranges(leaves, buckets)
    assert ranges[0][0] == 0 and ranges[-1][1] == leaves
    for (l1, r1), (l2, r2) in zip(ranges, ranges[1:]):
        assert r1 == l2 and l1 < r1
    assert ranges[-1][0] < ranges[-1][1]
    # the scan-side closed form floor(leaf*B/T) inverts the ranges
    for i, (l, r) in enumerate(ranges):
        for leaf in {l, r - 1, (l + r) // 2}:
            assert leaf * buckets // leaves == i


def _esc_py(v):
    """Pure-Python replica of privacy._prf_field / the DuckDB twin."""
    if v is None:
        return "\\N"
    return v.replace("\\", "\\\\").replace("|", "\\|")


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.one_of(st.none(), st.text(max_size=6)), min_size=1, max_size=4),
    st.lists(st.one_of(st.none(), st.text(max_size=6)), min_size=1, max_size=4),
)
def test_prf_field_escaping_is_injective(a, b):
    """The escaped '|'-join is INJECTIVE on key tuples (same arity):
    two distinct cells can never forge the same PRF key — the
    property the per-cell parallel-composition DP argument needs.
    Pure-Python replica of the expression (no Spark per example)."""
    ka = "|".join(_esc_py(x) for x in a)
    kb = "|".join(_esc_py(x) for x in b)
    if len(a) == len(b):
        assert (ka == kb) == (a == b)
    elif a != b and ka == kb:
        # different arity may only collide when one key's extra
        # fields are absorbed by... nothing: the seed is appended as
        # a fixed final field, so same-query keys always share arity.
        # Cross-arity collisions are out of scope by construction.
        pass


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=10))
def test_prf_escape_roundtrip_unambiguous(s):
    """Escaped field text never contains a BARE '|' (every delimiter
    in the joined key comes from the join itself), and the NULL
    sentinel is unreachable from any non-NULL value."""
    e = _esc_py(s)
    # every '|' in the escaped text is preceded by a backslash run of
    # odd length (i.e. it is escaped)
    i = 0
    for i, ch in enumerate(e):
        if ch == "|":
            back = 0
            j = i - 1
            while j >= 0 and e[j] == "\\":
                back += 1
                j -= 1
            assert back % 2 == 1
    assert e != "\\N" or s is None


@given(
    st.lists(
        st.tuples(st.text(max_size=8), st.text(max_size=8)),
        min_size=2, max_size=6, unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_len_prefix_coin_encoding_injective(pairs):
    """portable_bernoulli's '<len>:<value>' field encoding joined by
    '_' must map DISTINCT composite keys to DISTINCT coin inputs for
    ARBITRARY strings (underscores, colons, digits, empty) — the
    invariant the r7 aliasing fix rests on. Pure-Python replica of
    the column expression (length = character count, as both Spark
    length() and DuckDB LENGTH() count it)."""
    def encode(fields):
        return "_".join(f"{len(f)}:{f}" for f in fields)

    encoded = [encode(p) for p in pairs]
    assert len(set(encoded)) == len(pairs), (
        f"aliased keys: {pairs} -> {encoded}"
    )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_repeated_spans_match_bruteforce_cover(spark, corpora, n):
    """r13 property pin: over random tiny-alphabet corpora (where
    collisions are the NORM, unlike the fixtures), repeated_spans
    must equal the brute-force definition — position p in doc D is
    covered iff SOME n-window containing p occurs at >= 2 (doc, pos)
    sites corpus-wide; spans are the maximal covered runs. Also the
    removal conservation law: kept + removed == token count, and the
    removed positions are exactly the covered ones."""
    from hillview_spark.functions import dedup

    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # brute force
    from collections import Counter

    grams = Counter()
    for i, toks in enumerate(corpora):
        for p in range(len(toks) - n + 1):
            grams[tuple(toks[p:p + n])] += 1
    covered = {}
    for i, toks in enumerate(corpora):
        cov = set()
        for p in range(len(toks) - n + 1):
            if grams[tuple(toks[p:p + n])] >= 2:
                cov.update(range(p + 1, p + n + 1))  # 1-based inclusive
        covered[i] = cov
    want_spans = set()
    for i, cov in covered.items():
        for p in sorted(cov):
            if p - 1 not in cov:  # run start
                q = p
                while q + 1 in cov:
                    q += 1
                want_spans.add((i, p, q))
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup.repeated_spans(df, n=n, min_sites=2).collect()
    }
    assert got == want_spans

    rm = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_removed)
        for r in dedup.remove_repeated_spans(df, n=n, min_sites=2).collect()
    }
    assert set(rm) == set(range(len(corpora)))
    for i, toks in enumerate(corpora):
        text_, kept, removed = rm[i]
        assert kept + removed == len(toks)
        assert removed == len(covered[i])
        want_text = " ".join(
            t for p, t in enumerate(toks, start=1) if p not in covered[i]
        )
        assert text_ == want_text


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_remove_repeated_spans_keep_first_matches_bruteforce(
    spark, corpora, n
):
    """r14 property pin (VERDICT-r13 directive #3): keep='first' must
    equal the brute-force keep-one definition — position p in doc D
    is covered iff SOME n-window containing p occurs at >= 2 sites
    AND (D, window start) is NOT the first (doc, pos) site of that
    gram; conservation law kept + removed == token count holds."""
    from collections import defaultdict

    from hillview_spark.functions import dedup

    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sites = defaultdict(list)
    for i, toks in enumerate(corpora):
        for p in range(len(toks) - n + 1):
            sites[tuple(toks[p:p + n])].append((i, p + 1))  # 1-based
    covered = {i: set() for i in range(len(corpora))}
    for gram, ss in sites.items():
        if len(ss) >= 2:
            for (i, p) in sorted(ss)[1:]:  # first (doc, pos) exempt
                covered[i].update(range(p, p + n))
    rm = {
        r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_removed)
        for r in dedup.remove_repeated_spans(
            df, n=n, min_sites=2, keep="first"
        ).collect()
    }
    assert set(rm) == set(range(len(corpora)))
    for i, toks in enumerate(corpora):
        text_, kept, removed = rm[i]
        assert kept + removed == len(toks)
        assert removed == len(covered[i])
        want_text = " ".join(
            t for p, t in enumerate(toks, start=1) if p not in covered[i]
        )
        assert text_ == want_text


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
        ),
        min_size=2,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_remove_contaminated_spans_matches_bruteforce(spark, corpora, n):
    """r14 property pin (VERDICT-r13 directive #4): the surgical
    decontamination edit must equal the brute-force definition —
    train position p is cut iff SOME n-window containing p appears
    verbatim anywhere in the eval corpus; every train doc survives
    with kept + removed == token count. Even-indexed docs play eval,
    odd-indexed play train (both non-empty by min_size=2... the
    split may still leave one side empty of GRAMS, which is itself
    an edge worth the pin)."""
    from hillview_spark.functions import dedup

    train_toks = {i: t for i, t in enumerate(corpora) if i % 2 == 1}
    eval_toks = {i: t for i, t in enumerate(corpora) if i % 2 == 0}
    train = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in train_toks.items()],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in eval_toks.items()],
        "doc_id long, text string",
    )
    eval_grams = {
        tuple(toks[p:p + n])
        for toks in eval_toks.values()
        for p in range(len(toks) - n + 1)
    }
    covered = {}
    for i, toks in train_toks.items():
        cov = set()
        for p in range(len(toks) - n + 1):
            if tuple(toks[p:p + n]) in eval_grams:
                cov.update(range(p + 1, p + n + 1))
        covered[i] = cov
    if train_toks:
        rm = {
            r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_removed)
            for r in dedup.remove_contaminated_spans(train, ev, n=n).collect()
        }
        assert set(rm) == set(train_toks)
        for i, toks in train_toks.items():
            text_, kept, removed = rm[i]
            assert kept + removed == len(toks)
            assert removed == len(covered[i])
            assert text_ == " ".join(
                t for p, t in enumerate(toks, start=1)
                if p not in covered[i]
            )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # hour
            st.sampled_from(["a", "b", "c", "d", "e"]),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_windowed_topk_both_policies_match_bruteforce(spark, evs, k):
    """r13 property pin for the r12 ties policies: over random event
    streams with heavy count ties, ties='truncate' must equal the
    brute-force (count DESC, value) row_number cut at exactly k rows
    per window, and ties='keep' the brute-force competition rank()
    (everything tying the k-th survives)."""
    import datetime

    from hillview_spark.streaming import events as ev

    rows = [
        (i, f"u{i}", t, datetime.datetime(2024, 1, 1, h), 1.0)
        for i, (h, t) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id string, event_type string, "
        "ts timestamp, value double",
    )
    from collections import Counter

    cells = Counter((h, t) for h, t in evs)
    per_win = {}
    for (h, t), n in cells.items():
        per_win.setdefault(h, []).append((t, n))
    want_trunc, want_keep = set(), set()
    for h, tn in per_win.items():
        win = datetime.datetime(2024, 1, 1, h)
        order = sorted(tn, key=lambda x: (-x[1], x[0]))
        for r, (t, n) in enumerate(order, start=1):
            if r <= k:
                want_trunc.add((win, t, n, r))
        ranks = {}
        for t, n in order:
            ranks[(t, n)] = 1 + sum(1 for _, m in order if m > n)
        for (t, n), r in ranks.items():
            if r <= k:
                want_keep.add((win, t, n, r))
    got_trunc = {
        (r.window_start, r.value, r.n, r.rank)
        for r in ev.windowed_topk(df, "hour", "event_type", k=k,
                                  ties="truncate").collect()
    }
    got_keep = {
        (r.window_start, r.value, r.n, r.rank)
        for r in ev.windowed_topk(df, "hour", "event_type", k=k,
                                  ties="keep").collect()
    }
    assert got_trunc == want_trunc
    assert got_keep == want_keep


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),          # quality
            st.one_of(st.none(),
                      st.integers(min_value=-5, max_value=30)),  # cost
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=0, max_value=120),
)
def test_select_within_budget_matches_bruteforce_prefix(spark, rows, budget):
    """r13 property pin (negative-cost clamp): the kept set must be
    the brute-force merit-ordered prefix under max(cost, 0) charging
    with NULL as 0, for random quality/cost mixes including negatives
    and ties."""
    from hillview_spark.functions import curation

    data = [(i, q, c) for i, (q, c) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, q int, cost int")
    order = sorted(data, key=lambda r: (-r[1], r[0]))
    cum, want = 0, {}
    for i, q, c in order:
        cum += max(c or 0, 0)
        if cum <= budget:
            want[i] = cum
        else:
            break
    got = {
        r.doc_id: r.cum_cost
        for r in curation.select_within_budget(
            df, budget=budget, quality_col="q", cost_col="cost"
        ).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.integers(min_value=1, max_value=400),
    st.sampled_from([0.0, 0.03, 0.07, 0.1, 0.13, 0.25, 0.29, 0.5, 1.0]),
)
def test_stratified_split_quota_exact_for_random_sizes(spark, n, frac):
    """r13 property pin (float-ceil quota fix): for ANY stratum size
    and the crossing-prone fractions, eval gets EXACTLY
    ceil(round(n*frac, 9)) rows — the decimal-true quota, not the
    IEEE-overshot one."""
    import math
    from decimal import Decimal

    from hillview_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "s") for i in range(n)], "doc_id long, source string"
    )
    out = sampling.stratified_split(df, frac, "doc_id", "source")
    got = out.where(F.col("split") == "eval").count()
    want = math.ceil(Decimal(n) * Decimal(str(frac)))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),              # user
            st.sampled_from(["click", "view", "purchase", "x"]),
            st.integers(min_value=0, max_value=12),             # minute
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_and_transitions_match_bruteforce(spark, evs):
    """r13 property pin for the r11 analytics core: over random
    event streams with same-instant ties, funnel_counts must equal
    the brute-force strictly-after first-completion chain, and
    transition_counts the brute-force adjacent-pair count under the
    (ts, event_id) total order."""
    import datetime

    from collections import Counter

    from hillview_spark.streaming import events as ev

    rows = [
        (i, f"u{u}", t, datetime.datetime(2024, 1, 1, 0, m), 1.0)
        for i, (u, t, m) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id string, event_type string, "
        "ts timestamp, value double",
    )
    # brute-force funnel: first click, first view strictly after it,
    # first purchase strictly after that
    steps = ("click", "view", "purchase")
    per_user = {}
    for i, (u, t, m) in enumerate(evs):
        per_user.setdefault(u, []).append((m, i, t))
    want_funnel = []
    survivors = {u: None for u in per_user}  # user -> prev step time
    for si, st_name in enumerate(steps, start=1):
        nxt = {}
        for u, prev in survivors.items():
            times = [
                m for m, _, t in per_user[u]
                if t == st_name and (prev is None or m > prev)
            ]
            if times:
                nxt[u] = min(times)
        survivors = nxt
        want_funnel.append((si, st_name, len(survivors)))
    got_funnel = sorted(
        (r.step, r.event_type, r.n_users)
        for r in ev.funnel_counts(df, steps=steps).collect()
    )
    assert got_funnel == sorted(want_funnel)

    # brute-force transitions under the (ts, event_id) total order
    want_trans = Counter()
    for u, seq in per_user.items():
        ordered = [t for m, i, t in sorted(seq)]
        for a, b in zip(ordered, ordered[1:]):
            want_trans[(a, b)] += 1
    got_trans = {
        (r.from_type, r.to_type): r.n_transitions
        for r in ev.transition_counts(df).collect()
    }
    assert got_trans == {k: v for k, v in want_trans.items()}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=3),
                  st.one_of(st.none(),
                            st.integers(min_value=0, max_value=20))),
        min_size=1, max_size=15,
    ),
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=3),
                  st.one_of(st.none(),
                            st.integers(min_value=0, max_value=20)),
                  st.integers(min_value=0, max_value=99)),
        min_size=0, max_size=15,
    ),
    st.sampled_from([None, 4]),
)
def test_asof_join_matches_bruteforce(spark, lrows, rrows, chunk):
    """r13 property pin: asof_join (default AND chunked path — the
    chunk-spine rewrite claims identical results for any chunk size)
    must equal the brute-force most-recent-preceding match, with
    right (key, time) pre-deduped so the match is unique, NULL
    keys/times matching nothing, and inclusive same-instant ties."""
    import datetime

    from hillview_spark.operators import temporal

    base = datetime.datetime(2024, 1, 1)
    sec = lambda s: None if s is None else base + datetime.timedelta(
        seconds=int(s))
    # pre-dedup right (key, time): keep the max payload (deterministic)
    rd = {}
    for k, t, v in rrows:
        key = (k, t)
        if key not in rd or v > rd[key]:
            rd[key] = v
    left = spark.createDataFrame(
        [(i, k, sec(t)) for i, (k, t) in enumerate(lrows)],
        "lid long, k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, sec(t), v) for (k, t), v in rd.items()],
        "k int, ts timestamp, v long",
    ) if rd else spark.createDataFrame([], "k int, ts timestamp, v long")
    got = {
        r.lid: (r.ts_r, r.v_r)
        for r in temporal.asof_join(
            left, right, "ts", ["k"], ["v"], chunk_seconds=chunk
        ).collect()
    }
    want = {}
    for i, (k, t) in enumerate(lrows):
        best = None
        if t is not None and k is not None:
            for (rk, rt), v in rd.items():
                if rk == k and rt is not None and rt <= t:
                    if best is None or rt > best[0]:
                        best = (rt, v)
        want[i] = (sec(best[0]), best[1]) if best else (None, None)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=14),
                  st.integers(min_value=0, max_value=14)),
        min_size=1, max_size=25,
    )
)
def test_connected_components_both_paths_match_union_find(spark, edges):
    """r13 property pin: over random pair graphs (self-loops,
    duplicate edges, chains, all allowed) BOTH execution paths — the
    driver-side union-find shortcut AND the distributed pointer-
    jumping loop (forced via driver_threshold=0) — must label every
    node with exactly min(component)."""
    from hillview_spark.functions import dedup

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_id_1 long, doc_id_2 long"
    )
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    for path_kw in ({"driver_threshold": 2_000_000},
                    {"driver_threshold": 0}):
        got = {
            r.doc_id: r.component
            for r in dedup.connected_components(df, **path_kw).collect()
        }
        assert got == want, path_kw


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=3),
                  st.integers(min_value=0, max_value=300)),
        min_size=1, max_size=30,
    ),
    st.integers(min_value=1, max_value=60),
)
def test_sessionize_matches_bruteforce(spark, evs, gap_minutes):
    """r13 property pin: gap-based session assignment over random
    event streams (same-instant ties broken by event_id) must equal
    the brute-force linear scan — session boundaries strictly-greater
    than the gap, per-user numbering from 1, correct n_events and
    start/end."""
    import datetime

    from hillview_spark.streaming import events as ev

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, f"u{u}", "click", base + datetime.timedelta(minutes=m), 1.0)
        for i, (u, m) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id string, event_type string, "
        "ts timestamp, value double",
    )
    per_user = {}
    for i, (u, m) in enumerate(evs):
        per_user.setdefault(u, []).append((m, i))
    want = {}
    for u, seq in per_user.items():
        seq.sort()
        sid, prev, bucket = 0, None, []
        for m, i in seq:
            if prev is None or (m - prev) * 60 > gap_minutes * 60:
                if bucket:
                    want[(f"u{u}", sid)] = bucket
                sid += 1
                bucket = []
            bucket.append(m)
            prev = m
        want[(f"u{u}", sid)] = bucket
    got = {
        (r.user_id, r.session_id):
            (r.n_events, r.session_start, r.session_end)
        for r in ev.sessionize(df, gap_minutes=gap_minutes).collect()
    }
    want_rows = {
        k: (
            len(v),
            base + datetime.timedelta(minutes=min(v)),
            base + datetime.timedelta(minutes=max(v)),
        )
        for k, v in want.items()
    }
    assert got == want_rows


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from([None, 1, 2]),          # user
            st.one_of(st.none(), st.integers(0, 3)),  # hour (None=NULL ts)
        ),
        min_size=1,
        max_size=24,
    ),
    st.integers(min_value=1, max_value=3),          # k
    st.one_of(st.none(), st.integers(1, 2)),        # max_windows
)
def test_bound_contributions_matches_bruteforce(spark, evs, k, max_w):
    """r15 property pin (VERDICT-r14 directive #3): the contribution
    bound must equal its brute-force definition over arbitrary
    (user, window) collision patterns — per (user, window) keep the
    k smallest (md5(id_salt), id) events (NULL users pooled as one
    group, NULL-ts rows dropped), then per user keep rows only in
    the max_windows smallest (md5(epoch_salt), window) windows."""
    import datetime
    import hashlib

    from hillview_spark.streaming import events as ev

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (
            i,
            u,
            "click",
            None if h is None else base + datetime.timedelta(hours=h),
            1.0,
        )
        for i, (u, h) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )

    def ehash(eid):
        return int(
            hashlib.md5(f"{eid}_bound1".encode()).hexdigest()[:7], 16
        )

    def whash(h):
        secs = int(
            (base + datetime.timedelta(hours=h))
            .replace(tzinfo=datetime.timezone.utc)
            .timestamp()
        )
        return int(
            hashlib.md5(f"{secs}_bound1w".encode()).hexdigest()[:7], 16
        )

    groups = {}
    for i, (u, h) in enumerate(evs):
        if h is None:
            continue
        groups.setdefault((u, h), []).append(i)
    kept = set()
    for ids in groups.values():
        kept.update(e for _, e in sorted((ehash(e), e) for e in ids)[:k])
    if max_w is not None:
        user_wins = {}
        for i, (u, h) in enumerate(evs):
            if i in kept:
                user_wins.setdefault(u, set()).add(h)
        keep_wins = {
            u: {h for _, h in sorted((whash(h), h) for h in ws)[:max_w]}
            for u, ws in user_wins.items()
        }
        kept = {
            i
            for i, (u, h) in enumerate(evs)
            if i in kept and h in keep_wins[u]
        }
    got = {
        r.event_id
        for r in ev.bound_contributions(
            df, k=k, per="hour", max_windows=max_w
        ).collect()
    }
    assert got == kept


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=16
        ),
        min_size=2,
        max_size=8,
    ),
    st.floats(min_value=0.1, max_value=1.0),
)
def test_ngram_containment_matches_bruteforce(spark, corpora, threshold):
    """r15 property pin: asymmetric containment must equal the
    brute-force set definition — per unordered doc pair with a
    non-empty shingle intersection, c/|A| and c/|B| over the
    DISTINCT 3-gram sets, kept when the larger direction clears the
    threshold; docs with no shingles never pair."""
    from hillview_spark.functions import dedup

    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sets = {
        i: {
            tuple(toks[p:p + 3]) for p in range(len(toks) - 2)
        }
        for i, toks in enumerate(corpora)
    }
    want = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                c = len(sets[i] & sets[j])
                if c and max(c / len(sets[i]), c / len(sets[j])) >= threshold:
                    want[(i, j)] = (
                        round(c / len(sets[i]), 4),
                        round(c / len(sets[j]), 4),
                    )
    got = {
        (r.doc_id_1, r.doc_id_2): (
            r.containment_1_in_2, r.containment_2_in_1
        )
        for r in dedup.ngram_containment_pairs(
            df, threshold=threshold, n=3
        ).collect()
    }
    assert got == want
