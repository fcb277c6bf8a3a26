"""Full-text relevance search over a document corpus: BM25 scoring
with the Okapi/Lucene formulation.

The query-term list is small and known up front, so the whole
computation is expressed WITHOUT exploding the corpus vocabulary:
per-document term frequencies are array expressions over the
tokenized text (one narrow scan, zero shuffle), corpus statistics
(N, avg doc length, per-term doc frequencies) are one tiny global
aggregate, and the final score is a per-row expression under a
broadcast of that 1-row stats relation. At 100 TB this is two scans
of the text column and a broadcast join — no shuffle of user data at
all, which is the plan you want when the query list is a handful of
terms (the Lucene/ES shape of "score everything against this
query").

Tokenization matches functions/text.py `vocab` (lowercase,
whitespace split, empty tokens dropped) so BM25 scores sit on the
same vocabulary the corpus-stats operators report.

Determinism note (cross-engine hash-oracle): every per-row operation
mirrors the DuckDB oracle's op order, so doubles are bit-identical —
except ln(), which differs by up to 1 ulp across math libraries. The
per-TERM idf is therefore quantized through DECIMAL(20,9)
immediately after the ln; everything downstream of the quantized idf
is bit-identical again. (Residual risk: a 1-ulp ln wobble landing
exactly on the 9th-decimal rounding boundary — ~1e-6 per query term,
not per row.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _eq(tm: str):
    """1-arg array-filter predicate. (A 2-arg lambda with a default
    would be treated by PySpark as the (element, index) signature —
    the index column would silently override the default.)"""
    return lambda x: x == F.lit(tm)


def bm25_search(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int | None = None,
) -> DataFrame:
    """Score every document against `terms` with Okapi BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the Lucene variant —
    always positive). Returns (id, bm25) for documents matching at
    least one term; top_n additionally sorts (score desc, id) and
    truncates — TakeOrderedAndProject, never a global sort.
    """
    if not terms:
        raise ValueError("terms must be a non-empty list")
    # document tokens are lowercased — normalize the query the same
    # way, or an uppercase query term would silently match nothing
    terms = [tm.lower() for tm in terms]
    if len(set(terms)) != len(terms):
        raise ValueError("terms must be distinct (after lowercasing)")
    # loud-failure convention (sampling.salted_guard): a term that the
    # tokenizer can never produce — empty, or containing the ASCII
    # whitespace Java \s splits on (tokens can still contain unicode
    # spaces like U+00A0, which Java \s does NOT split; those terms
    # stay legal) — would otherwise return 0 rows silently even when
    # documents literally contain the phrase
    import re

    bad = [tm for tm in terms if not tm or re.search(r"[ \t\n\x0b\f\r]", tm)]
    if bad:
        raise ValueError(
            "terms must be single whitespace-free tokens (the \\s+ "
            f"tokenizer can never produce them, so they cannot match): "
            f"{bad!r}"
        )

    from hillview_spark.functions.text import tokens_expr

    toks = tokens_expr(F.col(text_col))
    per = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, _eq(tm))).cast("long").alias(f"tf{i}")
            for i, tm in enumerate(terms)
        ],
    )
    # `per` feeds TWO consumers (the corpus stats aggregate and the
    # scoring join) — without a persist the tokenize scan runs twice
    # per call (the same feeds-two-consumers shape bigram_lm_nll and
    # top_terms_per_doc already persist). The persisted relation is
    # the lightweight proxy — one row per doc, id + a few longs —
    # never the text.
    from hillview_spark import cache

    per = per.transform(cache.persist)
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    joined = per.crossJoin(F.broadcast(stats))

    n_d = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_d
    rel = F.col("dl").cast("double") / avgdl
    score = None
    for i in range(len(terms)):
        df_d = F.col(f"df{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5))
        )
        # quantize the ONLY cross-library-wobbly op (see module doc)
        idf_q = idf.cast("decimal(20,9)").cast("double")
        tf_d = F.col(f"tf{i}").cast("double")
        contrib = (
            idf_q
            * (tf_d * F.lit(k1 + 1.0))
            / (tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * rel))
        )
        score = contrib if score is None else score + contrib
    hit = None
    for i in range(len(terms)):
        cond = F.col(f"tf{i}") > 0
        hit = cond if hit is None else hit | cond
    out = joined.where(hit).select(
        F.col(id_col),
        score.cast("decimal(20,8)").cast("double").alias("bm25"),
    )
    if top_n is not None:
        out = out.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(top_n)
    return out


def top_terms_per_doc(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Keyword extraction: the k highest-TF-IDF terms per document
    (tfidf = tf * ln(N / df), smooth-free idf; ties broken by term).
    The classic "what characterizes this document" signal — also the
    cheap feature for keyword-level clustering and near-dup triage.

    min_df / max_df_frac prune the vocabulary before scoring: terms
    in fewer than min_df docs (noise) or more than max_df_frac * N
    docs (stopwords, idf ~ 0) drop out — at 100 TB this also caps
    the document-frequency join's key space.

    Scale shape: one explode -> groupBy(doc, term) with map-side
    combine; document frequencies aggregate off the SAME (doc, term)
    relation (one row per pair, so count(*) per term IS the doc
    frequency); the scoring join is an equi-join on the term key and
    the top-k is a per-doc window over at most |terms-in-doc| rows.

    Determinism: idf quantizes through DECIMAL(20,9) after the ln
    (cross-library 1-ulp wobble — see bm25_search); tf is exact, so
    scores and the (score desc, term) rank reproduce in any engine.

    Precondition (ADVICE r15): doc ids are unique. The per-row
    run-length shape computes tf within each physical row, so rows
    sharing an id keep separate tf and each contributes to document
    frequency, where the pre-r15 groupBy(id, term) merged them. The
    expected corpus keys documents by id; dedupe first if yours
    doesn't.
    """
    from hillview_spark.functions.text import tokens_expr

    # Per-doc term frequencies WITHOUT the corpus-wide groupBy(doc,
    # term) shuffle (r15 opt): every document's tokens already live
    # in ONE row, so tf per (doc, term) is a per-row computation —
    # sort the token array, find run starts, and the run lengths ARE
    # the counts. The old shape exploded every token occurrence and
    # shuffled the whole pair relation just to count what was
    # co-located all along; this removes that exchange outright
    # (guide §2.4) — the surviving corpus-scale shuffles are docfreq
    # (distinct terms per input split after partial aggregation) and
    # the per-doc top-k window. The layered withColumns are
    # projection barriers so the sort runs once per row.
    toks = tokens_expr(F.col(text_col))
    n = F.size(F.col("__s"))
    # 1-based run-start positions in the sorted array (ANSI-safe:
    # element_at indexes are always within [1, n]; sequence is
    # guarded because sequence(1, 0) would DESCEND, not be empty)
    starts = F.when(
        n >= 1,
        F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == 1)
            | (F.element_at(F.col("__s"), i)
               # greatest() keeps the index >= 1 even when i == 1
               # (the OR's left arm already decides that case; this
               # arm must still be SAFE to evaluate under ANSI)
               != F.element_at(F.col("__s"), F.greatest(i - 1, F.lit(1)))),
        ),
    ).otherwise(F.array().cast("array<int>"))
    run = F.transform(
        F.sequence(F.lit(1), F.size(F.col("__r"))),
        lambda j: F.struct(
            F.element_at(
                F.col("__s"), F.element_at(F.col("__r"), j)
            ).alias("term"),
            (
                F.coalesce(F.try_element_at(F.col("__r"), j + 1), n + 1)
                - F.element_at(F.col("__r"), j)
            ).cast("long").alias("tf"),
        ),
    )
    pairs = (
        df.withColumn("__s", F.array_sort(toks))
        .withColumn("__r", starts)
        .select(
            F.col(id_col),
            F.explode(
                F.when(F.size(F.col("__r")) >= 1, run)
                .otherwise(F.array().cast("array<struct<term:string,tf:bigint>>"))
            ).alias("__p"),
        )
        .select(id_col, F.col("__p.term").alias("term"),
                F.col("__p.tf").alias("tf"))
    )
    from hillview_spark import cache

    pairs = pairs.transform(cache.persist)
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    docfreq = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
    )
    if min_df > 1:
        docfreq = docfreq.where(F.col("df") >= min_df)
    if max_df_frac is not None:
        docfreq = docfreq.where(
            F.col("df").cast("double")
            <= F.lit(max_df_frac) * F.col("n_docs").cast("double")
        )
    idf_q = (
        F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
        .cast("decimal(20,9)")
        .cast("double")
    )
    scored = pairs.join(
        docfreq.select("term", idf_q.alias("idf")), ["term"]
    ).select(
        F.col(id_col),
        "term",
        "tf",
        (F.col("tf").cast("double") * F.col("idf")).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )
