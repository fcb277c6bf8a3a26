"""Interleaved same-session A/B probes for the r15 OPTIMIZATION
round: each claimed win pairs the NEW shipped shape against an
inline replica of the OLD shape, alternating A,B,A,B,... inside one
session (bench.run_ab discipline — cross-process runs on this box
swing +-40%, which can invert a real same-process win).

Pairs:
  regexp_count   — lang_id / token_count / pii_scrub counting via
                   regexp_count (new) vs size(regexp_extract_all)
                   (old, materializes every match)
  repstats       — repetition_stats one shared tokenize + union
                   aggregate (new) vs two tokenize scans + two
                   groupBy chains + two joins (old)
  bm25_persist   — bm25_search persisted per-doc tf relation (new)
                   vs recomputed-per-consumer (old)

Usage: python tools/ab_r15.py [pair ...] [--repeats N]
Run on an otherwise-idle box.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from hillview_spark import cache  # noqa: E402
from hillview_spark.session import get_spark  # noqa: E402
from hillview_spark.tables import load_all  # noqa: E402
from hillview_spark.functions.text import (  # noqa: E402
    CJK_RE, STOPWORD_RES, WORD_OR_PUNCT_RE,
)


def _old_count_re(col, pattern):
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def old_lang_id(df):
    t = F.lower(F.col("text"))
    cjk = _old_count_re(F.col("text"), CJK_RE)
    counts = {lang: _old_count_re(t, pat) for lang, pat in STOPWORD_RES.items()}
    en, fr, es, de = counts["en"], counts["fr"], counts["es"], counts["de"]
    pred = (
        F.when(cjk > 0, F.lit("zh"))
        .when((en >= fr) & (en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((fr >= es) & (fr >= de) & (fr > 0), F.lit("fr"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("unknown"))
    )
    return df.select(F.col("doc_id"), pred.alias("lang_pred"))


def old_token_count(df):
    from hillview_spark.functions.text import _ws_tokens

    t = F.col("text")
    return df.select(
        F.col("doc_id"),
        _ws_tokens(t).cast("long").alias("ws_tokens"),
        _old_count_re(t, WORD_OR_PUNCT_RE).cast("long").alias("bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def old_repetition_stats(df):
    from hillview_spark.functions.curation import _bigrams_of

    id_col, text_col = "doc_id", "text"
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    tok_stats = (
        toks.groupBy("__doc", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("__doc")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            F.max("c").alias("max_tok"),
        )
    )
    grams = df.withColumn(
        "__toks",
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        ),
    ).select(
        F.col(id_col).alias("__doc"),
        F.explode(_bigrams_of(F.col("__toks"))).alias("gram"),
    )
    gram_stats = (
        grams.groupBy("__doc", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("__doc")
        .agg(F.max("c").alias("max_gram"))
    )
    n = F.col("n_tokens").cast("double")
    ids = df.select(F.col(id_col).alias("__doc"))
    return (
        ids.join(tok_stats, "__doc", "left")
        .join(gram_stats, "__doc", "left")
        .select(
            F.col("__doc").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("distinct_tokens"), F.lit(0)).alias(
                "distinct_tokens"
            ),
            F.coalesce(
                F.round(F.lit(1.0) - F.col("distinct_tokens") / n, 4),
                F.lit(0.0),
            ).alias("dup_token_frac"),
            F.coalesce(F.round(F.col("max_tok") / n, 4), F.lit(0.0)).alias(
                "top_token_frac"
            ),
            F.when(F.col("n_tokens").isNull(), F.lit(0.0))
            .otherwise(
                F.round(
                    F.least(
                        F.coalesce(F.col("max_gram"), F.lit(0)) * 2 / n,
                        F.lit(1.0),
                    ),
                    4,
                )
            )
            .alias("top_bigram_frac"),
        )
    )


def old_bm25(df, terms):
    from hillview_spark.functions.text import tokens_expr

    k1, b = 1.2, 0.75
    toks = tokens_expr(F.col("text"))

    def _eq(tm):
        return lambda x: x == tm

    per = df.select(
        F.col("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, _eq(tm))).cast("long").alias(f"tf{i}")
            for i, tm in enumerate(terms)
        ],
    )
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
    return joined.where(hit).select(
        F.col("doc_id"),
        score.cast("decimal(20,8)").cast("double").alias("bm25"),
    )


def old_pii_scrub(df):
    from hillview_spark.functions.curation import PII_RULES

    t = F.col("text")
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(
            _old_count_re(t, pat).cast("long").alias(f"n_{name}")
        )
        t = F.regexp_replace(t, pat, repl)
    return df.select(F.col("doc_id"), t.alias("text_scrubbed"), *counts)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_pair(name, fa, fb, repeats):
    sa, sb = [], []
    # untimed warm of both sides
    noop(fa())
    cache.release_all()
    noop(fb())
    cache.release_all()
    for i in range(repeats):
        order = [(fa, sa), (fb, sb)]
        if i % 2:
            order.reverse()
        for f, s in order:
            start = time.perf_counter()
            noop(f())
            s.append(time.perf_counter() - start)
            cache.release_all()
    print(
        f"{name}: new={statistics.median(sa):.3f}s old={statistics.median(sb):.3f}s"
        f"  (new {sorted(round(x, 3) for x in sa)} | old {sorted(round(x, 3) for x in sb)})"
    )


def main():
    args = list(sys.argv[1:])
    repeats = 5
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    from hillview_spark.functions import curation, search, text

    spark = get_spark(
        app_name="ab-r15", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_all(spark, "/root/testdata/sf0.1")
    docs = t["documents"]
    docs.count()

    pairs = {
        "lang_id": (lambda: text.lang_id(docs), lambda: old_lang_id(docs)),
        "token_count": (
            lambda: text.token_count(docs), lambda: old_token_count(docs)),
        "pii_scrub": (
            lambda: curation.pii_scrub(docs), lambda: old_pii_scrub(docs)),
        "repstats": (
            lambda: curation.repetition_stats(docs),
            lambda: old_repetition_stats(docs)),
        "bm25": (
            lambda: search.bm25_search(docs, ["spark", "hash", "vector"]),
            lambda: old_bm25(docs, ["spark", "hash", "vector"])),
    }
    names = args or list(pairs)
    for n in names:
        fa, fb = pairs[n]
        run_pair(n, fa, fb, repeats)
    spark.stop()


if __name__ == "__main__":
    main()
