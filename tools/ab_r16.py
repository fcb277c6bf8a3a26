"""Interleaved same-session A/B probes for the r16 OPTIMIZATION
round (second optimization round). Same discipline as tools/ab_r15:
each pair alternates A,B,A,B,... inside ONE session (cross-process
runs on this box swing +-40%, which can invert a real same-process
win); results-identical pairs assert identity row-for-row BEFORE
timing.

Pairs:
  repstats_rle — repetition_stats: per-row array_sort + run-length
                 stats, ZERO shuffle (candidate, the tfidf r15
                 idiom) vs the shipped union + (doc,tag,key)
                 aggregate + join. Identity asserted.
  colstats_sq  — basic_col_stats: square operands narrowed so the
                 sum-of-squares ACCUMULATOR stays on the <=18-digit
                 compact-long decimal path vs the shipped widths.
                 Identity asserted. (VERDICT-r15 #6)
  simhash_hash — time-only decomposition of the simhash fingerprint
                 job: explode-only, +md5/conv 60-bit hash (shipped,
                 oracle-pinned), +xxhash64&mask (the hash the
                 fingerprint CANNOT use without changing declared
                 results — measured to settle VERDICT-r15 #2).
  regexp_big   — regexp_count vs size(regexp_extract_all) on a
                 synthetic large-document fixture (~60x documents
                 text, ~100 KB docs), closing the r15 scale claim
                 with a number (VERDICT-r15 #4). Identity asserted.
  q15_10x      — q15 shipped (second quarter scan) vs persisted rev
                 aggregate, over a 10x lineitem parquet replica
                 (VERDICT-r15 #3). Identity asserted.

Usage: python tools/ab_r16.py [pair ...] [--repeats N]
Run on an otherwise-idle box; note the dedup_corpus_noise A/A floor
from the nearest bench run alongside any recorded number.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from hillview_spark import cache  # noqa: E402
from hillview_spark.session import get_spark  # noqa: E402
from hillview_spark.tables import load_all  # noqa: E402


# ---------------------------------------------------------------- helpers

def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _assert_same(a_df, b_df, keys):
    a = sorted(map(tuple, a_df.collect()))
    b = sorted(map(tuple, b_df.collect()))
    assert a == b, (
        f"A/B results differ: {len(a)} vs {len(b)} rows; "
        f"first diff: {next(((x, y) for x, y in zip(a, b) if x != y), None)}"
    )
    print(f"  identity OK over {len(a)} rows", file=sys.stderr)


def _ab(name, fa, fb, repeats, materialize=_noop):
    sa, sb = [], []
    for i in range(repeats):
        order = [(fa, sa), (fb, sb)]
        if i % 2:
            order.reverse()
        for f, s in order:
            t0 = time.perf_counter()
            materialize(f())
            s.append(time.perf_counter() - t0)
    cache.release_all()
    ma, mb = statistics.median(sa), statistics.median(sb)
    print(
        f"# {name}: new={ma:.3f}s vs old={mb:.3f}s "
        f"(medians of {repeats}; samples new={['%.3f' % x for x in sa]} "
        f"old={['%.3f' % x for x in sb]})"
    )
    return ma, mb


# ------------------------------------------------- repetition_stats (RLE)

def repstats_union_old(df, text_col="text", id_col="doc_id"):
    """Inline replica of the r15 SHIPPED shape (union + one
    (doc, tag, key) aggregate + ids left-join), the predecessor of
    the r16 per-row RLE rewrite now in curation.repetition_stats."""
    from hillview_spark.functions.curation import _bigrams_of

    toked = df.select(
        F.col(id_col).alias("__doc"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("__toks"),
    ).transform(cache.persist)
    pairs = toked.select(
        "__doc", F.lit(False).alias("__g"), F.explode("__toks").alias("k")
    ).unionAll(
        toked.select(
            "__doc", F.lit(True).alias("__g"),
            F.explode(_bigrams_of(F.col("__toks"))).alias("k"),
        )
    )
    tok = ~F.col("__g")
    per_doc = (
        pairs.groupBy("__doc", "__g", "k")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("__doc")
        .agg(
            F.sum(F.when(tok, F.col("c"))).alias("n_tokens"),
            F.count(F.when(tok, F.lit(1))).alias("distinct_tokens"),
            F.max(F.when(tok, F.col("c"))).alias("max_tok"),
            F.max(F.when(F.col("__g"), F.col("c"))).alias("max_gram"),
        )
    )
    n = F.col("n_tokens").cast("double")
    ids = df.select(F.col(id_col).alias("__doc"))
    return (
        ids.join(per_doc, "__doc", "left")
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


def pair_repstats_rle(t, repeats):
    from hillview_spark.functions import curation

    d = t["documents"]
    print("repstats_rle: asserting identity first", file=sys.stderr)
    _assert_same(
        curation.repetition_stats(d), repstats_union_old(d), ["doc_id"]
    )
    return _ab(
        "repstats_rle(new=shipped per-row RLE zero-shuffle, "
        "old=r15 union agg replica)",
        lambda: curation.repetition_stats(d),
        lambda: repstats_union_old(d),
        repeats,
    )


# ---------------------------------------------------- col_stats squares

def pair_colstats_sq(t, repeats):
    from hillview_spark.operators import stats
    import bench

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = t["lineitem"]

    # Narrowed TRUE domains: l_quantity in [1,50] -> (4,2); l_discount
    # and l_tax in [0,0.10]/[0,0.08] -> (3,2). Their squares then fit
    # (8,4)/(6,4), whose SUM accumulator decimal(18,4)/(16,4) stays on
    # the compact-long path. l_extendedprice needs (8,2) (values to
    # ~1e5), square (16,4) -> sum decimal(26,4): 128-bit regardless.
    narrow = {
        "l_quantity": (4, 2),
        "l_extendedprice": (8, 2),
        "l_discount": (3, 2),
        "l_tax": (3, 2),
    }

    def variant():
        # inline replica of basic_col_stats' exact path with separate
        # square widths: reuse the function but with the narrow widths
        # (sum operand AND square operand both narrowed — sums of
        # 2-decimal data are exact at any sufficient width)
        return stats.basic_col_stats(li, cols, widths=narrow)

    def shipped():
        return stats.basic_col_stats(li, cols, widths=bench._LI_STAT_WIDTHS)

    print("colstats_sq: asserting identity first", file=sys.stderr)
    _assert_same(variant(), shipped(), ["column"])
    return _ab(
        "colstats_sq(new=true-domain narrow widths, old=shipped widths)",
        variant, shipped, repeats,
        materialize=lambda df: df.collect(),
    )


# ----------------------------------------------------- simhash decompose

def pair_simhash_hash(t, repeats):
    from hillview_spark.functions.dedup import tokens

    d = t["documents"]
    toks = d.select(
        F.col("doc_id").alias("doc"), F.explode(tokens(F.col("text"))).alias("t")
    )

    def explode_only():
        return toks

    def with_md5():
        return toks.withColumn(
            "h", F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10)
            .cast("bigint")
        )

    def with_xxh():
        return toks.withColumn(
            "h", F.xxhash64(F.col("t")).bitwiseAND((1 << 60) - 1)
        )

    def agg_of(hdf):
        bit_aggs = [
            F.sum(
                F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(60)
        ]
        return hdf.groupBy("doc").agg(*bit_aggs)

    for name, f in [
        ("explode_only", explode_only),
        ("explode+md5conv (shipped hash)", with_md5),
        ("explode+xxhash64&mask", with_xxh),
        ("full agg over md5 (shipped)", lambda: agg_of(with_md5())),
        ("full agg over xxhash64", lambda: agg_of(with_xxh())),
    ]:
        s = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _noop(f())
            s.append(time.perf_counter() - t0)
        print(f"# simhash stage [{name}]: median {statistics.median(s):.3f}s "
              f"({['%.3f' % x for x in s]})")
    # interleaved A/B of the two full-aggregate variants (time-only:
    # results DIFFER by design — the oracle pins md5, so this number
    # is documentation, not a shippable change)
    return _ab(
        "simhash_full(new=xxhash64 [NOT shippable], old=md5conv shipped)",
        lambda: agg_of(with_xxh()),
        lambda: agg_of(with_md5()),
        repeats,
    )


# ---------------------------------------------------- regexp large docs

def pair_regexp_big(spark, t, repeats):
    from hillview_spark.functions.text import (
        STOPWORD_RES, WORD_OR_PUNCT_RE,
    )

    path = os.path.join(tempfile.gettempdir(), "r16-bigdocs.parquet")
    if not os.path.exists(path):
        big = (
            t["documents"].limit(2000)
            .select(
                "doc_id",
                F.concat_ws(
                    " ", F.array_repeat(F.col("text"), 60)
                ).alias("text"),
            )
        )
        big.write.mode("overwrite").parquet(path)
    big = spark.read.parquet(path)
    n_chars = big.agg(F.avg(F.length("text"))).first()[0]
    print(f"# regexp_big fixture: 2000 docs, avg {n_chars:.0f} chars",
          file=sys.stderr)

    pat_word = WORD_OR_PUNCT_RE
    pat_stop = STOPWORD_RES["en"]

    def new_counts():
        tl = F.lower(F.col("text"))
        return big.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(pat_word)).alias("c1"),
            F.regexp_count(tl, F.lit(pat_stop)).alias("c2"),
        )

    def old_counts():
        tl = F.lower(F.col("text"))
        return big.select(
            "doc_id",
            F.size(F.regexp_extract_all(
                F.col("text"), F.lit(pat_word), F.lit(0))).alias("c1"),
            F.size(F.regexp_extract_all(
                tl, F.lit(pat_stop), F.lit(0))).alias("c2"),
        )

    print("regexp_big: asserting identity first", file=sys.stderr)
    _assert_same(new_counts(), old_counts(), ["doc_id"])
    return _ab(
        "regexp_big(new=regexp_count, old=size(regexp_extract_all))",
        new_counts, old_counts, repeats,
    )


# -------------------------------------------------------------- q15 10x

def pair_q15_10x(spark, t, repeats):
    from hillview_spark.queries.tpch import q15_top_supplier, _dec
    from pyspark.sql.functions import broadcast

    path = os.path.join(tempfile.gettempdir(), "r16-li10x.parquet")
    if not os.path.exists(path):
        li = t["lineitem"].select(
            "l_shipdate", "l_suppkey", "l_extendedprice", "l_discount"
        )
        (li.withColumn("__r", F.explode(F.array_repeat(F.lit(1), 10)))
           .drop("__r")
           .write.mode("overwrite").parquet(path))
    li10 = spark.read.parquet(path)
    sup = t["supplier"]

    def shipped():
        return q15_top_supplier(li10, sup)

    def persisted():
        li = li10.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
        rev = li.groupBy("l_suppkey").agg(
            F.sum(revenue).alias("total_rev")
        ).transform(cache.persist)
        max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
        return (
            rev.join(broadcast(max_rev), rev.total_rev == max_rev.max_rev)
            .join(broadcast(sup.select("s_suppkey", "s_name")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_revenue"))
            .orderBy("s_suppkey")
        )

    print("q15_10x: asserting identity first", file=sys.stderr)
    _assert_same(shipped(), persisted(), ["s_suppkey"])
    cache.release_all()
    return _ab(
        "q15_10x(new=persisted rev aggregate, old=shipped rescan)",
        persisted, shipped, repeats,
        materialize=lambda df: df.collect(),
    )


def pair_q15_sf(spark, t, repeats):
    """Same pair as q15_10x but over the REAL sf tables — the r15
    decision (rescan faster at sf0.1) gets a fresh interleaved
    sample before r16 decides whether the 10x-neutral persist shape
    ships."""
    from hillview_spark.queries.tpch import q15_top_supplier, _dec
    from pyspark.sql.functions import broadcast

    li0, sup = t["lineitem"], t["supplier"]

    def shipped():
        return q15_top_supplier(li0, sup)

    def persisted():
        li = li0.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
        rev = li.groupBy("l_suppkey").agg(
            F.sum(revenue).alias("total_rev")
        ).transform(cache.persist)
        max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
        return (
            rev.join(broadcast(max_rev), rev.total_rev == max_rev.max_rev)
            .join(broadcast(sup.select("s_suppkey", "s_name")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_revenue"))
            .orderBy("s_suppkey")
        )

    print("q15_sf: asserting identity first", file=sys.stderr)
    _assert_same(shipped(), persisted(), ["s_suppkey"])
    cache.release_all()
    return _ab(
        "q15_sf(new=persisted rev aggregate, old=shipped rescan)",
        persisted, shipped, repeats,
        materialize=lambda df: df.collect(),
    )


# ---------------------------------------------------------- funnel fold

def pair_funnel_fold(t, repeats):
    """events_funnel: the r16 single-pass fold (one IN-pushdown scan,
    one corpus shuffle, one persisted |users|-row depth frame) vs an
    inline replica of the r11 iterative shape (type-filtered scan +
    join + aggregate + persist PER STEP). Identity asserted."""
    from hillview_spark.streaming.events import funnel_counts

    steps = ("click", "view", "purchase")
    events = t["events"]

    def old_iterative():
        base = events.where(
            F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        ).select(
            F.col("user_id").alias("__u"), "event_type",
            F.col("ts").alias("__ts"),
        )
        rows = []
        cur = None
        for i, st in enumerate(steps):
            side = base.where(F.col("event_type") == st)
            if cur is None:
                cur = side.groupBy("__u").agg(F.min("__ts").alias("__t"))
            else:
                cur = (
                    side.join(cur, "__u")
                    .where(F.col("__ts") > F.col("__t"))
                    .groupBy("__u")
                    .agg(F.min("__ts").alias("__t"))
                )
            cur = cache.persist(cur)
            rows.append(
                cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                    F.lit(i + 1).alias("step"),
                    F.lit(st).alias("event_type"),
                    "n_users",
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionAll(r)
        return out

    def new_fold():
        return funnel_counts(events, steps=steps)

    print("funnel_fold: asserting identity first", file=sys.stderr)
    _assert_same(new_fold(), old_iterative(), ["step"])
    cache.release_all()

    def mat(df):
        _noop(df)
        cache.release_all()

    return _ab(
        "funnel_fold(new=single-pass sorted fold, old=per-step "
        "scan+join+persist)",
        new_fold, old_iterative, repeats, materialize=mat,
    )


# ------------------------------------------------------------------ main

PAIRS = ["repstats_rle", "colstats_sq", "simhash_hash", "regexp_big",
         "q15_10x", "q15_sf", "funnel_fold"]


def main():
    args = list(sys.argv[1:])
    repeats = 5
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    names = args or PAIRS
    unknown = [n for n in names if n not in PAIRS]
    if unknown:
        raise SystemExit(f"unknown pairs: {unknown}; have {PAIRS}")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ab-r16", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = load_all(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    t["lineitem"].count()
    t["documents"].count()

    for name in names:
        spark.sparkContext.setJobDescription(f"ab_r16: {name}")
        if name == "repstats_rle":
            pair_repstats_rle(t, repeats)
        elif name == "colstats_sq":
            pair_colstats_sq(t, repeats)
        elif name == "simhash_hash":
            pair_simhash_hash(t, repeats)
        elif name == "regexp_big":
            pair_regexp_big(spark, t, repeats)
        elif name == "q15_10x":
            pair_q15_10x(spark, t, repeats)
        elif name == "q15_sf":
            pair_q15_sf(spark, t, repeats)
        elif name == "funnel_fold":
            pair_funnel_fold(t, repeats)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
