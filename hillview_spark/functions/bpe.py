"""Byte-pair encoding: train a merge table on a corpus and tokenize
with it — the real subword tokenizer of Sennrich et al. '16
(arXiv:1508.07909), replacing the whitespace/regex token ESTIMATES in
functions/text.py with actual learned-vocabulary token counts (what a
training-data pipeline budgets sequences with).

Scale split (the part that matters at 100 TB):
- The CORPUS scan is distributed: one explode -> groupBy(word) with
  map-side combine, truncated to the top max_vocab_words by (count,
  word) — the word-frequency table, not the corpus, is what BPE
  trains on, and it is bounded by construction.
- Merge LEARNING is inherently sequential (merge k depends on the
  state after merge k-1 — there is no cross-merge parallelism to
  win), so it runs driver-side on that bounded table with the
  incremental pair-statistics update of the reference subword-nmt
  implementation: each merge touches only the words that contain the
  merged pair.
- ENCODING is embarrassingly parallel again: the merge-rank dict
  broadcasts to every Arrow batch (mapInPandas) and each distinct
  word in a batch is encoded once through a per-batch cache.

Determinism: pair ties break on (count desc, pair lexicographic),
the word table truncates on (count desc, word), so the same corpus
always yields the same merge list on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

END = "</w>"  # end-of-word marker, per the reference implementation


def _word_counts(
    df: DataFrame,
    text_col: str,
    lowercase: bool,
    max_vocab_words: int,
) -> list[tuple[str, int]]:
    from hillview_spark.functions.text import tokens_expr

    toks = tokens_expr(F.col(text_col), lowercase=lowercase)
    rows = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_vocab_words)
        .collect()
    )
    return [(r.w, r.c) for r in rows]


def bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    lowercase: bool = True,
    max_vocab_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from the corpus. Returns the
    ordered merge list [(left, right), ...] — rank = list position.
    Stops early when no pair reaches min_pair_count (merging
    singletons would just memorize the tail)."""
    vocab = _word_counts(df, text_col, lowercase, max_vocab_words)
    # word -> list of current symbols; seed = chars + end marker
    words: list[list[str]] = [list(w) + [END] for w, _ in vocab]
    counts = [c for _, c in vocab]

    # pair statistics + inverted index (pair -> word idxs), updated
    # incrementally: a merge only touches words containing the pair
    stats: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + counts[i]
            index.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not stats:
            break
        # deterministic argmax: count desc, then pair lexicographic
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in sorted(index.get(best, ())):
            syms = words[i]
            c = counts[i]
            j = 0
            out = []
            while j < len(syms):
                if (
                    j < len(syms) - 1
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            # retract old pair stats for this word, add new ones
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] -= c
                if stats[(a, b)] <= 0:
                    stats.pop((a, b), None)
                s = index.get((a, b))
                if s is not None:
                    s.discard(i)
            for a, b in zip(out, out[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
                index.setdefault((a, b), set()).add(i)
            words[i] = out
        stats.pop(best, None)
        index.pop(best, None)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the reference
    encode loop): repeatedly merge the best-ranked adjacent pair."""
    syms = list(word) + [END]
    while len(syms) > 1:
        pairs = [(ranks.get((a, b)), k) for k, (a, b) in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, k) for r, k in pairs if r is not None]
        if not ranked:
            break
        _, k = min(ranked)
        syms = syms[:k] + [syms[k] + syms[k + 1]] + syms[k + 2 :]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    with_tokens: bool = False,
) -> DataFrame:
    """Tokenize every document with a trained merge table. Returns
    (id, n_bpe_tokens[, bpe_tokens]) — the LEARNED-vocabulary count
    that chunking/packing should budget with (text.token_count's
    regex estimate is the cheap proxy). The merge-rank dict rides the
    closure to every Arrow batch; distinct words encode once per
    batch via a local cache, so cost ∝ distinct words, not tokens.

    Word segmentation happens JVM-SIDE through tokens_expr — the SAME
    canonical expression bpe_train's word counts use — and the Arrow
    worker only applies merges. The pre-r10 version split with
    Python str.split(), which breaks on 23 characters Java \\s does
    not (U+00A0, U+2028/29, U+3000, …): a doc containing 'a\\u00a0b'
    trained the single word 'a\\u00a0b' but encoded ['a', 'b'] — a
    vocabulary the model was never trained on (r10 review)."""
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    from hillview_spark.functions.text import tokens_expr

    ranks = {pair: r for r, pair in enumerate(merges)}

    def run(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            n_out, toks_out = [], []
            for words in pdf["__toks"]:
                doc_toks: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    doc_toks.extend(enc)
                n_out.append(len(doc_toks))
                if with_tokens:
                    toks_out.append(doc_toks)
            out = {id_col: pdf[id_col], "n_bpe_tokens": n_out}
            if with_tokens:
                out["bpe_tokens"] = toks_out
            yield pd.DataFrame(out)

    # output schema as a StructType: the id field is copied verbatim
    # from the input schema (name, type, nullability) — DDL string
    # concatenation would fail to parse on column names that need
    # quoting and hardcoding 'long' would crash non-long id types
    fields = [df.schema[id_col], StructField("n_bpe_tokens", LongType())]
    if with_tokens:
        fields.append(StructField("bpe_tokens", ArrayType(StringType())))
    return df.select(
        F.col(id_col),
        tokens_expr(F.col(text_col), lowercase=lowercase).alias("__toks"),
    ).mapInPandas(run, StructType(fields))
