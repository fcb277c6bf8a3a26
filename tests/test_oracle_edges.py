"""Crafted-edge-data oracle parity: run the GATE's own DuckDB oracle
SQL against adversarial documents (empty text, whitespace-only, NULL
text, sub-shingle-length docs, exact + near duplicates) and assert the
Spark operators agree row-for-row.

The driver gate only ever sees the generated fixtures, which contain
none of these shapes — this test keeps the cross-engine contract honest
on the inputs most likely to diverge (tokenizer-on-empty, regex-on-NULL,
shingle windows shorter than n). The round-6/7 ADVICE bugs (NULL
event_type groups, NULL window filters) were exactly this class.
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from hillview_spark.functions import curation, dedup, text

EDGE_DOCS = [
    (1, "alpha beta gamma delta epsilon", "web", "en"),
    (2, "alpha beta gamma delta epsilon", "web", "en"),   # exact dup
    (3, "", "web", "en"),                                 # empty
    (4, "   ", "web", "en"),                              # whitespace
    (5, "one two", "web", "en"),                          # < shingle n
    (6, "alpha beta gamma delta zeta", "web", "en"),      # near dup
    (7, None, "web", "en"),                               # NULL text
    (8, "hello world hello", None, None),                 # NULL meta
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(
        EDGE_DOCS, "doc_id long, text string, source string, lang string"
    )


@pytest.fixture(scope="module")
def edge_con():
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(EDGE_DOCS, columns=["doc_id", "text", "source", "lang"]),
    )
    return con


# gate key -> the same operator call the gate's queries() entry makes
CASES = {
    "text_token_count": lambda df: text.token_count(df),
    "text_fingerprint": lambda df: text.fingerprint(df),
    "text_quality_score": lambda df: text.quality_score(df),
    "text_lang_id": lambda df: text.lang_id(df),
    "dedup_exact": lambda df: dedup.exact_dedup(df),
    "dedup_ngram_jaccard": lambda df: dedup.ngram_jaccard_pairs(
        df, threshold=0.3
    ),
    "dedup_minhash_lsh": lambda df: dedup.minhash_lsh_pairs(
        df, num_hashes=16, bands=4
    ),
    "text_pii_scrub": lambda df: curation.pii_scrub(df),
}


@pytest.mark.parametrize("key", sorted(CASES))
def test_oracle_matches_on_edge_docs(spark, edge_df, edge_con, key):
    sdf = CASES[key](edge_df)
    cols = sorted(sdf.columns)
    got = sorted(repr(tuple(r[c] for c in cols)) for r in sdf.collect())
    rel = edge_con.sql(entry_mod.oracle_sql()[key])
    dcols = list(rel.columns)
    assert sorted(dcols) == cols, f"{key}: column drift {dcols} vs {cols}"
    order = [dcols.index(c) for c in cols]
    want = sorted(
        repr(tuple(row[i] for i in order)) for row in rel.fetchall()
    )
    assert got == want, f"{key} diverged on edge docs"
