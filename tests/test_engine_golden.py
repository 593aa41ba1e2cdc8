"""End-to-end golden tests: Spark engine vs the pure-Python oracle.

Rank-identical AND score-identical (bit-exact — both sides fix the same
float expression tree and summation order) on generated boolean queries
covering all 15 reference templates (`generate_queries.py:24-40`).
"""

import pandas as pd
import pytest

from text_indexing_and_retrieval_system_spark import querygen
from text_indexing_and_retrieval_system_spark.functions.normalize import (
    normalize_to_tokens,
)
from text_indexing_and_retrieval_system_spark.operators import query_parser as qp

K = 20

POOLS_SPEC = querygen.PoolSpec(min_word_freq=3, high=(5, 40), mid=(41, 200), low=(201, 1200))


@pytest.fixture(scope="session")
def query_set(corpus_pdf):
    tokens = normalize_to_tokens(corpus_pdf["text"])
    freq = (
        pd.Series([t for lst in tokens for t in lst])
        .value_counts()
        .sort_values(ascending=False)
    )
    freqs = list(freq.items())
    freqs.sort(key=lambda kv: (-kv[1], kv[0]))
    pools = querygen.pools_from_frequencies(freqs, POOLS_SPEC)
    return querygen.generate_queries(pools, n_queries=30, seed=7)


def _assert_match(oracle_hits, engine_result, query):
    o_docs = [d for d, _ in oracle_hits]
    o_scores = [s for _, s in oracle_hits]
    assert engine_result.docs == o_docs, (
        f"doc mismatch for {query!r}:\n oracle={o_docs[:8]}\n engine={engine_result.docs[:8]}"
    )
    assert engine_result.scores == pytest.approx(o_scores, rel=0, abs=0), (
        f"score mismatch for {query!r}"
    )


@pytest.mark.parametrize("scorer", ["bm25", "tfidf", "wordcount"])
def test_single_term_all_scorers(built_index, oracle_index, scorer):
    q = '"stat"'  # high-frequency stem in the synthetic vocab? use pool below
    # pick a term guaranteed present: the most frequent non-stopword stem
    term = max(oracle_index.postings, key=lambda t: len(oracle_index.postings[t]))
    q = f'"{term}"'
    want = oracle_index.search(q, k=K, scorer=scorer)
    got = built_index.search_collect(q, k=K, scorer=scorer, strategy="dataframe")
    _assert_match(want, got, q)


def test_golden_queries_dataframe(built_index, oracle_index, query_set):
    for q in query_set:
        want = oracle_index.search(q, k=K, scorer="bm25")
        got = built_index.search_collect(q, k=K, scorer="bm25", strategy="dataframe")
        _assert_match(want, got, q)


def test_golden_queries_kernel(built_index, oracle_index, query_set):
    """The bucket-kernel boolean path (strategy=kernel, the interactive
    default for non-disjunctive bm25 queries) must be bit-identical to
    the oracle on all 15 templates (AND/OR/NOT/phrase mixes)."""
    for q in query_set:
        want = oracle_index.search(q, k=K, scorer="bm25")
        got = built_index.search_collect(q, k=K, scorer="bm25", strategy="kernel")
        _assert_match(want, got, q + " [kernel]")


def test_kernel_not_and_phrase(built_index, oracle_index, corpus_pdf):
    from text_indexing_and_retrieval_system_spark.functions.normalize import (
        normalize_to_tokens as _ntt,
    )

    term = max(oracle_index.postings, key=lambda t: len(oracle_index.postings[t]))
    mid = sorted(oracle_index.postings, key=lambda t: -len(oracle_index.postings[t]))[20]
    tokens = _ntt(corpus_pdf["text"].head(50))
    phrase = next(f"{lst[0]} {lst[1]}" for lst in tokens if len(lst) >= 2)
    for q in (
        f'NOT "{term}"',  # top-level complement: universe cogroup path
        f'"{mid}" AND NOT "{term}"',
        f'PHRASE "{phrase}"',
        f'PHRASE "{phrase}" OR "{mid}"',
    ):
        want = oracle_index.search(q, k=K)
        got = built_index.search_collect(q, k=K, strategy="kernel")
        _assert_match(want, got, q + " [kernel]")


def test_wand_matches_dataframe_on_disjunctions(built_index, oracle_index):
    terms = sorted(
        oracle_index.postings, key=lambda t: -len(oracle_index.postings[t])
    )[:6]
    q = " OR ".join(f'"{t}"' for t in terms)
    want = oracle_index.search(q, k=K, scorer="bm25")
    got_wand = built_index.search_collect(q, k=K, strategy="wand")
    got_df = built_index.search_collect(q, k=K, strategy="dataframe")
    _assert_match(want, got_wand, q + " [wand]")
    _assert_match(want, got_df, q + " [dataframe]")


def test_phrase_query(built_index, oracle_index, corpus_pdf):
    # take two adjacent tokens from a real document to guarantee >=1 hit
    tokens = normalize_to_tokens(corpus_pdf["text"].head(50))
    phrase = None
    for lst in tokens:
        if len(lst) >= 2:
            phrase = f"{lst[0]} {lst[1]}"
            break
    assert phrase
    q = f'PHRASE "{phrase}"'
    want = oracle_index.search(q, k=K)
    got = built_index.search_collect(q, k=K, strategy="dataframe")
    assert len(want) > 0
    _assert_match(want, got, q)


def test_not_query(built_index, oracle_index):
    term = max(oracle_index.postings, key=lambda t: len(oracle_index.postings[t]))
    mid = sorted(oracle_index.postings, key=lambda t: -len(oracle_index.postings[t]))[20]
    q = f'"{mid}" AND NOT "{term}"'
    want = oracle_index.search(q, k=K)
    got = built_index.search_collect(q, k=K, strategy="dataframe")
    _assert_match(want, got, q)


def test_missing_term_empty(built_index, oracle_index):
    q = '"zzzznonexistentzzz"'
    assert oracle_index.search(q, k=K) == []
    assert built_index.search_collect(q, k=K).docs == []
