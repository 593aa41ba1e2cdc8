"""Tokenizer/normalizer tests vs the reference pipeline semantics
(`/root/reference/code/preprocessing/preprocessor.py`, order fixed at
`dataset_news.py:283-308`)."""

import pandas as pd

from text_indexing_and_retrieval_system_spark.functions.normalize import (
    DEFAULT_CONFIG,
    NormalizeConfig,
    normalize_query_terms,
    normalize_to_tokens,
)
from text_indexing_and_retrieval_system_spark.functions.porter import porter_stem


def test_porter_known_pairs():
    pairs = {
        "caresses": "caress",
        "flies": "fli",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "motoring": "motor",
        "hopping": "hop",
        "happy": "happi",
        "relational": "relat",
        "conditional": "condit",
        "generalization": "gener",
        "abuse": "abus",       # vocab seen in reference query_sets/news_queries.json
        "september": "septemb",
        "the": "the",
    }
    for w, want in pairs.items():
        assert porter_stem(w) == want, w


def test_pipeline_order_and_classes():
    # stopwords removed BEFORE punctuation strip; digits and punct dropped;
    # empty tokens vanish before positions are assigned
    s = pd.Series(["The QUICK don't 123 fox-trot ran, over 42 lazy dogs!!"])
    toks = normalize_to_tokens(s, DEFAULT_CONFIG).iloc[0]
    # "The"->"the" stopword; "don't" stopword (pre-strip form); "123" -> "" dropped;
    # "fox-trot"->"foxtrot"->stem; "ran,"->"ran"; "42"->dropped; rest stemmed
    assert toks == ["quick", "foxtrot", "ran", "lazi", "dog"]


def test_no_stem_no_stop():
    cfg = NormalizeConfig(stopword_languages=(), stemming=None)
    s = pd.Series(["Hello, the WORLD 9 again"])
    assert normalize_to_tokens(s, cfg).iloc[0] == ["hello", "the", "world", "again"]


def test_underscore_and_unicode():
    cfg = NormalizeConfig(stopword_languages=(), stemming=None, remove_numbers=False)
    s = pd.Series(["foo_bar café 77x"])
    # '_' is not alnum in the reference test (`preprocessor.py:73`) -> removed
    assert normalize_to_tokens(s, cfg).iloc[0] == ["foobar", "café", "77x"]


def test_empty_and_null():
    s = pd.Series(["", None, "the and or"])
    out = normalize_to_tokens(s, DEFAULT_CONFIG)
    assert list(out) == [[], [], []]


def test_query_terms_match_corpus_normalization():
    assert normalize_query_terms(["Abuse", "running shoes"]) == [
        ["abus"],
        ["run", "shoe"],
    ]
