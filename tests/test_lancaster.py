"""Lancaster (Paice/Husk) stemmer tests.

Two independent oracles:
1. the attested examples published in NLTK's lancaster-module doctests
   (the reference pipeline calls nltk.stem.LancasterStemmer — parity on
   these is parity with the reference's algo='lancaster' branch);
2. tests/fixtures/lancaster_vocab_stems.csv — the full documents-table
   vocabulary stemmed BY HAND from the published rule table (derivation
   notes below), which also backs the stem_lancaster_top50 driver
   oracle.

Hand-derivation notes for the non-identity fixture rows (rule strings
are Paice's reversed-ending notation):
- agg -> ag        "gg1." drops one g ("ga2>" wants ending "ag", agg
                   ends "gg")
- customer->custom "re2>" drops "er", continue; no m-rule then matches
- data -> dat      "a*1." (intact) drops final a; "dat" is acceptable
- filter -> filt   "re2>"; no t-rule matches "lt"
- line -> lin      "e1>"; no n-rule matches "in"
- merge -> merg    "e1>"; no g-rule matches "rg"
- order -> ord     "re2>"; "de2>" wants ending "ed", "ord" ends "rd"
- small -> smal    "ll1." ("la2>" wants ending "al", small ends "ll")
- table -> tabl    "e1>"; then "lba3>" ("abl") would leave "t",
                   rejected by the acceptability condition
- value -> valu    "e1>"; no u-rule matches "lu"
- vector -> vect   "ro2>" drops "or"; no t-rule matches "ct"
Identity rows that look stemmable but are not: "a" ("a*1." would leave
the empty string), "scan" ("na2>" would leave vowel-less "sc"), "the"
("e1>" would leave 2-letter consonant-initial "th"), "query"/"key"
(no rule covers "-ry"/"-ey").
"""

import csv
import os

from text_indexing_and_retrieval_system_spark.functions.lancaster import (
    MemoLancaster,
    lancaster_stem,
)
from text_indexing_and_retrieval_system_spark.functions.normalize import (
    NormalizeConfig,
    normalize_to_tokens,
)

# published doctest examples for nltk.stem.LancasterStemmer (the exact
# stemmer the reference dispatches to for algo='lancaster')
ATTESTED = {
    "maximum": "maxim",
    "presumably": "presum",
    "multiply": "multiply",
    "provision": "provid",
    "owed": "ow",
    "ear": "ear",
    "saying": "say",
    "crying": "cry",
    "string": "string",
    "meant": "meant",
    "cement": "cem",
}

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "lancaster_vocab_stems.csv"
)


def test_attested_nltk_examples():
    got = {w: lancaster_stem(w) for w in ATTESTED}
    assert got == ATTESTED


def test_hand_derived_corpus_vocab():
    with open(FIXTURE, newline="") as f:
        rows = {r["term"]: r["stem"] for r in csv.DictReader(f)}
    got = {t: lancaster_stem(t) for t in rows}
    assert got == rows


def test_algorithm_properties():
    # intact-only rules never fire on modified words: "maximum" loses
    # "um" via the intact rule, but "madeupum" derived through another
    # rule first keeps its "um"
    assert lancaster_stem("maximum") == "maxim"
    # acceptability: never strips below 2 letters (vowel start) or
    # 3 letters / vowel-less (consonant start)
    assert lancaster_stem("string") == "string"  # "str" has no vowel
    assert lancaster_stem("meant") == "meant"  # "me" too short
    assert lancaster_stem("a") == "a"
    assert lancaster_stem("") == ""
    # iterative continuation: -ness -> -i -> -y chain
    assert lancaster_stem("happiness") == "happy"


def test_memo_batch_matches_scalar():
    words = ["running", "running", "provision", "table", "ear"]
    memo = MemoLancaster()
    assert memo.stem_many(words) == [lancaster_stem(w) for w in words]


def test_normalize_pipeline_dispatch():
    import pandas as pd

    cfg = NormalizeConfig(stemming="lancaster", stopword_languages=())
    out = normalize_to_tokens(pd.Series(["the customer filter value"]), cfg)
    assert list(out.iloc[0]) == ["the", "custom", "filt", "valu"]
